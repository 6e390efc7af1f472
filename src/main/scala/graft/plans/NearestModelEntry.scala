package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructType}

/** Argmin/argmax over a LITERAL model table (k centroids or one PQ
  * subspace's K codebook entries): returns the id of the entry nearest
  * to the input vector. The per-row work is the same k dot products the
  * crossJoin(broadcast) → max_by form computed, but as ONE expression
  * with a plain Scala loop: no k-way row blowup, no reassembly
  * exchange, and — unlike inlining the model as k unrolled struct
  * literals — no per-call Janino compilation of model-specialized
  * source (measured at seconds per distinct centroid set, which
  * dominated every kmeans iteration and index build at bench scale)
  * and no per-element interpreted HOF dispatch. The model rides along
  * as a boxed literal reference, so the generated source is identical
  * across calls.
  *
  * Arithmetic is REPLICATED BIT-FOR-BIT from the expression form it
  * fuses (the oracle mirrors these exact compositions):
  *  - cosine mode (`l2 = false`, [[graft.operators.Similarity.cosine]]):
  *    sim = round(dot(v,c) / (√dot(v,v) · √dot(c,c)), 6), pick MAX sim,
  *    ties → smaller id; null sims (null input array, null element,
  *    length mismatch) sort BELOW every non-null sim; NaN sorts above
  *    everything (Spark's nan-safe double ordering); all-null → min id.
  *  - L2 mode (`l2 = true`, the PQ assignment): d2 =
  *    round(dot(v,v) − 2·dot(v,c) + dot(c,c), 6) evaluated in exactly
  *    that association order, pick MIN d2, ties → smaller id; null d2
  *    sorts FIRST (wins), NaN last — the min_by struct ordering.
  *  - round(x, 6) is Spark's Round on DoubleType: NaN/±Inf pass
  *    through, else BigDecimal.valueOf(x).setScale(6, HALF_UP).
  *
  * Dots accumulate in ascending index order like [[ArrayDot]]. Entries
  * are evaluated in ascending-id order with strict-improvement
  * replacement, which realizes the smaller-id tiebreak exactly.
  */
case class NearestModelEntry(emb: Expression, model: Expression, l2: Boolean)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(emb, model)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (l2) "graft_nearest_l2" else "graft_nearest_cosine"

  override def checkInputDataTypes(): TypeCheckResult = {
    def vecOk(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val modelOk = model.dataType match {
      case ArrayType(st: StructType, _) if st.length == 2 =>
        st.head.dataType == LongType && vecOk(st(1).dataType)
      case _ => false
    }
    if (vecOk(emb.dataType) && modelOk && model.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, " +
        "foldable array<struct<bigint, array<double>>>), got " +
        s"${emb.dataType.sql} and ${model.dataType.sql}")
  }

  private def isFloat: Boolean =
    emb.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** (id, centroid array, dot(c,c)) parsed once; ascending id. */
  @transient private lazy val entries: Array[(Long, Array[Double], Double)] = {
    val arr = model.eval(null).asInstanceOf[ArrayData]
    val modelElemFloat = model.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType](1).dataType
      .asInstanceOf[ArrayType].elementType == FloatType
    val out = (0 until arr.numElements()).map { i =>
      val row = arr.getStruct(i, 2)
      val ca = row.getArray(1)
      val c = new Array[Double](ca.numElements())
      var d = 0
      while (d < c.length) {
        c(d) = if (modelElemFloat) ca.getFloat(d).toDouble else ca.getDouble(d)
        d += 1
      }
      var cc = 0.0
      var j = 0
      while (j < c.length) { cc += c(j) * c(j); j += 1 }
      (row.getLong(0), c, cc)
    }.toArray
    require(out.nonEmpty, s"$prettyName: empty model table")
    out.sortBy(_._1)
  }

  /** Spark's Round(DoubleType, 6) semantics exactly. */
  private def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Spark's nan-safe double ordering (NaN == NaN, NaN > non-NaN,
    * -0.0 < 0.0 via Double.compare). */
  private def nanSafeCompare(x: Double, y: Double): Int =
    if (x.isNaN && y.isNaN) 0
    else if (x.isNaN) 1
    else if (y.isNaN) -1
    else java.lang.Double.compare(x, y)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val embAny = emb.eval(input)
    val v: Array[Double] =
      if (embAny == null) null
      else {
        val a = embAny.asInstanceOf[ArrayData]
        val out = new Array[Double](a.numElements())
        var i = 0
        var bad = false
        while (i < out.length && !bad) {
          if (a.isNullAt(i)) bad = true
          else {
            out(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
            i += 1
          }
        }
        if (bad) null else out
      }
    val vv: Double = if (v == null) 0.0 else {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      s
    }
    var bestId = 0L
    var bestScore = 0.0
    var bestNull = true
    var first = true
    var e = 0
    while (e < entries.length) {
      val (cid, c, cc) = entries(e)
      // score: null when the input vector is null/has null elements or
      // the lengths mismatch — ArrayDot's null contract.
      val scoreNull = v == null || c.length != v.length
      val score =
        if (scoreNull) 0.0
        else {
          var vc = 0.0; var i = 0
          while (i < v.length) { vc += v(i) * c(i); i += 1 }
          if (l2) round6(vv - 2.0 * vc + cc)
          else round6(vc / (math.sqrt(vv) * math.sqrt(cc)))
        }
      val wins =
        if (first) true
        else if (l2) {
          // min (d2, id); null d2 sorts FIRST (wins over non-null)
          if (scoreNull && bestNull) false // equal → keep smaller id (earlier)
          else if (scoreNull) true
          else if (bestNull) false
          else nanSafeCompare(score, bestScore) < 0
        } else {
          // max (sim, −id); null sim sorts LAST (loses to non-null)
          if (scoreNull) false // earlier entry keeps ties and non-null beats null
          else if (bestNull) true
          else nanSafeCompare(score, bestScore) > 0
        }
      if (wins) { bestId = cid; bestScore = score; bestNull = scoreNull }
      first = false
      e += 1
    }
    bestId
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NearestModelEntry =
    copy(emb = newChildren(0), model = newChildren(1))
}

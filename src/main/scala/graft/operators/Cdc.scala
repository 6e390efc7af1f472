package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture apply — fold a batch of row-level changes
  * (insert/update/delete, as a Debezium-style op column) into a
  * current-state snapshot. The type-1 counterpart of [[Scd2.merge]]:
  * no history, the snapshot converges to "latest op per key".
  *
  * Within a batch the LAST op per key wins, decided by a caller-named
  * monotonic sequence column (log offset / LSN) — resolved with ONE
  * max_by hash aggregation (map-side partials, no per-key sort, the
  * skew-robust shape). Then deletes anti-join out of the snapshot and
  * surviving upserts replace their keys: two equi-joins on the key
  * plus a union, all broadcastable when the batch is small — delta-
  * sized work against a snapshot-sized table, never a full rewrite of
  * untouched rows at the logical level (pair with partitioned publish
  * to avoid rewriting them physically).
  */
object Cdc {

  val OpCol = "op" // values: I / U / D

  def apply(snapshot: DataFrame, changes: DataFrame, key: String,
            seqCol: String): DataFrame = {
    val payload = snapshot.columns
    require(payload.forall(changes.columns.contains),
      s"changes must carry the snapshot columns (${payload.mkString(", ")})")
    require(changes.columns.contains(OpCol) && changes.columns.contains(seqCol),
      s"changes must carry '$OpCol' and '$seqCol'")

    // Fail loudly on malformed op values: a null or unknown op would
    // otherwise be silently dropped by the `op =!= "D"` upsert filter
    // (null predicate removes the row) — i.e. treated as a DELETE for
    // that key, losing snapshot rows with no error. The check rides the
    // existing scan (a per-row conditional, no extra pass) and fails
    // the batch at execution time, which in the streaming ingest fails
    // the micro-batch before anything is published.
    val validated = changes.withColumn(OpCol,
      when(col(OpCol).isin("I", "U", "D"), col(OpCol))
        .otherwise(raise_error(concat(
          lit(s"malformed CDC $OpCol (want I/U/D): "),
          coalesce(col(OpCol), lit("NULL"))))))

    // last op per key: one hash agg, constant state per key. Null keys
    // are dropped first — a null-key row can never equi-join the
    // snapshot (null matches nothing), so it would otherwise append an
    // unremovable null-key row per batch.
    val latest = validated
      .filter(col(key).isNotNull)
      .groupBy(col(key))
      .agg(max_by(struct((changes.columns.filterNot(_ == key)).map(col): _*),
        col(seqCol)).as("__last"))
      .select(col(key) +: changes.columns.filterNot(_ == key)
        .map(c => col(s"__last.$c")): _*)

    val untouched = snapshot.join(latest.select(col(key)), Seq(key), "left_anti")
    val upserts = latest.filter(col(OpCol) =!= "D")
      .select(payload.map(col).toSeq: _*)
    untouched.unionByName(upserts)
  }
}

package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LakeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_lake_$name").toFile.getAbsolutePath

  test("stats manifest skips most files for a selective range, result parity with full scan") {
    val df = (0L until 3200L).map(i => (i, i % 800, s"t${i % 5}")).toDF("id", "k", "tag")
    val path = tmp("clustered") + "/t"
    Lake.writeClustered(df, path, Seq(col("k")), Seq("k"))

    val (kept, total) = Lake.pruneStats(spark, path, "k", 100, 120)
    assert(total >= 8, s"fixture should spread over many files, got $total")
    assert(kept < total / 2, s"selective range should skip most files: kept $kept of $total")

    val pruned = Lake.readPruned(spark, path, "k", 100, 120)
      .filter(col("k").between(100, 120))
    val full = spark.read.parquet(path).filter(col("k").between(100, 120))
    assert(pruned.collect().toSet == full.collect().toSet)
    assert(pruned.count() > 0)
  }

  test("readPruned with a range outside every file returns empty with the table schema") {
    val df = (0L until 100L).map(i => (i, i)).toDF("id", "k")
    val path = tmp("empty") + "/t"
    Lake.writeClustered(df, path, Seq(col("k")), Seq("k"))
    val out = Lake.readPruned(spark, path, "k", 5000, 6000)
    assert(out.columns.toSeq == Seq("id", "k"))
    assert(out.count() == 0)
  }

  test("readPruned caps the driver-side file collect: 100k-file manifest fails loudly over the cap") {
    // Manufactured manifest: 100k file entries (no data files needed —
    // the cap must trip BEFORE any data read is attempted). At 100 TB
    // with small files this is the shape that would otherwise stream
    // millions of path strings into driver memory.
    val nFiles = 100000L
    val path = tmp("capped") + "/t"
    spark.range(nFiles)
      .select(concat(lit(s"$path/part-"), col("id")).as("file"),
        (col("id") * 10).as("min_k"), (col("id") * 10 + 9).as("max_k"))
      .write.mode("overwrite").parquet(s"$path/${Lake.StatsDir}")
    // unselective range → every file survives the prune → over the cap
    val e = intercept[IllegalStateException] {
      Lake.readPruned(spark, path, "k", 0, Long.MaxValue, maxFiles = 50000)
    }
    assert(e.getMessage.contains("not a prune"), e.getMessage)
    assert(e.getMessage.contains("compact"), "remedy must be named in the error")
    // selective range under the cap: the collect proceeds (list resolves
    // to missing files only because the manifest is synthetic — the cap
    // logic is what this test pins, so stop at the bounded collect via
    // pruneStats parity)
    val (kept, total) = Lake.pruneStats(spark, path, "k", 0, 99)
    assert(total == nFiles && kept == 10, s"kept $kept of $total")
    // and the eq-path enforces the same ceiling
    val vPos = Lake.bloomPositionsLocal("v")
    val bloomy = spark.range(nFiles)
      .select(concat(lit(s"$path/part-"), col("id")).as("file"),
        array(vPos.map(lit(_)): _*).as("bloom_k"))
    bloomy.write.mode("overwrite").parquet(s"$path/${Lake.StatsDir}")
    val e2 = intercept[IllegalStateException] {
      Lake.readPrunedEq(spark, path, "k", "v", maxFiles = 50000)
    }
    assert(e2.getMessage.contains("not a prune"), e2.getMessage)
  }

  test("z-order layout skips files on BOTH dimensions; linear layout only on its own") {
    // 64×64 grid; z-order cluster by interleaved (x, y) vs linear by x.
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")

    val zpath = tmp("zorder") + "/t"
    Lake.writeClustered(grid.withColumn("z", Lake.zorderValue(col("x"), col("y"), 6)),
      zpath, Seq(col("z")), Seq("x", "y"))
    val (zKeptX, zTotal) = Lake.pruneStats(spark, zpath, "x", 0, 7)
    val (zKeptY, _) = Lake.pruneStats(spark, zpath, "y", 0, 7)
    assert(zKeptX < zTotal, s"z-order must skip on x: $zKeptX of $zTotal")
    assert(zKeptY < zTotal, s"z-order must skip on y: $zKeptY of $zTotal")

    val lpath = tmp("linear") + "/t"
    Lake.writeClustered(grid, lpath, Seq(col("x")), Seq("x", "y"))
    val (lKeptY, lTotal) = Lake.pruneStats(spark, lpath, "y", 0, 7)
    assert(lKeptY == lTotal,
      s"linear-by-x layout cannot skip on y: kept $lKeptY of $lTotal — " +
        "this is the contrast that justifies z-order")
    val (zK, _) = Lake.pruneStats(spark, zpath, "y", 0, 7)
    assert(zK < lKeptY, "z-order strictly beats linear layout on the non-cluster dimension")

    // and result parity through the pruned path
    val pruned = Lake.readPruned(spark, zpath, "y", 0, 7).filter(col("y") <= 7)
    assert(pruned.count() == 64 * 8)
  }

  test("per-file bloom skips files for point lookups on a non-cluster column") {
    // id is uncorrelated with the cluster key k (bit-reversed ordering),
    // so min/max on id spans nearly the full range in every file and
    // range pruning would keep everything — the bloom case.
    val df = (0L until 3200L).map(i => (java.lang.Long.reverse(i) >>> 32, i % 800))
      .toDF("id", "k")
    val path = tmp("bloom") + "/t"
    Lake.writeClustered(df, path, Seq(col("k")), Seq("k"), bloomCols = Seq("id"))

    val probe = java.lang.Long.reverse(1234L) >>> 32
    val (kept, total) = Lake.pruneStatsEq(spark, path, "id", probe)
    assert(total >= 8, s"fixture should spread over many files, got $total")
    assert(kept < total / 2, s"bloom should skip most files: kept $kept of $total")

    val got = Lake.readPrunedEq(spark, path, "id", probe)
      .filter(col("id") === probe).collect()
    assert(got.length == 1 && got.head.getLong(1) == 1234L % 800)

    // absent key: usually zero files survive; correctness either way
    val miss = Lake.readPrunedEq(spark, path, "id", -99L).filter(col("id") === -99L)
    assert(miss.count() == 0)
  }

  test("compactPublished: many small files -> few clustered files, atomically versioned") {
    val root = tmp("compact")
    val df = (0L until 2000L).map(i => (i, i % 500)).toDF("id", "k")
    // simulate a streaming ingest's fragmented layout: 50 small files
    graft.sinks.Publish.publishTables(spark,
      Map("t" -> df.repartition(50)), root, "000001")
    val before = spark.read.parquet(s"$root/v-000001/t").inputFiles.length
    assert(before >= 40, s"fixture should be fragmented, got $before files")

    Lake.compactPublished(spark, root, "t", Seq(col("k")), Seq("k"),
      newVersion = "000002", numFiles = 8)

    assert(graft.sinks.Publish.currentVersion(spark, root).contains("v-000002"))
    val compacted = graft.sinks.Publish.readTable(spark, root, "t")
    assert(compacted.inputFiles.length == 8)
    assert(compacted.collect().toSet == df.collect().toSet, "compaction preserves data")
    // the fresh manifest prunes on the new layout
    val (kept, total) = Lake.pruneStats(spark, s"$root/v-000002/t", "k", 0, 10)
    assert(total == 8 && kept < total)
    // old version intact for pinned readers until vacuum
    assert(spark.read.parquet(s"$root/v-000001/t").count() == 2000)
  }

  test("failed compaction cleans its staged dir (vacuum could never reclaim it)") {
    val root = tmp("compact_fail")
    val df = (0L until 100L).map(i => (i, i % 10)).toDF("id", "k")
    graft.sinks.Publish.publishTables(spark, Map("t" -> df), root, "000001")
    intercept[Exception] {
      // nonexistent cluster column → writeClustered throws mid-compaction
      Lake.compactPublished(spark, root, "t", Seq(col("no_such_col")), Seq("k"),
        newVersion = "000002")
    }
    assert(graft.sinks.Publish.currentVersion(spark, root).contains("v-000001"))
    assert(!new java.io.File(s"$root/v-000002").exists(),
      "partial staging dir must not linger newer-than-current")
  }

  test("zorderValue interleaves bits (known values)") {
    val out = Seq((3L, 5L)).toDF("x", "y")
      .select(Lake.zorderValue(col("x"), col("y"), 4).as("z"))
      .as[Long].head()
    // x=3=0b011 (even positions), y=5=0b101 (odd positions):
    // z = 1*1 + 1*2 + 1*4 + 0*8 + 0*16 + 1*32 = 39
    assert(out == 39L)
  }
}

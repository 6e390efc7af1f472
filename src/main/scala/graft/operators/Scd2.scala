package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension merge — the history-preserving
  * variant of the reference's find-or-insert catalog maintenance
  * (reference: src/Command/EtlHisTurnosCommand.php:112-151 keeps
  * dimensions current-only; SCD2 is the standard extension when the
  * warehouse must answer "what did this row look like on date X").
  *
  * Contract: `current` is the full history table — one OPEN row per
  * live key (`is_current = true`, `valid_to` null) plus any number of
  * CLOSED rows; `updates` carries one row per key with the new tracked
  * values (enforce uniqueness upstream with [[Dedup.firstWins]]). The
  * merge:
  *
  *  - keys whose tracked values changed (null-safe compare): the open
  *    row is closed (`valid_to = batchDate`, `is_current = false`) and
  *    a new open row is inserted with `valid_from = batchDate`;
  *  - keys absent from `current`: inserted as new open rows;
  *  - unchanged keys and all closed history rows: pass through as-is.
  *
  * Everything is equi-joins on the key (broadcast when the update
  * batch is small, hash otherwise — Catalyst/AQE decide from stats),
  * so the merge costs one shuffle of the update batch at worst;
  * closed-history rows are never rewritten, only unioned through —
  * at 100 TB pair this with a partitioned publish so the untouched
  * history partitions are not even read.
  */
object Scd2 {

  def merge(current: DataFrame, updates: DataFrame, key: String,
            trackedCols: Seq[String], batchDate: java.sql.Date): DataFrame = {
    require(trackedCols.nonEmpty, "trackedCols must not be empty")
    val meta = Seq("valid_from", "valid_to", "is_current")
    require(meta.forall(current.columns.contains),
      s"current must carry ${meta.mkString(", ")}")

    val open = current.filter(col("is_current"))
    val closedHistory = current.filter(!col("is_current"))

    // One row per changed-or-new key — a single left join, aliased so a
    // shared lineage between `updates` and `current` cannot make the
    // join condition self-referential. Null-safe <=> so null→value and
    // value→null both count as changes.
    val u = updates.alias("u")
    val o = open.alias("o")
    val sameVals = trackedCols.map(c => col(s"u.$c") <=> col(s"o.$c")).reduce(_ and _)
    val changedOrNew = u.join(o, col(s"u.$key") === col(s"o.$key"), "left")
      .filter(col(s"o.$key").isNull || !sameVals)
      .select(updates.columns.map(c => col(s"u.$c")): _*)
    val changedKeys = changedOrNew.select(col(key))

    val toClose = open.join(changedKeys, Seq(key), "left_semi")
      .withColumn("valid_to", lit(batchDate))
      .withColumn("is_current", lit(false))
    val unchangedOpen = open.join(changedKeys, Seq(key), "left_anti")
    val fresh = changedOrNew
      .withColumn("valid_from", lit(batchDate))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))

    val cols = current.columns.map(col).toSeq
    closedHistory.select(cols: _*)
      .unionByName(unchangedOpen.select(cols: _*))
      .unionByName(toClose.select(cols: _*))
      .unionByName(fresh.select(cols: _*))
  }
}

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
  * values for every non-meta column (enforce per-key uniqueness
  * upstream with [[Dedup.firstWins]]). The merge:
  *
  *  - keys whose tracked values changed (null-safe compare): the open
  *    row is closed (`valid_to = batchDate`, `is_current = false`) and
  *    a new open row is inserted with `valid_from = batchDate`;
  *  - keys absent from `current`: inserted as new open rows;
  *  - unchanged keys and all closed history rows: pass through as-is.
  *
  * Plan shape: ONE full-outer equi-join of the update batch against
  * the open rows (broadcast when the batch is small, hash otherwise —
  * Catalyst/AQE decide from stats), then a generator that emits 1 or 2
  * output rows per joined row — no per-class re-joins, so the open
  * side is scanned once. Closed-history rows are never rewritten, only
  * unioned through — at 100 TB pair this with a partitioned publish so
  * untouched history partitions are not even read.
  */
object Scd2 {

  private val meta = Seq("valid_from", "valid_to", "is_current")

  def merge(current: DataFrame, updates: DataFrame, key: String,
            trackedCols: Seq[String], batchDate: java.sql.Date): DataFrame = {
    require(trackedCols.nonEmpty, "trackedCols must not be empty")
    require(meta.forall(current.columns.contains),
      s"current must carry ${meta.mkString(", ")}")
    val payload = current.columns.filterNot(meta.contains)
    require(payload.toSet == updates.columns.toSet,
      s"updates must carry exactly the non-meta columns " +
        s"(${payload.mkString(", ")}), got (${updates.columns.mkString(", ")})")

    val open = current.filter(col("is_current"))
    val closedHistory = current.filter(!col("is_current"))

    // A null-key update row would otherwise fall through the full-outer
    // join unmatched on BOTH sides (null joins nothing) and the
    // "no update" branch would fabricate an all-null history row —
    // null-key updates are structurally meaningless, drop them here.
    val cleanUpdates = updates.filter(col(key).isNotNull)
    // Aliased so shared lineage between updates and current cannot make
    // the join self-referential; <=> so null→value and value→null both
    // count as changes.
    val u = cleanUpdates.alias("u")
    val o = open.alias("o")
    val same = trackedCols.map(c => col(s"u.$c") <=> col(s"o.$c")).reduce(_ and _)
    val hasU = col(s"u.$key").isNotNull
    val hasO = col(s"o.$key").isNotNull

    val oRow = struct(current.columns.map(c => col(s"o.$c").as(c)).toSeq: _*)
    val oClosed = struct(current.columns.map {
      case "valid_to" => lit(batchDate).as("valid_to")
      case "is_current" => lit(false).as("is_current")
      case c => col(s"o.$c").as(c)
    }.toSeq: _*)
    val uFresh = struct(current.columns.map {
      case "valid_from" => lit(batchDate).as("valid_from")
      case "valid_to" => lit(null).cast("date").as("valid_to")
      case "is_current" => lit(true).as("is_current")
      case c => col(s"u.$c").as(c)
    }.toSeq: _*)

    val emitted = when(hasU && hasO && same, array(oRow))
      .when(hasU && hasO && !same, array(oClosed, uFresh))
      .when(!hasU, array(oRow)) // no update for this open row
      .otherwise(array(uFresh)) // brand-new key

    val mergedOpen = u.join(o, col(s"u.$key") === col(s"o.$key"), "full_outer")
      .select(explode(emitted).as("__r"))
      .select(current.columns.map(c => col(s"__r.$c")).toSeq: _*)

    closedHistory.unionByName(mergedOpen)
  }

  /** Point-in-time (temporal) join: each fact row joined to the
    * dimension VERSION that was valid at the fact's timestamp —
    * `valid_from <= ts < valid_to` (open rows have null `valid_to`).
    * The key equality keeps this a hash/broadcast equi-join with the
    * validity range as a join filter (never a nested loop); facts with
    * no valid version at their timestamp keep nulls (left join). At
    * most one version matches per (key, ts) when the history is
    * well-formed ([[merge]] maintains non-overlapping intervals). */
  def pointInTime(facts: DataFrame, history: DataFrame, factKey: String,
                  dimKey: String, tsCol: String): DataFrame = {
    // Aliased, like merge: facts and history often share lineage (the
    // history was derived from the same source), and bare df(col)
    // references would then resolve to the same attribute ids —
    // an ambiguous/trivially-true self-join.
    val f = facts.alias("pit_f")
    val h = history.alias("pit_h")
    f.join(h,
      col(s"pit_f.$factKey") === col(s"pit_h.$dimKey") &&
        col(s"pit_f.$tsCol") >= col("pit_h.valid_from") &&
        (col("pit_h.valid_to").isNull ||
          col(s"pit_f.$tsCol") < col("pit_h.valid_to")),
      "left")
  }
}

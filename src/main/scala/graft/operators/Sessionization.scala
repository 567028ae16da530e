package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the heart of the reference engine.
  *
  * Reference semantics (functions/sessionization/main.py:408-448, W1-W7 in
  * SURVEY.md §2.5): per client id, order hits by receive time; a hit starts a
  * new session when the gap to the previous hit is >= 30 minutes (or there is
  * no previous hit); the running sum of the start-flags is the per-user
  * session number; a deterministic session id is derived from
  * (key, session start, session end).
  *
  * Spark-first design notes:
  *  - ONE window family `partitionBy(key).orderBy(ts)` serves the lag, the
  *    start-flag and the running sum, so the whole operator costs exactly one
  *    shuffle by `key` — this is the property that survives a 1000x scale-up
  *    (shuffle is hash-partitioned on the user key; no global sort).
  *  - Start/end per session use `min/max over partitionBy(key, seq)` instead
  *    of the reference's order-dependent `first_value`/unordered `last_value`
  *    (main.py:442-445) — deterministic, same observable output.
  *  - All expressions are built-ins => whole-stage codegen end-to-end.
  */
object Sessionization {

  val DefaultGapMs: Long = 30L * 60L * 1000L

  /** Adds `prev_ts_ms`, `is_new_session` (0/1), `session_seq` (1-based
    * per-key counter), given an epoch-millis Long column.
    *
    * @param tieBreakers extra ordering columns after `tsMs` — pass a unique
    *   id so same-millisecond hits order deterministically (the reference
    *   orders by receive time alone, which is nondeterministic on ties).
    */
  def withSessionFlags(
      df: DataFrame,
      key: Column,
      tsMs: Column,
      gapMs: Long = DefaultGapMs,
      tieBreakers: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tsMs +: tieBreakers: _*)
    val prev = lag(tsMs, 1).over(w)
    val isNew = when(prev.isNull || (tsMs - prev) >= gapMs, 1).otherwise(0)
    // Two analysis passes instead of three (each withColumn re-analyzes
    // the full plan — costly on the 280-col GA table). session_seq must
    // reference the is_new_session COLUMN: inlining the expression would
    // nest lag().over() inside sum().over(), which Spark rejects.
    df.withColumns(Map(
      "prev_ts_ms" -> prev,
      "is_new_session" -> isNew))
      .withColumn(
        "session_seq",
        sum(col("is_new_session"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Full sessionization: flags + per-session start/end/hit-count + a
    * deterministic session id hash(key || start || end) (reference W7,
    * main.py:437 uses `sha` = sha1).
    *
    * @param idAlgo "sha1" (reference-faithful, default) or "md5" — md5
    *   exists in DuckDB 1.0 while sha1 does not, so oracle-checked queries
    *   use md5; the hash choice changes only the id's bit pattern, not the
    *   grouping semantics.
    */
  def sessionize(
      df: DataFrame,
      key: Column,
      tsMs: Column,
      gapMs: Long = DefaultGapMs,
      tieBreakers: Seq[Column] = Nil,
      idAlgo: String = "sha1"): DataFrame = {
    val flagged = withSessionFlags(df, key, tsMs, gapMs, tieBreakers)
    // Window by (key, session_seq): no extra shuffle — child is already
    // hash-partitioned by key; Spark only adds a local sort.
    val ws = Window.partitionBy(key, col("session_seq"))
    val idInput = concat(key.cast("string"),
      col("session_start_ms").cast("string"),
      col("session_end_ms").cast("string"))
    flagged
      .withColumn("session_start_ms", min(tsMs).over(ws))
      .withColumn("session_end_ms", max(tsMs).over(ws))
      .withColumn("session_hits", count(lit(1)).over(ws))
      .withColumn("session_id",
        if (idAlgo == "md5") md5(idInput) else sha1(idInput))
  }

  /** One row per session (the reference's `is_new_session = 1` projection,
    * main.py:929-978). Call on the output of [[sessionize]]. */
  def sessions(sessionized: DataFrame): DataFrame =
    sessionized.filter(col("is_new_session") === 1)
}

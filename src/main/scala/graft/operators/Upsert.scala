package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed MERGE/upsert — the Delta-style `WHEN MATCHED THEN UPDATE ALL /
  * WHEN NOT MATCHED THEN INSERT ALL` semantics (SURVEY §2.8's proper fix
  * for the reference's append-only session history), expressed as the
  * anti-join + union a table format performs under the hood when it
  * rewrites the touched files.
  *
  * This is strictly stronger than the idempotent-history anti-join mode
  * ([[graft.jobs.DailyJob]]): that mode only SUPPRESSES re-appended
  * duplicates, so a session that legitimately changed (reopened across
  * the day boundary, revenue restated) keeps its stale row forever;
  * upsert REPLACES the matched row with the source version.
  *
  * Shape: one equi-join on the key columns (the target side is the big
  * table — at scale the join prunes to the key projection and AQE
  * broadcasts the day-sized source) plus a union; no window, no
  * collect. Writing the result back follows the staging-then-swap
  * discipline ([[graft.jobs.TrainingArtifact]]) since the target path is
  * also an input.
  */
object Upsert {

  /** Latest-wins keyed merge: rows of `target` whose key appears in
    * `source` are replaced by the source rows; all other target rows
    * carry over; source rows with new keys insert. Both frames must
    * share the key columns; output columns = source columns. */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    target
      .join(source.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(source)
  }
}

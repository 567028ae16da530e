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

  /** Schema-EVOLVING keyed merge — [[upsert]] when the source carries
    * columns the target predates (the additive half of schema
    * evolution, the one a long-lived serving table actually meets: a
    * new enrichment field appears mid-history). Output schema is the
    * UNION of both schemas; carried target rows surface null for
    * columns only the source has, and vice versa — exactly Delta's
    * `mergeSchema` semantics for MERGE. Column REMOVAL is deliberately
    * not expressed (a source that dropped a column leaves the target
    * column in place, null on new rows): silent narrowing is a data
    * loss bug, not evolution. */
  def upsertEvolve(target: DataFrame, source: DataFrame,
                   keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    require(keys.forall(k => target.columns.contains(k) &&
      source.columns.contains(k)), "key columns must exist on both sides")
    target
      .join(source.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(source, allowMissingColumns = true)
  }

  /** PARTITION-SCOPED merge against a `partCol`-partitioned parquet
    * tree — the file-pruning shape a lakehouse MERGE has, and the 100 TB
    * answer to [[upsert]]'s whole-table rewrite: only partitions
    * carrying source rows are READ (partition-pruned scan) and
    * REWRITTEN (dynamic partition overwrite); a year of untouched daily
    * partitions is neither scanned nor written. New partition values in
    * the source become inserts of whole new partitions.
    *
    * Contract the caller owns (true for session history keyed by start
    * date): a key's rows live under ONE partition value, and a source
    * row carries the SAME partition value as the target row it updates
    * — otherwise the stale twin in the unscanned partition survives.
    *
    * Runs on a cloned session (the Compaction discipline): dynamic
    * overwrite + inference-off stay scoped to this merge. In-place
    * read/rewrite is safe because dynamic overwrite stages output and
    * swaps partitions at COMMIT, after all source reads — the
    * Compaction caveat about mid-commit crashes applies identically. */
  def upsertPartitionScoped(spark: org.apache.spark.sql.SparkSession,
                            targetPath: String, partCol: String,
                            source: DataFrame, keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    require(!keys.contains(partCol), s"$partCol partitions the tree; key on the id columns")
    val sess = spark.newSession()
    sess.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    sess.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val root = new org.apache.hadoop.fs.Path(targetPath)
    val fs = root.getFileSystem(sess.sessionState.newHadoopConf())
    // re-root the source on the clone (RDDs are context-, not session-,
    // scoped) so the overwrite semantics above govern its write — no
    // driver materialization involved
    // Persist the re-rooted source: it is consumed up to three times
    // (isEmpty/bootstrap write, touched-partition collect, merge write).
    // Without the pin an expensive source triples its compute, and a
    // NON-DETERMINISTIC one could yield a touched-partition list that
    // diverges from the rows actually written — leaving stale twins in
    // partitions the scan never visited. One evaluation ends both risks.
    val src = sess.createDataFrame(source.rdd, source.schema).persist()
    try {
      if (!fs.exists(root)) {
        // bootstrap: the whole source is new partitions. An EMPTY first
        // batch writes nothing — a zero-file tree would make every later
        // read of the target fail schema inference (an empty day is
        // normal for a streaming sink's first triggers, not an error).
        if (!src.isEmpty) src.write.partitionBy(partCol).parquet(targetPath)
        return
      }
      // O(batch partitions) driver list — the "partitions touched" set a
      // table format would read from its transaction log
      val touched = src.select(col(partCol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq
      require(!touched.contains(null),
        s"source rows with NULL $partCol cannot be partition-scoped " +
          "(they would land in the Hive default partition outside the scan scope)")
      // inference is off, so the pruned read carries partCol as the raw
      // directory string; cast it back to the SOURCE's type — the source
      // typed the tree at bootstrap, so this round-trips value-identically
      // (and a string-typed source keeps `hour=00` verbatim, the
      // Compaction value-identity lesson)
      val affected = sess.read.parquet(targetPath)
        .filter(col(partCol).cast("string").isin(touched: _*))
        .withColumn(partCol, col(partCol).cast(source.schema(partCol).dataType))
      upsert(affected, src, keys)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy(partCol)
        .parquet(targetPath)
    } finally src.unpersist()
  }

  /** ATOMIC partition-scoped merge — [[upsertPartitionScoped]] with the
    * [[graft.sources.Manifest]] commit protocol closing its documented
    * crash window: the merged partitions are STAGED as fresh appended
    * files (old files untouched), the new file list publishes in one
    * manifest rename, and only then are the replaced files vacuumed.
    * A crash at ANY point leaves manifest readers on exactly the old or
    * exactly the new snapshot, never a mix of rewritten and stale
    * partitions. Readers resolve the table via `Manifest.read`; the
    * same key/partition contract as the non-atomic form applies. */
  def upsertPartitionScopedAtomic(spark: org.apache.spark.sql.SparkSession,
                                  targetPath: String, partCol: String,
                                  source: DataFrame, keys: Seq[String],
                                  keepVersions: Int = 1): Unit = {
    import graft.sources.Manifest
    require(keys.nonEmpty, "upsert needs at least one key column")
    require(!keys.contains(partCol), s"$partCol partitions the tree; key on the id columns")
    val sess = spark.newSession()
    sess.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    val root = new org.apache.hadoop.fs.Path(targetPath)
    val fs = root.getFileSystem(sess.sessionState.newHadoopConf())
    val src = sess.createDataFrame(source.rdd, source.schema).persist()
    try {
      if (!fs.exists(root) || Manifest.current(sess, targetPath).isEmpty) {
        // bootstrap: either a brand-new table (whole source = new
        // partitions) or an existing plain tree adopted under manifest
        // control before the merge
        if (fs.exists(root)) Manifest.bootstrap(sess, targetPath)
        else if (!src.isEmpty) {
          src.write.partitionBy(partCol).parquet(targetPath)
          Manifest.bootstrap(sess, targetPath)
          return
        } else return
      }
      val touched = src.select(col(partCol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq
      require(!touched.contains(null),
        s"source rows with NULL $partCol cannot be partition-scoped")
      if (touched.isEmpty) return
      // pinned snapshot read: the staging append cannot disturb it
      val affected = Manifest.read(sess, targetPath)
        .filter(col(partCol).cast("string").isin(touched: _*))
        .withColumn(partCol, col(partCol).cast(source.schema(partCol).dataType))
      val newFiles = Manifest.stagePartitionReplacement(sess, targetPath,
        partCol, upsert(affected, src, keys), touched)
      Manifest.commit(sess, targetPath, newFiles)
      Manifest.vacuum(sess, targetPath, keepVersions)
    } finally src.unpersist()
  }

  /** [[upsertPartitionScopedAtomic]] for MULTI-LEVEL partitioning
    * (round-12 verdict #4 — the reference's own serving layout is
    * three-level `year=/month=/day=`): the touched set is the distinct
    * LEAF tuples the source carries, the pruned read is a broadcast
    * semi-join on those tuples (an `isin` per level would over-select
    * the cross product), and the replacement publish swaps exactly the
    * touched leaves — files outside them are carried by reference,
    * byte-untouched. Same key/partition contract per leaf as the
    * single-level form. */
  def upsertPartitionScopedAtomicN(spark: org.apache.spark.sql.SparkSession,
                                   targetPath: String, partCols: Seq[String],
                                   source: DataFrame, keys: Seq[String],
                                   keepVersions: Int = 1): Unit = {
    import graft.sources.Manifest
    require(keys.nonEmpty, "upsert needs at least one key column")
    require(partCols.nonEmpty, "use upsert()/mergeDv for unpartitioned")
    partCols.foreach(pc => require(!keys.contains(pc),
      s"$pc partitions the tree; key on the id columns"))
    val sess = spark.newSession()
    sess.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    val root = new org.apache.hadoop.fs.Path(targetPath)
    val fs = root.getFileSystem(sess.sessionState.newHadoopConf())
    val src = sess.createDataFrame(source.rdd, source.schema).persist()
    try {
      if (!fs.exists(root) || Manifest.current(sess, targetPath).isEmpty) {
        if (fs.exists(root)) Manifest.bootstrap(sess, targetPath)
        else if (!src.isEmpty) {
          src.write.partitionBy(partCols: _*).parquet(targetPath)
          Manifest.bootstrap(sess, targetPath)
          return
        } else return
      }
      val (touchedDirs, touchedDf) =
        PartitionScope.touchedLeaves(sess, src, partCols)
      if (touchedDirs.isEmpty) return
      val snapshot = Manifest.read(sess, targetPath)
      val affected = PartitionScope.semiJoinLeaves(snapshot, touchedDf, partCols)
        .select(snapshot.columns.map(c =>
          col(c).cast(source.schema(c).dataType).as(c)): _*)
      val merged = upsert(affected, src, keys)
      val created = Manifest.stageUniqueParts(sess, fs, root, partCols, merged)
      PartitionScope.requireWithin(created, partCols, touchedDirs)
      val live = Manifest.current(sess, targetPath).get._2
      Manifest.commit(sess, targetPath,
        live.filterNot(f =>
          touchedDirs(Manifest.leafDirOf(f, partCols))) ++ created)
      Manifest.vacuum(sess, targetPath, keepVersions)
    } finally src.unpersist()
  }
}

/** Shared leaf-tuple plumbing of the multi-level partition-scoped
  * operators. */
private[operators] object PartitionScope {
  import org.apache.spark.sql.{Row, SparkSession}
  import org.apache.spark.sql.types.{StringType, StructField, StructType}
  import graft.sources.Manifest

  /** Distinct leaf tuples of `df` (string-cast, null-refused) as
    * (escaped leaf-dir set, broadcastable tuple frame with `_t_`-
    * prefixed columns). */
  def touchedLeaves(sess: SparkSession, df: DataFrame,
                    partCols: Seq[String]): (Set[String], DataFrame) = {
    val tuples = df
      .select(partCols.map(c => col(c).cast("string")): _*)
      .distinct().collect().map(_.toSeq.map(_.asInstanceOf[String]))
    tuples.foreach(t => require(!t.contains(null),
      s"rows with NULL in ${partCols.mkString(",")} cannot be " +
        "partition-scoped (they would land in the Hive default " +
        "partition outside the scan scope)"))
    val esc = org.apache.spark.sql.catalyst.catalog
      .ExternalCatalogUtils.escapePathName _
    val dirs = tuples.map(t => partCols.zip(t)
      .map { case (c, v) => s"$c=${esc(v)}" }.mkString("/")).toSet
    val schema = StructType(partCols.map(c =>
      StructField(s"_t_$c", StringType, nullable = false)))
    import scala.jdk.CollectionConverters._
    val tdf = sess.createDataFrame(
      tuples.map(t => Row.fromSeq(t)).toSeq.asJava, schema)
    (dirs, tdf)
  }

  /** Keep exactly the rows of `df` whose leaf tuple appears in
    * `touchedDf` — broadcast semi-join on all levels at once. */
  def semiJoinLeaves(df: DataFrame, touchedDf: DataFrame,
                     partCols: Seq[String]): DataFrame =
    df.join(broadcast(touchedDf),
      partCols.map(c => df(c).cast("string") === touchedDf(s"_t_$c"))
        .reduce(_ && _), "left_semi")

  /** Staged files must land only under declared-touched leaves. */
  def requireWithin(created: Seq[String], partCols: Seq[String],
                    touched: Set[String]): Unit = {
    val bad = created.map(Manifest.leafDirOf(_, partCols))
      .find(d => !touched(d))
    require(bad.isEmpty,
      s"staged data contains leaf ${bad.getOrElse("")} outside the " +
        s"declared touched set")
  }
}

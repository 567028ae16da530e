package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch explorer for q161's selective-ANN parameters: derives the
  * clustered fixture from the embeddings table, then sweeps probe
  * configurations printing (mean recall@5, mean n_cand, corpus n) so
  * the gated configuration is chosen from measurement, not guesswork.
  */
object ProbeAnnSel {
  def main(args: Array[String]): Unit = {
    import graft.llm.{KMeans, Similarity}
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val ce = Similarity.plantedClusters(emb).persist()
    val n = ce.count()
    val pred = col("vec_id") < 10
    val truth = Similarity.bruteForceTopK(ce, pred, 5)
      .select(col("query_id"), col("neighbor_id")).persist()
    def report(name: String, res: DataFrame, cand: DataFrame): Unit = {
      val rec = truth.join(res.select(col("query_id"), col("neighbor_id"),
          lit(1).as("hit")), Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg((sum(coalesce(col("hit"), lit(0))) / count(lit(1))).as("r"))
        .agg(avg("r")).first().getDouble(0)
      val nc = cand.groupBy("query_id").count().agg(avg("count"))
        .first().getDouble(0)
      println(f"PROBE $name%-28s recall=$rec%.3f n_cand=$nc%.1f/$n (${100 * nc / n}%.1f%%)")
    }
    val kmCents = KMeans.fitCentroids(ce, 16, 3)
    for (probe <- Seq(1, 2, 3); store <- Seq(1, 2))
      report(s"ivf_km p=$probe s=$store",
        Similarity.ivfTopKWith(ce, kmCents, pred, 5, probe, store),
        Similarity.ivfCandidatePairs(ce, kmCents, pred, probe, store))
    for (ham <- Seq(0, 1))
      report(s"lsh_mp h=$ham",
        Similarity.multiProbeLshTopK(ce, pred, 5, 16, 8, ham),
        Similarity.multiProbeCandidatePairs(ce, pred, 16, 8, ham))
    spark.stop()
  }
}

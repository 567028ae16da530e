package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.llm.IncrementalDedup

/** Streaming corpus admission — the streaming face of
  * [[graft.llm.IncrementalDedup]]: each micro-batch of candidate
  * documents is admitted against the corpus AS OF that batch (read
  * fresh per batch), and the admitted rows append to the same corpus
  * location, so batch N+1 dedups against everything batch N let in.
  *
  * Delivery semantics: `foreachBatch` is at-least-once on failure, and
  * that is ENOUGH here — admission is idempotent BY CONSTRUCTION. A
  * redelivered batch re-admits against a corpus that already contains
  * its own admitted rows, so every one of them is corpus-exact (or
  * near-dup) and zero rows append. The dedup anti-join doubles as the
  * exactly-once mechanism; no transactional sink needed. (This is the
  * same argument that lets a failed daily admission job simply re-run.)
  *
  * The per-batch corpus read costs one parquet scan of fingerprints +
  * hash sets; production deployments materialize those two derived
  * tables bucketed ([[graft.sources.Bucketing]]) and append to them in
  * the same loop, as documented on [[IncrementalDedup.admit]].
  */
object StreamingAdmission {

  /** Read the corpus dir, or an empty frame of `schema` before the
    * first admission lands (same empty-fallback shape as the GA
    * history read). */
  def corpusOrEmpty(spark: SparkSession, dir: String,
                    schema: StructType): DataFrame = {
    val hasData = new java.io.File(dir).listFiles() match {
      case null => false
      case fs => fs.exists(_.getName.endsWith(".parquet"))
    }
    if (hasData) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Start the admission loop: `docs` (streaming, with doc_id + text
    * columns) -> admitted rows appended to `corpusDir`. */
  def run(docs: DataFrame, corpusDir: String, checkpointDir: String,
          threshold: Double = 0.8): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val corpus = corpusOrEmpty(batch.sparkSession, corpusDir, batch.schema)
        IncrementalDedup.admit(corpus, batch, col("doc_id"), col("text"), threshold)
          .write.mode("append").parquet(corpusDir)
      }
      .start()
}

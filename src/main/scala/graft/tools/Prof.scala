package graft.tools
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.llm.MinHashLsh
import graft.sources.Tables

/** Scratch profiler for dedup stages (kept out of Bench). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.range(100).write.format("noop").mode("overwrite").save()
    time("scan")(docs.write.format("noop").mode("overwrite").save())
    time("shingles-array")(docs.select(col("doc_id"), MinHashLsh.shingles(col("text")).as("sh"))
      .write.format("noop").mode("overwrite").save())
    time("explode")(docs.select(col("doc_id"), explode(MinHashLsh.shingles(col("text"))).as("s"))
      .write.format("noop").mode("overwrite").save())
    time("explode+md5")(docs.select(col("doc_id"), explode(MinHashLsh.shingles(col("text"))).as("s"))
      .select(col("doc_id"), MinHashLsh.shingleHash(col("s")).as("h"))
      .write.format("noop").mode("overwrite").save())
    time("explode+md5+collect")(MinHashLsh.hashSets(docs, col("doc_id"), col("text"))
      .write.format("noop").mode("overwrite").save())
    time("repartitioned-hashSets")(MinHashLsh.hashSets(
      docs.repartition(32), col("doc_id"), col("text"))
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}

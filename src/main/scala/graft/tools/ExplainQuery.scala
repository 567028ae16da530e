package graft.tools

import graft.GraftSession

/** Dev helper: print the executed plan of registered queries.
  * `runMain graft.tools.ExplainQuery <name>[,<name>...] [sfDir] [lines]` */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q01_pricing_agg"))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val take = args.lift(2).map(_.toInt).getOrElse(40)
    val spark = GraftSession.builder(master = "local[4]",
      shufflePartitions = Some(4)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      println(s"===== $q")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      println(df.queryExecution.executedPlan.toString
        .linesIterator.take(take).mkString("\n"))
    }
  }
}

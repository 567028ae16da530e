package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{CosineSimExpr, MinHashBandKeysExpr, WordBigramsExpr}

/** Session extensions: registers graft's native Catalyst expressions as
  * SQL functions. Activated via
  * `spark.sql.extensions=graft.GraftExtensions` (GraftSession, Verify and
  * Bench all set it).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("minhash_band_keys"),
      new ExpressionInfo(classOf[MinHashBandKeysExpr].getName, "minhash_band_keys"),
      (children: Seq[Expression]) => MinHashBandKeysExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("cosine_d"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_d"),
      (children: Seq[Expression]) => CosineSimExpr(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("word_bigrams"),
      new ExpressionInfo(classOf[WordBigramsExpr].getName, "word_bigrams"),
      (children: Seq[Expression]) => WordBigramsExpr(children.head)))
  }
}

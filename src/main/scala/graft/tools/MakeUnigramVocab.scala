package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.GraftSession
import graft.llm.UnigramLm

/** One-time artifact builder: trains the unigram-LM tokenizer
  * ([[UnigramLm.train]], SentencePiece-style Viterbi-EM) on the
  * sf0.001 documents fixture and checks the piece table in as a TSV.
  * The q178 provenance gate re-trains on the same declared corpus and
  * must reproduce this file bit-for-bit (the q128/BPE discipline). */
object MakeUnigramVocab {

  val DefaultOut = "src/main/resources/graft/unigram_vocab.tsv"
  val Corpus = "/root/testdata/sf0.001"

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else DefaultOut
    val spark = GraftSession.local()
    val vocab = UnigramLm.train(
      graft.sources.Tables.documents(spark, Corpus), col("text"))
      .orderBy("rank")
      .collect()
      .map(r => s"${r.getLong(0)}\t${r.getString(1)}\t${r.getLong(2)}\t${r.getLong(3)}")
    val lines = ("rank\tpiece\tcnt\tp_ppm" +: vocab).mkString("", "\n", "\n")
    Files.writeString(Paths.get(out), lines)
    println(s"wrote ${vocab.length} pieces to $out")
    spark.stop()
  }
}

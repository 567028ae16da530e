package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.GraftSession
import graft.llm.{Bpe, WordPiece}

/** One-shot vocab trainer: learns the checked-in WordPiece table
  * (`src/main/resources/graft/wordpiece_vocab.tsv`) from the sf0.001
  * documents fixture — likelihood-scored merges (count(lr)/(count(l)·
  * count(r)), exact cross-multiplied comparison), `##` continuation
  * symbols, ties lexicographic; see [[graft.llm.WordPiece]].
  *
  * Run (from the repo root): `sbt "runMain graft.tools.MakeWordPieceVocab"`.
  * The output is a versioned artifact — regenerating it is a VOCAB
  * CHANGE, exactly like [[MakeBpeVocab]]. */
object MakeWordPieceVocab {

  val DefaultOut = "src/main/resources/graft/wordpiece_vocab.tsv"

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else DefaultOut
    val spark = GraftSession.local()
    val texts = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select("text").collect().map(_.getString(0)).filter(_ != null)
    val wordFreq = texts.iterator.flatMap(Bpe.splitWords)
      .foldLeft(Map.empty[String, Long]) { (m, w) =>
        m.updated(w, m.getOrElse(w, 0L) + 1L)
      }
    val merges = WordPiece.train(wordFreq, WordPiece.NumMerges)
    val rows = WordPiece.vocabRows(wordFreq, merges)
    val body = "id\ttoken\n" +
      rows.map { case (i, s) => s"$i\t$s" }.mkString("\n") + "\n"
    Files.createDirectories(Paths.get(out).getParent)
    Files.write(Paths.get(out), body.getBytes(StandardCharsets.UTF_8))
    println(s"wrote ${rows.size} vocab entries (${merges.size} merges) to $out")
    spark.stop()
  }
}

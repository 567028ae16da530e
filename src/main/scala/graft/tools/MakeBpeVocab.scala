package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.GraftSession
import graft.llm.Bpe

/** One-shot vocab trainer: learns the checked-in BPE merge table
  * (`src/main/resources/graft/bpe_merges.tsv`) from the sf0.001
  * documents fixture. Standard BPE training (Sennrich et al. 2016):
  * count adjacent symbol pairs over the word-frequency table, merge the
  * most frequent pair (ties: lexicographically smallest (left, right) —
  * the determinism the spec pins), repeat.
  *
  * Run (from the repo root): `sbt "runMain graft.tools.MakeBpeVocab"`.
  * The output is a versioned artifact — regenerating it is a VOCAB
  * CHANGE and invalidates every stored token count downstream, exactly
  * like swapping tokenizers under a trained model; hence a tool, not a
  * pipeline stage.
  */
object MakeBpeVocab {

  val DefaultOut = "src/main/resources/graft/bpe_merges.tsv"
  val NumMerges = 200

  /** Train `numMerges` merges from a word-frequency table. Training
    * applies each learned merge to every occurrence in the vocab (the
    * classic fold); ENCODING replays merges one occurrence at a time —
    * both are deterministic, and encoding only needs the rank order. */
  def train(wordFreq: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var vocab: Map[List[String], Long] =
      wordFreq.map { case (w, n) => Bpe.codePointSymbols(w).toList -> n }
        .groupMapReduce(_._1)(_._2)(_ + _)
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var stop = false
    while (k < numMerges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + n
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val (pair, cnt) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        if (cnt < 2) stop = true // a pair seen once compresses nothing
        else {
          merges += pair
          vocab = vocab.map { case (syms, n) => (applyMerge(syms, pair), n) }
            .groupMapReduce(_._1)(_._2)(_ + _)
          k += 1
        }
      }
    }
    merges.result()
  }

  /** Leftmost-greedy fold: rewrite every non-overlapping occurrence. */
  def applyMerge(syms: List[String], pair: (String, String)): List[String] = {
    val out = List.newBuilder[String]
    var rest = syms
    while (rest.nonEmpty) {
      rest match {
        case a :: b :: tail if a == pair._1 && b == pair._2 =>
          out += a + b; rest = tail
        case a :: tail => out += a; rest = tail
        case Nil =>
      }
    }
    out.result()
  }

  val DefaultVocabOut = "src/main/resources/graft/bpe_vocab.tsv"

  /** Id space: 0 = `<unk>` (any token over code points unseen in
    * training), 1..B = base symbols (distinct training code points,
    * sorted), B+1.. = merge outputs in rank order. Every token the
    * encoder can emit over in-vocab chars has an id by construction. */
  def vocab(wordFreq: Map[String, Long],
      merges: Seq[(String, String)]): Seq[(Int, String)] = {
    val base = wordFreq.keysIterator
      .flatMap(Bpe.codePointSymbols).toSet.toSeq.sorted
    (Seq(0 -> Bpe.UnkToken) ++
      base.zipWithIndex.map { case (s, i) => (i + 1) -> s } ++
      merges.zipWithIndex.map { case ((l, r), i) =>
        (base.size + 1 + i) -> (l + r)
      }).map { case (i, s) => (i, s) }
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else DefaultOut
    val vocabOut = if (args.length > 1) args(1) else DefaultVocabOut
    val spark = GraftSession.local()
    val texts = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select("text").collect().map(_.getString(0)).filter(_ != null)
    val wordFreq = texts.iterator.flatMap(Bpe.splitWords)
      .foldLeft(Map.empty[String, Long]) { (m, w) =>
        m.updated(w, m.getOrElse(w, 0L) + 1L)
      }
    val merges = train(wordFreq, NumMerges)
    val body = "rank\tl\tr\n" + merges.zipWithIndex.map {
      case ((l, r), i) => s"$i\t$l\t$r"
    }.mkString("\n") + "\n"
    Files.createDirectories(Paths.get(out).getParent)
    Files.write(Paths.get(out), body.getBytes(StandardCharsets.UTF_8))
    val v = vocab(wordFreq, merges)
    val vbody = "id\ttoken\n" +
      v.map { case (i, s) => s"$i\t$s" }.mkString("\n") + "\n"
    Files.write(Paths.get(vocabOut), vbody.getBytes(StandardCharsets.UTF_8))
    println(s"wrote ${merges.size} merges to $out, ${v.size} vocab entries to $vocabOut")
    spark.stop()
  }
}

package graft.expressions

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `ac_scan(text, patterns)` →
  * `struct<hits: array<string>, n_occ: bigint>` — every blocklist
  * phrase found in `text`, by ONE Aho–Corasick pass.
  *
  * The blocklist problem at corpus scale: a curation blocklist is
  * thousands of phrases, and the naive plans are P `contains()` scans
  * per document (P full text passes) or one mega-alternation regex
  * (backtracking-pathological and still not O(n)). Aho–Corasick walks
  * the text ONCE whatever P is: a trie over the patterns with BFS
  * failure links; at each character the live node's suffix chain
  * yields every pattern ending there. `hits` is the sorted distinct
  * matched patterns; `n_occ` counts ALL occurrences at every ending
  * position (overlaps included — "aaa" vs pattern "aa" counts 2),
  * which the per-node propagated end-count gives for free.
  *
  * Matching is case-insensitive by ASCII A–Z fold ONLY (byte-exact,
  * locale-free on both sides — the oracle mirrors it with
  * `translate(text, 'A..Z', 'a..z')`; full Unicode folding is
  * locale/version-dependent and could never hash-gate).
  *
  * Plan shape: pure per-row projection inside whole-stage codegen.
  * `patterns` must be FOLDABLE (a literal blocklist): the automaton is
  * built once on the driver, shipped to executors as a codegen
  * reference object, and cached per-JVM by pattern-set key for the
  * interpreted path — never rebuilt per row.
  */
case class AcScanExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        if (!right.foldable) TypeCheckResult.TypeCheckFailure(
          "ac_scan patterns must be a foldable array<string> literal")
        else {
          // Guard the FOLDED value here, not in the lazy automaton build:
          // a null/empty/null-element pattern list would otherwise NPE
          // during codegen and surface as an opaque planning error.
          val arr = right.eval().asInstanceOf[ArrayData]
          if (arr == null) TypeCheckResult.TypeCheckFailure(
            "ac_scan patterns must not be a null literal")
          else if (arr.numElements() == 0) TypeCheckResult.TypeCheckFailure(
            "ac_scan patterns must be non-empty")
          else {
            var i = 0; var bad = -1
            while (i < arr.numElements() && bad < 0) {
              if (arr.isNullAt(i) || arr.getUTF8String(i).numBytes() == 0) bad = i
              i += 1
            }
            if (bad >= 0) TypeCheckResult.TypeCheckFailure(
              s"ac_scan pattern at index $bad is null or empty")
            else TypeCheckResult.TypeCheckSuccess
          }
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ac_scan requires (string, array<string>), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("hits", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("n_occ", LongType, nullable = false)))
  override def prettyName: String = "ac_scan"

  @transient private lazy val automaton: AcAutomaton = {
    val arr = right.eval().asInstanceOf[ArrayData]
    val pats = Array.tabulate(arr.numElements())(i =>
      arr.getUTF8String(i).toString)
    AcScan.cached(pats)
  }

  override def eval(input: InternalRow): Any = {
    val t = left.eval(input)
    if (t == null) null else automaton.scan(t.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val autoRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AcAutomaton].getName)
    val leftGen = left.genCode(ctx)
    ev.copy(code =
      code"""
        ${leftGen.code}
        boolean ${ev.isNull} = ${leftGen.isNull};
        InternalRow ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $autoRef.scan(${leftGen.value});
        }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AcScanExpr =
    copy(left = newLeft, right = newRight)
}

object AcScan {
  private val cache = new ConcurrentHashMap[String, AcAutomaton]()

  /** Per-JVM automaton cache keyed by the NUL-joined pattern set
    * (patterns cannot contain NUL — rejected at build — so the key is
    * collision-free even for phrases with spaces). */
  def cached(patterns: Array[String]): AcAutomaton =
    cache.computeIfAbsent(patterns.mkString("\u0000"),
      _ => new AcAutomaton(patterns))
}

/** The built Aho–Corasick automaton: trie + BFS failure links, with the
  * end-count and matched-pattern-id lists PRE-PROPAGATED along each
  * node's suffix chain, so the scan never walks dictionary links — per
  * character it is one goto step (amortized O(1) by the standard
  * failure-link argument) plus one array read. Serializable: built on
  * the driver, shipped inside the codegen references; the build-only
  * scaffolding is `@transient` (deserialized copies scan with the
  * frozen arrays only). */
final class AcAutomaton(patternsRaw: Array[String]) extends Serializable {
  require(patternsRaw.nonEmpty, "ac_scan: empty pattern list")
  // ASCII-only case fold (see AcScanExpr doc) — applied to patterns at
  // build and to text per character at scan
  private def fold(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
  private val patterns: Array[String] = patternsRaw.map(p => p.map(fold))
  patterns.foreach { p =>
    require(p.nonEmpty, "ac_scan: empty pattern")
    require(!p.contains('\u0000'), "ac_scan: NUL in pattern")
  }
  require(patterns.distinct.length == patterns.length,
    "ac_scan: duplicate patterns after ASCII fold")

  // --- trie build (scaffolding; not shipped) ---
  @transient private val next =
    mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
  @transient private val ownEnd = mutable.ArrayBuffer(List.empty[Int])
  for ((p, pi) <- patterns.zipWithIndex) {
    var v = 0
    for (c <- p) {
      v = next(v).getOrElseUpdate(c, {
        next += mutable.HashMap.empty[Char, Int]
        ownEnd += Nil
        next.length - 1
      })
    }
    ownEnd(v) ::= pi
  }
  private val fail = new Array[Int](next.length)
  /** Pattern ids ending at this node INCLUDING its suffix chain. */
  private val matched = new Array[Array[Int]](next.length)
  matched(0) = ownEnd(0).toArray
  locally {
    val queue = mutable.Queue.empty[Int]
    for ((_, u) <- next(0)) { fail(u) = 0; queue += u }
    while (queue.nonEmpty) {
      val v = queue.dequeue()
      // BFS order: fail(v) is strictly shallower, so matched(fail(v))
      // is already propagated when v dequeues
      matched(v) = (ownEnd(v) ++ matched(fail(v))).toArray
      for ((c, u) <- next(v)) {
        var f = fail(v)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(u) = next(f).getOrElse(c, 0)
        queue += u
      }
    }
  }
  private val endCnt: Array[Int] = matched.map(_.length)
  // scan-time goto maps frozen immutable (thread-safe, serializable)
  private val goto: Array[Map[Char, Int]] = next.map(_.toMap).toArray
  private val patternUtf8: Array[UTF8String] =
    patterns.map(UTF8String.fromString)

  def scan(text: UTF8String): InternalRow = {
    val s = text.toString
    var state = 0
    var nOcc = 0L
    var seen: mutable.BitSet = null
    var i = 0
    while (i < s.length) {
      val c = fold(s.charAt(i))
      var v = state
      while (v != 0 && !goto(v).contains(c)) v = fail(v)
      state = goto(v).getOrElse(c, 0)
      if (endCnt(state) > 0) {
        nOcc += endCnt(state)
        if (seen == null) seen = new mutable.BitSet(patterns.length)
        val m = matched(state)
        var j = 0
        while (j < m.length) { seen += m(j); j += 1 }
      }
      i += 1
    }
    // UTF8String compareTo = binary UTF-8 order — the same collation
    // DuckDB's list_sort applies, for ANY pattern alphabet (Java
    // String order diverges on supplementary-plane chars)
    val hits: Array[Any] =
      if (seen == null) Array.empty[Any]
      else seen.toArray.map(patternUtf8(_)).sorted.map(x => x: Any)
    InternalRow(new GenericArrayData(hits), nOcc)
  }
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.expressions._

/** Session extensions: registers graft's native Catalyst expressions as
  * SQL functions. Activated via
  * `spark.sql.extensions=graft.GraftExtensions` (GraftSession, Verify and
  * Bench all set it).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Constant integer argument: any FOLDABLE expression qualifies (so
    * SQL like `char_ngram_hash_set(text, 2+3)` works, not just bare
    * literals). */
  private def longLit(e: Expression, what: String): Long = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be a constant integer expression, got $e")
    e.eval() match {
      case v: Long => v
      case v: Int => v.toLong
      case other => throw new IllegalArgumentException(
        s"$what must be integral, got $other")
    }
  }

  private def arity(children: Seq[Expression], n: Int, min: Int, usage: String): Unit =
    if (children.length > n || children.length < min)
      throw new IllegalArgumentException(
        s"wrong argument count ${children.length}: usage $usage")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Whole-operator extension (custom LogicalPlan -> SparkPlan): the
    // greedy-packing chain as a planner-visible node with declared
    // distribution/ordering requirements (plans/GreedyPack.scala).
    ext.injectPlannerStrategy(_ => graft.plans.GreedyPackStrategy)
    // Optimizer extension: size(bpe_encode(x)) -> bpe_count(x) — the
    // token-count budget without materializing the token array
    // (plans/BpeCountRewrite.scala).
    ext.injectOptimizerRule(_ => graft.plans.BpeCountRewrite)
    // Materialized-summary rewrite: matching aggregates over a
    // registered base table answer from its pre-aggregated summary
    // (plans/SummaryRewrite.scala). No-op until a summary registers.
    ext.injectOptimizerRule(_ => graft.plans.SummaryRewrite)
    // FK join elimination: a validated fact→dim constraint drops
    // dimension joins the query doesn't consume
    // (plans/JoinElimination.scala). No-op until a constraint registers.
    ext.injectOptimizerRule(_ => graft.plans.JoinElimination)
    // Unified table read path: catalog tables marked graft.manifest=true
    // resolve through the manifest commit log (snapshot isolation) with
    // bloom file pruning on the declared point-lookup column
    // (sources/GraftTable.scala). No-op for every other table.
    ext.injectPostHocResolutionRule(s => graft.sources.ManifestTableResolution(s))
    // SQL DML on manifest tables: DELETE FROM / UPDATE / keyed MERGE
    // INTO dispatch to the merge-on-read operators (deleteWhere /
    // updateWhere / mergeDv) — the write-side twin of the unified read
    // path (plans/ManifestDml.scala). Runs after the read resolution
    // in the same post-hoc batch; no-op for every other table.
    ext.injectPostHocResolutionRule(s => graft.plans.ManifestDmlResolution(s))
    // SQL operational surface (the injectParser tier): read-side time
    // travel (`SELECT … FROM t VERSION AS OF v` — Spark's v1 path
    // rejects it during MAIN resolution, so the parser is the one seam
    // early enough) plus DESCRIBE HISTORY / VACUUM / RESTORE /
    // OPTIMIZE ZORDER / CHECKPOINT, each dispatching to the existing
    // operator (plans/GraftSqlParser.scala). Unmatched SQL delegates
    // verbatim.
    ext.injectParser((session, delegate) =>
      new graft.plans.GraftSqlParser(session, delegate))
    // Metadata-only aggregates: a global count(*)/count(col)/min/max
    // (under partition-only filters) over a manifest table answers
    // from the commit log's stats sidecars — zero data IO
    // (plans/AggFromLog.scala). Declines (normal scan) whenever
    // exactness isn't provable.
    ext.injectOptimizerRule(s => graft.plans.AggFromLog(s))
    // Batch CDC as a table-valued function (round-12 verdict #5; the
    // Delta CDF design exposes the change feed to SQL as
    // `table_changes`): `SELECT * FROM table_changes('db.t', v1, v2)`
    // returns the row-level events of (v1, v2] with `_change_type` +
    // `_commit_version` — how an auditor or a backfill job consumes
    // commit history without standing up a stream. The first argument
    // names a graft.manifest=true catalog table (or a raw
    // manifest-controlled root path); versions must be constant.
    ext.injectTableFunction((
      FunctionIdentifier("table_changes"),
      new ExpressionInfo(graft.sources.ManifestCdc.getClass.getName,
        "table_changes"),
      (children: Seq[Expression]) => {
        arity(children, 3, 3, "table_changes('db.table' | '/root', from, to)")
        val spark = org.apache.spark.sql.SparkSession.active
        val nameArg = children.head
        if (!nameArg.foldable) throw new IllegalArgumentException(
          "table_changes: the table name must be a constant string")
        val name = nameArg.eval() match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other => throw new IllegalArgumentException(
            s"table_changes: expected a string table name, got $other")
        }
        val (root, declared) =
          if (name.contains("/")) (name, None)
          else {
            val ti = spark.sessionState.sqlParser.parseTableIdentifier(name)
            val tbl = spark.sessionState.catalog.getTableMetadata(ti)
            if (!tbl.properties.get(graft.sources.GraftTable.PropManifest)
              .contains("true")) throw new UnsupportedOperationException(
              s"$name is not a graft.manifest=true catalog table — " +
                s"table_changes reads manifest commit logs only")
            (new org.apache.hadoop.fs.Path(tbl.location).toUri.getPath,
              Some(tbl.schema))
          }
        val df = graft.sources.ManifestCdc.tableChanges(spark, root,
          longLit(children(1), "table_changes from version"),
          longLit(children(2), "table_changes to version"), declared)
        df.queryExecution.logical
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_band_keys"),
      new ExpressionInfo(classOf[MinHashBandKeysExpr].getName, "minhash_band_keys"),
      (children: Seq[Expression]) => {
        arity(children, 1, 1, "minhash_band_keys(<arg>)")
        MinHashBandKeysExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("cosine_d"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_d"),
      (children: Seq[Expression]) => {
        arity(children, 2, 2, "cosine_d(a, b)")
        CosineSimExpr(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("word_bigrams"),
      new ExpressionInfo(classOf[WordBigramsExpr].getName, "word_bigrams"),
      (children: Seq[Expression]) => {
        arity(children, 1, 1, "word_bigrams(<arg>)")
        WordBigramsExpr(children.head)
      }))
    // rolling_hash(text[, b, p]) — base/modulus as literals
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHashExpr].getName, "rolling_hash"),
      (children: Seq[Expression]) => {
        arity(children, 3, 1, "rolling_hash(text[, b, p])")
        RollingHashExpr(
        children.head,
        if (children.length > 1) longLit(children(1), "rolling_hash base") else 31L,
        if (children.length > 2) longLit(children(2), "rolling_hash modulus") else 2147483647L)
      }))
    ext.injectFunction((
      FunctionIdentifier("html_text"),
      new ExpressionInfo(classOf[HtmlTextExpr].getName, "html_text"),
      (children: Seq[Expression]) => {
        arity(children, 1, 1, "html_text(<arg>)")
        HtmlTextExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60Expr].getName, "simhash60"),
      (children: Seq[Expression]) => {
        arity(children, 1, 1, "simhash60(<arg>)")
        SimHash60Expr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle_hash_set"),
      new ExpressionInfo(classOf[ShingleHashSetExpr].getName, "shingle_hash_set"),
      (children: Seq[Expression]) => {
        arity(children, 1, 1, "shingle_hash_set(<arg>)")
        ShingleHashSetExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("lsh_sigs"),
      new ExpressionInfo(classOf[LshSigsExpr].getName, "lsh_sigs"),
      (children: Seq[Expression]) => {
        arity(children, 1, 1, "lsh_sigs(<arg>)")
        LshSigsExpr(children.head)
      }))
    // lsh_sigs_int(emb, nTables, nBits) — integer signatures for
    // multi-probe (sig XOR mask); table/bit counts as constant ints
    ext.injectFunction((
      FunctionIdentifier("lsh_sigs_int"),
      new ExpressionInfo(classOf[LshSigsIntExpr].getName, "lsh_sigs_int"),
      (children: Seq[Expression]) => {
        arity(children, 3, 3, "lsh_sigs_int(emb, nTables, nBits)")
        LshSigsIntExpr(children.head,
          longLit(children(1), "lsh_sigs_int nTables").toInt,
          longLit(children(2), "lsh_sigs_int nBits").toInt)
      }))
    // winnow_fingerprints(text, k, w) — k/w as constant integers
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowExpr].getName, "winnow_fingerprints"),
      (children: Seq[Expression]) => {
        arity(children, 3, 3, "winnow_fingerprints(text, k, w)")
        WinnowExpr(children.head,
          longLit(children(1), "winnow_fingerprints k").toInt,
          longLit(children(2), "winnow_fingerprints w").toInt)
      }))
    // gram_hashes(text, k) — k as a constant integer
    ext.injectFunction((
      FunctionIdentifier("gram_hashes"),
      new ExpressionInfo(classOf[GramHashesExpr].getName, "gram_hashes"),
      (children: Seq[Expression]) => {
        arity(children, 2, 2, "gram_hashes(text, k)")
        GramHashesExpr(children.head, longLit(children(1), "gram_hashes k").toInt)
      }))
    // cut_spans(text, starts, ends)
    ext.injectFunction((
      FunctionIdentifier("cut_spans"),
      new ExpressionInfo(classOf[CutSpansExpr].getName, "cut_spans"),
      (children: Seq[Expression]) => {
        arity(children, 3, 3, "cut_spans(text, starts, ends)")
        CutSpansExpr(children(0), children(1), children(2))
      }))
    // word_ngram_hash_set(text, n) — n as a constant integer
    ext.injectFunction((
      FunctionIdentifier("word_ngram_hash_set"),
      new ExpressionInfo(classOf[WordNgramHashSetExpr].getName, "word_ngram_hash_set"),
      (children: Seq[Expression]) => {
        arity(children, 2, 2, "word_ngram_hash_set(text, n)")
        WordNgramHashSetExpr(
          children.head, longLit(children(1), "word_ngram_hash_set n").toInt)
      }))
    // char_ngram_hash_set(text, n) — n as a constant integer
    ext.injectFunction((
      FunctionIdentifier("char_ngram_hash_set"),
      new ExpressionInfo(classOf[CharNgramHashSetExpr].getName, "char_ngram_hash_set"),
      (children: Seq[Expression]) => {
        arity(children, 2, 2, "char_ngram_hash_set(text, n)")
        CharNgramHashSetExpr(
          children.head, longLit(children(1), "char_ngram_hash_set n").toInt)
      }))
    ext.injectFunction((
      FunctionIdentifier("char_entropy"),
      new ExpressionInfo(classOf[CharEntropyExpr].getName, "char_entropy"),
      (children: Seq[Expression]) => {
        arity(children, 1, 1, "char_entropy(<arg>)")
        CharEntropyExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("rep_stats"),
      new ExpressionInfo(classOf[RepStatsExpr].getName, "rep_stats"),
      (children: Seq[Expression]) => {
        arity(children, 1, 1, "rep_stats(<arg>)")
        RepStatsExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("ac_scan"),
      new ExpressionInfo(classOf[AcScanExpr].getName, "ac_scan"),
      (children: Seq[Expression]) => {
        arity(children, 2, 2, "ac_scan(<text>, <patterns>)")
        AcScanExpr(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("varint_pack"),
      new ExpressionInfo(classOf[VarintPackExpr].getName, "varint_pack"),
      (children: Seq[Expression]) => {
        arity(children, 1, 1, "varint_pack(<array<bigint>>)")
        VarintPackExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("varint_unpack"),
      new ExpressionInfo(classOf[VarintUnpackExpr].getName, "varint_unpack"),
      (children: Seq[Expression]) => {
        arity(children, 1, 1, "varint_unpack(<binary>)")
        VarintUnpackExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("gram_agg"),
      new ExpressionInfo(classOf[GramAggExpr].getName, "gram_agg"),
      (children: Seq[Expression]) => {
        arity(children, 1, 1, "gram_agg(<array<bigint>>)")
        GramAggExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_hit"),
      new ExpressionInfo(classOf[BloomHitExpr].getName, "bloom_hit"),
      (children: Seq[Expression]) => {
        arity(children, 2, 2, "bloom_hit(<binary>, <bigint>)")
        BloomHitExpr(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSizeExpr].getName, "sorted_intersect_size"),
      (children: Seq[Expression]) => {
        arity(children, 2, 2, "sorted_intersect_size(a, b)")
        SortedIntersectSizeExpr(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(classOf[BpeEncodeExpr].getName, "bpe_encode"),
      (children: Seq[Expression]) => {
        arity(children, 1, 1, "bpe_encode(<text>)")
        BpeEncodeExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("bpe_encode_ids"),
      new ExpressionInfo(classOf[BpeEncodeIdsExpr].getName, "bpe_encode_ids"),
      (children: Seq[Expression]) => {
        arity(children, 1, 1, "bpe_encode_ids(<text>)")
        BpeEncodeIdsExpr(children.head)
      }))
    // bpe_count(text): direct SQL access to the count projection; null
    // text -> NULL here (the ANSI shape) — size(bpe_encode(..)) callers
    // get whichever contract their session's size() has, via the rewrite
    ext.injectFunction((
      FunctionIdentifier("bpe_count"),
      new ExpressionInfo(classOf[BpeCountExpr].getName, "bpe_count"),
      (children: Seq[Expression]) => {
        arity(children, 1, 1, "bpe_count(<text>)")
        BpeCountExpr(children.head, legacySizeOfNull = false)
      }))
    ext.injectFunction((
      FunctionIdentifier("unigram_encode"),
      new ExpressionInfo(classOf[UnigramEncodeExpr].getName, "unigram_encode"),
      (children: Seq[Expression]) => {
        arity(children, 1, 1, "unigram_encode(<text>)")
        UnigramEncodeExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("wordpiece_encode"),
      new ExpressionInfo(classOf[WordPieceEncodeExpr].getName, "wordpiece_encode"),
      (children: Seq[Expression]) => {
        arity(children, 1, 1, "wordpiece_encode(<text>)")
        WordPieceEncodeExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("bpe_decode_ids"),
      new ExpressionInfo(classOf[BpeDecodeIdsExpr].getName, "bpe_decode_ids"),
      (children: Seq[Expression]) => {
        arity(children, 1, 1, "bpe_decode_ids(<ids>)")
        BpeDecodeIdsExpr(children.head)
      }))
    // bounded_levenshtein(a, b, maxd) — maxd is a per-row expression
    // (Spark's levenshtein threshold overload only takes a constant)
    ext.injectFunction((
      FunctionIdentifier("bounded_levenshtein"),
      new ExpressionInfo(classOf[BoundedLevenshteinExpr].getName, "bounded_levenshtein"),
      (children: Seq[Expression]) => {
        arity(children, 3, 3, "bounded_levenshtein(a, b, maxd)")
        BoundedLevenshteinExpr(children(0), children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("text_stats"),
      new ExpressionInfo(classOf[TextStatsExpr].getName, "text_stats"),
      (children: Seq[Expression]) => {
        arity(children, 1, 1, "text_stats(<arg>)")
        TextStatsExpr(children.head)
      }))
    // collect_top_k(expr, k, reverse) — Spark's own bounded-heap top-k
    // aggregate (public in catalyst, used by the pandas layer, but not
    // SQL-registered upstream). Exposed here because it is the SCALE
    // shape of grouped top-k: O(k) state, map-side combinable — where a
    // row_number window sorts each whole group in one task.
    // reverse=false keeps the k largest (descending result).
    ext.injectFunction((
      FunctionIdentifier("collect_top_k"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK].getName,
        "collect_top_k"),
      (children: Seq[Expression]) => {
        arity(children, 3, 3, "collect_top_k(expr, k, reverse)")
        new org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK(
          children(0), children(1), children(2))
      }))
    // top_cells(embedding, centroids, n_probe) — the centroid matrix is
    // runtime data, passed as any foldable array<array<double>>
    // expression (a typedLit literal or a SQL array(array(...))
    // constructor) and unpacked here into the expression's constructor
    ext.injectFunction((
      FunctionIdentifier("top_cells"),
      new ExpressionInfo(classOf[TopCellsExpr].getName, "top_cells"),
      (children: Seq[Expression]) => {
        arity(children, 3, 3, "top_cells(embedding, centroids, nProbe)")
        val isDoubleMatrix = children(1).dataType match {
          case ArrayType(ArrayType(DoubleType, _), _) => true
          case _ => false
        }
        val cents =
          if (children(1).foldable && isDoubleMatrix) {
            children(1).eval() match {
              case arr: ArrayData =>
                (0 until arr.numElements()).map(i => arr.getArray(i).toDoubleArray()).toArray
              case _ => throw new IllegalArgumentException(
                "top_cells centroids must not be NULL")
            }
          } else throw new IllegalArgumentException(
            s"top_cells centroids must be a constant array<array<double>>, got ${children(1)}")
        TopCellsExpr(children(0), cents, longLit(children(2), "top_cells nProbe").toInt)
      }))
  }
}

package graft

import org.apache.spark.sql.functions._

class AcScanSpec extends SparkTestBase {
  import spark.implicits._

  private def scan(texts: Seq[String], pats: Seq[String]) = {
    val patCol = array(pats.map(lit): _*)
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"),
        call_function("ac_scan", col("text"), patCol).as("r"))
      .select(col("id"), array_join(col("r.hits"), "|").as("hits"),
        col("r.n_occ").as("n_occ"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
      .map { case (_, h, n) => (h, n) }
  }

  test("classic he/she/his/hers decision table: suffix-chain matches counted") {
    // "ushers": 'she' ends at 4, 'he' ends at 4 (suffix of she),
    // 'hers' ends at 6 — 3 occurrences, 3 distinct patterns
    val r = scan(Seq("ushers"), Seq("he", "she", "his", "hers"))
    assert(r.head == ("he|hers|she", 3L))
  }

  test("overlapping occurrences of one pattern all count") {
    // 'aa' in 'aaaa' ends at positions 2,3,4
    val r = scan(Seq("aaaa"), Seq("aa"))
    assert(r.head == ("aa", 3L))
  }

  test("nested patterns each count at every ending position") {
    // 'table': 'table' x1, 'able' x1, 'ble' x1; 'tabletable' doubles it
    val r = scan(Seq("table", "tabletable", "cable"),
      Seq("table", "able", "ble"))
    assert(r(0) == ("able|ble|table", 3L))
    assert(r(1) == ("able|ble|table", 6L))
    assert(r(2) == ("able|ble", 2L))
  }

  test("phrases with spaces, ASCII case fold, and non-matches") {
    val r = scan(Seq("The Big Table IS FAST", "nothing here"),
      Seq("big table", "fast", "zzz"))
    assert(r(0) == ("big table|fast", 2L))
    assert(r(1) == ("", 0L))
  }

  test("non-ASCII text passes through unfolded; empty text matches nothing") {
    // Unicode chars are matched verbatim (only A-Z folds)
    val r = scan(Seq("straße und STRASSE", ""), Seq("straße", "strasse"))
    assert(r(0) == ("strasse|straße", 2L))
    assert(r(1) == ("", 0L))
  }

  test("matches equal the brute-force position scan on corpus text") {
    val pats = Seq("table", "able", "an", "scan", "row scan", "at", "data")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("t"))
      .as[(Long, String)].collect()
    val patCol = array(pats.map(lit): _*)
    val got = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        call_function("ac_scan", col("text"), patCol).as("r"))
      .select(col("doc_id"), col("r.hits"), col("r.n_occ"))
      .as[(Long, Seq[String], Long)].collect()
      .map { case (id, h, n) => id -> ((h, n)) }.toMap
    docs.foreach { case (id, t) =>
      val occ = pats.map { p =>
        p -> (0 to t.length - p.length).count(i => t.startsWith(p, i))
      }
      val expHits = occ.filter(_._2 > 0).map(_._1).sorted
      val expOcc = occ.map(_._2.toLong).sum
      assert(got(id) == ((expHits, expOcc)), s"doc $id")
    }
  }

  test("null/empty pattern literals are rejected at analysis, not codegen") {
    val df = Seq((1L, "abc")).toDF("id", "text")
    def analyze(patCol: org.apache.spark.sql.Column): Throwable =
      intercept[org.apache.spark.sql.AnalysisException] {
        df.select(call_function("ac_scan", col("text"), patCol)).collect()
      }
    // a null array literal (typed so the expression type-checks first)
    assert(analyze(lit(null).cast("array<string>")).getMessage
      .contains("null literal"))
    // an empty array
    assert(analyze(array().cast("array<string>")).getMessage
      .contains("non-empty"))
    // a null element and an empty-string element
    assert(analyze(array(lit("ok"), lit(null).cast("string"))).getMessage
      .contains("index 1"))
    assert(analyze(array(lit(""))).getMessage.contains("index 0"))
  }

  test("interpreted path agrees with codegen") {
    val pats = Seq("he", "she", "hers", "aa")
    val texts = Seq("ushers aaa", "he-SHE", "")
    val patCol = array(pats.map(lit): _*)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val auto = graft.expressions.AcScan.cached(pats.toArray)
    val viaEval = texts.map(t => {
      val row = auto.scan(org.apache.spark.unsafe.types.UTF8String.fromString(t))
      (row.getArray(0).toObjectArray(
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq,
        row.getLong(1))
    })
    val viaPlan = df.select(col("id"),
        call_function("ac_scan", col("text"), patCol).as("r"))
      .select(col("id"), col("r.hits"), col("r.n_occ"))
      .as[(Long, Seq[String], Long)].collect().sortBy(_._1)
      .map { case (_, h, n) => (h, n) }.toSeq
    assert(viaPlan == viaEval)
  }
}

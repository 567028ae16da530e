package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.schema.GaSchemas

/** Ingest stage — everything the reference's transformation Lambda does
  * (functions/transformation/main.py), re-expressed as pure Spark column
  * expressions so the whole stage stays inside whole-stage codegen and
  * Catalyst can push/prune through it:
  *
  *   Firehose record (b64 JSON envelope)
  *     → decode (S7)  → IP anonymization (P9) → GA body query-string parse
  *     (P10) → flatten to `body_*` columns against the 267-col static
  *     schema (P8 — subsumed by schema-driven projection).
  *
  * No RDDs, no UDFs, no driver round-trips.
  */
object Ingest {

  /** S7 — Firehose record decode: base64 `data` → parsed envelope struct
    * (transformation/main.py:11-25). Invalid b64/JSON yields null fields
    * (the reference catches per record and drops it; callers can
    * `.filter($"message_id".isNotNull)` for that behavior). Spark's
    * unbase64 THROWS on malformed input, so the shape is validated first
    * — the `when` evaluates unbase64 only on valid rows. */
  def decodeEnvelope(data: Column, schema: StructType = GaSchemas.envelopeSchema): Column = {
    val validB64 =
      data.rlike("^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$")
    from_json(
      when(data.isNotNull && validB64, unbase64(data).cast("string")),
      schema)
  }

  /** P9 — IP anonymization (transformation/main.py:27-45):
    *  - IPv4 (a '.' at position >= 2, mirroring Python `find('.') > 0`):
    *    keep first 3 octets, zero the last.
    *  - IPv6 (a ':' at position >= 2): keep first 3 groups, append five
    *    "0000" groups (reference appends exactly 5, total 8 with 3 kept).
    *  - anything else → "0.0.0.0".
    */
  def anonymizeIp(ip: Column): Column =
    when(ip.isNotNull && instr(ip, ".") >= 2,
      concat(substring_index(ip, ".", 3), lit(".0")))
      .when(ip.isNotNull && instr(ip, ":") >= 2,
        concat_ws(":",
          slice(split(ip, ":"), 1, 3),
          array(lit("0000"), lit("0000"), lit("0000"), lit("0000"), lit("0000"))))
      .otherwise(lit("0.0.0.0"))

  /** P10 — GA Measurement-Protocol body parse (transformation/main.py:47-65,
    * Python `dict(parse_qsl(body))`):
    *  - split on '&' / '='; pairs without '=' or with an empty value are
    *    dropped (parse_qsl default `keep_blank_values=False`);
    *  - keys and values are percent-decoded, '+' → space;
    *  - duplicate keys: last occurrence wins (Python dict()) — requires
    *    `spark.sql.mapKeyDedupPolicy=LAST_WIN` (set in [[graft.GraftSession]]).
    */
  def parseGaBody(body: Column): Column = {
    val rawMap = str_to_map(body, lit("&"), lit("="))
    val nonBlank = map_filter(rawMap, (_, v) => v.isNotNull && v =!= "")
    transform_values(
      map_from_arrays(
        transform(map_keys(nonBlank), k => url_decode(k)),
        map_values(nonBlank)),
      (_, v) => url_decode(v))
  }

  /** Flatten a parsed-body map to `body_<param>` columns for every GA param
    * in the static schema (the `flatten_dict` naming convention,
    * transformation/main.py:55-65). Schema-driven: params absent from the
    * map come out null, which also implements P8 row padding. */
  def bodyColumns(bodyMap: Column): Seq[Column] = {
    val bodyFields = GaSchemas.allHitFields.filter(_.startsWith("body_"))
    bodyFields.map { f =>
      element_at(bodyMap, f.stripPrefix("body_")).as(f)
    }
  }

  /** Full ingest of raw Firehose records: decode → anonymize → parse →
    * flatten. Output carries the 7 envelope columns + every `body_*` column
    * of the static schema (geo and device columns stay null until
    * enrichment). */
  def fromFirehose(records: DataFrame, dataCol: String = "data"): DataFrame = {
    val env = records.withColumn("_env", decodeEnvelope(col(dataCol)))
    val parsed = env
      .select(
        col("_env.message_id").as("message_id"),
        col("_env.trace_id").as("trace_id"),
        col("_env.system_source").as("system_source"),
        col("_env.system_version").as("system_version"),
        col("_env.received_at_apig").as("received_at_apig"),
        anonymizeIp(col("_env.ip")).as("ip"),
        col("_env.user_agent").as("user_agent"),
        parseGaBody(col("_env.body")).as("_body_map"))
    parsed.select(
      (GaSchemas.apiGatewayFields.map(col) ++ bodyColumns(col("_body_map"))): _*)
  }

  /** S1 — enriched-hit JSONL scan with the declared 267-col schema,
    * FAILFAST, no inference (sessionization/main.py:301-306). Spark's JSON
    * reader null-pads ragged records against the declared schema, which
    * replaces the reference's RDD `validate_fields` round-trip (P8). */
  def readEnrichedHits(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(GaSchemas.hitSchema)
      .option("mode", "FAILFAST")
      .json(path)

  /** Event-time column: epoch-millis string → timestamp
    * (`from_unixtime(cast(received_at_apig/1000 as bigint))`, main.py:422).
    * Integral division in Long to avoid double rounding. */
  def receivedAtTs(receivedAtMs: Column): Column =
    timestamp_seconds((receivedAtMs.cast("long") / 1000L).cast("long"))

  /** S6 — record-framing repair: Firehose writes batches as concatenated
    * JSON objects (`}{` with no newline); split them back into one record
    * per row (enrichment/adapters/s3_trigger.py:16-50 does the same naive
    * `}{` replace — a `}{` inside a string value would mis-split in both;
    * GA payloads never contain one). Line-based text scan, so a multi-GB
    * object still streams; each physical line may carry many records. */
  def repairConcatenatedJson(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(explode(split(
        regexp_replace(col("value"), "\\}\\s*\\{", "}\n{"), "\n")).as("record"))
      .filter(length(trim(col("record"))) > 0)

  /** S8 — Firehose processor response: each record serialized back to
    * JSONL (one b64 payload per record, trailing newline) with the
    * per-record Ok / ProcessingFailed status the reference emits
    * (transformation/main.py:67-97). `failed` marks rows whose decode
    * produced nothing. */
  def toFirehoseResponse(df: DataFrame, recordId: Column, payload: Column,
                         failed: Column): DataFrame =
    df.select(
      recordId.as("recordId"),
      when(failed, "ProcessingFailed").otherwise("Ok").as("result"),
      when(failed, lit(null).cast("string"))
        .otherwise(base64(concat(payload, lit("\n")).cast("binary"))).as("data"))
}

#!/usr/bin/env python3
"""Cross-validate graft's GA sessions table against the REFERENCE's own
PySpark pipeline, executed as-is from /root/reference on the same enriched
fixture.

Usage: compare_reference.py <graft q16 dir> [<q17 dir>] [<q45 dir> <q46 dir>
                            <q47 dir> <q48 dir>]

With the optional second argument, also diffs the PAGEVIEWS hit table
(hit numbering, hour/minute, page path + levels + hostname) against the
reference pipeline's second output, keyed by requestId. With all six,
also diffs the EVENTS / PRODUCTS / TRANSACTIONS / ITEMS hit tables on
the column intersection (graft adds productBrand and skips the
constant-'' refund column and envelope timestamps; visitId is excluded
everywhere: sha1 vs md5).

Caveats handled here:
- ANSI off + UTC to emulate the reference's Spark 2.4 runtime semantics.
- Rows with null body_dl are excluded on BOTH sides: the reference's
  attribution UDFs crash on them (urlparse(None) TypeError) — graft
  defines them as '(direct)' instead (documented divergence).
- visitId is excluded (sha1 vs the md5 the DuckDB oracle needs); the
  session identity is still checked via (fullVisitorId, visitNumber,
  visitStartTime).
"""
import sys
import glob
import importlib.util

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def load_reference():
    spec = importlib.util.spec_from_file_location(
        "refmain", "/root/reference/functions/sessionization/main.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


COLS = ["fullVisitorId", "visitNumber", "visitStartTime", "date",
        "trafficSource_source", "trafficSource_medium",
        "trafficSource_campaign", "totals_transactionRevenue", "landingPage",
        "touchpoints", "first_touchpoint", "last_touchpoint"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[COLS].copy()
    df["visitNumber"] = df["visitNumber"].astype("int64")
    df["visitStartTime"] = df["visitStartTime"].astype("int64")
    df["date"] = df["date"].astype("int64")
    # graft serializes the path as a string (the driver's oracle compare
    # can't hash array cells); the reference yields a list — map both to
    # the same string form. \x01 separator: a GA source value may itself
    # contain '|', which would make distinct paths compare equal.
    df["touchpoints"] = df["touchpoints"].map(
        lambda v: None if v is None else (v if isinstance(v, str) else "\x01".join(v)))
    df["totals_transactionRevenue"] = df["totals_transactionRevenue"].map(
        lambda v: None if v is None or v == "" else v)
    return df.sort_values(["fullVisitorId", "visitNumber"]).reset_index(drop=True)


def main():
    graft_dir = sys.argv[1]
    m = load_reference()
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.ansi.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # The reference pads rows with Row(**kwargs) + positional toDF against a
    # set-ordered schema — name/position alignment there is accidental.
    # Patch validate_fields to pad BY NAME in schema order (the intent).
    from pyspark.sql import Row
    names = [f.name for f in m.static_schema.fields]
    m.validate_fields = lambda row, required_fields=None: Row(
        *[row.asDict().get(n) for n in names])

    df = (spark.read.json("fixtures/ga/enriched/year=2019/month=09/day=23")
          .where(F.col("body_dl").isNotNull()))
    history = spark.createDataFrame([], m.session_schema)
    outputs = m.pipeline(spark, df, history, "2019-09-23")
    sessions = outputs[0]
    ref = sessions.where(F.to_date(F.col("timestamp")) == "2019-09-23").toPandas()

    mine = pd.concat([pd.read_parquet(f)
                      for f in glob.glob(f"{graft_dir}/*.parquet")])
    mine = mine[mine.fullVisitorId != "cid-v13"]  # null-dl visitor

    a, b = norm(ref), norm(mine)
    if len(a) != len(b):
        print(f"FAIL row count: reference={len(a)} graft={len(b)}")
        sys.exit(1)
    diffs = 0
    for i in range(len(a)):
        for c in COLS:
            va, vb = a.loc[i, c], b.loc[i, c]
            if (va is None) != (vb is None) or (va is not None and va != vb):
                print(f"DIFF row {i} ({a.loc[i,'fullVisitorId']}) col {c}: "
                      f"reference={va!r} graft={vb!r}")
                diffs += 1
    if diffs:
        print(f"FAIL: {diffs} cell diffs over {len(a)} sessions")
        sys.exit(1)
    print(f"PASS: graft sessions == reference pipeline output "
          f"({len(a)} sessions x {len(COLS)} columns)")

    if len(sys.argv) > 2:
        compare_pageviews(spark, outputs[1], sys.argv[2])
    if len(sys.argv) > 6:
        null_dl = null_dl_ids(spark)
        compare_hits(outputs[2], sys.argv[3], "events", null_dl,
                     ["fullVisitorId", "requestId", "visitStartTime",
                      "hits_hitNumber", "hits_hour", "hits_minute",
                      "hits_eventInfo_eventCategory", "hits_eventInfo_eventAction",
                      "hits_eventInfo_eventLabel", "hits_eventInfo_eventValue",
                      "hits_type"],
                     ints=["visitStartTime", "hits_hitNumber", "hits_hour",
                           "hits_minute"])
        compare_hits(outputs[3], sys.argv[4], "products", null_dl,
                     ["fullVisitorId", "requestId", "visitStartTime",
                      "hits_hitNumber", "hits_product_productPrice",
                      "hits_product_productQuantity", "hits_product_productSKU",
                      "hits_product_productVariant", "hits_eCommerceAction_option",
                      "hits_eCommerceAction_step",
                      "hits_eCommerceAction_action_type",
                      "hits_item_transactionId", "hits_product_productRevenue",
                      "hits_transaction_transactionRevenue", "hits_type"],
                     ints=["visitStartTime", "hits_hitNumber"],
                     extra_key="hits_product_productSKU",
                     # the reference UDF stringifies the product revenue
                     # (str(qt*price)); graft keeps it numeric — same
                     # values, so compare as floats (NaN == None)
                     floats=["hits_product_productRevenue"])
        compare_hits(outputs[4], sys.argv[5], "transactions", null_dl,
                     ["fullVisitorId", "requestId", "visitStartTime",
                      "hits_hitNumber", "hits_transation_transactionCoupon",
                      "hits_transaction_transactionId",
                      "hits_transaction_transactionRevenue",
                      "totals_transactionRevenue",
                      "hits_transaction_transactionShipping",
                      "hits_transaction_transactionTax"],
                     ints=["visitStartTime", "hits_hitNumber"])
        compare_hits(outputs[5], sys.argv[6], "items", null_dl,
                     ["fullVisitorId", "requestId", "visitStartTime",
                      "hits_hitNumber", "hits_item_transactionId",
                      "hits_item_productName", "hits_item_itemRevenue",
                      "hits_item_itemQuantity", "hits_item_productSKU",
                      "hits_item_productCategory"],
                     ints=["visitStartTime", "hits_hitNumber"],
                     renames={"hits_item_productSku": "hits_item_productSKU"})
    spark.stop()


def null_dl_ids(spark):
    return set(
        r.message_id for r in
        spark.read.json("fixtures/ga/enriched/year=2019/month=09/day=23")
        .where(F.col("body_dl").isNull()).select("message_id").collect())


def compare_hits(ref_df, graft_dir, label, null_dl, cols, ints,
                 extra_key=None, renames=None, floats=()):
    """Diff one reference hit table against graft's parquet on the column
    intersection, keyed by requestId (+ extra_key for exploded tables)."""
    ref = ref_df.toPandas()
    mine = pd.concat([pd.read_parquet(f)
                      for f in glob.glob(f"{graft_dir}/*.parquet")])
    if renames:
        mine = mine.rename(columns=renames)
    # the reference input was pre-filtered to body_dl NOT NULL
    mine = mine[~mine.requestId.isin(null_dl)]
    key = ["requestId"] + ([extra_key] if extra_key else [])

    def norm(df):
        df = df[cols].copy()
        for c in ints:
            df[c] = df[c].astype("int64")
        for c in floats:
            # exact: every value here is a short decimal both engines
            # parse to the same double; NaN stands for null on both sides
            df[c] = df[c].map(
                lambda v: float("nan") if v is None else float(v))
        return df.sort_values(key).reset_index(drop=True)

    a, b = norm(ref), norm(mine)
    if len(a) != len(b):
        print(f"FAIL {label} row count: reference={len(a)} graft={len(b)}")
        sys.exit(1)
    diffs = 0
    for i in range(len(a)):
        for c in cols:
            va, vb = a.loc[i, c], b.loc[i, c]
            if c in floats and pd.isna(va) and pd.isna(vb):
                continue
            if (va is None) != (vb is None) or (va is not None and va != vb):
                print(f"DIFF {label} row {i} ({a.loc[i, 'requestId']}) col {c}: "
                      f"reference={va!r} graft={vb!r}")
                diffs += 1
    if diffs:
        print(f"FAIL: {diffs} cell diffs over {len(a)} {label} hits")
        sys.exit(1)
    print(f"PASS: graft {label} == reference pipeline output "
          f"({len(a)} hits x {len(cols)} columns)")


PV_COLS = ["fullVisitorId", "requestId", "visitStartTime", "hits_hitNumber",
           "hits_hour", "hits_minute", "hits_page_pagePath",
           "hits_page_hostname", "hits_page_pagePathLevel1",
           "hits_page_pagePathLevel2", "hits_page_pagePathLevel3",
           "hits_page_pagePathLevel4", "hits_type"]


def compare_pageviews(spark, ref_pv_df, graft_dir):
    # the reference input was pre-filtered to body_dl NOT NULL (its UDFs
    # crash otherwise); drop the same hits from graft's side by requestId
    null_dl_ids = set(
        r.message_id for r in
        spark.read.json("fixtures/ga/enriched/year=2019/month=09/day=23")
        .where(F.col("body_dl").isNull()).select("message_id").collect())
    ref = ref_pv_df.toPandas()
    mine = pd.concat([pd.read_parquet(f)
                      for f in glob.glob(f"{graft_dir}/*.parquet")])
    mine = mine[~mine.requestId.isin(null_dl_ids)]

    def norm_pv(df):
        df = df[PV_COLS].copy()
        for c in ["visitStartTime", "hits_hitNumber", "hits_hour", "hits_minute"]:
            df[c] = df[c].astype("int64")
        return df.sort_values("requestId").reset_index(drop=True)

    a, b = norm_pv(ref), norm_pv(mine)
    if len(a) != len(b):
        print(f"FAIL pageviews row count: reference={len(a)} graft={len(b)}")
        sys.exit(1)
    diffs = 0
    for i in range(len(a)):
        for c in PV_COLS:
            va, vb = a.loc[i, c], b.loc[i, c]
            if (va is None) != (vb is None) or (va is not None and va != vb):
                print(f"DIFF pv row {i} ({a.loc[i,'requestId']}) col {c}: "
                      f"reference={va!r} graft={vb!r}")
                diffs += 1
    if diffs:
        print(f"FAIL: {diffs} cell diffs over {len(a)} pageview hits")
        sys.exit(1)
    print(f"PASS: graft pageviews == reference pipeline output "
          f"({len(a)} hits x {len(PV_COLS)} columns)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness check.

Usage: compare_oracle.py <sfdir> <verify_outdir>

Reads each <outdir>/<name> parquet (Spark result) and runs
<outdir>/oracle_sql.json[name] in DuckDB over views of <sfdir>'s tables,
then compares: column set (sorted by name), row count, and exact values
(after sorting rows). Prints PASS/FAIL per query with first diffs.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> tuple:
    """Returns (normalized_df, array_cols). The DRIVER's pandas compare
    dies on array-typed cells (r6 q102: TypeError sorting np.ndarray), so
    any column holding arrays is reported back for a HARD failure — we
    still tuple-ize to keep the value diff readable, but a query whose
    output contains array cells would err under the driver and must be
    serialized (array_join, q16/q102 precedent) before it can pass."""
    df = df[sorted(df.columns)].copy()
    array_cols = []
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            def is_arraylike(v):
                return (isinstance(v, (list, tuple)) or
                        (hasattr(v, "__len__") and hasattr(v, "tolist")
                         and not isinstance(v, (str, bytes))))
            # scan EVERY cell (a LEFT JOIN can put the first array after
            # any number of leading NULLs) and reuse the same predicate
            # for detection and tuple-ization so they can't diverge
            if any(is_arraylike(v) for v in s):
                array_cols.append(c)
            df[c] = s.map(lambda v: tuple(v.tolist())
                          if hasattr(v, "tolist") and is_arraylike(v)
                          else (tuple(v) if is_arraylike(v) else v))
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df, array_cols


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # exact: we demand bit-equality via decimal sums
    return a == b


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output")
                n_fail += 1
                continue
            spark_df, s_arr = normalize(pd.concat([pd.read_parquet(f) for f in files]))
            duck_df, d_arr = normalize(con.sql(sql).df())
            if s_arr or d_arr:
                print(f"FAIL {name}: array-typed cells (driver-incompatible) "
                      f"spark={s_arr} duck={d_arr} — serialize with array_join")
                n_fail += 1
                continue
            if list(spark_df.columns) != list(duck_df.columns):
                print(f"FAIL {name}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
                n_fail += 1
                continue
            if len(spark_df) != len(duck_df):
                print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
                n_fail += 1
                continue
            bad = 0
            for c in spark_df.columns:
                sv, dv = spark_df[c].tolist(), duck_df[c].tolist()
                for i, (x, y) in enumerate(zip(sv, dv)):
                    if not values_equal(x, y):
                        if bad < 3:
                            print(f"  diff {name}.{c}[{i}]: spark={x!r} duck={y!r}")
                        bad += 1
            if bad:
                print(f"FAIL {name}: {bad} value diffs")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(spark_df)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    # rows-only queries (no oracleSql): the driver records a weaker
    # rows>0 check; mirror it here so a broken query can't hide behind
    # its missing oracle entry. Driven by the Verify-emitted manifest of
    # ALL registered queries, NOT by globbing output dirs — a query that
    # crashed before writing any output must FAIL, not vanish. (Glob is
    # the fallback for pre-manifest output dirs only.)
    try:
        expected = json.load(open(f"{outdir}/queries.json"))
    except FileNotFoundError:
        try:  # SPARK_GRAFT_ONLY iteration: restrict to the partial manifest
            expected = json.load(open(f"{outdir}/queries_partial.json"))
        except FileNotFoundError:
            expected = [d.rsplit("/", 1)[-1] for d in sorted(glob.glob(f"{outdir}/q*"))]
    for name in sorted(expected):
        if name in oracle:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        if n > 0:
            print(f"PASS {name} ({n} rows, rows-only: no oracle)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows-only check found no rows")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local driver-mimic: compare Verify parquet outputs vs DuckDB oracle.

Usage: python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/verify_out
Mirrors the driver's t2 gate: for each query dir, run the oracle SQL in
DuckDB over the same parquet tables, sort columns by name, sort rows, and
hash-compare values.
"""
import sys, os, json, glob
import duckdb, pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def family(s):
    """Coarse dtype family. The driver's hash is strict about integer-ness:
    DuckDB HUGEINT (sum of INTEGER/BIGINT) surfaces as float64/object and
    hash-mismatches Spark's BIGINT even when every value is equal — so an
    int-vs-nonint difference must FAIL here, not be laundered away."""
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_float_dtype(s):
        return "float"
    import decimal
    if s.dtype == object and s.map(lambda v: isinstance(v, (decimal.Decimal, int, float)) and not isinstance(v, bool)).any():
        return "float"  # decimal/hugeint-as-object: numeric but NOT int dtype
    return "other"

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize values for compare (dtype families are checked separately)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        try:
            import decimal
            if df[c].dtype == object and df[c].map(lambda v: isinstance(v, decimal.Decimal)).any():
                df[c] = df[c].astype(float).round(9)
        except Exception:
            pass
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

fails, passes = [], []
for qdir in sorted(glob.glob(os.path.join(outdir, "*"))):
    name = os.path.basename(qdir)
    if not os.path.isdir(qdir):
        continue
    spark_df = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
    if name not in oracle:
        passes.append((name, f"rows-only ({len(spark_df)})"))
        continue
    try:
        oracle_df = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"ORACLE SQL ERROR: {e}"))
        continue
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        fails.append((name, f"COLUMNS spark={list(a.columns)} oracle={list(b.columns)}"))
        continue
    dtype_mismatch = [(c, family(spark_df[c]), family(oracle_df[c]))
                      for c in spark_df.columns
                      if {family(spark_df[c]), family(oracle_df[c])} == {"int", "float"}]
    if dtype_mismatch:
        fails.append((name, "DTYPE (driver hash would differ): " +
                      ", ".join(f"{c} spark={fa} oracle={fb}" for c, fa, fb in dtype_mismatch)))
        continue
    if len(a) != len(b):
        fails.append((name, f"ROWS spark={len(a)} oracle={len(b)}"))
        continue
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        passes.append((name, f"ok ({len(a)} rows)"))
    except AssertionError as e:
        fails.append((name, "VALUES: " + str(e).split("\n")[0] + " | " + (str(e).split("\n")[1] if len(str(e).split("\n"))>1 else "")))

missing = sorted(set(oracle) - {os.path.basename(p) for p in glob.glob(os.path.join(outdir, "*")) if os.path.isdir(p)})
for name, msg in passes:
    print(f"PASS {name}: {msg}")
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
for name in missing:
    print(f"MISSING {name} (query errored in Verify)")
print(f"\n{len(passes)} pass / {len(fails)} fail / {len(missing)} missing")
sys.exit(1 if fails or missing else 0)

#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate.

Usage: check_oracle.py SF_DIR OUT_DIR
  SF_DIR  — e.g. /root/testdata/sf0.01
  OUT_DIR — graft.Verify output dir (one parquet dir per query + oracle_sql.json)

Compares each query's Spark parquet result against the DuckDB oracle:
columns sorted by name, rows sorted, exact value compare (reports near-miss
float diffs separately).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def dtype_family(dt) -> str:
    if pd.api.types.is_bool_dtype(dt): return "bool"
    if pd.api.types.is_integer_dtype(dt): return "int"
    if pd.api.types.is_float_dtype(dt): return "float"
    if pd.api.types.is_datetime64_any_dtype(dt): return "datetime"
    return "object"

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize tz-aware → naive for compare
    for c in df.columns:
        if pd.api.types.is_datetime64tz_dtype(df[c]):
            df[c] = df[c].dt.tz_localize(None)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        # The driver's hash is TYPED: a DuckDB HUGEINT column (from an
        # un-cast SUM over BIGINT) fails against Spark's int64 even when
        # every value matches. Fail such oracles before comparing values —
        # and before the MISSING check, so subset runs still sweep typing.
        try:
            desc = con.execute(f"DESCRIBE SELECT * FROM ({sql}) LIMIT 0").fetchdf()
            huge = [r["column_name"] for _, r in desc.iterrows()
                    if "HUGEINT" in str(r["column_type"]).upper()]
            if huge:
                results[name] = f"ORACLE-TYPE HUGEINT cols={huge} (add CAST(... AS BIGINT))"
                continue
        except Exception as e:
            results[name] = f"ERROR describe: {e}"
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "MISSING spark output"
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
            exp = canon(con.execute(sql).fetchdf())
        except Exception as e:
            results[name] = f"ERROR {e}"
            continue
        if list(got.columns) != list(exp.columns):
            results[name] = f"SCHEMA got={list(got.columns)} exp={list(exp.columns)}"
            continue
        if len(got) != len(exp):
            results[name] = f"ROWS got={len(got)} exp={len(exp)}"
            continue
        mismatch = None
        for c in got.columns:
            g, e = got[c], exp[c]
            gf, ef = dtype_family(g.dtype), dtype_family(e.dtype)
            if gf != ef:
                mismatch = f"DTYPE col={c} got={g.dtype}({gf}) exp={e.dtype}({ef})"
                break
            try:
                eq = (g.values == e.values) | (g.isna().values & e.isna().values)
            except Exception:
                eq = g.astype(str).values == e.astype(str).values
            if not eq.all():
                i = int((~eq).argmax())
                mismatch = f"VALUE col={c} row={i} got={g.iloc[i]!r} exp={e.iloc[i]!r}"
                break
        results[name] = mismatch or f"OK ({len(got)} rows)"
    bad = {k: v for k, v in results.items() if not v.startswith("OK")}
    for k in sorted(results):
        print(f"{'PASS' if results[k].startswith('OK') else 'FAIL'} {k}: {results[k]}")
    print(f"\n{len(results) - len(bad)}/{len(results)} pass")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

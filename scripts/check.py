#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify's parquet
dumps, run each oracle SQL in DuckDB over the same sf dir, compare
(columns sorted by name, rows sorted by all columns, exact values).

Usage: python3 scripts/check.py <sfDir> <outDir>
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "MISSING_SPARK_OUTPUT"; continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            results[name] = f"ERROR: {e}"; continue
        if list(got.columns) != list(want.columns):
            results[name] = f"COLS got={list(got.columns)} want={list(want.columns)}"
        elif len(got) != len(want):
            results[name] = f"ROWS got={len(got)} want={len(want)}"
        else:
            bad = None
            for c in got.columns:
                g, w = got[c], want[c]
                if pd.api.types.is_float_dtype(g) and pd.api.types.is_float_dtype(w):
                    eq = (g.fillna(math.nan)).combine(w.fillna(math.nan),
                        lambda a, b: (math.isnan(a) and math.isnan(b)) or a == b)
                else:
                    eq = (g.isna() & w.isna()) | (g == w)
                if not eq.all():
                    i = eq[~eq].index[0]
                    bad = f"VAL col={c} row={i} got={g[i]!r} want={w[i]!r}"
                    break
            results[name] = bad or "OK"
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, v in results.items():
        print(f"{'PASS' if v=='OK' else 'FAIL'} {name}" + ("" if v == "OK" else f"  {v}"))
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{out_dir}/q*")):
        name = d.split("/")[-1]
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"{'PASS' if n > 0 else 'FAIL'} {name}  rows-only n={n}")
    print(f"== {n_ok}/{len(oracle)} oracle-checked queries OK ==")
    return 0 if n_ok == len(oracle) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

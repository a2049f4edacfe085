#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare (dev tool only,
not part of the shipped library). Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
Registers each <sfDir>/<table>.parquet as a DuckDB view, runs every
oracle_sql.json entry, and compares to the Spark parquet in
<verifyOutDir>/<name>/ — column names (sorted), dtypes (loose), values.
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Spill outside the repo: DuckDB's default temp_directory is .tmp/
    # in cwd, which once leaked multi-GB spill files into git history.
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            duck = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_bad += 1; continue
        spark = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        if list(duck.columns) != list(spark.columns):
            print(f"FAIL {name}: cols duck={list(duck.columns)} "
                  f"spark={list(spark.columns)}"); n_bad += 1; continue
        if len(duck) != len(spark):
            print(f"FAIL {name}: rows duck={len(duck)} spark={len(spark)}")
            n_bad += 1; continue
        bad_cols = []
        for c in duck.columns:
            a, b = duck[c], spark[c]
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    # tiny tolerance absorbs float64 representation
                    # noise (exact == flags last-ulp diffs that are
                    # not real bugs). Kept at 1e-9 so a genuine
                    # HALF_UP-vs-half-even rounding divergence (1e-6
                    # under round(x,6)) still FAILS here — those must
                    # be fixed with the floor(x*1e6+0.5)/1e6 idiom
                    # (see q26), because the driver hash compare is
                    # exact
                    af = a.astype('float64'); bf = b.astype('float64')
                    eq = ((a.isna() & b.isna()) |
                          ((af - bf).abs() <= 1e-9))
                else:
                    eq = (a.isna() & b.isna()) | (a.astype(str) == b.astype(str))
                if not eq.all():
                    i = int((~eq).idxmax())
                    bad_cols.append((c, i, a.iloc[i], b.iloc[i]))
            except Exception as e:
                bad_cols.append((c, -1, "cmp-error", str(e)))
        if bad_cols:
            c, i, x, y = bad_cols[0]
            print(f"FAIL {name}: {len(bad_cols)} col(s) differ; first: "
                  f"{c}[{i}] duck={x!r} spark={y!r}")
            n_bad += 1
        else:
            # dtype report (informational — driver may be stricter)
            dt = [(c, str(duck[c].dtype), str(spark[c].dtype))
                  for c in duck.columns if str(duck[c].dtype) != str(spark[c].dtype)]
            note = f" [dtypes differ: {dt}]" if dt else ""
            print(f"OK   {name} ({len(duck)} rows){note}")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()

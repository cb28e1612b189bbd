#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs <verifyOutDir>/oracle_sql.json's SQL in DuckDB with the testdata
tables registered as views, then compares: row count, column names
(sorted), and cell values (rows sorted by all columns). Strict exact
compare — if this passes, any reasonable hash compare passes.
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # pandas NaT (null timestamp): like NaN, NaT != NaT — normalize
    if v is pd.NaT:
        return "NaT"
    if hasattr(v, "as_py"):
        v = v.as_py()
    return v

def load_sorted(df):
    # sort columns by name, then rows by string repr of the full row
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple(repr(x) for x in r))
    return list(df.columns), rows

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    names = sorted([os.path.basename(p) for p in glob.glob(os.path.join(out_dir, "*"))
                    if os.path.isdir(p)])
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output parquet"); n_fail += 1; continue
        spark_df = pd.concat([pq.read_table(f).to_pandas() for f in sorted(files)],
                             ignore_index=True)
        if name not in oracle:
            if len(spark_df) == 0:
                # an empty un-oracled result proves nothing — fail it
                print(f"FAIL {name}: rows-only query returned zero rows")
                n_fail += 1
            else:
                print(f"ROWS-ONLY {name}: {len(spark_df)} rows (no oracle)")
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        sc, sr = load_sorted(spark_df)
        dc, dr = load_sorted(duck_df)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}"); n_fail += 1; continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}"); n_fail += 1; continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, dr)):
            for j, (x, y) in enumerate(zip(a, b)):
                eq = (x == y)  # strict: floats require exact match
                # timestamps/dates: pandas may give Timestamp vs datetime
                if not eq and hasattr(x, "to_pydatetime"):
                    eq = x.to_pydatetime() == (y.to_pydatetime() if hasattr(y, "to_pydatetime") else y)
                if not eq and hasattr(y, "to_pydatetime") and not hasattr(x, "to_pydatetime"):
                    eq = y.to_pydatetime() == x
                if not eq:
                    bad = (i, sc[j], x, y); break
            if bad: break
        if bad:
            i, c, x, y = bad
            print(f"FAIL {name}: row {i} col {c}: spark={x!r} duck={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sr)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

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

def norm_duck_type(t):
    """Normalize a DuckDB type string to a representation class comparable
    with Arrow's. The driver hashes cell REPRESENTATION, so HUGEINT
    (int128) vs Spark BIGINT is a real failure even when values match —
    pandas coercion used to hide exactly that (round-4 q69/q71)."""
    t = str(t).upper()
    if t.endswith("[]"):
        return "list<%s>" % norm_duck_type(t[:-2])
    m = {"TINYINT": "int8", "SMALLINT": "int16", "INTEGER": "int32",
         "BIGINT": "int64", "HUGEINT": "int128", "UTINYINT": "uint8",
         "USMALLINT": "uint16", "UINTEGER": "uint32", "UBIGINT": "uint64",
         "UHUGEINT": "uint128", "FLOAT": "float32", "DOUBLE": "float64",
         "VARCHAR": "string", "BOOLEAN": "bool", "DATE": "date",
         "BLOB": "binary", "INTERVAL": "interval"}
    if t in m:
        return m[t]
    if t.startswith("DECIMAL"):
        return "decimal" + t[len("DECIMAL"):].replace(" ", "")
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.startswith("STRUCT"):
        return "struct"
    return t.lower()

def norm_arrow_type(t):
    import pyarrow as pa
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list<%s>" % norm_arrow_type(t.value_type)
    if pa.types.is_decimal(t):
        return "decimal(%d,%d)" % (t.precision, t.scale)
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_float32(t):
        return "float32"
    if pa.types.is_float64(t):
        return "float64"
    if pa.types.is_struct(t):
        return "struct"
    return str(t)

def type_mismatches(spark_schema, duck_cols, duck_types):
    """Column-name-matched representation-class compare."""
    spark_t = {f.name: norm_arrow_type(f.type) for f in spark_schema}
    bad = []
    for c, dt in zip(duck_cols, duck_types):
        dn = norm_duck_type(dt)
        sn = spark_t.get(c)
        if sn is not None and sn != dn:
            bad.append((c, sn, dn))
    return bad

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
            rel = con.sql(oracle[name])
            duck_cols, duck_types = list(rel.columns), [str(t) for t in rel.types]
            duck_df = rel.fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        spark_schema = pq.read_schema(sorted(files)[0])
        tmm = type_mismatches(spark_schema, duck_cols, duck_types)
        if tmm:
            for c, sn, dn in tmm:
                print(f"FAIL {name}: col {c} type spark={sn} duck={dn}")
            n_fail += 1; continue
        sc, sr = load_sorted(spark_df)
        dc, dr = load_sorted(duck_df)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}"); n_fail += 1; continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}"); n_fail += 1; continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, dr)):
            for j, (x, y) in enumerate(zip(a, b)):
                # array-valued cells (numpy arrays / lists) compare
                # elementwise and RECURSIVELY — `==` on them yields an
                # array, not a bool, at every nesting depth. Guard BOTH
                # sides: scalar-vs-array must report FAIL, not crash
                # with an ambiguous-truth-value error
                def cell_eq(p, q):
                    p_arr = hasattr(p, "__len__") and not isinstance(p, str)
                    q_arr = hasattr(q, "__len__") and not isinstance(q, str)
                    if p_arr or q_arr:
                        return (p_arr and q_arr and len(p) == len(q) and
                                all(cell_eq(a, b) for a, b in zip(list(p), list(q))))
                    return p == q  # strict: floats require exact match
                eq = cell_eq(x, y)
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

#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: run graft.Verify
output against DuckDB oracles on the same sf dir. Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out [query ...]
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def reject_arrays(df, name):
    """The driver's comparator sorts a pandas frame; array-typed cells are
    unhashable numpy arrays there and crash the gate. Fail locally first."""
    if len(df) == 0:
        return None
    for c in df.columns:
        v = df[c].iloc[0]
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return c
    return None

def norm(df):
    df = df[sorted(df.columns)]
    # stringify for stable compare (floats already rounded by queries)
    rows = sorted(tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None))
    return rows

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    # rows-only queries (output dir, no oracle SQL): still require non-empty
    # output, like the driver's weaker check
    rows_only = [d for d in sorted(os.listdir(out))
                 if os.path.isdir(f"{out}/{d}") and d not in oracles]
    for name in rows_only:
        if only and name not in only:
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        n = (con.execute(f"SELECT count(*) FROM read_parquet('{out}/{name}/*.parquet')")
             .fetchone()[0] if files else 0)
        if n > 0:
            print(f"pass {name} ({n} rows, rows-only)"); n_pass += 1
        else:
            print(f"FAIL {name}: rows-only query produced no output"); n_fail += 1
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_dir = f"{out}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sdf = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        bad_col = reject_arrays(sdf, name)
        if bad_col is not None:
            print(f"FAIL {name}: array-typed output column '{bad_col}' "
                  f"(driver comparator cannot sort arrays — flatten or join to string)")
            n_fail += 1; continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: schema {sorted(sdf.columns)} vs {sorted(odf.columns)}"); n_fail += 1; continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows {len(sdf)} vs {len(odf)}"); n_fail += 1; continue
        s, o = norm(sdf), norm(odf)
        if s != o:
            bad = [i for i, (a, b) in enumerate(zip(s, o)) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs at {bad}")
            for i in bad[:2]:
                print(f"  spark : {s[i]}\n  oracle: {o[i]}")
            n_fail += 1
        else:
            print(f"pass {name} ({len(sdf)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

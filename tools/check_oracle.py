#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet dumps
against SparkEntry.oracleSql in DuckDB and compare (sorted columns, sorted
rows, exact value match). Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    declared = sorted(d for d in os.listdir(outdir)
                      if os.path.isdir(os.path.join(outdir, d)))
    failures = 0
    for name in declared:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no parquet output"); failures += 1; continue
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        if name not in oracle:
            print(f"[rows-only] {name}: rows={len(got)}")
            if len(got) == 0: failures += 1
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}"); failures += 1; continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"[FAIL] {name}: columns {gc} != {wc}"); failures += 1; continue
        g = got[gc].sort_values(gc).reset_index(drop=True)
        w = want[wc].sort_values(wc).reset_index(drop=True)
        if len(g) != len(w):
            print(f"[FAIL] {name}: rows {len(g)} != {len(w)}"); failures += 1; continue
        if g.equals(w):
            print(f"[ok] {name}: {len(g)} rows")
        else:
            neq = (g != w) & ~(g.isna() & w.isna())
            bad = neq.any(axis=1)
            print(f"[FAIL] {name}: {int(bad.sum())}/{len(g)} rows differ")
            print("  spark:", g[bad].head(3).to_dict("records"))
            print("  oracle:", w[bad].head(3).to_dict("records"))
            failures += 1
    print(f"\n{len(declared) - failures}/{len(declared)} queries pass")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

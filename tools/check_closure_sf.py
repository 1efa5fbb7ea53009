#!/usr/bin/env python3
"""sf1 companion for the three closure-oracle keys (dedup_components,
dedup_keep_best, semantic_dedup_keep): the stock DuckDB replay closes
connected components with a recursive CTE whose `reach` set is
O(sum component_size^2) rows — fine at the driver's sf0.01 gate and the
local sf0.1 sweep, quadratic blow-up on the sf1 dup clusters (observed:
>70 GB RSS before this harness existed). The SPARK side has no such
blow-up (large-star/small-star contraction); only the replay does.

This harness keeps the oracle's own `pairs` prefix bit-for-bit (so the
candidate mining / verify arithmetic is still the oracle's), swaps ONLY
the mechanical closure for a linear union-find with min-id
representatives (provably the same `min(reachable)` labeling), replays
each key's tail in python, and compares against the graft.Verify dump
exactly like tools/check_oracle.py.

Usage: python3 tools/check_closure_sf.py /tmp/sf1 /tmp/verify_sf1
"""
import sys, json, re, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def uf_components(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # min root stays root -> final root == min id of component,
            # the recursive CTE's min(reachable) label
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def norm_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in order) for r in rows)


def spark_rows(out, name):
    con = duckdb.connect()
    df = con.execute(
        f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchall()
    cols = [d[0] for d in con.execute(
        f"SELECT * FROM read_parquet('{out}/{name}/*.parquet') LIMIT 0").description]
    return df, cols


def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0

    def report(name, got, cols):
        nonlocal n_pass, n_fail
        sdf, scols = spark_rows(out, name)
        if sorted(scols) != sorted(cols):
            print(f"FAIL {name}: schema {sorted(scols)} vs {sorted(cols)}"); n_fail += 1; return
        s, o = norm_rows(sdf, scols), norm_rows(got, cols)
        if s == o:
            print(f"pass {name} ({len(s)} rows, union-find closure)"); n_pass += 1
        else:
            bad = [i for i, (a, b) in enumerate(zip(s, o)) if a != b][:2]
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}, first diffs {bad}"); n_fail += 1

    # --- dedup_components: (vec_id, comp) over the pairs graph ---
    sql = oracles["dedup_components"]
    prefix = sql[:sql.index("edges AS (")].rstrip().rstrip(",")
    pairs = con.execute(prefix + "\nSELECT id_a, id_b FROM pairs").fetchall()
    comp = uf_components(pairs)
    report("dedup_components", [(i, c) for i, c in comp.items()], ["vec_id", "comp"])

    # --- dedup_keep_best: per-component (quality desc, id) argmax ---
    sql = oracles["dedup_keep_best"]
    prefix = sql[:sql.index("kedges AS (")].rstrip().rstrip(",")
    jpairs = con.execute(prefix + "\nSELECT id_a, id_b FROM jpairs").fetchall()
    comp = uf_components(jpairs)
    kq = re.search(r"kq AS \(\s*(SELECT.*?FROM documents)\),\s*klab AS", sql, re.S).group(1)
    quality = dict(con.execute(kq).fetchall())
    best = {}
    for doc, q in quality.items():
        c = comp.get(doc, doc)
        # argmax by (quality desc, id asc)
        if c not in best or (q, -doc) > (best[c][1], -best[c][0]):
            best[c] = (doc, q)
    report("dedup_keep_best",
           [(doc, c, q) for c, (doc, q) in best.items()], ["doc_id", "comp", "quality"])

    # --- semantic_dedup_keep: drop non-representative members ---
    sql = oracles["semantic_dedup_keep"]
    prefix = sql[:sql.index("edges AS (")].rstrip().rstrip(",")
    pairs = con.execute(prefix + "\nSELECT id_a, id_b FROM pairs").fetchall()
    comp = uf_components(pairs)
    dropped = {i for i, c in comp.items() if i != c}
    kept = con.execute("SELECT vec_id, label FROM embeddings").fetchall()
    report("semantic_dedup_keep",
           [(v, l) for v, l in kept if v not in dropped], ["vec_id", "label"])

    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

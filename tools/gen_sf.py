#!/usr/bin/env python3
"""Local scale-factor generator for the sf1 oracle sweep (VERDICT r9 item 4).

The driver ships sf{0.001,0.01,0.1} only; this produces a larger dataset with
the SAME schemas and value distributions (measured from sf0.1) so graft.Verify
plus tools/check_oracle.py can be replayed at 10x scale to catch
regime-dependent divergences (agg order, prefilter regimes, overflow).  It is
a TEST harness input, not a replacement for the driver's data — outputs land
outside the repo and are never committed.

Usage: python3 tools/gen_sf.py 1.0 /tmp/sf1
"""
import sys, os, json
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["large", "hot", "small", "cold", "round", "flat", "long", "short"]
PNOUN = ["ring", "bolt", "washer", "nut", "screw", "plate", "rod", "gear"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = (["en"] * 8 + ["zh"] * 3 + ["es"] * 3 + ["fr"] * 3 + ["de"] * 3)
VOCAB = ("spark window merge table column vector stream value data small join "
         "filter big group hash line part sort row query scan order key batch "
         "fast slow agg customer the a").split()

DAY_US = 86_400_000_000


def us_date(rng, lo_days, hi_days, n, epoch="1995-01-01"):
    base = np.datetime64(epoch).astype("datetime64[us]").astype(np.int64)
    return base + rng.integers(lo_days, hi_days, n) * DAY_US


def write(outdir, name, cols, types):
    arrays = [pa.array(v, type=t) for v, t in zip(cols.values(), types)]
    tbl = pa.Table.from_arrays(arrays, names=list(cols.keys()))
    pq.write_table(tbl, os.path.join(outdir, f"{name}.parquet"))
    print(f"wrote {name}: {tbl.num_rows} rows")


def main():
    sf = float(sys.argv[1])
    outdir = sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(SEED)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    write(outdir, "region",
          {"r_regionkey": np.arange(5, dtype=np.int32), "r_name": REGIONS},
          [pa.int32(), pa.string()])

    write(outdir, "nation",
          {"n_nationkey": np.arange(25, dtype=np.int32),
           "n_name": [f"NATION_{i}" for i in range(25)],
           "n_regionkey": (np.arange(25) % 5).astype(np.int32)},
          [pa.int32(), pa.string(), pa.int32()])

    write(outdir, "customer",
          {"c_custkey": np.arange(n_cust, dtype=np.int64),
           "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
           "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
           "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
           "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)]},
          [pa.int64(), pa.string(), pa.int32(), pa.float64(), pa.string()])

    write(outdir, "supplier",
          {"s_suppkey": np.arange(n_supp, dtype=np.int64),
           "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
           "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
           "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2)},
          [pa.int64(), pa.string(), pa.int32(), pa.float64()])

    adj = rng.integers(0, len(PADJ), n_part)
    noun = rng.integers(0, len(PNOUN), n_part)
    write(outdir, "part",
          {"p_partkey": np.arange(n_part, dtype=np.int64),
           "p_name": [f"{PADJ[a]} {PNOUN[b]}" for a, b in zip(adj, noun)],
           "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
           "p_type": [PTYPES[i] for i in rng.integers(0, 6, n_part)],
           "p_size": rng.integers(1, 51, n_part).astype(np.int32),
           "p_retailprice": np.round(900.0 + (np.arange(n_part) % 1000) * 0.1, 1)},
          [pa.int64(), pa.string(), pa.string(), pa.string(), pa.int32(),
           pa.float64()])

    write(outdir, "orders",
          {"o_orderkey": np.arange(n_ord, dtype=np.int64),
           "o_custkey": rng.integers(0, n_cust, n_ord),
           "o_orderstatus": [["O", "P", "F"][i] for i in rng.integers(0, 3, n_ord)],
           "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
           "o_orderdate": us_date(rng, 0, 2404, n_ord),
           "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_ord)]},
          [pa.int64(), pa.int64(), pa.string(), pa.float64(),
           pa.timestamp("us"), pa.string()])

    rf = rng.integers(0, 3, n_li)
    ls = rng.integers(0, 2, n_li)
    write(outdir, "lineitem",
          {"l_orderkey": rng.integers(0, n_ord, n_li),
           "l_partkey": rng.integers(0, n_part, n_li),
           "l_suppkey": rng.integers(0, n_supp, n_li),
           "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
           "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
           "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
           "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
           "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
           "l_returnflag": [["A", "N", "R"][i] for i in rf],
           "l_linestatus": [["F", "O"][i] for i in ls],
           "l_shipdate": us_date(rng, 1, 2500, n_li)},
          [pa.int64(), pa.int64(), pa.int64(), pa.int32(), pa.float64(),
           pa.float64(), pa.float64(), pa.float64(), pa.string(), pa.string(),
           pa.timestamp("us")])

    base_ts = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    ts = np.sort(base_ts + rng.integers(0, 30 * DAY_US, n_ev))
    write(outdir, "events",
          {"event_id": np.arange(n_ev, dtype=np.int64),
           "ts": ts,
           "user_id": rng.integers(0, int(15_000 * sf), n_ev),
           "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, n_ev)],
           "value": np.round(rng.exponential(100, n_ev), 2),
           "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)]},
          [pa.int64(), pa.timestamp("us"), pa.int64(), pa.string(), pa.float64(),
           pa.string()])

    # documents: 10..100 words from the 31-word vocab; lang/source mirror sf0.1
    lens = rng.integers(10, 101, n_doc)
    texts = []
    vocab = np.array(VOCAB)
    for L in lens:
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), L)]))
    # plant duplicate structure so the near-dup family (minhash/simhash/
    # text_dedup_keep) has real output at this scale, like the driver's
    # data does: every 250th doc gets an exact copy at i+1, every 250th
    # at offset 125 a near-copy (one word appended -> Jaccard just below 1)
    for i in range(0, n_doc - 1, 250):
        texts[i + 1] = texts[i]
    for i in range(125, n_doc - 1, 250):
        texts[i + 1] = texts[i] + " merge"
    write(outdir, "documents",
          {"doc_id": np.arange(n_doc, dtype=np.int64),
           "text": texts,
           "lang": [LANGS[i] for i in rng.integers(0, len(LANGS), n_doc)],
           "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
           "n_chars": np.array([len(t) for t in texts], dtype=np.int64)},
          [pa.int64(), pa.string(), pa.string(), pa.string(), pa.int64()])

    # embeddings: unit-norm 64-dim with a weak per-label center (as measured)
    labels = rng.integers(0, 10, n_emb).astype(np.int32)
    centers = rng.normal(0, 0.07 / 8, (10, 64))
    E = centers[labels] + rng.normal(0, 0.125, (n_emb, 64))
    E = (E / np.linalg.norm(E, axis=1, keepdims=True)).astype(np.float32)
    write(outdir, "embeddings",
          {"vec_id": np.arange(n_emb, dtype=np.int64),
           "embedding": list(E),
           "label": labels},
          [pa.int64(), pa.list_(pa.float32()), pa.int32()])


if __name__ == "__main__":
    main()

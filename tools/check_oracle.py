#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: run graft.Verify
output against DuckDB oracles on the same sf dir. Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out [query ...]

Flags (r12 — the r11 sweep lost ALL per-key output when its 90-minute
budget expired mid-batch; verdicts now persist per key, immediately):
  --journal FILE   append one JSON line per completed key (default:
                   <out>/check_journal.jsonl). Survives timeouts/kills.
  --resume         skip keys already recorded as pass in the journal.
  --cost-from FILE order keys by ascending `secs` from a previous journal
                   (e.g. the sf0.01 run) so a timeout strands the least
                   work; keys unknown to the cost file run FIRST (new
                   keys are exactly what most needs checking).
  --budget-mins N  stop gracefully after N minutes: finish the current
                   key, print the summary, exit 2 (journal keeps all
                   completed verdicts; rerun with --resume to continue).
  --skip a,b,c     never run these keys (e.g. the 3 closure keys at sf1,
                   whose stock recursive-CTE replay is O(sum comp^2) —
                   tools/check_closure_sf.py covers them instead).
"""
import sys, json, glob, os, time
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

def load_journal(path):
    done = {}
    if path and os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    row = json.loads(line)
                    done[row["name"]] = row
                except (ValueError, KeyError):
                    continue
    return done

def parse_args(argv):
    args = {"journal": None, "resume": False, "cost_from": None,
            "budget_mins": None, "skip": set(), "pos": []}
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--journal":
            args["journal"] = argv[i + 1]; i += 2
        elif a == "--resume":
            args["resume"] = True; i += 1
        elif a == "--cost-from":
            args["cost_from"] = argv[i + 1]; i += 2
        elif a == "--budget-mins":
            args["budget_mins"] = float(argv[i + 1]); i += 2
        elif a == "--skip":
            args["skip"] = set(argv[i + 1].split(",")); i += 2
        else:
            args["pos"].append(a); i += 1
    return args

def main():
    args = parse_args(sys.argv[1:])
    sf, out = args["pos"][0], args["pos"][1]
    only = set(args["pos"][2:])
    journal_path = args["journal"] or f"{out}/check_journal.jsonl"
    prior = load_journal(journal_path) if args["resume"] else {}
    costs = {n: r.get("secs", 0.0)
             for n, r in load_journal(args["cost_from"]).items()} if args["cost_from"] else {}
    t0 = time.time()
    deadline = t0 + args["budget_mins"] * 60 if args["budget_mins"] else None
    jf = open(journal_path, "a")

    def record(name, status, **kw):
        row = {"name": name, "status": status, "at": round(time.time() - t0, 1)}
        row.update(kw)
        jf.write(json.dumps(row) + "\n")
        jf.flush()
        os.fsync(jf.fileno())

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    # rows-only queries (output dir, no oracle SQL): still require non-empty
    # output, like the driver's weaker check
    rows_only = [d for d in sorted(os.listdir(out))
                 if os.path.isdir(f"{out}/{d}") and d not in oracles]
    # cheapest-first: unknown keys (cost 0) run first, then ascending cost
    ordered = sorted(oracles.items(), key=lambda kv: (costs.get(kv[0], 0.0), kv[0]))
    stranded = []
    for ri, name in enumerate(rows_only):
        if (only and name not in only) or name in args["skip"]:
            continue
        if args["resume"] and prior.get(name, {}).get("status") == "pass":
            n_skip += 1; continue
        if deadline and time.time() > deadline:
            # deadline applies here too: large rows-only outputs must not
            # silently eat the whole budget before any oracle key journals
            stranded += [n for n in rows_only[ri:]
                         if (not only or n in only) and n not in args["skip"]
                         and not (args["resume"] and prior.get(n, {}).get("status") == "pass")]
            break
        t1 = time.time()
        files = glob.glob(f"{out}/{name}/*.parquet")
        n = (con.execute(f"SELECT count(*) FROM read_parquet('{out}/{name}/*.parquet')")
             .fetchone()[0] if files else 0)
        if n > 0:
            print(f"pass {name} ({n} rows, rows-only)", flush=True); n_pass += 1
            record(name, "pass", rows=int(n), secs=round(time.time() - t1, 2), mode="rows_only")
        else:
            print(f"FAIL {name}: rows-only query produced no output", flush=True); n_fail += 1
            record(name, "fail", err="rows-only query produced no output",
                   secs=round(time.time() - t1, 2), mode="rows_only")
    for idx, (name, sql) in enumerate(ordered):
        if (only and name not in only) or name in args["skip"]:
            continue
        if args["resume"] and prior.get(name, {}).get("status") == "pass":
            n_skip += 1; continue
        if deadline and time.time() > deadline:
            stranded += [n for n, _ in ordered[idx:]
                         if (not only or n in only) and n not in args["skip"]
                         and not (args["resume"] and prior.get(n, {}).get("status") == "pass")]
            break
        t1 = time.time()
        spark_dir = f"{out}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output", flush=True); n_fail += 1
            record(name, "fail", err="no spark output"); continue
        try:
            sdf = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}", flush=True); n_fail += 1
            record(name, "fail", err=str(e)[:500], secs=round(time.time() - t1, 2)); continue
        secs = round(time.time() - t1, 2)
        bad_col = reject_arrays(sdf, name)
        if bad_col is not None:
            print(f"FAIL {name}: array-typed output column '{bad_col}' "
                  f"(driver comparator cannot sort arrays — flatten or join to string)", flush=True)
            n_fail += 1
            record(name, "fail", err=f"array-typed output column {bad_col}", secs=secs); continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: schema {sorted(sdf.columns)} vs {sorted(odf.columns)}", flush=True)
            n_fail += 1
            record(name, "fail", err="schema mismatch", secs=secs); continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows {len(sdf)} vs {len(odf)}", flush=True); n_fail += 1
            record(name, "fail", err=f"rows {len(sdf)} vs {len(odf)}", secs=secs); continue
        s, o = norm(sdf), norm(odf)
        if s != o:
            bad = [i for i, (a, b) in enumerate(zip(s, o)) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs at {bad}", flush=True)
            for i in bad[:2]:
                print(f"  spark : {s[i]}\n  oracle: {o[i]}", flush=True)
            n_fail += 1
            record(name, "fail", err=f"values differ at {bad}", rows=len(sdf), secs=secs)
        else:
            print(f"pass {name} ({len(sdf)} rows)", flush=True); n_pass += 1
            record(name, "pass", rows=len(sdf), secs=secs)
    skip_note = f", {n_skip} resumed-skip" if n_skip else ""
    print(f"== {n_pass} pass, {n_fail} fail{skip_note}", flush=True)
    if stranded:
        print(f"== BUDGET EXPIRED with {len(stranded)} keys stranded "
              f"(rerun with --resume): {' '.join(stranded[:10])}"
              f"{' ...' if len(stranded) > 10 else ''}", flush=True)
        sys.exit(2)
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Full-registry oracle hash stamp at the ~sf1 replica (dev tooling).

Round-12 verdict item 1: extend the ~sf1 (sf0.1 x 10) oracle hash check
from the 38 hand-picked queries to the ENTIRE registry — volume
correctness is the one signal the sf0.01/sf0.1 gates cannot give.

Per query this spawns a CHILD process (bounded memory, hard timeout —
a quadratic oracle must show up as a 'timeout' row, never hang the
stamp) that:
  1. opens DuckDB on the replica's tables,
  2. if the oracle embeds the shared kNN-edges chain (gr01-gr08,
     ann14), materialises `edges` into a temp table FIRST and runs the
     identical remainder (tools/graph_oracle_stage.py's two-stage
     trick — DuckDB re-evaluates plain CTEs per reference, which at
     10x explodes on 5+ references),
  3. hash-compares against the Spark parquet dump (canonicalisation
     identical to tools/selfcheck.py).

Writes SF1STAMP.json: {query: {status, rows, secs}} plus a summary.
Statuses: ok | mismatch | error | timeout (timeout/error rows document
the ORACLE's cost/limits at volume, not an engine defect — the engine
side already ran in graft.Verify and is timed by ScaleCheck).

Usage:
  # prereqs (once):
  #   sbt "runMain graft.tools.ScaleCheck /root/testdata/sf0.1 10 \
  #        /tmp/graft_scale_x10 --materialise-only"
  #   SPARK_GRAFT_CPUS=32 sbt "runMain graft.Verify /tmp/graft_scale_x10 /tmp/verify_sf1"
  python3 tools/sf1_stamp.py [sfdir] [outdir] [--jobs N] [--timeout S] [query...]
"""
import sys, os, json, time, hashlib, math, datetime, decimal
import multiprocessing as mp

SF = "/tmp/graft_scale_x10"
OUT = "/tmp/verify_sf1"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
# First post-`edges` CTE of every oracle embedding the kNN-edges chain.
STAGE_MARKERS = ["\nnodes AS", "\nund AS", "\nr0 AS", "\nl0 AS", "\nsds AS"]


def canon(val):
    if val is None: return "NULL"
    if isinstance(val, float):
        if math.isnan(val): return "nan"
        return f"{round(val, 9):.9f}"
    if isinstance(val, decimal.Decimal): return f"{val:f}"
    if isinstance(val, datetime.datetime): return val.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(val, datetime.date): return val.isoformat()
    if isinstance(val, (list, tuple)):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode()); h.update(b"\n")
    return h.hexdigest(), len(lines)


def check_one(name, sql, sf, out, conn_q, mem="24GB"):
    """Child: evaluate one oracle and hash-compare. Result via queue."""
    t0 = time.time()
    try:
        import duckdb
        con = duckdb.connect()
        con.sql(f"SET memory_limit='{mem}'")
        con.sql("SET threads=8")
        # Per-child spill directory: concurrent children sharing the
        # default ".tmp" corrupt each other's out-of-core state (first
        # full run: 6 children died with IOException / SIGABRT / garbage
        # stats reading a sibling's duckdb_temp_storage block).
        tmp = f"/tmp/duck_spill_{name}_{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        con.sql(f"SET temp_directory='{tmp}'")
        for t in TABLES:
            src = f"{sf}/{t}.parquet"
            if os.path.isdir(src): src = f"{src}/*.parquet"
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
        # two-stage edges materialisation for the kNN-graph chains.
        # The head (everything before the first post-edges CTE) is
        # evaluated ONCE into a temp table; the rebuilt query keeps the
        # PRE-edges CTEs in place — ann07/ann14's tails reference head
        # CTEs other than edges (bk, b_top), which the first cut of this
        # splice dropped ("Table with name bk does not exist").
        cands = [(sql.index(m), m) for m in STAGE_MARKERS if m in sql]
        if cands and "edges AS (" in sql:
            marker = min(cands)[1]
            head, tail = sql.split(marker, 1)
            if head.startswith("WITH "):
                body = head[5:].rstrip().rstrip(",")
                con.sql(f"CREATE TEMP TABLE t_edges AS WITH {body} SELECT * FROM edges")
                pre = head[:head.rindex("edges AS (")]
                sql = (f"{pre}edges AS (SELECT * FROM t_edges),"
                       f"{marker[1:]}{tail}")
        exp = con.sql(sql)
        erows, ecols = exp.fetchall(), [d[0] for d in exp.description]
        got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
        grows, gcols = got.fetchall(), [d[0] for d in got.description]
        secs = round(time.time() - t0, 1)
        if sorted(gcols) != sorted(ecols):
            conn_q.put((name, {"status": "mismatch", "secs": secs,
                               "detail": f"columns {sorted(gcols)} vs {sorted(ecols)}"}))
            return
        gh, gn = table_hash(grows, gcols)
        eh, en = table_hash(erows, ecols)
        if gh == eh:
            conn_q.put((name, {"status": "ok", "rows": gn, "secs": secs}))
        else:
            conn_q.put((name, {"status": "mismatch", "secs": secs,
                               "detail": f"hash (spark {gn} rows, oracle {en})"}))
    except Exception as e:
        conn_q.put((name, {"status": "error", "secs": round(time.time() - t0, 1),
                           "detail": f"{type(e).__name__}: {e}"[:300]}))


def main():
    global SF, OUT
    args = sys.argv[1:]
    jobs, timeout, mem = 5, 900, "24GB"
    pos = []
    i = 0
    while i < len(args):
        if args[i] == "--jobs": jobs = int(args[i + 1]); i += 2
        elif args[i] == "--timeout": timeout = int(args[i + 1]); i += 2
        elif args[i] == "--mem": mem = args[i + 1]; i += 2
        else: pos.append(args[i]); i += 1
    if len(pos) > 0: SF = pos[0]
    if len(pos) > 1: OUT = pos[1]
    only = pos[2:]
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    names = only or sorted(oracles)
    # skip queries whose Spark dump is absent (Verify failed there)
    missing = [n for n in names if not os.path.isdir(f"{OUT}/{n}")]
    names = [n for n in names if n not in set(missing)]
    results = {n: {"status": "no_spark_output"} for n in missing}

    pending = list(names)
    running = {}  # name -> (proc, start)
    q = mp.Queue()
    done = 0
    while pending or running:
        while pending and len(running) < jobs:
            n = pending.pop(0)
            p = mp.Process(target=check_one, args=(n, oracles[n], SF, OUT, q, mem))
            p.start()
            running[n] = (p, time.time())
        try:
            n, res = q.get(timeout=5)
            results[n] = res
            p, _ = running.pop(n)
            p.join()
            done += 1
            tag = res["status"].upper()
            print(f"[{done}/{len(names)}] {tag:9s} {n} "
                  f"({res.get('rows', '-')} rows, {res.get('secs', '-')}s) "
                  f"{res.get('detail', '')}", flush=True)
        except Exception:
            pass
        for n, (p, t0) in list(running.items()):
            if time.time() - t0 > timeout:
                p.terminate(); p.join()
                running.pop(n)
                results[n] = {"status": "timeout", "secs": round(time.time() - t0, 1)}
                done += 1
                print(f"[{done}/{len(names)}] TIMEOUT   {n} (> {timeout}s oracle cost)",
                      flush=True)
            elif not p.is_alive() and p.exitcode not in (0, None):
                # child died (e.g. OOM-killed) without reporting
                running.pop(n)
                results[n] = {"status": "error", "secs": round(time.time() - t0, 1),
                              "detail": f"child exit {p.exitcode}"}
                done += 1
                print(f"[{done}/{len(names)}] ERROR     {n} child exit {p.exitcode}",
                      flush=True)
    counts = {}
    for r in results.values():
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    summary = {"metric": "sf1_stamp", "sf_dir": SF, "out_dir": OUT,
               "timeout_s": timeout, "counts": counts, "queries": results}
    with open("SF1STAMP.json", "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"\nSF1 STAMP: {counts}", flush=True)
    sys.exit(0 if counts.get("mismatch", 0) == 0 else 1)


if __name__ == "__main__":
    main()

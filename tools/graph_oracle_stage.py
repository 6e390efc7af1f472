#!/usr/bin/env python3
"""Two-stage DuckDB evaluation of the gr01/gr04 oracles at the ~sf1
replica: the registered single-statement oracle re-evaluates the heavy
shared `edges` CTE (the kNN-graph chain) once per reference, which at
10x scale explodes DuckDB's runtime/memory. Materialising `edges` into
a temp table FIRST and running the remainder against it computes the
IDENTICAL relational expression — same rows, same hash — in minutes.
Hash logic mirrors tools/selfcheck.py exactly."""
import sys, os, json, hashlib, math, datetime, decimal
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_scale_x10"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf1"
TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

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
    for ln in lines: h.update(ln.encode()); h.update(b"\n")
    return h.hexdigest(), len(lines)

oracles = json.load(open(f"{OUT}/oracle_sql.json"))
con = duckdb.connect()
for t in TABLES:
    src = f"{SF}/{t}.parquet"
    if os.path.isdir(src): src = f"{src}/*.parquet"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

fails = 0
for name in (sys.argv[3:] or ["gr01_pagerank", "gr04_triangles"]):
    sql = oracles[name]
    # Split the single WITH statement at the first CTE AFTER the knn
    # chain — everything before defines (and ends with) the `edges`
    # CTE. Each graph oracle's first post-chain CTE is one of: nodes
    # (gr01-03), und (gr04/gr07/gr08), r0 (gr05), l0 (gr06); take the
    # EARLIEST marker present so multi-marker oracles split correctly.
    MARKERS = ["\nnodes AS", "\nund AS", "\nr0 AS", "\nl0 AS", "\nsds AS"]
    cands = [(sql.index(m), m) for m in MARKERS if m in sql]
    assert cands, f"{name}: no post-edges CTE marker found"
    marker = min(cands)[1]
    head, tail = sql.split(marker, 1)
    assert head.startswith("WITH ")
    con.sql("DROP TABLE IF EXISTS t_edges")
    body = head[5:].rstrip().rstrip(",")
    con.sql(f"CREATE TEMP TABLE t_edges AS WITH {body} SELECT * FROM edges")
    staged = f"WITH edges AS (SELECT * FROM t_edges),{marker[1:]}{tail}"
    exp = con.sql(staged)
    erows, ecols = exp.fetchall(), [d[0] for d in exp.description]
    got = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
    grows, gcols = got.fetchall(), [d[0] for d in got.description]
    if sorted(gcols) != sorted(ecols):
        print(f"FAIL {name}: columns {sorted(gcols)} vs {sorted(ecols)}"); fails += 1; continue
    gh, gn = table_hash(grows, gcols)
    eh, en = table_hash(erows, ecols)
    if gh == eh:
        print(f"OK   {name} ({gn} rows) [two-stage edges materialisation]")
    else:
        fails += 1
        print(f"FAIL {name}: hash mismatch (spark {gn} rows, oracle {en} rows)")
print("GRAPH-STAGE RESULT:", "FAIL" if fails else "PASS")
sys.exit(1 if fails else 0)

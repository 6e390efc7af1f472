#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only —
not part of the Spark library). Runs graft.Verify at a scale factor,
then compares each query's parquet output against its DuckDB oracle:
columns sorted by name, rows sorted, doubles rounded to 1e-9,
timestamps formatted UTC, then value-hash compare.

Usage: python3 tools/selfcheck.py [sfdir] [outdir] [--skip-verify] [query...]
"""
import sys, os, json, subprocess, hashlib
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
SKIP = "--skip-verify" in sys.argv
ONLY = [a for a in sys.argv[3:] if not a.startswith("--")]

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def run_verify():
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:])
        sys.exit("verify run failed")

def canon(val):
    import datetime, decimal, math
    if val is None: return "NULL"
    if isinstance(val, float):
        if math.isnan(val): return "nan"
        return f"{round(val, 9):.9f}"
    if isinstance(val, decimal.Decimal):
        return f"{val:f}"
    if isinstance(val, datetime.datetime):
        return val.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(val, datetime.date):
        return val.isoformat()
    if isinstance(val, (list, tuple)):
        return "[" + ",".join(canon(v) for v in val) + "]"
    return str(val)

def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines: h.update(ln.encode()); h.update(b"\n")
    return h.hexdigest(), len(lines)

def main():
    if not SKIP: run_verify()
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        # Spark-written tables are DIRECTORIES of part files (e.g. the
        # ScaleCheck-replicated fixtures); DuckDB needs the glob form.
        src = f"{SF}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    names = ONLY or sorted(oracles)
    failures = 0
    for name in names:
        try:
            got = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
            grows, gcols = got.fetchall(), [d[0] for d in got.description]
            # The driver's gate canonicalizes DECIMAL differently than this
            # replica (round-1 ADVICE): any DECIMAL output column is a real
            # gate failure even if values match here.
            dec_cols = [d[0] for d in got.description if "DECIMAL" in str(d[1]).upper()]
            if dec_cols:
                print(f"FAIL {name}: DECIMAL output columns {dec_cols} "
                      "(driver gate canonicalizes these differently — cast to DOUBLE+round)")
                failures += 1; continue
            exp = con.sql(oracles[name])
            erows, ecols = exp.fetchall(), [d[0] for d in exp.description]
            if sorted(gcols) != sorted(ecols):
                print(f"FAIL {name}: columns {sorted(gcols)} vs {sorted(ecols)}")
                failures += 1; continue
            gh, gn = table_hash(grows, gcols)
            eh, en = table_hash(erows, ecols)
            if gh == eh:
                print(f"OK   {name} ({gn} rows)")
            else:
                failures += 1
                print(f"FAIL {name}: hash mismatch (spark {gn} rows, oracle {en} rows)")
                gset = set("\x1f".join(canon(r[i]) for i in sorted(range(len(gcols)), key=lambda i: gcols[i])) for r in grows)
                eset = set("\x1f".join(canon(r[i]) for i in sorted(range(len(ecols)), key=lambda i: ecols[i])) for r in erows)
                for x in list(gset - eset)[:3]: print(f"  spark-only : {x[:200]}")
                for x in list(eset - gset)[:3]: print(f"  oracle-only: {x[:200]}")
        except Exception as e:
            failures += 1
            print(f"ERROR {name}: {str(e)[:300]}")
    print(f"\n{len(names) - failures}/{len(names)} queries match")
    sys.exit(1 if failures else 0)

main()

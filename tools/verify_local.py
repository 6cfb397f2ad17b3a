#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs graft.Verify at a given SF dir, then executes each oracle SQL in
DuckDB over the same parquet tables and compares (rows sorted, columns
sorted by name, values normalized) — so oracle mismatches surface before
the driver round.

Usage: python3 tools/verify_local.py [sfdir] [outdir]
"""
import json, math, subprocess, sys, os
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out

def main():
    if os.environ.get("SKIP_SPARK") != "1":
        extra = f" {','.join(sorted(ONLY))}" if ONLY else ""
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}{extra}'],
            capture_output=True, text=True, cwd="/root/repo")
        sys.stdout.write(r.stdout[-3000:])
        sys.stderr.write(r.stderr[-3000:])
        if r.returncode != 0:
            print("VERIFY RUN FAILED"); sys.exit(1)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if ONLY and name not in ONLY:
            continue
        pdir = f"{OUT}/{name}"
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            gotrel = con.sql(f"SELECT * FROM '{pdir}/*.parquet'")
            got_cols, got_types = gotrel.columns, [str(t) for t in gotrel.types]
            got_rows = gotrel.fetchall()
            exprel = con.sql(sql)
            exp_cols, exp_types = exprel.columns, [str(t) for t in exprel.types]
            exp_rows = exprel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} vs {sorted(exp_cols)}")
            n_fail += 1; continue
        # Type parity: the driver's hasher is type-sensitive (HUGEINT vs
        # BIGINT broke events_sessionize in round 1 despite value equality).
        gt = dict(zip(got_cols, got_types))
        et = dict(zip(exp_cols, exp_types))
        tdiff = [(c, gt[c], et[c]) for c in got_cols if gt[c] != et[c]]
        if tdiff:
            print(f"FAIL {name}: type mismatch {tdiff}")
            n_fail += 1; continue
        g, e = canon(got_rows, got_cols), canon(exp_rows, exp_cols)
        if g == e:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: {len(g)} vs {len(e)} rows")
            diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
            for a, b in diff:
                print(f"   spark: {a}\n   duck : {b}")
            only_g = set(g) - set(e)
            only_e = set(e) - set(g)
            for x in list(only_g)[:2]: print(f"   only-spark: {x}")
            for x in list(only_e)[:2]: print(f"   only-duck : {x}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()

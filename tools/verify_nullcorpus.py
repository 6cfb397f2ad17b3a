#!/usr/bin/env python3
"""Degenerate-corpus twins of the correctness gate: regenerate the
documents table in an adversarial shape, then run the full
Spark-vs-DuckDB compare over it.

Shapes (GRAFT_DEGEN_MODE env, default "null"):
  null  — NULL text / NULL lang / NULL source rows injected (~1% each,
          co-occurring): the fixture generator never emits them, yet
          text IS nullable by schema, and every ADVICE-class finding of
          rounds 9-11 was a cross-engine divergence on exactly such
          corpora — null-propagating oracles vs coalescing operators,
          NULLS LAST vs nulls-first sort keys, group-key equi-joins
          dropping null groups, and two outright NPEs.
  shift — doc_id offset by 1,000,000: kills every silent "ids are
          dense and start at 0" assumption in doc-keyed operators (the
          r10 ANN-family bug class, checked by machine across the whole
          surface instead of by review).

Run after touching any text-family operator or oracle.

Usage: GRAFT_DEGEN_MODE=null|shift \
  python3 tools/verify_nullcorpus.py [src_sf_dir] [work_dir] [only]
"""
import shutil, subprocess, sys, os
import duckdb

MODE = os.environ.get("GRAFT_DEGEN_MODE", "null")
SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
WORK = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sf{MODE}_gate"
ONLY = sys.argv[3] if len(sys.argv) > 3 else None

os.makedirs(WORK, exist_ok=True)
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{WORK}/{t}.parquet")

if MODE == "null":
    docs_sql = f"""
      SELECT doc_id,
             CASE WHEN doc_id % 97 = 3 THEN NULL ELSE text END AS text,
             CASE WHEN doc_id % 89 = 5 THEN NULL ELSE lang END AS lang,
             CASE WHEN doc_id % 89 = 5 OR doc_id % 83 = 7 THEN NULL
                  ELSE source END AS source,
             n_chars
      FROM '{SRC}/documents.parquet'"""
elif MODE == "shift":
    docs_sql = f"""
      SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
      FROM '{SRC}/documents.parquet'"""
else:
    sys.exit(f"unknown GRAFT_DEGEN_MODE: {MODE}")

duckdb.sql(
    f"COPY ({docs_sql}) TO '{WORK}/documents.parquet' (FORMAT PARQUET)")

args = ["python3", "tools/verify_local.py", WORK, f"{WORK}/out"]
if ONLY:
    args.append(ONLY)
sys.exit(subprocess.call(args, cwd=os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

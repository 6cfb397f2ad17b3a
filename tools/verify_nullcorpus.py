#!/usr/bin/env python3
"""Degenerate-corpus twin of the correctness gate: regenerate the
documents table with NULL text / NULL lang / NULL source rows injected,
then run the full Spark-vs-DuckDB compare over it.

The primary gate can never see these rows (the fixture generator emits
none), yet text IS nullable by schema and every ADVICE-class finding of
rounds 9-11 was a cross-engine divergence on exactly such corpora —
null-propagating oracles vs coalescing operators, NULLS LAST vs
nulls-first sort keys, group-key equi-joins dropping null groups, and
two outright NPEs. Run this after touching any text-family operator or
oracle.

Usage: python3 tools/verify_nullcorpus.py [src_sf_dir] [work_dir]
"""
import shutil, subprocess, sys, os
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfnull_gate"
ONLY = sys.argv[3] if len(sys.argv) > 3 else None

os.makedirs(WORK, exist_ok=True)
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{WORK}/{t}.parquet")

# ~1.2% null text, ~1.1% null lang (those rows also null source), plus
# ~1.2% null source alone — co-occurrence included so multi-column ops
# (wide entity, manifest) see combined nulls
duckdb.sql(f"""
COPY (
  SELECT doc_id,
         CASE WHEN doc_id % 97 = 3 THEN NULL ELSE text END AS text,
         CASE WHEN doc_id % 89 = 5 THEN NULL ELSE lang END AS lang,
         CASE WHEN doc_id % 89 = 5 OR doc_id % 83 = 7 THEN NULL
              ELSE source END AS source,
         n_chars
  FROM '{SRC}/documents.parquet'
) TO '{WORK}/documents.parquet' (FORMAT PARQUET)
""")

args = ["python3", "tools/verify_local.py", WORK, f"{WORK}/out"]
if ONLY:
    args.append(ONLY)
sys.exit(subprocess.call(args, cwd=os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

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
  unicode — adversarial unicode injected into text (astral emoji + ZWJ
          sequences, combining marks, CJK runs, RTL scripts, zero-width
          spaces inside tokens, fullwidth forms, cased specials
          İ/Σ/ß/astral Deseret, an all-punctuation doc, a 200-codepoint
          CJK token): the fixture is pure ASCII, yet the engine's
          tokenize/shingle/lower/length surface is defined over
          arbitrary UTF-8 — Java full case mapping vs utf8proc simple
          mapping, UTF-16 code units vs codepoints, and regex class
          semantics all diverge exactly here. n_chars is recomputed
          (the fixture invariant n_chars = length(text) holds).
  hugedoc — pathological document LENGTHS: ~0.5% of docs blown up to
          ~90k chars (300× the fixture's ~300-char average), one
          50k-char SINGLE token (no whitespace at all — every
          "tokenize then do per-token work" path sees one giant unit),
          one 100k-char doc that is ONE WORD repeated 20k times (the
          repetition/dedup/PMI pathological corner), and single-char
          docs. The fixture's lengths are near-constant, yet real
          corpora are heavy-tailed — pathological length is THE
          classic production text hazard (O(len²) formulations, regex
          blowups, per-doc memory). n_chars recomputed.
  chaos — ALL table perturbations at once (docs: unicode + nulls +
          id-shift; events: eventdegen; orders: reldegen; embeddings:
          vecdegen): each axis is individually green, so any failure
          here is an INTERACTION bug no single-axis gate can see
          (e.g. a doc-keyed op joining a null-lang doc to a zero
          vector under shifted ids).
  reldegen — adversarial ORDERS (the reference-parity backfill/join/agg
          family's entity table): NULL o_custkey (merchant/join key —
          the NOT IN trap, undecryptable rows), NULL o_totalprice (the
          %.2f-formats-null-as-"nu" Formatter trap, envelope null
          rendering), NULL o_orderdate (time axis of the forward
          as-of), and a mega-merchant absorbing a third of all orders.
  eventdegen — adversarial event stream: NULL ts (~1% — unplaceable in
          time), NULL user_id / event_type / value / props (group keys,
          funnel steps, sum inputs), ~14% of timestamps truncated to the
          hour (mass intra-user ties through every (ts, ...) ordering),
          ~9% collapsed onto ONE global instant (cross-user tie burst),
          and a mega-user absorbing a third of all events (window-
          partition skew). The fixture's stream is clean, unique-
          timestamped and uniform; a real clickstream is none of those.
  skewdegen — adversarial DISTRIBUTION (values stay clean; the shape
          doesn't): 50% of docs collapse onto ONE near-identical
          boilerplate text (one minhash/simhash cluster, one quality
          score per lang — the tie group IS the corpus), one token
          ('hottoken') rides >50% of all docs (a posting list that
          dwarfs every other), one source absorbs 90% of docs (and so
          ~90% of tokens), and 50% of embeddings are EXACT duplicates
          of vector 2 (one IVF cell, one hyperplane bucket, corpus-wide
          cosine ties). Every other gate perturbs values; this one
          machine-tests the bounded-skew assumptions — densityPrune's
          per-cell window, the saturation alarms' trip thresholds,
          histogram-offset tie cuts, capped bucket joins — at once.
  skewnull — skewdegen × null COMPOSITION: the mega-cluster/hot-token/
          mega-source distribution with null-laced text/lang/source
          riding it, plus skewdegen's one-IVF-cell embeddings — a
          boilerplate-cluster member with NULL lang exercises the
          null-group and tie-bucket paths of every histogram/RankCut
          cut together, which no single-axis mode can.
  vecdegen — adversarial embeddings: ~2% all-zero vectors (plus query
          id 5, so the QUERY side of every serve is degenerate too),
          ~2% exact duplicates of vector 2 (a mega-tie cluster through
          every top-k / dedup / graph tie-break), ~1.7% scaled by 1e18
          (float-edge magnitudes through the double math). A broken
          producer emits exactly these at 100 TB; zero vectors are not
          representable in cosine space and the engine excludes them at
          the source — the oracle must REPLAY that exclusion, not
          NaN-rank them into every result.

Run after touching any text-family operator or oracle.

Usage: GRAFT_DEGEN_MODE=null|shift \
  python3 tools/verify_nullcorpus.py [src_sf_dir] [work_dir] [only]
"""
import shutil, subprocess, sys, os
import duckdb

MODE = os.environ.get("GRAFT_DEGEN_MODE", "null")
# Seeded fuzzing: GRAFT_DEGEN_SEED=N rotates every perturbation
# selector (which rows go null / get the hot token / become the
# mega-key) while keeping each perturbation's RATE — N seeds of each
# mode sweep different row subsets through the same contracts at zero
# new tooling cost. Seed 0 is byte-identical to the pre-seed gates.
SEED = int(os.environ.get("GRAFT_DEGEN_SEED", "0"))

def res(m, r):
    return (r + SEED) % m
SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
WORK = (sys.argv[2] if len(sys.argv) > 2 else
        f"/tmp/sf{MODE}_gate" + (f"_s{SEED}" if SEED else ""))
ONLY = sys.argv[3] if len(sys.argv) > 3 else None

os.makedirs(WORK, exist_ok=True)
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{WORK}/{t}.parquet")

if MODE == "null":
    docs_sql = f"""
      SELECT doc_id,
             CASE WHEN doc_id % 97 = {res(97, 3)} THEN NULL ELSE text END AS text,
             CASE WHEN doc_id % 89 = {res(89, 5)} THEN NULL ELSE lang END AS lang,
             CASE WHEN doc_id % 89 = {res(89, 5)} OR doc_id % 83 = {res(83, 7)} THEN NULL
                  ELSE source END AS source,
             n_chars
      FROM '{SRC}/documents.parquet'"""
elif MODE == "shift":
    docs_sql = f"""
      SELECT doc_id + {1000000 + 1000 * SEED} AS doc_id, text, lang, source, n_chars
      FROM '{SRC}/documents.parquet'"""
elif MODE == "unicode":
    ZWSP, ZWJ, ACUTE = "​", "‍", "́"
    shapes = {
        1: f"'🦀 rust 👨{ZWJ}👩{ZWJ}👧 family ' || text",
        2: f"'cafe{ACUTE} e{ACUTE}clair {ACUTE} ' || text",
        3: "'火花数据处理引擎流式计算 ' || text",
        4: "'مرحبا بالعالم שלום עולם ' || text",
        5: f"'da{ZWSP}ta zero{ZWSP}width ' || text",
        6: "'ＡＢＣ　ａｂｃ １２３ ' || text",
        7: "'İstanbul STRASSE Σ ΟΔΥΣΣΕΥΣ ß ' || text",
        8: "'Привет ΩΜΕΓΑ Ωmega naïve Ёлка ' || text",
        9: "'!!! ??? 🎉🎉🎉 ... ;;;'",  # replaces text entirely
        10: "'𐐀𐐁𐐂 𐐨𐐩 DESERET ' || text",
        11: "repeat('蟹', 200) || ' ' || text",
        12: "'👍🏽 👩🏿‍🔬 flags 🇩🇪🇫🇷 ' || text",
    }
    cases = "\n".join(
        f"WHEN doc_id % 13 = {res(13, k)} THEN {v}" for k, v in shapes.items())
    docs_sql = f"""
      SELECT doc_id, text,
             lang, source, length(text) AS n_chars
      FROM (SELECT doc_id, CASE {cases} ELSE text END AS text,
                   lang, source
            FROM '{SRC}/documents.parquet')"""
elif MODE == "hugedoc":
    docs_sql = f"""
      SELECT doc_id, text, lang, source, length(text) AS n_chars
      FROM (SELECT doc_id,
                   CASE WHEN doc_id % 211 = {res(211, 3)} THEN repeat(text || ' ', 300)
                        WHEN doc_id % 223 = {res(223, 5)} THEN repeat('a', 50000)
                        WHEN doc_id % 229 = {res(229, 9)} THEN
                          rtrim(repeat('boilerplate ', 20000))
                        WHEN doc_id % 227 = {res(227, 7)} THEN 'x'
                        ELSE text END AS text,
                   lang, source
            FROM '{SRC}/documents.parquet')"""
elif MODE == "chaos":
    ZWSP, ZWJ, ACUTE = "\u200b", "\u200d", "\u0301"
    shapes = {
        1: f"'\U0001F980 rust \U0001F468{ZWJ}\U0001F469{ZWJ}\U0001F467 family ' || text",
        2: f"'cafe{ACUTE} e{ACUTE}clair {ACUTE} ' || text",
        3: "'\u706b\u82b1\u6570\u636e\u5904\u7406\u5f15\u64ce\u6d41\u5f0f\u8ba1\u7b97 ' || text",
        7: "'\u0130stanbul STRASSE \u03a3 \u039f\u0394\u03a5\u03a3\u03a3\u0395\u03a5\u03a3 \u00df ' || text",
        9: "'!!! ??? \U0001F389\U0001F389\U0001F389 ... ;;;'",
        10: "'\U00010400\U00010401\U00010402 \U00010428\U00010429 DESERET ' || text",
    }
    cases = "\n".join(
        f"WHEN doc_id % 13 = {res(13, k)} THEN {v}" for k, v in shapes.items())
    docs_sql = f"""
      SELECT doc_id + {1000000 + 1000 * SEED} AS doc_id,
             CASE WHEN doc_id % 97 = {res(97, 3)} THEN NULL ELSE text END AS text,
             CASE WHEN doc_id % 89 = {res(89, 5)} THEN NULL ELSE lang END AS lang,
             CASE WHEN doc_id % 89 = {res(89, 5)} OR doc_id % 83 = {res(83, 7)} THEN NULL
                  ELSE source END AS source,
             length(CASE WHEN doc_id % 97 = {res(97, 3)} THEN NULL ELSE text END)
               AS n_chars
      FROM (SELECT doc_id, CASE {cases} ELSE text END AS text,
                   lang, source
            FROM '{SRC}/documents.parquet')"""
    duckdb.sql(f"""COPY (
      SELECT event_id,
             CASE WHEN event_id % 97 = {res(97, 3)} THEN NULL
                  WHEN event_id % 7 = {res(7, 1)} THEN date_trunc('hour', ts)
                  WHEN event_id % 11 = {res(11, 2)}
                    THEN TIMESTAMP '2024-01-15 12:00:00'
                  ELSE ts END AS ts,
             CASE WHEN event_id % 89 = {res(89, 5)} THEN NULL
                  WHEN event_id % 3 = {res(3, 0)} THEN 7
                  ELSE user_id END AS user_id,
             CASE WHEN event_id % 83 = {res(83, 7)} THEN NULL
                  ELSE event_type END AS event_type,
             CASE WHEN event_id % 79 = {res(79, 9)} THEN NULL ELSE value END AS value,
             CASE WHEN event_id % 73 = {res(73, 11)} THEN NULL ELSE props END AS props
      FROM '{SRC}/events.parquet')
      TO '{WORK}/events.parquet' (FORMAT PARQUET)""")
    duckdb.sql(f"""COPY (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 89 = {res(89, 5)} THEN NULL
                  WHEN o_orderkey % 3 = {res(3, 0)} THEN 42
                  ELSE o_custkey END AS o_custkey,
             o_orderstatus,
             CASE WHEN o_orderkey % 79 = {res(79, 9)} THEN NULL
                  ELSE o_totalprice END AS o_totalprice,
             CASE WHEN o_orderkey % 97 = {res(97, 3)} THEN NULL
                  ELSE o_orderdate END AS o_orderdate,
             o_orderpriority
      FROM '{SRC}/orders.parquet')
      TO '{WORK}/orders.parquet' (FORMAT PARQUET)""")
    duckdb.sql(f"""COPY (
      SELECT vec_id,
             CASE
               WHEN vec_id % 53 = {res(53, 11)} OR vec_id = 5
                 THEN list_transform(embedding, x -> CAST(0.0 AS FLOAT))
               WHEN vec_id % 47 = {res(47, 13)}
                 THEN (SELECT embedding FROM '{SRC}/embeddings.parquet'
                       WHERE vec_id = 2)
               WHEN vec_id % 59 = {res(59, 17)}
                 THEN list_transform(embedding, x -> CAST(x * 1e18 AS FLOAT))
               ELSE embedding END AS embedding,
             label
      FROM '{SRC}/embeddings.parquet')
      TO '{WORK}/embeddings.parquet' (FORMAT PARQUET)""")
elif MODE == "reldegen":
    docs_sql = f"SELECT * FROM '{SRC}/documents.parquet'"
    orders_sql = f"""
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 89 = {res(89, 5)} THEN NULL
                  WHEN o_orderkey % 3 = {res(3, 0)} THEN 42
                  ELSE o_custkey END AS o_custkey,
             o_orderstatus,
             CASE WHEN o_orderkey % 79 = {res(79, 9)} THEN NULL
                  ELSE o_totalprice END AS o_totalprice,
             CASE WHEN o_orderkey % 97 = {res(97, 3)} THEN NULL
                  ELSE o_orderdate END AS o_orderdate,
             o_orderpriority
      FROM '{SRC}/orders.parquet'"""
    duckdb.sql(
        f"COPY ({orders_sql}) TO '{WORK}/orders.parquet' (FORMAT PARQUET)")
elif MODE == "eventdegen":
    docs_sql = f"SELECT * FROM '{SRC}/documents.parquet'"
    events_sql = f"""
      SELECT event_id,
             CASE WHEN event_id % 97 = {res(97, 3)} THEN NULL
                  WHEN event_id % 7 = {res(7, 1)} THEN date_trunc('hour', ts)
                  WHEN event_id % 11 = {res(11, 2)}
                    THEN TIMESTAMP '2024-01-15 12:00:00'
                  ELSE ts END AS ts,
             CASE WHEN event_id % 89 = {res(89, 5)} THEN NULL
                  WHEN event_id % 3 = {res(3, 0)} THEN 7
                  ELSE user_id END AS user_id,
             CASE WHEN event_id % 83 = {res(83, 7)} THEN NULL
                  ELSE event_type END AS event_type,
             CASE WHEN event_id % 79 = {res(79, 9)} THEN NULL ELSE value END AS value,
             CASE WHEN event_id % 73 = {res(73, 11)} THEN NULL ELSE props END AS props
      FROM '{SRC}/events.parquet'"""
    duckdb.sql(
        f"COPY ({events_sql}) TO '{WORK}/events.parquet' (FORMAT PARQUET)")
elif MODE == "skewdegen":
    docs_sql = f"""
      SELECT doc_id, text, lang, source, length(text) AS n_chars
      FROM (SELECT doc_id,
                   CASE WHEN doc_id % 2 = {res(2, 0)} THEN
                          'boilerplate header hottoken the quick brown '
                          || 'fox jumps over the lazy dog variant '
                          || CAST(doc_id % 5 AS VARCHAR)
                        WHEN doc_id % 10 = {res(10, 1)} THEN text || ' hottoken'
                        ELSE text END AS text,
                   lang,
                   CASE WHEN doc_id % 10 = {res(10, 7)} THEN source
                        ELSE 'megasrc' END AS source
            FROM '{SRC}/documents.parquet')"""
    emb_sql = f"""
      SELECT vec_id,
             CASE WHEN vec_id % 2 = {res(2, 0)}
               THEN (SELECT embedding FROM '{SRC}/embeddings.parquet'
                     WHERE vec_id = 2)
               ELSE embedding END AS embedding,
             label
      FROM '{SRC}/embeddings.parquet'"""
    duckdb.sql(
        f"COPY ({emb_sql}) TO '{WORK}/embeddings.parquet' (FORMAT PARQUET)")
elif MODE == "skewnull":
    # skewdegen × null composition: the mega-cluster / hot-token /
    # mega-source DISTRIBUTION with null-laced VALUES riding it — a
    # boilerplate-cluster member with NULL lang exercises RankCut's
    # null-group and tie-bucket paths TOGETHER (no single-axis mode
    # does), a null-text row inside the 50% tie group hits every
    # "tokenize the cluster" path's null-propagation, and the
    # embeddings keep skewdegen's one-IVF-cell shape. Same rates as
    # the parent modes; generators reused verbatim.
    docs_sql = f"""
      SELECT doc_id,
             CASE WHEN doc_id % 97 = {res(97, 3)} THEN NULL ELSE text END AS text,
             CASE WHEN doc_id % 89 = {res(89, 5)} THEN NULL ELSE lang END AS lang,
             CASE WHEN doc_id % 89 = {res(89, 5)} OR doc_id % 83 = {res(83, 7)} THEN NULL
                  ELSE source END AS source,
             length(CASE WHEN doc_id % 97 = {res(97, 3)} THEN NULL ELSE text END)
               AS n_chars
      FROM (SELECT doc_id,
                   CASE WHEN doc_id % 2 = {res(2, 0)} THEN
                          'boilerplate header hottoken the quick brown '
                          || 'fox jumps over the lazy dog variant '
                          || CAST(doc_id % 5 AS VARCHAR)
                        WHEN doc_id % 10 = {res(10, 1)} THEN text || ' hottoken'
                        ELSE text END AS text,
                   lang,
                   CASE WHEN doc_id % 10 = {res(10, 7)} THEN source
                        ELSE 'megasrc' END AS source
            FROM '{SRC}/documents.parquet')"""
    emb_sql = f"""
      SELECT vec_id,
             CASE WHEN vec_id % 2 = {res(2, 0)}
               THEN (SELECT embedding FROM '{SRC}/embeddings.parquet'
                     WHERE vec_id = 2)
               ELSE embedding END AS embedding,
             label
      FROM '{SRC}/embeddings.parquet'"""
    duckdb.sql(
        f"COPY ({emb_sql}) TO '{WORK}/embeddings.parquet' (FORMAT PARQUET)")
elif MODE == "vecdegen":
    docs_sql = f"SELECT * FROM '{SRC}/documents.parquet'"
    emb_sql = f"""
      SELECT vec_id,
             CASE
               WHEN vec_id % 53 = {res(53, 11)} OR vec_id = 5
                 THEN list_transform(embedding, x -> CAST(0.0 AS FLOAT))
               WHEN vec_id % 47 = {res(47, 13)}
                 THEN (SELECT embedding FROM '{SRC}/embeddings.parquet'
                       WHERE vec_id = 2)
               WHEN vec_id % 59 = {res(59, 17)}
                 THEN list_transform(embedding, x -> CAST(x * 1e18 AS FLOAT))
               ELSE embedding END AS embedding,
             label
      FROM '{SRC}/embeddings.parquet'"""
    duckdb.sql(
        f"COPY ({emb_sql}) TO '{WORK}/embeddings.parquet' (FORMAT PARQUET)")
elif MODE == "ansi":
    # the NO-SILENT-WRAP ledger mode (standing since r16): corpus
    # UNCHANGED, engine run under spark.sql.ansi.enabled=true so any
    # Long/Decimal overflow anywhere in the 190+-query surface is a
    # LOUD error row instead of wrapped garbage (the r14 DSIR 2^63
    # class). The oracle compare is unchanged — a green run proves
    # both "no silent wrap" AND "ANSI flips no row".
    docs_sql = f"SELECT * FROM '{SRC}/documents.parquet'"
    os.environ["GRAFT_ANSI"] = "1"
else:
    sys.exit(f"unknown GRAFT_DEGEN_MODE: {MODE}")

duckdb.sql(
    f"COPY ({docs_sql}) TO '{WORK}/documents.parquet' (FORMAT PARQUET)")

args = ["python3", "tools/verify_local.py", WORK, f"{WORK}/out"]
if ONLY:
    args.append(ONLY)
sys.exit(subprocess.call(args, cwd=os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

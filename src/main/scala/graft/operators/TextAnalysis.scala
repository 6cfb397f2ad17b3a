package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{TextFunctions => T}
import graft.functions.BottomK.bottom_k

/** Document-corpus text analysis queries (SURVEY.md §2.9 E5): language
  * ID, quality scoring, token statistics, term frequencies and
  * fingerprints — all narrow maps + one hash aggregate where grouped,
  * no joins, fully codegen-friendly.
  */
object TextAnalysis {

  /** PMI collocation mining — the phrase/vocab-induction step a
    * tokenizer pipeline runs before committing multi-word units to the
    * vocabulary: adjacent-token pairs scored by pointwise mutual
    * information, PMI(a,b) = ln( P(ab) / (P(a)·P(b)) ), the standard
    * collocation statistic (Church & Hanks 1990). High-count,
    * high-PMI pairs are phrases ("bound together" far above chance);
    * high-count low-PMI pairs are grammar.
    *
    * Shape: two hash aggregates (pair counts over the 2-shingles,
    * unigram counts over the tokens), two broadcast-able joins of the
    * pair table against the unigram table, totals as single-row
    * broadcast scalars — no window over the corpus, no pair explosion
    * beyond the adjacent pairs the text already contains, O(total
    * tokens) end to end. `minCount` floors the support (PMI of rare
    * pairs is noise — the classic failure mode), the top-`topN` cut
    * keys on (pair_cnt DESC, pmi DESC, bigram) so the result is
    * deterministic. The PMI division chain is written with explicit
    * double casts in the same association on both engines; the single
    * `ln` rounds at 6, inside the harness's 10-significant-digit
    * normalization (the bigram-LM oracle rides the same precedent). */
  def phrasePmi(spark: SparkSession, dir: String, minCount: Int = 5,
      topN: Int = 50): DataFrame = {
    // both frequency tables are the SHARED memos (token-tf /
    // bigram-tf) other vocab-prep queries read — a private re-build
    // here paid two redundant corpus scans per run
    val pairs = Memo.table(spark, dir, "bigram-tf") {
      Tables.load(spark, dir, "documents")
        .select(explode(T.wordShingles(col("text"), 2)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("bfreq"))
    }.select(col("bigram"), col("bfreq").as("pair_cnt"))
    val uni = tokenTf(spark, dir)
      .select(col("token"), col("freq").as("cnt"))
    val np = pairs.agg(sum(col("pair_cnt")).as("np"))
    val nu = uni.agg(sum(col("cnt")).as("nu"))
    pairs.filter(col("pair_cnt") >= minCount)
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .join(uni.select(col("token").as("w1"), col("cnt").as("c1")), "w1")
      .join(uni.select(col("token").as("w2"), col("cnt").as("c2")), "w2")
      .crossJoin(broadcast(np)).crossJoin(broadcast(nu))
      .select(col("bigram"), col("pair_cnt"), col("c1"), col("c2"),
        round(log(
          (col("pair_cnt").cast("double") / col("np").cast("double")) /
            ((col("c1").cast("double") / col("nu").cast("double")) *
              (col("c2").cast("double") / col("nu").cast("double")))), 6)
          .as("pmi"))
      .orderBy(col("pair_cnt").desc, col("pmi").desc, col("bigram"))
      .limit(topN)
  }

  /** One greedy left-to-right merge pass: every non-overlapping
    * occurrence of the adjacent symbol pair (`l`, `r`) fuses into one
    * symbol (the two joined by a space — unambiguous for display; the
    * ALGORITHM keys on the (left, right) pair, never the joined
    * string). After a fusion the next index is consumed, so "a a a"
    * under merge (a, a) yields ["a a", "a"] — the standard BPE greedy
    * scan.
    *
    * This is a deliberate IMPERATIVE kernel (driven via typed
    * `mapPartitions`), not a Catalyst expression — measured, not
    * assumed: the first implementation was a pure-Catalyst `aggregate`
    * over the index sequence with an (out, skip) struct state, and at
    * the 100× probe it was QUADRATIC-BY-COPY (each step's
    * `concat(out, array(x))` re-copies the whole immutable accumulator
    * array) and interpreter-bound when chained (the 6-pass encode put
    * six nested array-lambda aggregates in one projection): 444 s for
    * the 6-pass encode over 27M tokens vs seconds for this scan. A
    * per-document mutable left-to-right scan is exactly the
    * "genuine per-partition imperative logic" mapPartitions exists
    * for. */
  private def mergeOnce(ts: Array[String], l: String,
      r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](ts.length)
    var i = 0
    while (i < ts.length) {
      if (i + 1 < ts.length && ts(i) == l && ts(i + 1) == r) {
        out += (l + " " + r); i += 2
      } else { out += ts(i); i += 1 }
    }
    out.toArray
  }

  /** Split a word into CODEPOINT symbols (one String per Unicode code
    * point) — NOT UTF-16 code units: DuckDB's `word[i]` / `len(word)`
    * are codepoint-indexed, so a `toCharArray` split would diverge on
    * any astral character (an emoji becomes two lone surrogates, which
    * UTF8String then mangles to '?', collapsing distinct symbols).
    * Codepoint symbols keep the merge tables, counts and fingerprints
    * identical across engines on full Unicode, not just the BMP. */
  private def codepointSyms(w: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** BPE merge learning — the tokenizer-TRAINING step (Sennrich et al.
    * 2016), run here over the word stream (merges learn multi-word
    * units; the algorithm is byte-pair coding at whatever symbol
    * granularity it is fed): `m` rounds of
    *
    *  1. count adjacent symbol pairs across the corpus — one hash
    *     aggregate with map-side combine, the shuffle carries distinct
    *     pairs, never positions;
    *  2. pick the most frequent pair on the driver (ORDER BY count
    *     DESC, left, right LIMIT 1 — a bounded 1-row collect, the
    *     merge-table round-trip every distributed BPE trainer does);
    *  3. re-encode every document with [[mergeOnce]] — a pure NARROW
    *     map, no shuffle.
    *
    * Each round's encoding materializes once (scratch parquet), so
    * round k+1 reads round k's output instead of replaying a k-deep
    * transform chain — total cost O(m · corpus), the irreducible BPE
    * training work. The learned table is the corpus artifact
    * (memoized): (merge_rank, left_sym, right_sym, pair_cnt), with
    * pair counts provably non-increasing in rank (a merge can only
    * remove old occurrences, and every pair it creates is capped by
    * its own count — TextSpec pins the invariant). The DuckDB oracle
    * replays all `m` rounds bit-exactly: the same greedy scan as a
    * per-document recursive CTE, the same (count DESC, left, right)
    * tie-break. */
  def bpeMerges(spark: SparkSession, dir: String, m: Int = 6): DataFrame =
    Memo.table(spark, dir, s"bpe_merges_$m") {
      import spark.implicits._
      // superseded rounds are RELEASED as soon as their successor
      // materialized (scratchHandle + release) — only two round tables
      // ever exist at once, not m+1 until JVM shutdown
      // null text = empty token stream (the media-stub discipline):
      // a raw null ts would NPE the typed merge map and silently drop
      // the doc from the oracle's recursive replay
      var (cur, curPath) = Memo.scratchHandle(spark, "bpe_round_0")(
        Tables.load(spark, dir, "documents")
          .select(col("doc_id"),
            coalesce(T.tokens(col("text")),
              typedlit(Seq.empty[String])).as("ts")))
      val merges = Seq.newBuilder[(Long, String, String, Long)]
      for (k <- 1 to m) {
        val best = cur
          .filter(size(col("ts")) >= 2)
          .select(explode(zip_with(
            slice(col("ts"), lit(1), size(col("ts")) - 1),
            slice(col("ts"), lit(2), size(col("ts")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1).collect()
        if (best.nonEmpty) {
          val (l, r, cnt) = (best(0).getString(0), best(0).getString(1),
            best(0).getLong(2))
          merges += ((k.toLong, l, r, cnt))
          val (next, nextPath) = Memo.scratchHandle(spark, s"bpe_round_$k")(
            cur.select(col("doc_id"), col("ts")).as[(Long, Seq[String])]
              .mapPartitions(_.map { case (id, ts) =>
                (id, mergeOnce(ts.toArray, l, r).toSeq) })
              .toDF("doc_id", "ts"))
          Memo.release(spark, curPath)
          cur = next; curPath = nextPath
        }
      }
      Memo.release(spark, curPath)
      merges.result()
        .toDF("merge_rank", "left_sym", "right_sym", "pair_cnt")
    }.orderBy("merge_rank")

  /** BPE ENCODE — the inference twin of [[bpeMerges]]: apply the
    * learned merge table, in rank order, to every document. The merge
    * table is the bounded driver artifact (m rows — the same shape as
    * the IVF codebook literals), each merge one [[mergeOnce]] narrow
    * map, so the whole encode is a zero-shuffle chain over one corpus
    * scan. Output pins the compression (n_raw → n_tokens) and a
    * 60-bit fingerprint of the exact encoded sequence (tokens joined
    * by chr(1) — a separator no token contains, so the fingerprint
    * distinguishes segmentations that a space-join would collapse:
    * ["a b","c"] vs ["a","b c"]). The oracle replays training AND
    * encoding bit-exactly. */
  def bpeEncode(spark: SparkSession, dir: String, m: Int = 6): DataFrame = {
    val merges = bpeMerges(spark, dir, m).collect()
      .sortBy(_.getAs[Long]("merge_rank"))
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
    import spark.implicits._
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        // null text = empty token stream, like the trainer
        coalesce(T.tokens(col("text")),
          typedlit(Seq.empty[String])).as("ts"))
      .withColumn("n_raw", size(col("ts")).cast("long"))
    val encoded = base.select(col("doc_id"), col("n_raw"), col("ts"))
      .as[(Long, Long, Seq[String])]
      .mapPartitions(_.map { case (id, nRaw, ts0) =>
        var ts = ts0.toArray
        merges.foreach { case (l, r) => ts = mergeOnce(ts, l, r) }
        (id, nRaw, ts.toSeq)
      })
      .toDF("doc_id", "n_raw", "ts")
    encoded.select(col("doc_id"), col("n_raw"),
      size(col("ts")).cast("long").as("n_tokens"),
      // LENGTH-PREFIXED symbols, not a separator join: the tokenizer
      // splits on \s+ only, so a token CAN contain \u0001 and a
      // separator-joined fingerprint would equate segmentations the
      // fingerprint exists to distinguish; len:sym concatenation is
      // prefix-free for any symbol content (length() and DuckDB's
      // len() both count codepoints)
      graft.functions.Hash60.hash60(concat_ws("",
        transform(col("ts"),
          t => concat(length(t), lit(":"), t)))).as("enc_h"))
      .orderBy("doc_id")
  }

  /** BPE merge learning over the WORD-FREQUENCY table — the form real
    * tokenizer training takes (Sennrich et al. 2016 train on the
    * distinct-word count table, not the corpus): ONE corpus aggregate
    * up front collapses the token stream to (word, freq) — the only
    * corpus-sized pass — then every merge round runs over the VOCAB:
    * word-internal adjacent character pairs weighted by word
    * frequency, the (sum DESC, left, right) argmax, and the greedy
    * [[mergeOnce]] re-encode as a narrow map over vocabulary rows.
    * Each round is O(vocab), not O(corpus) — the property that makes
    * 32k–64k-merge vocabularies feasible where the corpus-granularity
    * trainer ([[bpeMerges]], which learns multi-WORD units and must
    * re-encode documents) pays m full corpus scans: at 100 TB the
    * word table is megabytes against terabytes of text, and the
    * per-round cost does not grow with the corpus AT ALL (a 100×
    * corpus has the same vocabulary with scaled freqs — the probe in
    * NOTES measures exactly that invariance).
    *
    * Rounds materialize by eager `localCheckpoint` (vocab-sized; the
    * superseded round's blocks are freed explicitly — plan depth and
    * storage both stay O(1) across 64 rounds) instead of scratch
    * parquet: the loop re-reads each round twice (pair count +
    * re-encode), never across queries. The learned table is the memo
    * artifact: (merge_rank, left_sym, right_sym, pair_cnt) with
    * pair_cnt the FREQ-WEIGHTED occurrence count; the same
    * non-increasing-in-rank invariant as [[bpeMerges]] holds (a merge
    * only removes old pair occurrences; every pair it creates is
    * capped by its own count). The DuckDB oracle replays all rounds
    * bit-exactly over the same word table (recursive greedy walk per
    * DISTINCT WORD — vocab-bounded there too). */
  def bpeMergesVocab(spark: SparkSession, dir: String, m: Int = 8): DataFrame =
    Memo.table(spark, dir, s"bpe_merges_vocab_$m") {
      import spark.implicits._
      val vocab0 = Tables.load(spark, dir, "documents")
        .select(explode(T.tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .as[(String, Long)]
        .map { case (w, f) => (w, f, codepointSyms(w).toSeq) }
        .toDF("word", "freq", "ts")
      var cur = vocab0.localCheckpoint(true)
      val merges = Seq.newBuilder[(Long, String, String, Long)]
      for (k <- 1 to m) {
        val best = cur
          .filter(size(col("ts")) >= 2)
          .select(col("freq"), explode(zip_with(
            slice(col("ts"), lit(1), size(col("ts")) - 1),
            slice(col("ts"), lit(2), size(col("ts")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1).collect()
        if (best.nonEmpty) {
          val (l, r, cnt) = (best(0).getString(0), best(0).getString(1),
            best(0).getLong(2))
          merges += ((k.toLong, l, r, cnt))
          val next = cur.select(col("word"), col("freq"), col("ts"))
            .as[(String, Long, Seq[String])]
            .mapPartitions(_.map { case (w, f, ts) =>
              (w, f, mergeOnce(ts.toArray, l, r).toSeq) })
            .toDF("word", "freq", "ts")
            .localCheckpoint(true)
          org.apache.spark.sql.graftshim.Shim.freeLocalCheckpoint(cur)
          cur = next
        }
      }
      org.apache.spark.sql.graftshim.Shim.freeLocalCheckpoint(cur)
      merges.result()
        .toDF("merge_rank", "left_sym", "right_sym", "pair_cnt")
    }.orderBy("merge_rank")

  /** Encode with the [[bpeMergesVocab]] table — and the encode itself
    * is vocab-bounded: each DISTINCT word encodes once (m merge passes
    * over vocabulary rows, narrow), then one hash join maps the
    * corpus's positional token stream onto its per-word encodings and
    * a per-doc aggregate reassembles counts and the exact-segmentation
    * fingerprint in token order. The m·corpus re-encode chain of
    * [[bpeEncode]] becomes m·vocab + one join — the only corpus-sized
    * steps are the tokenize and the final aggregate, independent of
    * m. Fingerprint = hash60 of all subword symbols in document order
    * joined by chr(1) (per-word encodings are chr(1)-joined, then
    * words chr(1)-joined — associatively identical to the flat join,
    * so the oracle reassembles the same string). */
  def bpeEncodeVocab(spark: SparkSession, dir: String, m: Int = 8): DataFrame = {
    val merges = bpeMergesVocab(spark, dir, m).collect()
      .sortBy(_.getAs[Long]("merge_rank"))
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
    import spark.implicits._
    val wordEnc = Tables.load(spark, dir, "documents")
      .select(explode(T.tokens(col("text"))).as("word"))
      .distinct()
      .as[String]
      .mapPartitions(_.map { w =>
        var ts: Array[String] = codepointSyms(w)
        val nch = ts.length.toLong
        merges.foreach { case (l, r) => ts = mergeOnce(ts, l, r) }
        // length-prefixed (codepoint counts — the engines' shared
        // length unit), prefix-free under concatenation: see bpeEncode
        (w, nch, ts.length.toLong,
          ts.map(t => s"${t.codePointCount(0, t.length)}:$t").mkString(""))
      })
      .toDF("word", "n_chars", "n_sub", "enc")
    val perDoc = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), posexplode(T.tokens(col("text")))
        .as(Seq("pos", "word")))
      .join(wordEnc, "word")
      .groupBy("doc_id")
      .agg(sum(col("n_chars")).as("n_raw"),
        sum(col("n_sub")).as("n_tokens"),
        // word encodings concatenate bare: each is already a
        // prefix-free len:sym stream, so the doc fingerprint equals
        // the flat symbol stream's
        graft.functions.Hash60.hash60(concat_ws("",
          transform(array_sort(collect_list(struct(col("pos"), col("enc")))),
            e => e.getField("enc")))).as("enc_h"))
    // token-less documents have no exploded rows: complete them with
    // zero counts and the empty-stream fingerprint (bpeEncode keeps
    // them through its narrow map, so this surface must too)
    Tables.load(spark, dir, "documents").select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_raw"), lit(0L)).as("n_raw"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("enc_h"),
          graft.functions.Hash60.hash60(lit(""))).as("enc_h"))
      .orderBy("doc_id")
  }

  /** CLUSTER LABELING — the human-readable face of the learned
    * k-means clustering (the step a curation UI or a mixture report
    * needs): per coarse cluster, the top-`k` terms by summed TF-IDF
    * over member documents (vec_id ≅ doc_id, the repo-wide
    * identification hybrid_search serves under). Reuses the
    * [[tfidfTopTerms]] scoring verbatim (same tf·ln((N+1)/(df+1)),
    * rounded per (doc, term) before the cluster fold so the oracle
    * replays it), sums through DECIMAL(38,18) (order-free), and ranks
    * per cluster by (weight DESC, term). The window partitions by
    * c_id over the (cluster, term) aggregate — C ~ √n groups at
    * production geometry, the aggregated table is vocabulary-bounded
    * per cluster, never the corpus. */
  def clusterLabels(spark: SparkSession, dir: String, k: Int = 3,
      iters: Int = 2): DataFrame = {
    val scored = scoredTerms(spark, dir)
    val asg = Similarity.assignmentTable(spark, dir, iters)
      .select(col("vec_id").as("doc_id"), col("c_id"))
    val byCluster = scored.join(asg, "doc_id")
      .groupBy("c_id", "term")
      .agg(graft.functions.DecimalConv.decSum(col("tfidf")).as("wsum"))
      .withColumn("weight", round(col("wsum"), 6))
    val w = Window.partitionBy("c_id")
      .orderBy(col("weight").desc, col("term"))
    byCluster.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("c_id", "rk", "term", "weight")
      .orderBy("c_id", "rk")
  }

  /** Per-doc language-ID heuristic vs the labeled lang column. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        T.langId(col("text")).as("pred_lang"))
      .orderBy("doc_id")

  /** Per-doc quality signals (flattened struct). */
  def quality(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), T.qualityStruct(col("text")).as("q"))
      .select(col("doc_id"), col("q.n_chars").as("n_chars"),
        col("q.n_tokens").as("n_tokens"),
        round(col("q.avg_token_len"), 6).as("avg_token_len"),
        round(col("q.punct_ratio"), 6).as("punct_ratio"),
        round(col("q.digit_ratio"), 6).as("digit_ratio"),
        round(col("q.stopword_ratio"), 6).as("stopword_ratio"))
      .orderBy("doc_id")

  /** Harness query `quality_quantile_filter`: keep the top `keep`
    * fraction of documents PER LANGUAGE by a composite quality score
    * (stopword − punct − digit ratios, rounded) — the standard
    * quality-pruning pass of a training-data pipeline, with the rank
    * semantics of `rank ≤ 1 + keep·(n−1)` over (score desc, doc_id).
    *
    * Scale shape: the naive form is a per-language window over every
    * document — a 20 TB single partition per language at 100 TB. This
    * plan instead (1) aggregates to (lang, score) counts — bounded by
    * langs × distinct rounded scores, (2) finds each language's
    * threshold score and its tie quota with a window over THAT tiny
    * table, (3) keeps `score > thr` with a narrow broadcast-joined
    * filter, and (4) cuts the tie group (docs exactly at the
    * threshold) in hard-bounded (lang, id-bucket) windows. Exactly the
    * kept set the full window would produce (the oracle computes it
    * that way), at O(docs) narrow work + windows over aggregate-sized
    * inputs. Steps 2–4 are [[RankCut.topFlag]] — see there for why the
    * tie cut must be histogram-shaped (a boilerplate corpus collapses
    * every doc onto ONE 6dp score, so the tie group IS the language
    * and both a per-lang rank window and a quota-sized bottom-k heap
    * are corpus-sized). */
  def qualityQuantileFilter(spark: SparkSession, dir: String,
      keep: Double = 0.5, tieBucketShift: Int = 8): DataFrame = {
    // memoized: the (doc_id, lang, score) table feeds three plan
    // branches (threshold aggregate, above-threshold filter, tie
    // ranking) — uncached, each branch would re-tokenize the corpus;
    // materialized once it's a narrow 3-column scan per branch
    val q = Memo.table(spark, dir, "quality_scores") {
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("lang"),
          compositeScore(col("text")).as("score"))
    }
    RankCut.topFlag(q, "lang", "score", "doc_id",
        n => floor(lit(1.0) + lit(keep) * (n - 1)), "kept",
        tieBucketShift)
      .filter(col("kept"))
      .select("lang", "doc_id", "score")
      .orderBy("lang", "doc_id")
  }

  /** THE composite quality score (stopword − punct − digit ratios,
    * 6dp each, 6dp total) — ONE definition shared by
    * [[qualityQuantileFilter]] (over raw text) and
    * [[Curation.curationPipeline]] (over extracted text), so the two
    * cuts can never silently fork; the curation oracle mirrors this
    * exact rounding order. */
  private[graft] def compositeScore(text: Column): Column = {
    val q = T.qualityStruct(text)
    round(round(q.getField("stopword_ratio"), 6) -
      round(q.getField("punct_ratio"), 6) -
      round(q.getField("digit_ratio"), 6), 6)
  }

  /** Token counts: whitespace tokens, distinct tokens, BPE-ish subword
    * estimate. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(T.tokens(col("text"))).cast("long").as("n_tokens"),
        size(array_distinct(T.tokens(col("text")))).cast("long").as("n_distinct"),
        T.bpeishTokenCount(col("text")).cast("long").as("n_bpeish"))
      .orderBy("doc_id")

  /** Corpus term frequencies: top 50 tokens by count (explode → one
    * hash-aggregate shuffle; at 100 TB the same plan with a higher
    * shuffle partition count — no driver-side collection). */
  def termFrequencies(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(explode(T.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(50)

  /** THE per-(doc, term) TF-IDF scoring — tf·ln((N+1)/(df+1)) rounded
    * at 6 BEFORE any ranking or cluster fold, one definition shared by
    * [[tfidfTopTerms]] and [[clusterLabels]] (whose oracles both
    * assume identical scores; a smoothing or rounding tweak applied to
    * one copy would silently desynchronize them). tf feeds both the
    * score join and the df aggregate; the branch IS recomputed (two
    * streaming tokenize scans). Measured: persisting tf here is a wash
    * at sf0.1 and a liability at scale — the (doc, term) table is
    * larger than the corpus, so two cheap streaming scans beat caching
    * it. */
  private def scoredTerms(spark: SparkSession, dir: String): DataFrame = {
    // spread before the tokenize: the tf and df branches each pay the
    // explode+aggregate over this scan, and a single-split source runs
    // both on one core (r17 measurement: 2 × ~300 ms single-task
    // stages); the shared exchange also lets AQE reuse the scan
    val docs = Tables.spread(spark,
      Tables.load(spark, dir, "documents").select("doc_id", "text"),
      col("doc_id"))
    val terms = docs.select(col("doc_id"),
      explode(T.tokens(col("text"))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(total))
      .withColumn("tfidf", round(col("tf") *
        log((col("n") + 1.0) / (col("df") + 1.0)), 6))
  }

  /** TF-IDF top-3 terms per document: term frequencies and document
    * frequencies in two hash aggregates, smoothed idf = ln((N+1)/(df+1)),
    * per-doc top-k window. Ranking is on the ROUNDED score (ties broken
    * by term) so cross-engine libm ulp differences can't flip ranks. */
  def tfidfTopTerms(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    scoredTerms(spark, dir)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("doc_id", "rk", "term", "tfidf")
      .orderBy("doc_id", "rk")
  }

  /** Deterministic uniform sample of 5 docs per language via the custom
    * [[graft.functions.BottomK]] aggregate over md5(content) — O(k)
    * state per group, order-insensitive, mergeable. Null text
    * coalesces to the empty sort key (first in the order — the quota
    * family's discipline; BottomK SKIPS null keys, so a raw null
    * would silently drop the doc from the sample where the window
    * form would rank it first). Oracle mirrors the coalesce. */
  def sampleKPerLang(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy("lang")
      .agg(bottom_k(struct(coalesce(md5(col("text")), lit(""))
        .as("sort_key"), col("doc_id").as("id")), 5).as("sample"))
      .select(col("lang"), explode(col("sample")).as("s"))
      .select(col("lang"), col("s.sort_key").as("sort_key"),
        col("s.id").as("doc_id"))
      // doc_id tiebreak: two exact-duplicate docs share a sort_key, and
      // an ambiguous order would emit them in nondeterministic row
      // order (the sibling quota orders by (key, id) for the same
      // reason — oracle mirrored)
      .orderBy("lang", "sort_key", "doc_id")

  /** Normalization pipeline: lowercase → strip punctuation → collapse
    * whitespace → drop English stopwords — the canonical pre-tokenizer
    * cleanup, all codegen'd string/array expressions. */
  def normalize(spark: SparkSession, dir: String): DataFrame = {
    // the declared single source (the oracle-SQL generator re-emits
    // it) — a second hand-typed copy here could silently drift
    val sw = array(T.stopwords("en").map(lit): _*)
    Tables.load(spark, dir, "documents")
      .withColumn("cleaned",
        trim(regexp_replace(regexp_replace(T.simpleLower(col("text")),
          "[^a-z0-9\\s]", " "), "\\s+", " ")))
      .select(col("doc_id"),
        concat_ws(" ", filter(split(col("cleaned"), " "),
          t => length(t) > 0 && !array_contains(sw, t))).as("normalized"))
      .orderBy("doc_id")
  }

  /** Gopher-style repetition signals: duplicate word-2gram fraction and
    * duplicate-line fraction — high values mark boilerplate/spam docs
    * that LLM corpora drop. */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val grams = T.wordShingles(col("text"), 2)
    val lines = filter(split(col("text"), "\\n"), l => length(trim(l)) > 0)
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        when(size(grams) === 0, 0.0d)
          .otherwise(round(lit(1.0) -
            size(array_distinct(grams)).cast("double") / size(grams), 6))
          .as("dup_2gram_frac"),
        when(size(lines) === 0, 0.0d)
          .otherwise(round(lit(1.0) -
            size(array_distinct(lines)).cast("double") / size(lines), 6))
          .as("dup_line_frac"))
      .orderBy("doc_id")
  }

  /** Token-window document chunking — the "split every document into
    * ~N-token training chunks with overlap" preprocessing step. One
    * narrow projection + one generator: chunk starts are a strided
    * `sequence`, each chunk a `slice` of the let-bound token array (an
    * attribute reference, so the lambda does NOT retokenize per chunk —
    * the HOF-recompute trap). Chunk text leaves as md5 so the row stays
    * narrow; empty docs emit one empty chunk (parity with the oracle's
    * `greatest(len,1)` range). */
  def docChunks(spark: SparkSession, dir: String,
      chunkSize: Int = 64, stride: Int = 48): DataFrame =
    Tables.load(spark, dir, "documents")
      // null text chunks like an empty doc: one (0, 0, md5('')) chunk
      // — total output, no null sha (oracle mirrors the coalesce)
      .select(col("doc_id"),
        coalesce(T.tokens(col("text")), typedlit(Seq.empty[String]))
          .as("ts"))
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(1), greatest(size(col("ts")), lit(1)), lit(stride)),
          i => struct(
            ((i - 1) / stride).cast("long").as("chunk_idx"),
            size(slice(col("ts"), i, lit(chunkSize))).cast("long").as("n_chunk_tokens"),
            md5(concat_ws(" ", slice(col("ts"), i, lit(chunkSize)))).as("chunk_sha"))))
          .as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.n_chunk_tokens"),
        col("c.chunk_sha"))
      .orderBy("doc_id", "chunk_idx")

  /** THE memoized corpus token-frequency table — one definition of the
    * "token-tf" memo (it was built inline, byte-identically, in three
    * places: an edit to one copy would silently change what the shared
    * memo contains depending on which query ran first). */
  private def tokenTf(spark: SparkSession, dir: String): DataFrame =
    Memo.table(spark, dir, "token-tf") {
      Tables.load(spark, dir, "documents")
        .select(explode(T.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("freq"))
    }

  /** Vocabulary coverage — tokenizer-prep telemetry: how much of the
    * corpus the top-k vocabulary covers. Two hash aggregates (term
    * counts, then total), then a top-k BEFORE any global window: the
    * `orderBy().limit(topK)` plans as TakeOrderedAndProject (per-
    * partition heap top-k, merged at the driver — no single-partition
    * sort of the vocabulary, which is billions of distinct tokens at
    * web-corpus scale). The rank/cumulative window then runs over
    * exactly topK rows — bounded by construction, not by hoping the
    * vocab is small. */
  def vocabCoverage(spark: SparkSession, dir: String, topK: Int = 30): DataFrame = {
    // the term-frequency aggregate feeds BOTH branches below (top-k and
    // grand total) — without materialization each branch re-runs the
    // full corpus explode+aggregate, i.e. two streaming scans of the
    // token table. Memoized once per dataset, the branches read the
    // (vocabulary-sized) parquet instead — and any other vocab-prep
    // query in the same run shares it
    val tf = tokenTf(spark, dir)
    val top = tf.orderBy(col("freq").desc, col("token")).limit(topK)
    val w = Window.orderBy(col("freq").desc, col("token"))
    top.crossJoin(broadcast(tf.agg(sum("freq").as("total"))))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_frac",
        round(sum(col("freq")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("double") / col("total"), 6))
      .select("rank", "token", "freq", "cum_frac")
      .orderBy("rank")
  }

  /** Frequent-items sketch over corpus tokens (`approx_top_k` —
    * Spark 4's bounded-memory heavy-hitters aggregate): ONE pass, O(k)
    * state per partial, mergeable — the affordable global top-k when
    * the distinct-token table is too big to fully aggregate. The
    * harness vocabulary fits inside the tracked-item budget, so the
    * sketch degenerates to the exact frequency table and hash-matches
    * the exact oracle; at web-corpus scale the same plan returns
    * estimates within the sketch bound. Re-sorted deterministically
    * after explode (the sketch's own array order is not a contract). */
  def approxTopTerms(spark: SparkSession, dir: String, k: Int = 50): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(explode(T.tokens(col("text"))).as("token"))
      // track 4k items but CUT at k deterministically below: the sketch
      // itself breaks a frequency tie at the boundary arbitrarily, and
      // an arbitrary member of a tie would flip the cross-engine hash
      // against the oracle's (freq DESC, token) order — the wider
      // budget makes the boundary's true tie-group visible so the
      // deterministic cut owns the selection
      .agg(expr(s"approx_top_k(token, ${4 * k})").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("token"), col("e.count").as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(k)

  /** COUNT-MIN frequency sketch — the sketch family's frequency
    * member (Cormode & Muthukrishnan 2005), built the honest
    * distributed way: the sketch IS a (depth × width) counter table
    * produced by ONE hash aggregate over the token stream replicated
    * `depth` ways (4·n narrow rows in, d·w counter rows out — map-side
    * combined, the counter table is the bounded artifact a streaming
    * heavy-hitter pipeline merges across shards by simple addition).
    * Estimates: each probe token reads its `depth` buckets and takes
    * the min — CM never underestimates, so `est >= freq` is a hard
    * invariant the spec and the oracle both see. Probes are the top-30
    * true-frequency tokens (the heavy hitters the sketch exists for);
    * hashes are the cross-engine md5-derived hash60, so DuckDB replays
    * the whole sketch bit-exactly. */
  def countMinFreq(spark: SparkSession, dir: String, depth: Int = 4,
      width: Int = 256, topN: Int = 30): DataFrame = {
    import graft.functions.Hash60.hash60
    // the per-token count relation feeds both the sketch (counter =
    // SUM of member-token frequencies — identical to counting raw
    // occurrences, but the depth-replication fans out over vocabulary
    // rows, not corpus rows) and the heavy-hitter probes — read from
    // the SHARED token-tf memo, never a private corpus re-tokenize
    val tokCounts = tokenTf(spark, dir)
    def bucket(d: org.apache.spark.sql.Column,
        tok: org.apache.spark.sql.Column) =
      pmod(hash60(concat(lit("cm"), d.cast("string"), lit(":"), tok)),
        lit(width.toLong))
    val cm = tokCounts
      .select(col("token"), col("freq"),
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .groupBy(col("d"), bucket(col("d"), col("token")).as("b"))
      .agg(sum(col("freq")).as("c"))
    val probes = tokCounts
      .orderBy(col("freq").desc, col("token")).limit(topN)
    probes
      .select(col("token"), col("freq"),
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .withColumn("b", bucket(col("d"), col("token")))
      .join(cm, Seq("d", "b"))
      .groupBy("token", "freq")
      .agg(min(col("c")).as("est"))
      .select(col("token"), col("freq"), col("est"),
        (col("est") - col("freq")).as("overestimate"))
      .orderBy(col("freq").desc, col("token"))
  }

  /** PII redaction — the scrub-before-training corpus step: emails,
    * IPv4s and phone-ish digit runs replaced by typed placeholder
    * tokens (in that order — the chain is deterministic), with
    * per-category counts taken from the ORIGINAL text. All codegen'd
    * regexp expressions, a pure narrow map; the patterns are chosen to
    * behave identically under Java regex (Spark) and RE2 (DuckDB), so
    * the redacted text is hash-checked cross-engine. The redacted text
    * leaves as md5 to keep the result row narrow. */
  def redactPii(spark: SparkSession, dir: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val phone = "\\+?\\d[\\d ()-]{7,}\\d"
    val redacted = regexp_replace(regexp_replace(regexp_replace(col("text"),
      email, "<EMAIL>"), ip, "<IP>"), phone, "<PHONE>")
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(email), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"), lit(ip), lit(0)))
          .cast("long").as("n_ips"),
        size(regexp_extract_all(col("text"), lit(phone), lit(0)))
          .cast("long").as("n_phones"),
        md5(redacted).as("redacted_sha"))
      .orderBy("doc_id")
  }

  /** Unigram language-model document scoring — the KenLM-lite quality
    * signal: score each document by the mean log-probability of its
    * tokens under the corpus unigram distribution. Gibberish and
    * boilerplate-free rare-token soup score low; fluent text built from
    * common tokens scores high. The classic cheap perplexity proxy for
    * corpus filtering.
    *
    * Shape: the corpus term-frequency table is the SAME memoized
    * `token-tf` table [[vocabCoverage]] builds (one corpus tokenize per
    * dataset, shared across every vocab-prep query); the vocabulary
    * total is a broadcast scalar; scoring is one token explode, one
    * hash join on the token (every token hits — the model was trained
    * on this corpus), one per-doc aggregate. Mean is computed on the
    * rounded per-token logprob so cross-engine libm/summation ulp
    * differences cannot move the 6-decimal result. */
  def unigramLogprob(spark: SparkSession, dir: String): DataFrame = {
    val tf = tokenTf(spark, dir)
    val total = tf.agg(sum("freq").as("total"))
    val docs = Tables.load(spark, dir, "documents")
    val perDoc = docs
      .select(col("doc_id"), explode(T.tokens(col("text"))).as("token"))
      .join(tf, "token")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        // summed through decimal: the round-8 terms are exact decimals,
        // so the sum is order-free (a raw double sum depends on the
        // partial-aggregate merge order — clusterLabels' discipline)
        graft.functions.DecimalConv.decSumStr(
          round(log(col("freq").cast("double") / col("total")), 8))
          .as("s"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        // RAW quotient — round-6 of (scale-8 grid sum / n) lands
        // EXACTLY on the half boundary whenever n divides the unscaled
        // sum (the dsir hugedoc-gate class); the raw IEEE quotient of
        // deterministic doubles never forks
        when(coalesce(col("n_tokens"), lit(0L)) === 0, 0.0d)
          .otherwise(col("s") / col("n_tokens")).as("avg_logprob"))
      .orderBy("doc_id")
  }

  /** Harness query `bigram_logprob`: bigram language-model fluency
    * scoring — avg log P(w_i | w_{i-1}) with add-one smoothing,
    * P = (c(w1 w2) + 1) / (c(w1) + V) — the KenLM-style filter a
    * training pipeline runs after the unigram pass (a doc of real words
    * in scrambled order scores well on unigrams but poorly here).
    *
    * Shape: the bigram table memoizes next to the shared `token-tf`
    * memo (one extra corpus shingle pass per dataset); scoring is one
    * shingle explode, two hash joins (bigram count, left-token count),
    * a broadcast vocab scalar, one per-doc aggregate. Same rounding
    * discipline as [[unigramLogprob]] (round per-bigram logprob to 8
    * before the sum, mean on the rounded sum) so the cross-engine hash
    * holds. */
  def bigramLogprob(spark: SparkSession, dir: String): DataFrame = {
    val tf = tokenTf(spark, dir)
    val bf = Memo.table(spark, dir, "bigram-tf") {
      Tables.load(spark, dir, "documents")
        .select(explode(T.wordShingles(col("text"), 2)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("bfreq"))
    }
    val vocab = tf.agg(count(lit(1)).as("v"))
    val docs = Tables.load(spark, dir, "documents")
    val perDoc = docs
      .select(col("doc_id"), explode(T.wordShingles(col("text"), 2)).as("bigram"))
      .join(bf, "bigram")
      // tokens contain no whitespace (the tokenizer splits on it), so
      // the bigram's left token is everything before the separator
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .join(tf.select(col("token").as("w1"), col("freq")), "w1")
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        // decimal-exact sum, as in unigramLogprob
        graft.functions.DecimalConv.decSumStr(
          round(log((col("bfreq") + 1).cast("double") /
            (col("freq") + col("v")).cast("double")), 8)).as("s"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        // RAW quotient — same grid-sum/n boundary class as
        // unigramLogprob
        when(coalesce(col("n_bigrams"), lit(0L)) === 0, 0.0d)
          .otherwise(col("s") / col("n_bigrams")).as("avg_logprob"))
      .orderBy("doc_id")
  }

  /** Document fingerprints: order-invariant md5 fingerprint (detects
    * "same content, shuffled tokens" duplicates) plus the order-
    * SENSITIVE Rabin-Karp rolling hash — both cross-engine (md5-based),
    * both oracle-checked. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      // null text fingerprints as the empty doc (fp = md5(''), rhash =
      // 0) — a raw null yields the half-null (md5(''), null) row the
      // oracle can't reproduce
      .select(col("doc_id"),
        T.fingerprint(coalesce(col("text"), lit(""))).as("fp"),
        T.rollingHash(coalesce(col("text"), lit(""))).as("rhash"))
      .orderBy("doc_id")

  // ============ unigram-LM (SentencePiece-style) tokenizer =============

  /** Unigram-LM tokenizer hyper-parameters. Words longer than
    * [[UlmMaxWord]] codepoints bypass the model as single OOV pieces —
    * the SentencePiece discipline (it caps candidate/sentence-piece
    * length the same way), and what keeps the Viterbi DP O(maxWord²)
    * per distinct word instead of O(len²) on a hugedoc 50k-char
    * token. */
  val UlmMaxWord = 64
  val UlmMaxPiece = 4
  val UlmVocabSize = 512

  /** Candidate-piece table: every char 1..[[UlmMaxPiece]]-gram of every
    * eligible DISTINCT word, occurrence-weighted by word frequency —
    * the top-[[UlmVocabSize]] by (freq DESC, piece) plus ALL single
    * chars (the coverage floor: every eligible word must have a
    * segmentation path). Vocab-bounded everywhere after the one corpus
    * word-count aggregate. */
  /** The distinct-word table IS the shared token-tf memo (one corpus
    * aggregate, one owner — the tokenTf dedup rule). */
  private def ulmWords(spark: SparkSession, dir: String): DataFrame =
    tokenTf(spark, dir).select(col("token").as("word"), col("freq"))

  private def ulmVocab0(spark: SparkSession, dir: String): DataFrame =
    Memo.table(spark, dir, s"ulm_vocab0_${UlmVocabSize}_$UlmMaxPiece") {
      val elig = ulmWords(spark, dir)
        .filter(length(col("word")) <= UlmMaxWord)
      val pieces = (1 to UlmMaxPiece).map { n =>
        elig.select(col("freq"),
          explode(graft.functions.CharNgrams.charNgrams(col("word"), n))
            .as("piece"))
      }.reduce(_ unionByName _)
        .groupBy("piece").agg(sum(col("freq")).as("pfreq"))
      val top = pieces
        .orderBy(col("pfreq").desc, col("piece")).limit(UlmVocabSize)
      val singles = pieces.filter(length(col("piece")) === 1)
      top.unionByName(singles).distinct()
    }

  /** One EM round's M-step: piece scores from segmentation counts,
    * add-one smoothed over the fixed vocab (a zero-count piece stays
    * finite instead of being pruned — the simplest valid M-step; the
    * ln + round-8 is the unigram_logprob discipline). */
  private def ulmScores(vocab: DataFrame, counts: DataFrame): DataFrame = {
    val joined = vocab.join(counts, Seq("piece"), "left")
      .select(col("piece"), col("pfreq"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val tot = joined.agg(sum(col("cnt")).as("tot"),
      count(lit(1)).as("nv"))
    joined.crossJoin(broadcast(tot))
      .select(col("piece"), col("pfreq"), col("cnt"),
        round(log((col("cnt") + 1L).cast("double") /
          (col("tot") + col("nv")).cast("double")), 8).as("s"))
  }

  /** Viterbi best segmentation of one word under a piece-score map —
    * max total score, ties prefer the LONGER last piece (the oracle's
    * struct-max order). Every char of an eligible word is in the
    * vocab (singles floor), so a path always exists. */
  private def ulmViterbi(w: String, score: collection.Map[String, Double])
      : Array[String] = {
    val syms = codepointSyms(w)
    val n = syms.length
    val best = Array.fill(n + 1)(0.0)
    val bl = Array.fill(n + 1)(0)
    var i = 1
    while (i <= n) {
      var chosen = Double.NegativeInfinity
      var chosenL = 0
      var l = 1
      while (l <= math.min(UlmMaxPiece, i)) {
        score.get(syms.slice(i - l, i).mkString) match {
          case Some(s) =>
            val cand = best(i - l) + s
            if (cand > chosen || (cand == chosen && l > chosenL)) {
              chosen = cand; chosenL = l
            }
          case None =>
        }
        l += 1
      }
      // the single-char coverage floor guarantees an l=1 hit for every
      // eligible word; if a future vocab change breaks that invariant,
      // fail LOUDLY here — bl(j)=0 in the backtrace would spin the
      // executor forever (a model bug must be an exception, not a hang)
      require(chosenL > 0,
        s"ulmViterbi: no vocab piece covers position $i of word " +
          s"'${syms.mkString}' — single-char coverage floor violated")
      best(i) = chosen; bl(i) = chosenL
      i += 1
    }
    val out = List.newBuilder[String]
    var j = n
    val rev = List.newBuilder[(Int, Int)]
    while (j > 0) { rev += ((j - bl(j), j)); j -= bl(j) }
    rev.result().reverse.foreach { case (a, b) =>
      out += syms.slice(a, b).mkString }
    out.result().toArray
  }

  /** Segment every eligible distinct word under `scores` (driver-
    * collected — the vocab is a bounded artifact, ≤ UlmVocabSize +
    * alphabet rows, the same round-trip the BPE trainer does with its
    * merge table) and return per-piece usage counts weighted by word
    * freq. */
  private def ulmSegCounts(spark: SparkSession, dir: String,
      scores: DataFrame): DataFrame = {
    import spark.implicits._
    val sm = scores.select("piece", "s").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    ulmWords(spark, dir)
      .filter(length(col("word")) <= UlmMaxWord)
      .select("word", "freq").as[(String, Long)]
      .mapPartitions(_.flatMap { case (w, f) =>
        ulmViterbi(w, sm).map(p => (p, f)) })
      .toDF("piece", "f")
      .groupBy("piece").agg(sum(col("f")).as("cnt"))
  }

  /** Harness query `ulm_vocab`: unigram-LM tokenizer TRAINING
    * (Kudo 2018, the SentencePiece unigram model) — candidate pieces
    * from char n-grams of the distinct-word table, initial scores
    * ln(freq/total), then one Viterbi-EM round: E-step = Viterbi-best
    * segmentation of every eligible word under the current scores
    * (exact DP, not greedy), M-step = re-estimated piece scores from
    * usage counts. The second real-world tokenizer-training family
    * next to BPE ([[bpeMergesVocab]]); every round is vocab-bounded —
    * the corpus is touched once (the word-count aggregate).
    *
    * Output: the trained table (piece, pfreq, cnt, score). The DuckDB
    * oracle replays candidate selection, both score tables and the
    * full Viterbi DP per word (sliding-window recursive CTE +
    * backtrace walk) bit-exactly. */
  def ulmVocab(spark: SparkSession, dir: String): DataFrame =
    Memo.table(spark, dir, s"ulm_trained_${UlmVocabSize}_$UlmMaxPiece") {
      val vocab = ulmVocab0(spark, dir)
      val tot0 = vocab.agg(sum(col("pfreq")).as("tot"))
      val score0 = vocab.crossJoin(broadcast(tot0))
        .select(col("piece"), col("pfreq"),
          round(log(col("pfreq").cast("double") /
            col("tot").cast("double")), 8).as("s"))
      ulmScores(vocab, ulmSegCounts(spark, dir, score0))
    }.orderBy("piece")

  /** Harness query `ulm_encode`: tokenize the corpus under the trained
    * unigram LM — each eligible DISTINCT word Viterbi-segments once
    * under the EM-round scores, OOV words (> [[UlmMaxWord]] cp) pass
    * through as single pieces, and one join maps the positional token
    * stream onto the per-word encodings ([[bpeEncodeVocab]]'s shape:
    * the only corpus-sized steps are the tokenize and the final
    * per-doc aggregate). Fingerprint = hash60 of the length-prefixed
    * piece stream in document order. */
  def ulmEncode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sm = ulmVocab(spark, dir).select("piece", "s").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val wordEnc = ulmWords(spark, dir)
      .select("word").as[String]
      .mapPartitions(_.map { w =>
        val syms = codepointSyms(w)
        val ps = if (syms.length > UlmMaxWord) Array(w)
          else ulmViterbi(w, sm)
        (w, syms.length.toLong, ps.length.toLong,
          ps.map(p => s"${p.codePointCount(0, p.length)}:$p").mkString(""))
      })
      .toDF("word", "n_chars", "n_pieces", "enc")
    val perDoc = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), posexplode(T.tokens(col("text")))
        .as(Seq("pos", "word")))
      .join(wordEnc, "word")
      .groupBy("doc_id")
      .agg(sum(col("n_chars")).as("n_raw"),
        sum(col("n_pieces")).as("n_tokens"),
        graft.functions.Hash60.hash60(concat_ws("",
          transform(array_sort(collect_list(struct(col("pos"), col("enc")))),
            e => e.getField("enc")))).as("enc_h"))
    Tables.load(spark, dir, "documents").select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_raw"), lit(0L)).as("n_raw"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("enc_h"),
          graft.functions.Hash60.hash60(lit(""))).as("enc_h"))
      .orderBy("doc_id")
  }

  // ================= learned quality classifier (linear probe) =========

  /** Hashed feature width for the quality probe. Widened 64 → 128 in
    * r17 along with the unigram→unigram+bigram feature upgrade: at 64
    * unigram buckets the probe's kept-set precision at 100× was a
    * 1.12× lift over the base rate — collision-saturated features
    * barely separated the corpus. */
  val QcBuckets = 128L

  /** GD hyper-parameters as exact decimal-string literals (both
    * engines parse the identical doubles). */
  val QcEta = "0.5"
  val QcIters = 4

  /** Per-doc hashed n-gram features x = tf/n_features plus a constant
    * bias feature at bucket [[QcBuckets]] for EVERY doc (so token-less
    * docs still score). The feature family is the DSIR map
    * ([[graft.operators.Sampling]]): unigrams + word bigrams, hashed
    * with multiplicity — bigrams carry the source-distinctive
    * collocations a unigram bag at this width collision-blurs (the
    * fastText recipe: word + bigram features) — PLUS one DENSE
    * feature at bucket [[QcBuckets]]+1: the doc's DSIR average
    * log-importance-ratio against the full-width (1024-bucket) LM
    * fit ([[graft.operators.Sampling.dsirAvgLogratioAll]]). Hashing
    * 900+ distinct n-grams into 128 buckets averages ~7 features per
    * bucket, blurring most of the per-n-gram signal toward the base
    * rate; the ratio feature carries the UNBLURRED aggregate (the
    * CCNet stacking move: LM score as a classifier feature) at the
    * cost of one extra row per doc instead of an 8× wider GD.
    * Memoized per dataset — iterative GD re-reads the feature matrix
    * every round (the standard persist-the-training-set
    * discipline). */
  private def qcFeatures(spark: SparkSession, dir: String): DataFrame =
    Memo.table(spark, dir, s"qc_feats_ubd_$QcBuckets") {
      val docs = Tables.load(spark, dir, "documents")
      val toks = docs
        .select(col("doc_id"),
          concat(T.tokens(col("text")),
            T.wordShingles(col("text"), 2)).as("fs"))
        .select(col("doc_id"), explode(col("fs")).as("token"),
          size(col("fs")).as("nt"))
        .groupBy(col("doc_id"),
          pmod(graft.functions.Hash60.hash60(
            concat(lit("qc:"), col("token"))), lit(QcBuckets)).as("b"))
        // exact integer ratio: one deterministic IEEE division
        .agg((count(lit(1)).cast("double") /
          first(col("nt")).cast("double")).as("x"))
      val bias = docs.select(col("doc_id"), lit(QcBuckets).as("b"),
        lit(1.0d).as("x"))
      val dense = Sampling.dsirAvgLogratioAll(spark, dir)
        .select(col("doc_id"), lit(QcBuckets + 1L).as("b"),
          col("alr").as("x"))
      toks.unionByName(bias).unionByName(dense)
    }

  /** Harness query `quality_classifier`: a LEARNED quality filter — a
    * linear probe over hashed bag-of-words features trained by
    * full-batch gradient descent to recognize curated-source text
    * (label = source ∈ [[Sampling.DsirTargets]]), then scoring every
    * document — the fastText-style classifier step of a CCNet/GPT-3
    * quality pipeline, the learned counterpart of
    * [[graft.operators.Sampling.dsirWeighted]]'s LM-ratio filter.
    *
    * The squashing link is the RATIONAL sigmoid
    * σ(z) = 0.5 + z/(2(1+|z|)) (Elliott), not exp's logistic: a
    * measured 0.25% of doubles get a different bit pattern from JVM
    * `Math.exp` vs the oracle engine's libm exp, and GD amplifies any
    * single forked probability into forked weights (the Lloyd-fork
    * class) — the rational link is +,·,/,|·| only, so training is
    * cross-engine deterministic BY CONSTRUCTION, not by measure.
    *
    * Determinism: per-doc scores and per-bucket gradients sum their
    * products through the EXACT-expansion decimal hop
    * ([[graft.functions.DecimalConv.decSumExact]] — order-proof, no
    * repr algorithm in the loop); the weight update is raw IEEE ops on
    * those deterministic images, so every iteration is bit-identical
    * cross-engine with no rounding grid anywhere in training (a
    * round-k pre-sum hop forks at ~ulp/10^-k per value — 4M values per
    * sf0.1 training run would expect dozens of forks). 100 TB shape: per
    * iteration ONE pass over the memoized feature matrix joined with
    * the broadcast (QcBuckets+1)-row weight table — a per-doc
    * aggregate (map-side combined), a join back for the residual, and
    * a per-bucket aggregate onto a bounded group set; the weight
    * table round-trips through the driver as 65 doubles (the same
    * bounded-artifact round-trip every distributed GD/BPE trainer
    * does). */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame =
    qcScored(spark, dir).orderBy("doc_id")

  /** Trained + scored corpus, memoized per dataset: TWO harness
    * consumers ([[qualityClassifier]]'s prior-calibrated cut and
    * [[qualityClassifierFrac]]'s kept-fraction cut) would otherwise
    * each re-run the full [[QcIters]]-round GD training. */
  private def qcScored(spark: SparkSession, dir: String): DataFrame =
    Memo.table(spark, dir, s"qc_scored_ubd_${QcBuckets}_$QcIters") {
      qcScoredUncached(spark, dir)
    }

  private def qcScoredUncached(spark: SparkSession,
      dir: String): DataFrame = {
    import graft.functions.DecimalConv.decSumExact
    val docs = Tables.load(spark, dir, "documents")
    val labels = docs.select(col("doc_id"),
      when(coalesce(col("source")
        .isin(Sampling.DsirTargets: _*), lit(false)), 1.0d)
        .otherwise(0.0d).as("y"))
    // ONE driver action for both scalars GD needs (r14 hygiene: n
    // used to be a separate docs.count()): n and the positive count —
    // both exact integers in doubles (< 2^53), so the base rate p is
    // one deterministic IEEE divide on both engines
    val cnt = labels.agg(count(lit(1)).cast("double").as("n"),
      sum(col("y")).as("npos")).collect()(0)
    val n = cnt.getDouble(0)
    val nPos = cnt.getDouble(1)
    // bias init at the base-rate PRIOR under the Elliott link — the
    // z with σ(z) = p, i.e. (2p−1)/(2(1−p)) for p ≥ 0.5 and
    // (2p−1)/(2p) below (the rational-link counterpart of fastText's
    // log-odds bias init). From w = 0 on an imbalanced corpus, GD
    // spends its few full-batch rounds re-learning the class prior
    // through the bias instead of separating features (the r14 100×
    // finding: 15%-positive corpora predicted all-negative); starting
    // at the prior leaves every round to the feature weights. Each
    // step is one IEEE op in a fixed order, replayed verbatim by the
    // oracle — a deterministic function of two exact counts.
    val p = nPos / n
    val bias0 =
      if (n == 0.0 || nPos == 0.0 || nPos == n) 0.0
      else if (p >= 0.5) (2.0 * p - 1.0) / (2.0 * (1.0 - p))
      else (2.0 * p - 1.0) / (2.0 * p)
    val feats = qcFeatures(spark, dir)
    val eta = lit(QcEta.toDouble)
    def sigma(z: Column): Column =
      lit(0.5d) + z / (lit(2.0d) * (lit(1.0d) + abs(z)))
    def scores(w: DataFrame): DataFrame =
      feats.join(broadcast(w), "b")
        .groupBy("doc_id")
        .agg(decSumExact(col("w") * col("x")).as("z"))
    // weights: QcBuckets hashed n-gram buckets + bias (at QcBuckets,
    // initialized to the base-rate prior) + the dense DSIR-ratio
    // feature (at QcBuckets+1, initialized to 0 like the n-grams)
    var w = spark.range(0L, QcBuckets + 2L)
      .select(col("id").as("b"),
        when(col("id") === QcBuckets, lit(bias0))
          .otherwise(lit(0.0d)).as("w"))
    for (_ <- 1 to QcIters) {
      val p = scores(w).join(labels, "doc_id")
        .select(col("doc_id"), (sigma(col("z")) - col("y")).as("resid"))
      val grad = feats.join(p, "doc_id")
        .groupBy("b")
        .agg(decSumExact(col("resid") * col("x")).as("g"))
      w = w.join(grad, Seq("b"), "left")
        .select(col("b"), (col("w") -
          eta * (coalesce(col("g"), lit(0.0d)) / lit(n)))
          .as("w"))
        // 65 rows — truncate the lineage so iteration t+1's plan does
        // not re-derive every earlier round
        .localCheckpoint()
    }
    scores(w).join(labels, "doc_id")
      .select(col("doc_id"), col("y").cast("int").as("label_curated"),
        round(col("z"), 6).as("score"),
        round(sigma(col("z")), 6).as("prob"),
        // decision threshold CALIBRATED at the base rate: predict
        // curated iff σ(z) ≥ p ⟺ z ≥ bias0 (σ monotone, σ(bias0)=p)
        // — "scores above the unconditional prior", the standard
        // imbalance calibration; at p = 0.5 this is the old z ≥ 0.
        // The r14 z ≥ 0 cut was degenerate (all-negative) on any
        // realistically imbalanced corpus.
        (col("z") >= lit(bias0)).as("predicted"))
  }

  /** Keep fraction of [[qualityClassifierFrac]]'s selection — a
    * precision-oriented cut at the fixture's 15% curated base rate. */
  val QcKeepFrac = 0.15

  /** Harness query `quality_classifier_frac`: the PRODUCTION
    * calibration mode of the learned quality filter — keep a target
    * FRACTION of the corpus by classifier score (rank semantics
    * ⌊1 + frac·(n−1)⌋ over (score DESC, doc_id), the
    * [[qualityQuantileFilter]] convention) instead of the
    * unconditional-prior cut [[qualityClassifier]] defaults to. The
    * prior cut answers "scores above the base rate" — recall-heavy by
    * design (r15: 60% flagged at a 15% base rate); a CCNet/GPT-3-style
    * curation run selects a kept budget, which is exactly this
    * threshold. Rides [[RankCut.topFlag]] over the memoized scored
    * corpus — window-free at corpus scale, training runs ONCE for
    * both calibration modes. */
  def qualityClassifierFrac(spark: SparkSession, dir: String,
      frac: Double = QcKeepFrac): DataFrame = {
    val scored = qcScored(spark, dir)
      .select(col("doc_id"), col("label_curated"), col("score"))
    RankCut.topFlag(scored.withColumn("g", lit(0)), "g", "score",
        "doc_id", n => floor(lit(1.0) + lit(frac) * (n - 1)), "kept")
      .select("doc_id", "label_curated", "score", "kept")
      .orderBy("doc_id")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Composition semantics of the end-to-end curation pipeline:
  * extract → langid → per-language quality cut → extracted-content
  * dedup → manifest. Pins the stage interactions no single-operator
  * spec sees: the quality cut law per PREDICTED language, and dedup
  * over EXTRACTED text grouping pages that differ only in
  * boilerplate. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixture(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("curation").toString
    rows.map { case (id, t, lang) => (id, t, lang, "web", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("quality cut holds per predicted language, dedup groups " +
      "boilerplate-only variants, selected = kept AND keeper") {
    // two docs with IDENTICAL text at different ids (≠ mod 17 ≡ 3):
    // their synthesized pages differ (header/nav ids) but the
    // EXTRACTED text is identical → one dedup group, min-id keeper.
    val en = "the cat and the dog walk to the park and it is fine " +
      "that they do for the day is long and the sun is up"
    val de = "der hund und die katze ist von zu mit den ein der die " +
      "das und ist von zu mit den ein der die das und ist von"
    val rows = Seq(
      (0L, en, "en"), (21L, en, "en"),      // exact extracted dup pair
      (1L, en + " extra words here", "en"),
      (2L, "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20 21 " +
        "22 23 24 25 26 27", "en"),          // digit-heavy: low score
      (5L, de, "de"), (7L, de + " mehr text hier dazu", "de"))
    val dir = fixture(rows)
    try {
      val out = graft.operators.Curation.curationPipeline(spark, dir)
        .collect().map(r => r.getLong(0) -> r).toMap
      assert(out.size == rows.size)
      // per-PREDICTED-language kept law: k = floor(1 + 0.5(n-1))
      val byLang = out.values.groupBy(_.getString(1))
      byLang.foreach { case (lang, docs) =>
        val n = docs.size
        val k = math.floor(1.0 + 0.5 * (n - 1)).toLong
        assert(docs.count(_.getBoolean(3)) == k,
          s"lang $lang kept ${docs.count(_.getBoolean(3))}, want $k")
      }
      // the identical-text pair: same fingerprint → if both kept, only
      // the min id is keeper; 21 can never be keeper while 0 is kept
      if (out(0L).getBoolean(3) && out(21L).getBoolean(3)) {
        assert(out(0L).getBoolean(4), "min-id dup must be the keeper")
        assert(!out(21L).getBoolean(4), "non-min dup must not keep")
      }
      // selected ≡ dedup_keeper AND split = 'train' (the training-
      // selection verdict — val/test keepers stay unselected), and
      // keeper ⇒ kept
      out.values.foreach { r =>
        assert(r.getBoolean(6) ==
          (r.getBoolean(4) && r.getString(5) == "train"))
        assert(!r.getBoolean(4) || r.getBoolean(3))
      }
      // split is the 90/5/5 hash label — a pure function of doc_id
      out.values.foreach { r =>
        assert(Set("train", "val", "test").contains(r.getString(5))) }
      // deterministic replay
      val again = graft.operators.Curation.curationPipeline(spark, dir)
        .collect().map(r => r.getLong(0) -> r.toString).toMap
      out.foreach { case (id, r) => assert(again(id) == r.toString) }
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("near-dup manifest clusters NON-identical extracted text and " +
      "picks the QUALITY-aware keeper, not the min id") {
    // EXACTLY 24 tokens = two full ≥25-char paragraphs in the page
    // frame (a trailing short paragraph would be dropped by the
    // length rule and silently re-identify the pair)
    val en = "the cat and the dog walk to the park and it is fine " +
      "that they do for the day is long and the sun"
    val para1 = "the cat and the dog walk to the park and it is"
    val rows = Seq(
      // near-dup pair: doc 21 re-appends the first paragraph —
      // different fingerprint (exact dedup would NOT group them),
      // shingle jaccard ≈ 0.92, and a strictly HIGHER stopword-ratio
      // score (the repeated paragraph is stopword-denser than the
      // average)
      (0L, en, "en"), (21L, en + " " + para1, "en"),
      // far-away en doc: pads the en group to n=3 so k=2 keeps BOTH
      // pair members — the keeper choice then separates quality-aware
      // (21) from min-id (0)
      (8L, "a cat walks alone to a quiet park while birds sing " +
        "songs of morning in a tree", "en"),
      (5L, "der hund und die katze ist von zu mit den ein der die " +
        "das und ist von zu mit den ein der die das und ist von", "de"))
    val dir = fixture(rows)
    try {
      val out = graft.operators.Curation
        .curationPipelineNearDup(spark, dir)
        .collect().map(r => r.getLong(0) -> r).toMap
      assert(out.size == rows.size)
      // the near-dup pair lands in ONE cluster (min-id component)
      assert(out(0L).getLong(4) == out(21L).getLong(4))
      // singletons resolve to their own id
      assert(out(8L).getLong(4) == 8L && out(5L).getLong(4) == 5L)
      // en kept law: n=3 → k=2 (docs 0 and 21; the sparse-stopword
      // doc 8 scores lowest) — and the keeper is the HIGHER-scoring
      // member 21, which a min-id policy would never pick
      assert(out(0L).getBoolean(3) && out(21L).getBoolean(3))
      assert(out(21L).getBoolean(5), "best-quality member must keep")
      assert(!out(0L).getBoolean(5), "min-id member must NOT keep")
      // laws: keeper ⇒ kept; selected ≡ keeper AND split = 'train'
      out.values.foreach { r =>
        assert(!r.getBoolean(5) || r.getBoolean(3))
        assert(r.getBoolean(7) ==
          (r.getBoolean(5) && r.getString(6) == "train"))
      }
      // deterministic replay
      val again = graft.operators.Curation
        .curationPipelineNearDup(spark, dir)
        .collect().map(r => r.getLong(0) -> r.toString).toMap
      out.foreach { case (id, r) => assert(again(id) == r.toString) }
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }
}

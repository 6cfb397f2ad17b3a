package graft

import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture behavior of the HTML main-content extractor:
  * boilerplate (nav/ad/footer) never classifies as content, real
  * paragraphs do, null text yields an all-boilerplate shell, and the
  * deterministic ¾-truncation (doc_id ≡ 3 mod 17) loses content. */
class HtmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixture(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("html").toString
    rows.map { case (id, t) => (id, t, "en", "web", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("extractor keeps paragraphs, drops nav/ad/footer, survives " +
      "null text and truncated markup") {
    val longText = (1 to 60).map(i => s"word$i content").mkString(" ")
    val dir = fixture(Seq(
      0L -> longText,            // untruncated, plenty of content
      3L -> longText,            // 3 % 17 == 3 → ¾-truncated page
      21L -> longText,           // same text, NOT truncated (21%17=4)
      10L -> null.asInstanceOf[String], // all-boilerplate shell
      // truncation × empty-page interaction (the r15 oracle-fork
      // class: a zero-token page one byte shorter on either engine
      // cuts at a forked offset) — 1006 ≡ 3 (mod 17)
      1006L -> null.asInstanceOf[String],
      11L -> "tiny"))            // sub-threshold paragraph
    try {
      val rows = graft.operators.Html.htmlExtract(spark, dir).collect()
        .map(r => r.getLong(0) -> r).toMap
      // long doc: 120 tokens → 10 paragraphs, all ≥ 25 chars → content
      assert(rows(0L).getLong(2) == 10L,
        s"doc 0 n_content = ${rows(0L).getLong(2)}")
      // boilerplate always present (header/nav/ad/footer blocks)
      assert(rows.values.forall(_.getLong(4) > 0L),
        "some doc lost its boilerplate chars")
      // null text: shell page only — zero content blocks, blocks exist
      assert(rows(10L).getLong(2) == 0L && rows(10L).getLong(1) > 0L,
        s"null-text doc: ${rows(10L)}")
      // truncated null-text shell: still zero content, still has
      // boilerplate (the r15 fork class — the VALUE is pinned
      // cross-engine by the verify gate; here pin the shape)
      assert(rows(1006L).getLong(2) == 0L && rows(1006L).getLong(4) > 0L,
        s"truncated null-text doc: ${rows(1006L)}")
      // sub-threshold paragraph is not content
      assert(rows(11L).getLong(2) == 0L, s"tiny doc: ${rows(11L)}")
      // truncation really cut content: same text, fewer content chars
      assert(rows(3L).getLong(3) < rows(21L).getLong(3),
        s"truncated ${rows(3L).getLong(3)} !< full ${rows(21L).getLong(3)}")
      // identical text+shape ⟹ identical extraction fingerprint: docs
      // 0 and 21 differ only in header/nav ids (boilerplate)
      assert(rows(0L).getLong(5) == rows(21L).getLong(5),
        "extract fingerprint should depend on content only")
      // deterministic replay
      val again = graft.operators.Html.htmlExtract(spark, dir).collect()
        .map(r => r.getLong(0) -> r.toString).toMap
      rows.foreach { case (id, r) => assert(again(id) == r.toString) }

      // stats twin reconciles with the per-doc totals
      val st = graft.operators.Html.htmlBoilerplateStats(spark, dir)
        .collect()
      assert(st.length == 1 && st.head.getString(0) == "web")
      assert(st.head.getLong(1) == 6L)
      assert(st.head.getLong(2) == rows.values.map(_.getLong(3)).sum)
      assert(st.head.getLong(3) == rows.values.map(_.getLong(4)).sum)
      val frac = st.head.getDouble(4)
      assert(frac > 0.0 && frac < 1.0, s"boiler_frac $frac")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("script/style bodies and comments contribute ZERO chars, and a " +
      "closing tag inside a JS string does not fork segmentation") {
    import spark.implicits._
    // the public seam on a REAL html column — no synthesized frame.
    // The script body is long (> MinBlockChars after tag-strip) and
    // contains a literal "</div>": without scrub it would (a) count
    // as content and (b) split the page into extra blocks.
    val para = (1 to 30).map(i => s"tok$i real").mkString(" ")
    val html =
      s"""<html><body><script>var x = "</div> long analytics payload
         |beacon tracker string well over the block threshold";
         |</script><style>.a { color: blue; margin: 12px auto; }
         |</style><!-- template comment that is itself quite long
         |over threshold --><p>$para</p></body></html>""".stripMargin
    val df = Seq(html, // closed forms
      // truncated page: unclosed script drops to end-of-page
      s"""<p>$para</p><script>var y = "unclosed body $para""")
      .toDF("html")
      .select(graft.operators.Html.extract(org.apache.spark.sql
        .functions.col("html")).as("txt"))
    val out = df.collect().map(_.getString(0))
    assert(out(0) == para.trim,
      s"closed scrub: got '${out(0)}'")
    assert(out(1) == para.trim,
      s"unclosed script should drop to EOF: got '${out(1)}'")

    // case handling is EXPLICIT ASCII classes, not (?i): uppercase
    // <SCRIPT> scrubs; a Unicode-fold lookalike <ſcript> (long s
    // U+017F, which RE2's (?i) would fold to 's' but Java's would
    // not) must NOT scrub on either engine — its body survives as
    // text. This pins the deliberate ASCII-only fold so the two
    // engines can never diverge on it.
    val caseDf = Seq(
      s"<SCRIPT>var up = 1; twenty plus chars of js</SCRIPT><p>$para</p>",
      s"<ſcript>body stays</ſcript> <p>$para</p>")
      .toDF("html")
      .select(graft.operators.Html.extract(org.apache.spark.sql
        .functions.col("html")).as("txt"))
    val caseOut = caseDf.collect().map(_.getString(0))
    assert(caseOut(0) == para.trim,
      s"uppercase <SCRIPT> must scrub: got '${caseOut(0)}'")
    assert(caseOut(1).contains("body stays"),
      s"U+017F lookalike tag must NOT scrub: got '${caseOut(1)}'")
  }

  test("hostile markup through the public seam: quoted-attribute '>' " +
      "truncates the tag strip, uppercase anchors evade link density, " +
      "entities stay literal") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val para = (1 to 30).map(i => s"tok$i real").mkString(" ")
    val df = Seq(
      // '>' inside a quoted attribute: the quote-blind <[^>]*> strip
      // ends at the attr's '>' — the remainder (7">) leaks into the
      // block text. DOCUMENTED cost of regex-class stripping; the
      // hostile oracle family hash-pins it cross-engine every run.
      s"""<div title="a > b 7"><p>$para</p></div>""",
      // uppercase <A> evades the lowercase '<a ' link capture: a
      // long all-link paragraph classifies as CONTENT (ll = 0)
      s"""<p><A HREF="/x">$para</A></p>""",
      // entity references are never decoded
      s"<p>$para &amp; &gt; more</p>")
      .toDF("html")
      .select(graft.operators.Html.extract(col("html")).as("txt"))
    val out = df.collect().map(_.getString(0))
    assert(out(0).contains("7\">") && out(0).contains(para),
      s"quoted-attr '>' should leak the attr remainder: '${out(0)}'")
    assert(out(1).contains(para),
      s"uppercase anchor should evade ll and stay content: '${out(1)}'")
    assert(out(2).contains("&amp;") && out(2).contains("&gt;"),
      s"entities must stay literal: '${out(2)}'")

    // the hostile FRAME: every variant produces blocks; the unclosed
    // comment variant (id ≡ 2 mod 3) scrubs the trailing unclosed <p>
    val dir = fixture(Seq(3L -> para, 4L -> para, 5L -> para))
    try {
      val r = graft.operators.Html.htmlExtractHostile(spark, dir)
        .collect().map(x => x.getLong(0) -> x).toMap
      assert(r.values.forall(_.getLong(1) > 0), s"no blocks: $r")
      // all three variants keep the paragraph content
      assert(r.values.forall(_.getLong(3) > 0), s"no content: $r")
      // the unclosed-comment page (doc 5) loses the trailing segment
      // to the comment scrub — strictly fewer boiler chars than the
      // CDATA page (doc 3), which keeps cdata remnants as boiler
      assert(r(5L).getLong(4) < r(3L).getLong(4),
        s"comment scrub should eat the trailing text: $r")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("an all-link page classifies fully boilerplate even when long") {
    // one anchor spanning a WHOLE ≥25-char paragraph (≤12 tokens so
    // synthesis keeps it in one block): length passes but link
    // density is ~1 — the integer 3·ll < len rule must reject it
    val linky = (1 to 9).map(i => s"click$i").mkString(" ")
    val dir = fixture(Seq(100L -> s"<a href=x>$linky</a>"))
    try {
      val r = graft.operators.Html.htmlExtract(spark, dir).collect().head
      // the embedded anchor rides INSIDE a <p> block: that block's
      // link chars ≈ its text chars, so it must not be content
      assert(r.getLong(2) <= 1L, s"link-page content blocks: $r")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }
}

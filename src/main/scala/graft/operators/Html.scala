package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Hash60.hash60

/** HTML/boilerplate main-content extraction — the jusText/trafilatura-
  * class cleaning step every crawl-curation pipeline runs BEFORE any
  * of the text operators (langid, quality, dedup, tokenizers all
  * assume extracted text, not raw markup).
  *
  * The extractor is a DETERMINISTIC rule pipeline (pure string/integer
  * ops — no ML, no floating point anywhere until the stats twin's one
  * final round-6 divide), so the DuckDB oracle replays it exactly:
  *   1. segment the page into blocks on closing block-level tags
  *      (plain literal alternation — no lookaround, identical in Java
  *      regex and RE2);
  *   2. per block: strip tags, collapse whitespace (EXPLICIT class
  *      `[ \t\n\r]` — Java's `\s` includes \x0B, RE2's does not, so a
  *      hostile vertical-tab document would fork the engines), and
  *      measure anchor-text length from `<a ...>text` captures;
  *   3. classify: content iff stripped length ≥ [[MinBlockChars]] AND
  *      link density < 1/3 — written as the INTEGER compare
  *      `3·link_chars < chars` so no division ever happens (the
  *      link-density threshold is exact, fork-free at any magnitude).
  *
  * Step 0 (before segmentation): SCRUB non-content element BODIES —
  * `<script>…</script>`, `<style>…</style>` and `<!-- -->` comments
  * are removed wholesale ([[scrub]]), because tag-stripping alone
  * would keep JavaScript/CSS text as "content" chars, and because a
  * script body may contain literal closing block tags (a JS string
  * `"</div>"`) that would otherwise fork the segmentation.
  * jusText/boilerpipe-class extractors drop these elements entirely.
  * Unclosed script/style/comment (the truncated-page norm) drop to
  * end-of-page — the conservative crawl-cleaning choice, replayed
  * identically by the oracle. Patterns use inline `(?is)` flags and
  * non-greedy `.*?` — both identical in Java regex and RE2.
  *
  * The rule pipeline is PUBLIC: [[scrub]] → [[blocks]] →
  * [[extract]]/[[extractStats]] consume ANY html `Column`, so a user
  * holding a real crawl applies them directly. Because the harness
  * corpus has no html column, the harness queries WRAP each document
  * in a deterministic page frame first ([[htmlOf]]): title + nav
  * menu (doc_id-keyed link count) + a script block, a style block
  * and a template comment (so the scrub rules are exercised by every
  * run) + the text as ~12-token paragraphs + a link-dense ad block +
  * footer; doc_id ≡ 3 (mod 17) pages are TRUNCATED at ¾ length —
  * mid-tag, mid-anchor — so the extractor's behavior on broken
  * markup is exercised by every run (and by every degenerate-corpus
  * gate shape flowing through `text`). Null text wraps to an
  * all-boilerplate shell page.
  *
  * 100 TB shape: the whole pipeline is ONE narrow projection over the
  * documents scan — array lambdas (`transform`/`filter`/`aggregate`)
  * over the block list, zero shuffles, zero UDFs; the stats twin adds
  * one map-side-combined per-source aggregate over exact integer
  * sums. Reference anchor: builder brief "text analysis" mandate;
  * public technique: Kohlschütter et al. 2010 (boilerpipe) /
  * Pomikálek 2011 (jusText) link-density + block-length rules. */
object Html {

  /** Content blocks must have at least this many collapsed chars. */
  val MinBlockChars = 25

  /** Tokens per synthesized paragraph. */
  val ParaTokens = 12

  /** Whitespace split WITHOUT lowercasing (markup is case-sensitive;
    * also keeps the unicode simple-case question out of this family
    * entirely). Explicit class, not `\s` — see class doc. */
  private def rawTokens(text: Column): Column =
    filter(split(coalesce(text, lit("")), "[ \t\n\r]+"),
      t => length(t) > 0)

  /** The document text as ~[[ParaTokens]]-token `<p>` paragraphs —
    * the content half of BOTH page frames ([[htmlOf]],
    * [[htmlHostileOf]]). The token array is let-bound (transform over
    * a 1-element array — the wordShingles discipline: a lambda
    * referencing an outer expression re-tokenizes per element). */
  private def parasOf(text: Column): Column =
    array_join(
      flatten(transform(array(rawTokens(text)), ts =>
        when(size(ts) === 0, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0),
              floor((size(ts) + lit(ParaTokens - 1)) / ParaTokens)
                .cast("int") - 1),
            i => concat(lit("<p>"),
              array_join(slice(ts, i * ParaTokens + 1, lit(ParaTokens)), " "),
              lit("</p>")))))),
      "\n")

  /** Deterministic page frame around a document's text — the fixture
    * half of the operator (both engines synthesize the identical
    * page, then extract from it). */
  private[graft] def htmlOf(docId: Column, text: Column): Column = {
    val id = coalesce(docId, lit(0L))
    val paras = parasOf(text)
    // script body deliberately (a) ≥ MinBlockChars after tag-strip,
    // zero link chars — WITHOUT scrub it would classify as content —
    // and (b) contains a literal "</div>" inside a JS string, which
    // without scrub would fork the block segmentation
    val script = lit("<script type=\"text/javascript\">var a = 1; " +
      "if (a < 2) { track(\"</div> page view analytics beacon\"); }" +
      "</script>")
    val style = lit("<style>.c { color: red; margin: 0 auto; " +
      "padding: 2px; }</style>")
    val comment = lit("<!-- rendered by example corp template v2 -->")
    val nav = concat(lit("<nav><ul>"),
      array_join(transform(
        sequence(lit(1), lit(3) + pmod(id, lit(4L)).cast("int")),
        i => concat(lit("<li><a href=\"/s"), i, lit("\">sec "), i,
          lit("</a></li>"))), ""),
      lit("</ul></nav>"))
    val header = concat(lit("<h1>Document "), id, lit("</h1>"))
    val ad = lit("<div><a href=\"/buy\">Buy now best deals " +
      "click here limited offer</a></div>")
    val footer = lit("<footer><a href=\"/tos\">Terms</a> " +
      "<a href=\"/privacy\">Privacy</a> (c) example corp</footer>")
    val page = concat_ws("\n",
      lit("<html><head><title>d</title></head><body>"),
      header, script, style, nav, paras, comment, ad, footer,
      lit("</body></html>"))
    // ~6% of pages truncated at ¾ length (mid-tag/mid-anchor): broken
    // markup is the norm in a crawl, not the exception
    when(pmod(id, lit(17L)) === 3,
      page.substr(lit(1), floor(length(page) * 3 / 4).cast("int")))
      .otherwise(page)
  }

  /** HOSTILE page frame — real-crawl markup shapes the standard frame
    * never produces, so the tag-strip/scrub rules are ORACLE-proven on
    * them every gate run (not just spec-asserted):
    *
    *  - `>` inside a QUOTED attribute (`title="Doc > 7"`,
    *    `class="x>y"`): the tag-strip `<[^>]*>` is quote-blind and
    *    terminates at the first `>`, leaving the attribute remainder
    *    (`7">`) as text — wrong-ish extraction, but CONSISTENT on both
    *    engines, and the documented cost of regex-class stripping;
    *  - MIXED-CASE tags: `<SCRIPT>` scrubs (ASCII case classes);
    *    `</H1>`/`</DIV>` do NOT segment (closers are lowercase
    *    literals), so uppercase-closed blocks merge into the next
    *    segment; an uppercase `<A TITLE=…>` anchor evades the
    *    lowercase `<a ` link-density capture (ll = 0);
    *  - a CDATA section (doc_id ≡ 0 mod 3): not special-cased — its
    *    literal `</p>` segments and its tag-ish prefix strips;
    *  - entity references (`&amp;`, `&gt;`): kept as literal text,
    *    never decoded;
    *  - an UNCLOSED comment after the content (doc_id ≡ 2 mod 3):
    *    scrubs to end-of-page, eating the trailing unclosed `<p>`;
    *  - a trailing unclosed `<p>` (other docs): no closer — rides to
    *    the page-end segment. */
  private[graft] def htmlHostileOf(docId: Column, text: Column): Column = {
    val id = coalesce(docId, lit(0L))
    val header = concat(lit("<H1 title=\"Doc > "), id,
      lit("\" class=\"t\">Hostile Document "), id, lit("</H1>"))
    val script = lit("<SCRIPT type=\"a>b\">var p = \"</p>\"; " +
      "track(\"</div>\");</SCRIPT>")
    val cdata = lit("<![CDATA[cdata block <p>not a paragraph</p> " +
      "raw text]]>")
    val divattr = lit("<DIV class=\"x>y\"><A TITLE=\"a>b\" " +
      "HREF=\"/x\">anchor &amp; entity</A></DIV>")
    val uncomment =
      lit("<!-- unclosed template comment drops to end of page")
    val variant = when(pmod(id, lit(3L)) === 0, cdata)
      .when(pmod(id, lit(3L)) === 1, divattr)
      .otherwise(uncomment)
    concat_ws("\n",
      lit("<html><body>"), header, script, parasOf(text), variant,
      lit("<p>trailing unclosed &amp; 5 &gt; 3"),
      lit("</body></html>"))
  }

  /** Closing block-level tags — the segmentation boundaries. Literal
    * alternation only (Java regex ≡ RE2). */
  private val BlockClosers = "</p>|</li>|</h1>|</div>|</footer>"

  /** Non-content element scrub patterns, applied IN THIS ORDER before
    * segmentation: closed comments, closed script/style (bodies
    * removed wholesale), then unclosed script/style/comment drop to
    * end-of-page (the truncated-crawl norm). `(?s)` dotall and
    * non-greedy `.*?` behave identically in Java regex and RE2;
    * case-insensitivity is EXPLICIT ASCII classes `[sS]`… — NOT the
    * `(?i)` flag, which is ASCII-only in Java but Unicode
    * simple-folding in RE2 (a `<ſcript>` long-s tag would scrub on
    * the oracle and survive on the engine — the same Java≡RE2 class
    * divergence the explicit `[ \t\n\r]` whitespace class guards).
    * The DuckDB oracle interpolates THESE strings verbatim (adding
    * only its 'g' option — Java replaceAll is already global). */
  private[graft] val ScrubPatterns: Seq[String] = {
    val script = "[sS][cC][rR][iI][pP][tT]"
    val style = "[sS][tT][yY][lL][eE]"
    Seq(
      "(?s)<!--.*?-->",
      s"(?s)<$script[^>]*>.*?</$script>",
      s"(?s)<$style[^>]*>.*?</$style>",
      s"(?s)<(?:$script|$style)[^>]*>.*",
      "(?s)<!--.*")
  }

  // the oracle splices these verbatim into single-quoted DuckDB SQL
  // literals — a quote would corrupt the SQL, a backslash would fork
  // Java-vs-RE2 escape semantics at splice time
  require(ScrubPatterns.forall(p =>
    !p.contains("'") && !p.contains("\\")),
    "ScrubPatterns must stay quote- and backslash-free (oracle splice)")

  /** PUBLIC SEAM, step 0: remove `<script>`/`<style>` element CONTENT
    * and `<!-- -->` comments from a raw html column. Tag-strip alone
    * would count JavaScript/CSS bodies as content chars, and a JS
    * string containing a literal closing block tag would fork the
    * segmentation. */
  def scrub(html: Column): Column =
    ScrubPatterns.foldLeft(html)((c, p) => regexp_replace(c, p, " "))

  private def collapsed(c: Column): Column =
    trim(regexp_replace(c, "[ \t\n\r]+", " "))

  /** PUBLIC SEAM, step 1: segment a raw html column into an array of
    * block structs — `txt` (tag-stripped, whitespace-collapsed block
    * text) and `ll` (anchor-text chars). Scrubs first ([[scrub]]).
    * One narrow expression — apply it to any DataFrame's html column
    * with `.select(Html.blocks(col("html")))`. */
  def blocks(html: Column): Column =
    transform(
      split(scrub(html), BlockClosers),
      b => struct(
        collapsed(regexp_replace(b, "<[^>]*>", " ")).as("txt"),
        aggregate(
          regexp_extract_all(b, lit("<a [^>]*>([^<]*)"), lit(1)),
          lit(0L),
          (acc, x) => acc + length(collapsed(x))).as("ll")))

  /** PUBLIC SEAM, step 2: extracted main text of a raw html column —
    * content blocks (length ≥ [[MinBlockChars]], link density < 1/3)
    * joined in page order. The whole pipeline is ONE narrow
    * expression: `.select(Html.extract(col("html")))`. */
  def extract(html: Column): Column =
    array_join(transform(filter(blocks(html), isContent(_)),
      b => b.getField("txt")), "\n")

  /** Per-doc block metrics over a synthesized harness frame:
    * (doc_id, source, blocks). The fixture wrapper around the public
    * [[blocks]] seam; `frame` picks the page synthesizer
    * ([[htmlOf]] / [[htmlHostileOf]]). */
  private def blockTable(spark: SparkSession, dir: String,
      frame: (Column, Column) => Column = htmlOf): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        blocks(frame(col("doc_id"), col("text"))).as("blocks"))

  private def isContent(b: Column): Column =
    length(b.getField("txt")) >= MinBlockChars &&
      b.getField("ll") * 3 < length(b.getField("txt"))

  /** The per-doc extraction metrics: nonempty block count,
    * content-block count, exact content/boilerplate char totals, and
    * the 60-bit fingerprint of the extracted main text (content
    * blocks joined in page order). ONE definition for the standard
    * and hostile frames. */
  private def extractMetrics(bt: DataFrame): DataFrame =
    bt.select(col("doc_id"),
        size(filter(col("blocks"),
          b => length(b.getField("txt")) > 0)).cast("long").as("n_blocks"),
        size(filter(col("blocks"), isContent(_)))
          .cast("long").as("n_content"),
        aggregate(filter(col("blocks"), isContent(_)), lit(0L),
          (acc, b) => acc + length(b.getField("txt")))
          .as("content_chars"),
        aggregate(filter(col("blocks"),
            b => length(b.getField("txt")) > 0 && !isContent(b)),
          lit(0L), (acc, b) => acc + length(b.getField("txt")))
          .as("boiler_chars"),
        hash60(array_join(transform(filter(col("blocks"), isContent(_)),
          b => b.getField("txt")), "\n")).as("extract_h"))
      .orderBy("doc_id")

  /** Harness query `html_extract`: [[extractMetrics]] over the
    * standard page frame. */
  def htmlExtract(spark: SparkSession, dir: String): DataFrame =
    extractMetrics(blockTable(spark, dir))

  /** Harness query `html_extract_hostile`: [[extractMetrics]] over
    * the HOSTILE page frame ([[htmlHostileOf]]) — quoted-attribute
    * `>`, CDATA, mixed-case/unclosed tags and entity references flow
    * through the identical scrub/segment/strip/classify rules and are
    * hash-compared against the oracle's replay every run. */
  def htmlExtractHostile(spark: SparkSession, dir: String): DataFrame =
    extractMetrics(blockTable(spark, dir, htmlHostileOf))

  /** Harness query `html_boilerplate_stats`: per-source boilerplate
    * fraction — the corpus-health report a curation run reads before
    * deciding thresholds. Exact integer char sums (orderless), ONE
    * final round-6 IEEE divide. */
  def htmlBoilerplateStats(spark: SparkSession, dir: String): DataFrame =
    blockTable(spark, dir)
      .select(col("source"),
        aggregate(filter(col("blocks"), isContent(_)), lit(0L),
          (acc, b) => acc + length(b.getField("txt"))).as("cc"),
        aggregate(filter(col("blocks"),
            b => length(b.getField("txt")) > 0 && !isContent(b)),
          lit(0L), (acc, b) => acc + length(b.getField("txt"))).as("bc"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("cc")).as("content_chars"),
        sum(col("bc")).as("boiler_chars"))
      .select(col("source"), col("n_docs"),
        col("content_chars"), col("boiler_chars"),
        when(col("content_chars") + col("boiler_chars") === 0, 0.0d)
          .otherwise(round(col("boiler_chars").cast("double") /
            (col("content_chars") + col("boiler_chars")).cast("double"),
            6)).as("boiler_frac"))
      .orderBy("source")
}

package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML link + text extraction over the Common-Crawl-style page table
  * `pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)`
  * (BASELINE.json input_hint; SURVEY S8) — the production source of the url->url edge
  * table.
  *
  * Everything is pure deterministic column expressions (versioned; golden fixtures in
  * `src/test/resources/extract_golden/` lock the byte-identical-text-per-url
  * invariant). No UDFs — the whole extraction stays inside whole-stage codegen, so the
  * 100 TB shape is a single parquet/Iceberg scan with projection pushdown on
  * (url, html).
  */
object HtmlExtract {

  private val LinkPattern = "(?is)<a\\b[^>]*?href\\s*=\\s*\"([^\"]*)\"[^>]*>(.*?)</a>"

  /** Raw href attribute values, in document order (double-quoted hrefs; the crawler
    * normalization contract).
    */
  def hrefs(html: Column): Column =
    regexp_extract_all(html.cast("string"), lit(LinkPattern), lit(1))

  /** Anchor texts aligned with [[hrefs]] (same matches, group 2), inner tags stripped
    * and whitespace collapsed.
    */
  def anchors(html: Column): Column =
    transform(
      regexp_extract_all(html.cast("string"), lit(LinkPattern), lit(2)),
      a => cleanText(a)
    )

  /** (href, anchor) structs in document order. */
  def links(html: Column): Column =
    zip_with(hrefs(html), anchors(html), (h, a) => struct(h.as("href"), a.as("anchor")))

  /** Visible text: drop script/style/comments, strip tags to spaces, decode the basic
    * entities, collapse whitespace. THE extractor whose output is locked byte-identical
    * by the golden fixtures — any change must version the goldens.
    */
  def text(html: Column): Column = {
    val noScript = regexp_replace(html.cast("string"), "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    cleanText(noComment)
  }

  private def cleanText(s: Column): Column = {
    val noTags = regexp_replace(s, "<[^>]*>", " ")
    // decode basic entities; &amp; LAST so double-encoded stays single-decoded
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Absolute url for an href found on `base` (scheme://host/path...):
    * absolute stays (minus fragment), protocol-relative gets the base scheme,
    * root-relative gets the base origin, fragment-only/empty/non-http schemes -> null,
    * relative resolves against the base directory (no ../ collapsing — crawler-style
    * conservative normalization, documented + golden-locked).
    */
  def normalizeUrl(base: Column, href: Column): Column = {
    val noFrag = regexp_extract(href, "^([^#]*)", 1)
    val scheme = regexp_extract(base, "^([a-z]+):", 1)
    val origin = regexp_extract(base, "^([a-z]+://[^/]+)", 1)
    val baseDir = regexp_extract(base, "^(.*/)[^/]*$", 1)
    when(noFrag === "", lit(null).cast("string"))
      .when(noFrag.rlike("^https?://"), noFrag)
      .when(noFrag.rlike("^//"), concat(scheme, lit(":"), noFrag))
      .when(noFrag.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*:"), lit(null).cast("string")) // mailto:, javascript:
      .when(noFrag.startsWith("/"), concat(origin, noFrag))
      .otherwise(concat(baseDir, noFrag))
  }

  /** url -> url link table from the page table: explode links, normalize, drop
    * self-links and nulls. One projection + one explode; no joins.
    */
  def linkTable(pages: DataFrame): DataFrame =
    pages
      .select(col("url"), explode(links(col("html"))).as("l"))
      .select(col("url").as("srcUrl"), normalizeUrl(col("url"), col("l.href")).as("dstUrl"))
      .filter(col("dstUrl").isNotNull && col("dstUrl") =!= col("srcUrl"))

  /** S9: mint dense vertex ids 0..n-1 for urls via the distributed rank-compaction
    * join ([[graft.graph.Ranks.denseRank]]): range-partitioned local ranks +
    * per-partition offset join — no global window, no single-partition exchange, so
    * the path scales to 10^9+ urls (PlanAudit asserts the plan shape).
    */
  def urlDictionary(urls: DataFrame): DataFrame =
    graft.graph.Ranks.denseRank(urls, "url", "node")

  /** Full production path: pages -> link table -> dictionary-encoded symmetric
    * weighted edge table (src, dst, w) + the dictionary (url, node).
    */
  def edgeTable(pages: DataFrame): (DataFrame, DataFrame) = {
    val linksDf = linkTable(pages)
    val dict = urlDictionary(
      linksDf.select(col("srcUrl").as("url"))
        .unionAll(linksDf.select(col("dstUrl").as("url")))
    )
    val dir = linksDf
      .join(dict.select(col("url").as("srcUrl"), col("node").as("src")), "srcUrl")
      .join(dict.select(col("url").as("dstUrl"), col("node").as("dst")), "dstUrl")
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).cast("long").as("w"))
    (graft.graph.Graphs.symmetrize(dir), dict)
  }
}

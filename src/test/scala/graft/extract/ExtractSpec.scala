package graft.extract

import graft.SparkFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Golden-fixture tests locking the byte-identical extraction invariant (SURVEY S8,
  * FIXTURES.md §1): for every hand-written HTML case under
  * src/test/resources/extract_golden/, the extractor's (text, links) must equal the
  * stored goldens EXACTLY. Any extractor change must consciously re-version these.
  */
class GoldenExtractionSpec extends SparkFunSuite {
  private val goldenDir = Paths.get(getClass.getResource("/extract_golden").toURI)

  private def cases: Seq[String] =
    Files.list(goldenDir).iterator().asScala.filter(Files.isDirectory(_))
      .map(_.getFileName.toString).toSeq.sorted

  test("extracted text is byte-identical to the goldens") {
    val s = spark
    import s.implicits._
    val rows = cases.map { name =>
      val html = Files.readAllBytes(goldenDir.resolve(s"$name/page.html"))
      (name, html)
    }.toDF("name", "html")
    val got = rows.select(col("name"), HtmlExtract.text(col("html")).as("text"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { name =>
      val expected = new String(Files.readAllBytes(goldenDir.resolve(s"$name/text.txt")), "UTF-8")
      assert(got(name) === expected, s"case $name text mismatch")
      assert(got(name).getBytes("UTF-8").sameElements(expected.getBytes("UTF-8")),
        s"case $name not byte-identical")
    }
  }

  test("extracted links (href, anchor) match the goldens exactly, in order") {
    val s = spark
    import s.implicits._
    val rows = cases.map { name =>
      (name, Files.readAllBytes(goldenDir.resolve(s"$name/page.html")))
    }.toDF("name", "html")
    val got = rows.select(col("name"), HtmlExtract.links(col("html")).as("links"))
      .collect().map { r =>
        r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getString(0), x.getString(1)))
      }.toMap
    cases.foreach { name =>
      val raw = new String(Files.readAllBytes(goldenDir.resolve(s"$name/links.json")), "UTF-8")
      // minimal JSON array-of-pairs parser for the golden format
      val expected = "\\[\"(.*?)\",\\s*\"(.*?)\"\\]".r
        .findAllMatchIn(raw.drop(1).dropRight(1))
        .map(m => (unescape(m.group(1)), unescape(m.group(2)))).toSeq
      assert(got(name) === expected, s"case $name links mismatch: ${got(name)}")
    }
  }

  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")
}

class UrlNormalizeSpec extends SparkFunSuite {
  test("url normalization rules") {
    val s = spark
    import s.implicits._
    val base = "https://site1.example/dir/page.html"
    val cases = Seq(
      ("https://other.example/x", "https://other.example/x"),
      ("https://other.example/x#frag", "https://other.example/x"),
      ("//cdn.example/y", "https://cdn.example/y"),
      ("/root/z.html", "https://site1.example/root/z.html"),
      ("sibling.html", "https://site1.example/dir/sibling.html"),
      ("#only-frag", null),
      ("", null),
      ("mailto:x@y.z", null),
      ("javascript:void(0)", null)
    )
    val df = cases.map(_._1).map((base, _)).toDF("base", "href")
    val got = df.select(HtmlExtract.normalizeUrl(col("base"), col("href")).as("u"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(got === cases.map(_._2))
  }
}

class PageGenPipelineSpec extends SparkFunSuite {
  test("generator invariant: stored text == extractor output, byte-identical, all pages") {
    val pages = PageGen.generateDf(spark, hosts = 5, pagesPerHost = 8, seed = 7L)
    val mism = pages
      .select(col("url"), col("text"), HtmlExtract.text(col("html")).as("extracted"))
      .filter(col("text") =!= col("extracted"))
      .count()
    assert(mism === 0L)
  }

  test("pages -> edge table end-to-end: valid symmetric graph with dense ids") {
    val pages = PageGen.generateDf(spark, hosts = 5, pagesPerHost = 8, seed = 7L)
    val (edges, dict) = HtmlExtract.edgeTable(pages)
    assert(graft.graph.Graphs.validate(edges).values.forall(_ == 0L))
    val n = dict.count()
    val ids = dict.agg(min(col("node")), max(col("node"))).first()
    assert(ids.getLong(0) === 0L && ids.getLong(1) === n - 1)
    // deterministic under regeneration
    val (edges2, _) = HtmlExtract.edgeTable(PageGen.generateDf(spark, 5, 8, seed = 7L))
    assert(edges.collect().map(_.toSeq).toSet === edges2.collect().map(_.toSeq).toSet)
  }

  test("full flagship path on generated pages: extraction -> graph -> PageRank sums to 1") {
    val pages = PageGen.generateDf(spark, hosts = 4, pagesPerHost = 6, seed = 11L)
    val (edges, _) = HtmlExtract.edgeTable(pages)
    val pr = graft.ops.PageRank.run(spark, edges, iterations = 10)
    val total = pr.agg(sum(col("pr"))).first().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9)
  }
}

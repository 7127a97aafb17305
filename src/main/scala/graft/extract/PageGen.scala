package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import java.sql.Timestamp

/** Deterministic synthetic Common-Crawl-style page table (FIXTURES.md §1): a seeded
  * site graph of `hosts` x `pagesPerHost` pages whose html embeds out-links drawn from
  * a Zipf-ish distribution over target pages (hub skew on purpose) plus filler text.
  *
  * The invariant the golden tests lock: `HtmlExtract.text(html) == text` column,
  * byte-identical, for every generated page — the generator builds the html so the
  * extractor's normalization reproduces the stored text exactly.
  */
object PageGen {

  final case class Page(url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String)

  private val Words = Vector(
    "data", "graph", "page", "link", "crawl", "rank", "cluster", "block", "edge",
    "vertex", "shuffle", "join", "merge", "hash", "scan", "batch", "stream", "index"
  )
  private val Langs = Vector("en", "de", "fr", "es", "zh")

  def generate(spark: SparkSession, hosts: Int, pagesPerHost: Int, seed: Long = 42L): Dataset[Page] = {
    import spark.implicits._
    val n = hosts * pagesPerHost
    spark.range(n.toLong).map { i =>
      val id = i.toInt
      val rnd = new scala.util.Random(seed ^ (i * 0x9e3779b97f4a7c15L))
      val host = id / pagesPerHost
      val page = id % pagesPerHost
      val url = s"https://site$host.example/p$page.html"

      // Zipf-ish target selection: rank r with prob ~ 1/r^1.2 over the page universe
      val outDeg = 3 + rnd.nextInt(6)
      val targets = (0 until outDeg).map { _ =>
        val r = math.min(n - 1, math.pow(rnd.nextDouble(), -1.0 / 1.2).toInt - 1)
        val t = (r * 0x9e3779b9L % n + n) % n
        val th = t / pagesPerHost
        val tp = t % pagesPerHost
        s"https://site$th.example/p$tp.html"
      }

      // visible parts in document order: filler words and anchor texts
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      val body = new StringBuilder("<html><head><title></title>")
      body.append("<script>var x = 1 < 2;</script><style>p { color: red }</style>")
      body.append("</head><body>")
      var t = 0
      (0 until 6 + rnd.nextInt(8)).foreach { _ =>
        val w = Words(rnd.nextInt(Words.length))
        parts += w
        body.append(s"<p>$w</p>")
        if (t < targets.length && rnd.nextBoolean()) {
          val anchor = Words(rnd.nextInt(Words.length)) + " " + Words(rnd.nextInt(Words.length))
          parts += anchor
          body.append(s"""<a href="${targets(t)}">$anchor</a>""")
          t += 1
        }
      }
      // remaining links as nav
      while (t < targets.length) {
        val anchor = "more " + Words(rnd.nextInt(Words.length))
        parts += anchor
        body.append(s"""<nav><a href="${targets(t)}">$anchor</a></nav>""")
        t += 1
      }
      body.append("</body></html>")

      val text = parts.mkString(" ") // == HtmlExtract.text over this html, by construction
      val ts = new Timestamp(1700000000000L + (i % 86400) * 1000L)
      Page(url, ts, body.toString.getBytes("UTF-8"), text, Langs(id % Langs.length))
    }
  }

  def generateDf(spark: SparkSession, hosts: Int, pagesPerHost: Int, seed: Long = 42L): DataFrame =
    generate(spark, hosts, pagesPerHost, seed).toDF()
}

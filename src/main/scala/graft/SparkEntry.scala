package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.Graphs
import graft.ops.{ConnectedComponents, LabelPropagation, PageRank, Triangles}
import graft.textops.{Dedup, TextOps}
import graft.sim.Similarity
import graft.multimodal.MediaPipeline

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The graph queries run over a deterministic link graph derived from the harness
  * tables: a bipartite order--part graph (PageRank/CC/degrees/partitioning) and a
  * part co-purchase graph (triangles, clustering). Every SQL-expressible operator has
  * a DuckDB oracle; iterative fixpoint operators (CC, LP, k-way partition) are
  * validated by exact ScalaTest fixtures instead and recorded rows-only here.
  */
object SparkEntry {

  /** Shared SQL prelude: the bipartite link graph, symmetric — must mirror
    * [[Graphs.bipartite]] exactly (same PartOffset, same aggregation).
    */
  private val symSql: String =
    """dir AS (
      |  SELECT l_orderkey AS a, l_partkey + 100000000 AS b, CAST(count(*) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1, 2
      |), sym AS (
      |  SELECT a AS src, b AS dst, w FROM dir
      |  UNION ALL
      |  SELECT b AS src, a AS dst, w FROM dir
      |)""".stripMargin

  /** Fixed-iteration PageRank oracle: one CTE per superstep (no recursion needed —
    * the iteration count is part of the operator's definition here).
    */
  private def pageRankSql(iters: Int): String = {
    val head =
      s"""WITH $symSql,
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg FROM sym GROUP BY 1),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
         |pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM deg)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""pr$i AS (
         |  SELECT d.node,
         |         (1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * COALESCE(s.contrib, 0.0) AS pr
         |  FROM deg d LEFT JOIN (
         |    SELECT e.dst AS node, SUM(p.pr / dg.outdeg) AS contrib
         |    FROM sym e
         |    JOIN pr${i - 1} p ON e.src = p.node
         |    JOIN deg dg ON dg.node = e.src
         |    GROUP BY 1
         |  ) s ON d.node = s.node
         |)""".stripMargin
    }
    (Seq(head) ++ steps).mkString(",\n") +
      s"\nSELECT node, ROUND(pr, 8) AS pr FROM pr$iters"
  }

  private val PrIters = 5

  /** Connected-components oracle: unrolled min-label propagation, one CTE per
    * superstep. Plan hygiene that DuckDB needs at this depth: every step is
    * MATERIALIZED (plain CTEs are inlined and the optimizer's work grows
    * super-linearly past ~16 chained steps), and each step references the previous
    * labels exactly ONCE — the self-loops folded into `syml` carry a node's own label
    * forward, so no second reference (a double reference doubles the inlined plan per
    * step = exponential blowup). Converges once T >= the graph diameter; T=24 and
    * T=40 agree at sf0.01, so 40 carries a wide margin.
    */
  private def ccLabelsSql(iters: Int): String = {
    val head =
      """WITH dir AS MATERIALIZED (
        |  SELECT l_orderkey AS a, l_partkey + 100000000 AS b
        |  FROM lineitem GROUP BY 1, 2
        |), syml AS MATERIALIZED (
        |  SELECT a AS src, b AS dst FROM dir
        |  UNION ALL SELECT b, a FROM dir
        |  UNION ALL SELECT a, a FROM dir
        |  UNION ALL SELECT b, b FROM dir
        |),
        |l0 AS MATERIALIZED (SELECT src AS node, src AS lbl FROM syml GROUP BY 1)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT e.dst AS node, min(l.lbl) AS lbl
         |  FROM syml e JOIN l${i - 1} l ON e.src = l.node GROUP BY 1
         |)""".stripMargin
    }
    (Seq(head) ++ steps).mkString(",\n") +
      s"\nSELECT node, lbl AS component FROM l$iters"
  }

  /** Flagship query; driver smoke-checks rows>0. The full north-star path: synthetic
    * Common-Crawl-style page table -> HTML link extraction -> dictionary-encoded
    * symmetric edge table -> PageRank -> top pages by rank (joined back to urls).
    */
  def entry(spark: SparkSession): DataFrame = {
    val pages = graft.extract.PageGen.generateDf(spark, hosts = 20, pagesPerHost = 10)
    val (edges, dict) = graft.extract.HtmlExtract.edgeTable(pages)
    PageRank.run(spark, edges, iterations = PrIters)
      .join(dict, "node")
      .orderBy(desc("pr"), col("node"))
      .select(col("url"), col("node"), round(col("pr"), 8).as("pr"))
      .limit(20)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S4/S9-adjacent: graph construction (symmetrize + dedup + weight agg)
    "q01_edges" -> ((s, dir) => Graphs.bipartite(s, dir)),
    // degrees (gather aggregation)
    "q02_degrees" -> ((s, dir) => Graphs.degrees(Graphs.bipartite(s, dir))),
    // P1: degree buckets (skew-management layout), histogram
    "q03_degree_buckets" -> ((s, dir) =>
      Graphs.degreeBuckets(Graphs.bipartite(s, dir))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).cast("long").as("nodes"))),
    // M1: edge cut for a deterministic (node % 16) block assignment
    "q04_edge_cut_mod16" -> ((s, dir) =>
      Graphs.bipartite(s, dir)
        .filter(col("src") % 16 =!= col("dst") % 16)
        .agg((sum(col("w")) / 2).cast("long").as("cut"))),
    // M2/M5: block weights for the same assignment
    "q05_block_weights_mod16" -> ((s, dir) =>
      Graphs.vertices(Graphs.bipartite(s, dir))
        .groupBy((col("node") % 16).cast("int").as("block"))
        .agg(sum(col("weight")).as("weight"))),
    // triangle counting (degree-ordered orientation)
    "q06_triangles" -> ((s, dir) => Triangles.count(s, Graphs.copurchase(s, dir))),
    // PageRank, 5 supersteps, rounded for the hash compare
    "q07_pagerank5" -> ((s, dir) => {
      PageRank.run(s, Graphs.bipartite(s, dir), iterations = PrIters)
        .select(col("node"), round(col("pr"), 8).as("pr"))
    }),
    // CC large-star/small-star: EXACT per-node component labels (component = min node
    // id of the component), DuckDB-checked against an unrolled min-label-propagation
    // oracle (converged: T=40 and T=24 agree at sf0.01; Spark computes the true
    // fixpoint)
    "q08_cc_labels" -> ((s, dir) =>
      ConnectedComponents.run(s, Graphs.bipartite(s, dir))
        .select(col("node"), col("component"))),
    // LP community detection — rows-only (seeded-deterministic; exactness in ScalaTest)
    "q09_lp_communities" -> ((s, dir) =>
      LabelPropagation.run(s, Graphs.copurchase(s, dir), maxIter = 10)
        .groupBy(col("label"))
        .agg(count(lit(1)).cast("long").as("size"))),
    // k-way balanced partitioning (the flagship operator): block weights of a k=16
    // partition — rows-only here (quality bounds + determinism proven in ScalaTest
    // against the Walshaw fixtures). ONE shared partition run feeds q10 and q11.
    "q10_partition_blocks" -> ((s, dir) => {
      val res = partitionResult(s, dir)
      import s.implicits._
      res.blockWeights.zipWithIndex
        .map { case (w, b) => (b, w) }.toSeq.toDF("block", "weight")
    }),
    // partition quality metrics row (cut, imbalance, feasible)
    "q11_partition_metrics" -> ((s, dir) => {
      val res = partitionResult(s, dir)
      import s.implicits._
      Seq((res.cut, math.round(res.imbalance * 1e6), res.feasible))
        .toDF("cut", "imbalance_ppm", "feasible")
    }),
    // ---- training-data pipeline operators over documents/embeddings ----
    "q12_token_stats" -> ((s, dir) => TextOps.tokenStats(docs(s, dir))),
    "q13_quality_scores" -> ((s, dir) => TextOps.qualityScores(docs(s, dir))),
    "q14_lang_id" -> ((s, dir) => TextOps.langId(docs(s, dir))),
    "q15_fingerprints" -> ((s, dir) => TextOps.fingerprints(docs(s, dir))),
    "q16_exact_dedup" -> ((s, dir) => Dedup.exact(docs(s, dir))),
    // MinHash-LSH near-dup candidate pairs with exact-Jaccard verification
    // (xxhash-based — rows-only oracle; exactness covered in ScalaTest with planted dups)
    "q17_neardup_pairs" -> ((s, dir) =>
      Dedup.verifyJaccard(docs(s, dir), Dedup.lshCandidates(docs(s, dir)))
        .filter(col("jaccard") >= 0.5)),
    "q18_simhash_pairs" -> ((s, dir) => Dedup.simhashPairs(docs(s, dir), maxDist = 3)),
    // exact word-set Jaccard within each source bucket (SQL-expressible)
    "q19_jaccard_pairs" -> ((s, dir) => {
      val d = docs(s, dir).select(
        col("doc_id"), col("source"),
        array_distinct(split(lower(trim(col("text"))), "\\s+")).as("toks")
      )
      d.as("a").join(d.as("b"),
          col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
        .select(
          col("a.doc_id").as("a"), col("b.doc_id").as("b"),
          round(
            size(array_intersect(col("a.toks"), col("b.toks"))).cast("double") /
              size(array_union(col("a.toks"), col("b.toks"))).cast("double"),
            8
          ).as("jaccard")
        )
        .filter(col("jaccard") >= 0.2)
    }),
    // exact brute-force cosine top-5 for query vectors (vec_id < 10)
    "q20_knn_brute" -> ((s, dir) => {
      val v = vecs(s, dir)
      Similarity.bruteForceKnn(v.filter(col("id") < 10), v, k = 5)
    }),
    // LSH-bucketed approximate NN (recall vs brute force covered in ScalaTest);
    // short keys + many tables because the synthetic embeddings are weakly clustered
    "q21_ann_lsh" -> ((s, dir) => {
      val v = vecs(s, dir)
      Similarity.annLsh(v.filter(col("id") < 10), v, k = 5, planes = 6, tables = 16)
    }),
    // multimodal plumbing: synthetic opaque-binary media -> batched (stubbed) decode ->
    // per-kind feature stats (deterministic; rows-only)
    "q22_media_stats" -> ((s, dir) =>
      MediaPipeline.featureStats(MediaPipeline.extractFeatures(
        MediaPipeline.syntheticMedia(s, 200)))),
    // streaming/batch parity surface: the windowed aggregation the streaming module
    // runs, replayed over the static events table
    "q23_event_windows" -> ((s, dir) =>
      graft.streaming.EventStreams
        .windowedCountsBatch(s.read.parquet(s"$dir/events.parquet"), "1 hour")
        .select(col("window_start"), col("event_type"), col("events"),
          round(col("total_value"), 6).as("total_value"))),
    // real BPE subword tokenization (merge loop over the embedded table) — rows-only
    // (an iterative merge loop is not SQL-expressible; exact hand-computed fixtures
    // in BpeSpec). The q12 whitespace-token oracle is unchanged.
    "q24_bpe_tokens" -> ((s, dir) => graft.textops.Bpe.bpeTokens(docs(s, dir))),
    // CSR-shaped adjacency (P3-adjacent storage layout): ascending neighborhoods
    // with aligned weights, verified positionally by exploding the arrays back out
    "q25_adjacency" -> ((s, dir) =>
      Graphs.adjacency(Graphs.bipartite(s, dir))
        .select(col("node"),
          posexplode(arrays_zip(col("neighbors"), col("weights"))))
        .select(col("node"), col("pos").cast("int").as("pos"),
          col("col.neighbors").as("neighbor"), col("col.weights").as("w")))
  )

  /** q10/q11 share one partition run per sf dir (the run is deterministic, and the
    * driver's Verify executes queries sequentially on one session). Size-1 LRU: a
    * long-lived service iterating sf dirs must not accumulate Result handles.
    */
  private var partCache: Option[(String, graft.partition.Partitioner.Result)] = None
  private def partitionResult(s: SparkSession, dir: String): graft.partition.Partitioner.Result =
    synchronized {
      partCache match {
        case Some((d, r)) if d == dir => r
        case _ =>
          val r = graft.partition.Partitioner(Graphs.bipartite(s, dir))
            .setK(16).setEpsilon(0.03).setSeed(42L).computePartition(s)
          partCache = Some((dir, r))
          r
      }
    }

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def vecs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_edges" ->
      s"WITH $symSql SELECT src, dst, w FROM sym",
    "q02_degrees" ->
      s"""WITH $symSql
         |SELECT src AS node, CAST(count(*) AS BIGINT) AS degree,
         |       CAST(sum(w) AS BIGINT) AS wdegree
         |FROM sym GROUP BY 1""".stripMargin,
    "q03_degree_buckets" ->
      // bucket = floor(log2(deg))+1 computed as length(bin(deg)) to avoid
      // float-log boundary mismatches at exact powers of two
      s"""WITH $symSql,
         |deg AS (SELECT src AS node, count(*) AS degree FROM sym GROUP BY 1)
         |SELECT CAST(length(bin(degree)) AS BIGINT) AS bucket,
         |       CAST(count(*) AS BIGINT) AS nodes
         |FROM deg GROUP BY 1""".stripMargin,
    "q04_edge_cut_mod16" ->
      s"""WITH $symSql
         |SELECT CAST(sum(w) / 2 AS BIGINT) AS cut
         |FROM sym WHERE src % 16 <> dst % 16""".stripMargin,
    "q05_block_weights_mod16" ->
      s"""WITH $symSql,
         |v AS (SELECT DISTINCT src AS node FROM sym)
         |SELECT CAST(node % 16 AS INT) AS block, CAST(count(*) AS BIGINT) AS weight
         |FROM v GROUP BY 1""".stripMargin,
    "q06_triangles" ->
      """WITH pairs AS (
        |  SELECT DISTINCT a.l_partkey AS lo, b.l_partkey AS hi
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |)
        |SELECT CAST(count(*) AS BIGINT) AS triangles
        |FROM pairs e1
        |JOIN pairs e2 ON e1.hi = e2.lo
        |JOIN pairs e3 ON e3.lo = e1.lo AND e3.hi = e2.hi""".stripMargin,
    "q07_pagerank5" -> pageRankSql(PrIters),
    "q08_cc_labels" -> ccLabelsSql(40),
    "q12_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tokens,
        |  CAST(length(text) AS BIGINT) AS chars,
        |  ROUND(CAST(length(replace(replace(replace(trim(text), ' ', ''), chr(9), ''), chr(10), '')) AS DOUBLE)
        |        / len(regexp_split_to_array(trim(text), '\s+')), 8) AS avg_token_len
        |FROM documents""".stripMargin,
    "q13_quality_scores" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    regexp_split_to_array(trim(text), '\s+') AS toks,
        |    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) AS punct
        |  FROM documents
        |)
        |SELECT doc_id,
        |  ROUND(CAST(len(list_filter(toks, x -> lower(x) IN ('the','a','of','and','to','in','is','it','for','on'))) AS DOUBLE)
        |        / CAST(len(toks) AS DOUBLE), 8) AS stopword_ratio,
        |  ROUND(punct / CAST(length(text) AS DOUBLE), 8) AS punct_ratio,
        |  ROUND((CAST(len(toks) AS DOUBLE) / (CAST(len(toks) AS DOUBLE) + 100.0))
        |        * (1.0 - punct / CAST(length(text) AS DOUBLE)), 8) AS quality_score
        |FROM t""".stripMargin,
    "q14_lang_id" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_transform(regexp_split_to_array(trim(text), '\s+'), x -> lower(x)) AS toks
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, text,
        |    len(list_filter(toks, x -> x IN ('the','and','of','to','is','in','that','with'))) AS en,
        |    len(list_filter(toks, x -> x IN ('der','die','und','das','ist','nicht','mit','ein'))) AS de,
        |    len(list_filter(toks, x -> x IN ('le','la','les','et','est','que','une','des'))) AS fr,
        |    len(list_filter(toks, x -> x IN ('el','la','los','que','es','una','con','por'))) AS es
        |  FROM t
        |)
        |SELECT doc_id,
        |  CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |       WHEN en >= de AND en >= fr AND en >= es THEN 'en'
        |       WHEN de >= fr AND de >= es THEN 'de'
        |       WHEN fr >= es THEN 'fr'
        |       ELSE 'es' END AS predicted_lang
        |FROM h""".stripMargin,
    "q15_fingerprints" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin,
    "q16_exact_dedup" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |       min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS copies
        |FROM documents GROUP BY 1""".stripMargin,
    "q19_jaccard_pairs" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) AS toks
        |  FROM documents
        |)
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |  ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |        / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 8) AS jaccard
        |FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |      / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE) >= 0.2""".stripMargin,
    "q20_knn_brute" ->
      """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings),
        |q AS (SELECT * FROM v WHERE id < 10),
        |scored AS (
        |  SELECT q.id AS qid, c.id AS nid,
        |    ROUND(list_dot_product(q.vec, c.vec)
        |          / (sqrt(list_dot_product(q.vec, q.vec)) * sqrt(list_dot_product(c.vec, c.vec))), 6) AS cos
        |  FROM q JOIN v c ON q.id <> c.id
        |), ranked AS (
        |  SELECT qid, nid, cos,
        |    CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS INT) AS rank
        |  FROM scored
        |)
        |SELECT qid, rank, nid, cos FROM ranked WHERE rank <= 5""".stripMargin,
    "q23_event_windows" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        |       CAST(count(*) AS BIGINT) AS events, ROUND(sum(value), 6) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q25_adjacency" ->
      s"""WITH $symSql
         |SELECT src AS node,
         |       CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS INT) AS pos,
         |       dst AS neighbor, w
         |FROM sym""".stripMargin
  )
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Link-graph extraction — outlinks, domain edges, robots gates — over
  * deterministic link-bearing pages ([[graft.gen.LinkGen]], keyed by
  * doc_id like the media fixtures) through the real
  * [[graft.kernels.LinkKernel]] (the same tokenizer as text extraction,
  * in attrs mode; full URL resolution exercised: absolute, root- and
  * path-relative links must land on the right host for the oracle
  * counts to match).
  *
  * 100 TB shape: link extraction is a narrow per-row kernel map (the
  * page never shuffles); `q_domain_edges` shuffles only (src_host,
  * dst_host) pairs with map-side partial counts — the classic
  * web-graph aggregation; `q_robots_gate` is a pure projection.
  */
object LinkOps {

  import graft.kernels.LinkKernel

  private def pages(spark: SparkSession, dir: String) = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("cast(doc_id as long) as d").as[Long]
  }

  /** Per-page outlink profile: counts by class after resolution. The
    * oracle derives every count from doc_id arithmetic, so a resolution
    * bug (e.g. a relative link landing on the wrong host) breaks the
    * n_same_host/n_external split.
    */
  def outlinks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pages(spark, dir)
      .mapPartitions(_.map { d =>
        val r = LinkKernel.extract(graft.gen.LinkGen.pageHtml(d), graft.gen.LinkGen.pageUrl(d))
        val ext = r.links.count(_.external)
        val same = r.links.count(!_.external)
        val nof = r.links.count(_.nofollow)
        (d, r.links.size.toLong, ext.toLong, same.toLong, nof.toLong)
      })
      .toDF("doc_id", "n_links", "n_external", "n_same_host", "n_nofollow")
  }

  val outlinksSql: String =
    """WITH p AS (SELECT doc_id AS d, 3 + doc_id % 5 AS n FROM documents),
      |j AS (SELECT d, n, unnest(range(0, n)) AS j FROM p)
      |SELECT d AS doc_id,
      |  CAST(max(n) AS BIGINT) AS n_links,
      |  CAST(sum(CASE WHEN (d + j) % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_external,
      |  CAST(sum(CASE WHEN (d + j) % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_same_host,
      |  CAST(sum(CASE WHEN (d + j) % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nofollow
      |FROM j GROUP BY d""".stripMargin

  /** Domain-graph edges: external outlinks aggregated to (src_host,
    * dst_host) edge weights — the first stage of any web-graph
    * computation (PageRank, spam-mass, crawl scheduling). Only the tiny
    * host-pair tuples cross the exchange, with map-side partial counts.
    */
  def domainEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pages(spark, dir)
      .mapPartitions { it =>
        it.flatMap { d =>
          val url = graft.gen.LinkGen.pageUrl(d)
          val src = LinkKernel.hostOf(url)
          LinkKernel.extract(graft.gen.LinkGen.pageHtml(d), url)
            .links.iterator.filter(_.external).map(l => (src, l.host))
        }
      }
      .toDF("src_host", "dst_host")
      .groupBy("src_host", "dst_host")
      .agg(org.apache.spark.sql.functions.expr("cast(count(*) as long) as n_links"))
  }

  val domainEdgesSql: String =
    """WITH p AS (SELECT doc_id AS d, 3 + doc_id % 5 AS n FROM documents),
      |j AS (SELECT d, unnest(range(0, n)) AS j FROM p),
      |e AS (SELECT 'host' || (d % 20) || '.example' AS src_host,
      |             'h' || ((d * 7 + j) % 20) || '.example' AS dst_host
      |      FROM j WHERE (d + j) % 3 = 0)
      |SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links
      |FROM e GROUP BY src_host, dst_host""".stripMargin

  /** Meta-robots page gates: indexable/followable booleans a corpus
    * builder filters on before text ever enters the pipeline. Pure
    * projection — zero shuffle.
    */
  def robotsGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pages(spark, dir)
      .mapPartitions(_.map { d =>
        val r = LinkKernel.extract(graft.gen.LinkGen.pageHtml(d), graft.gen.LinkGen.pageUrl(d))
        (d, r.indexable, r.followable)
      })
      .toDF("doc_id", "indexable", "followable")
  }

  val robotsGateSql: String =
    """SELECT doc_id, doc_id % 7 <> 0 AS indexable,
      |  doc_id % 5 <> 0 AS followable
      |FROM documents""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_outlinks" -> (outlinks(_, _)),
    "q_domain_edges" -> (domainEdges(_, _)),
    "q_robots_gate" -> (robotsGate(_, _)))

  def oracles: Map[String, String] = Map(
    "q_outlinks" -> outlinksSql,
    "q_domain_edges" -> domainEdgesSql,
    "q_robots_gate" -> robotsGateSql)
}

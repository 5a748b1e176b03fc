package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * - Brute-force cosine top-k: the correctness baseline. The query side is
  *   broadcast (it is small by construction) so the big side streams with
  *   no shuffle; dot products run as codegen'd higher-order functions
  *   (`aggregate`/`zip_with`), no UDF.
  * - Sign-LSH bucketed top-k: the scale path — bucket by the sign bits of
  *   the leading dimensions (a fixed random-hyperplane family degenerates
  *   to axis signs for a fixed seed), shuffle on the bucket key only, and
  *   search within buckets. At 100 TB the bucket join replaces the cross
  *   product entirely.
  *
  * Similarities are rounded to 4 places so double summation-order
  * differences between engines cannot flip the driver's hash compare;
  * ranking ties break on neighbor id, so top-k is fully deterministic.
  */
object SimilarityOps {

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("cast(vec_id as long) as vec_id", "embedding",
        // squared norm, double accumulation in list order
        "aggregate(embedding, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)) as nrm")

  private val DotExpr =
    "aggregate(zip_with(q_embedding, embedding, (a, b) -> cast(a as double) * cast(b as double)), 0D, (acc, x) -> acc + x)"

  /** Shared top-k tail: the bounded [[graft.functions.TopK]] aggregate
    * replaces the old `row_number() OVER (PARTITION BY q_id)` window —
    * with the window, EVERY scored corpus row for a query funneled into
    * one reducer before `rn <= k`; with the capped aggregator, map-side
    * combine ships at most k candidates per (partition, query) into the
    * exchange. Output schema/order identical to the window version.
    */
  private def topkTail(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("q_id"))
      .agg(graft.functions.TopK.topk(k)(col("vec_id"), col("sim")).as("cands"))
      .select(col("q_id"), posexplode(col("cands")))
      .select(col("q_id"), col("col.n_id").as("n_id"),
        (col("pos") + 1).cast("long").as("rn"), col("col.sim").as("sim"))

  /** Brute-force cosine top-5 for query vectors (vec_id % 100 == 0). */
  def annBrute(spark: SparkSession, dir: String): DataFrame = {
    val all = embeddings(spark, dir)
    val q = all.filter(col("vec_id") % 100 === 0)
      .withColumnRenamed("vec_id", "q_id")
      .withColumnRenamed("embedding", "q_embedding")
      .withColumnRenamed("nrm", "q_nrm")
    val scored = all.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", round(expr(DotExpr) / sqrt(col("q_nrm") * col("nrm")), 4))
    topkTail(scored, 5)
  }

  val annBruteSql: String =
    """WITH n AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding::DOUBLE[] AS e,
      |    list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nrm
      |  FROM embeddings),
      |q AS (SELECT * FROM n WHERE vec_id % 100 = 0),
      |s AS (SELECT q.vec_id AS q_id, p.vec_id AS n_id,
      |    round(list_inner_product(q.e, p.e) / sqrt(q.nrm * p.nrm), 4) AS sim
      |  FROM q, n p WHERE p.vec_id <> q.vec_id),
      |r AS (SELECT q_id, n_id, sim,
      |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT) AS rn
      |  FROM s)
      |SELECT q_id, n_id, rn, sim FROM r WHERE rn <= 5""".stripMargin

  /** Sign-LSH bucket key: sign bits of dims 1..8 (deterministic family). */
  private val BucketExpr: String = (1 to 8)
    .map(i => s"(case when element_at(embedding, $i) >= cast(0 as float) then '1' else '0' end)")
    .mkString("concat(", ", ", ")")

  /** Bucketed ANN: candidates share the 8-bit sign bucket; top-3 within
    * bucket. Recall is partial by design (the scale/efficiency trade).
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val all = embeddings(spark, dir).withColumn("bucket", expr(BucketExpr))
    val q = all.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"),
        col("nrm").as("q_nrm"), col("bucket").as("q_bucket"))
    val scored = all.join(broadcast(q), col("bucket") === col("q_bucket") &&
        col("vec_id") =!= col("q_id"))
      .withColumn("sim", round(expr(DotExpr) / sqrt(col("q_nrm") * col("nrm")), 4))
    topkTail(scored, 3)
  }

  val annLshSql: String = {
    val bucket = (1 to 8)
      .map(i => s"(CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")
    s"""WITH n AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding::DOUBLE[] AS e,
       |    list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nrm,
       |    $bucket AS bucket
       |  FROM embeddings),
       |q AS (SELECT * FROM n WHERE vec_id % 100 = 0),
       |s AS (SELECT q.vec_id AS q_id, p.vec_id AS n_id,
       |    round(list_inner_product(q.e, p.e) / sqrt(q.nrm * p.nrm), 4) AS sim
       |  FROM q JOIN n p ON p.bucket = q.bucket AND p.vec_id <> q.vec_id),
       |r AS (SELECT q_id, n_id, sim,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT) AS rn
       |  FROM s)
       |SELECT q_id, n_id, rn, sim FROM r WHERE rn <= 3""".stripMargin
  }

  /** kNN label vote: majority label of the brute-force top-5 (embedding
    * near-dup / classification building block). Tie → smaller label.
    */
  def knnLabel(spark: SparkSession, dir: String): DataFrame = {
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("cast(vec_id as long) as n_id", "cast(label as long) as label")
    annBrute(spark, dir)
      .join(labels, "n_id")
      .groupBy(col("q_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("q_id"))
          .orderBy(col("votes").desc, col("label").asc)))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("label").as("pred_label"), col("votes"))
  }

  val knnLabelSql: String =
    s"""WITH topk AS ($annBruteSql),
       |v AS (SELECT t.q_id, CAST(e.label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS votes
       |  FROM topk t JOIN embeddings e ON CAST(e.vec_id AS BIGINT) = t.n_id
       |  GROUP BY t.q_id, e.label),
       |r AS (SELECT q_id, label, votes,
       |    row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, label) AS rn FROM v)
       |SELECT q_id, label AS pred_label, votes FROM r WHERE rn = 1""".stripMargin

  /** IVF-style ANN: a deterministic 8-centroid codebook (the embeddings
    * with vec_id 0..7 — a fixed "trained" codebook stand-in), every vector
    * assigned to its nearest centroid, then each query searches ONLY its
    * own cell: top-3 by cosine. At 100 TB the cell assignment is a
    * write-time partition column and a probe touches 1/K of the data;
    * here the cell join IS that pruning.
    *
    * The codebook is a driver-side model artifact (exactly as
    * KMeansModel.clusterCenters would be): 8×64 floats collected once and
    * inlined as literals, so nearest-centroid assignment is a single
    * narrow projection — the 8 cosines in one array, argmax via
    * array_position(array_max) — ZERO exchange, no per-row window. Ties
    * resolve to the smallest c_id because the sim array is ordered by
    * c_id and array_position takes the first occurrence (same tiebreak as
    * the oracle's ORDER BY c_sim DESC, c_id).
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val all = embeddings(spark, dir)
    val cents = all.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding"), col("nrm"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
      .sortBy(_._1)
    val cSims = cents.map { case (_, emb, cnrm) =>
      val centLit = array(emb.map(v => lit(v)): _*)
      round(
        aggregate(
          zip_with(col("embedding"), centLit, (a, b) => a.cast("double") * b.cast("double")),
          lit(0.0), (acc, x) => acc + x) / sqrt(lit(cnrm) * col("nrm")), 6)
    }
    val cellIds = array(cents.map(c => lit(c._1)): _*)
    val assigned = all
      .withColumn("c_sims", array(cSims.toIndexedSeq: _*))
      .withColumn("cell",
        element_at(cellIds, array_position(col("c_sims"), array_max(col("c_sims"))).cast("int")))
      .drop("c_sims")
    val q = assigned.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"),
        col("nrm").as("q_nrm"), col("cell").as("q_cell"))
    val scored = assigned
      .join(broadcast(q), col("cell") === col("q_cell") && col("vec_id") =!= col("q_id"))
      .withColumn("sim", round(expr(DotExpr) / sqrt(col("q_nrm") * col("nrm")), 4))
    topkTail(scored, 3)
  }

  val annIvfSql: String =
    """WITH n AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding::DOUBLE[] AS e,
      |    list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nrm
      |  FROM embeddings),
      |c AS (SELECT vec_id AS c_id, e AS ce, nrm AS cnrm FROM n WHERE vec_id < 8),
      |sc AS (SELECT n.vec_id, n.e, n.nrm, c.c_id,
      |    round(list_inner_product(n.e, c.ce) / sqrt(c.cnrm * n.nrm), 6) AS c_sim
      |  FROM n, c),
      |asg AS (SELECT vec_id, e, nrm, c_id AS cell FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, c_id) AS rn
      |    FROM sc) WHERE rn = 1),
      |q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qnrm, cell AS q_cell
      |  FROM asg WHERE vec_id % 100 = 0),
      |s AS (SELECT q.q_id, p.vec_id AS n_id,
      |    round(list_inner_product(q.qe, p.e) / sqrt(q.qnrm * p.nrm), 4) AS sim
      |  FROM q JOIN asg p ON p.cell = q.q_cell AND p.vec_id <> q.q_id),
      |r AS (SELECT q_id, n_id, sim,
      |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT) AS rn
      |  FROM s)
      |SELECT q_id, n_id, rn, sim FROM r WHERE rn <= 3""".stripMargin


  /** Multi-probe sign-LSH (Lv et al. 2007's trick on the sign family):
    * each query searches its own bucket PLUS the 8 buckets at Hamming
    * distance 1 (one sign bit flipped) — recovering neighbors that fell
    * just across a hyperplane without any extra index. Probes explode
    * on the SMALL query side only (9 rows per query, still broadcast);
    * the corpus keeps exactly one bucket per point, so the scan cost is
    * unchanged and buckets stay disjoint (no candidate dedup needed).
    */
  def annMultiprobe(spark: SparkSession, dir: String): DataFrame = {
    val all = embeddings(spark, dir).withColumn("bucket", expr(BucketExpr))
    val probes =
      "array(bucket, " + (1 to 8).map { i =>
        s"concat(substring(bucket, 1, ${i - 1}), " +
          s"case when substring(bucket, $i, 1) = '1' then '0' else '1' end, " +
          s"substring(bucket, ${i + 1}))"
      }.mkString(", ") + ")"
    val q = all.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"),
        col("nrm").as("q_nrm"), explode(expr(probes)).as("q_bucket"))
    val scored = all.join(broadcast(q), col("bucket") === col("q_bucket") &&
        col("vec_id") =!= col("q_id"))
      .withColumn("sim", round(expr(DotExpr) / sqrt(col("q_nrm") * col("nrm")), 4))
    topkTail(scored, 3)
  }

  val annMultiprobeSql: String = {
    val bucket = (1 to 8)
      .map(i => s"(CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")
    s"""WITH n AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding::DOUBLE[] AS e,
       |    list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nrm,
       |    $bucket AS bucket
       |  FROM embeddings),
       |q0 AS (SELECT * FROM n WHERE vec_id % 100 = 0),
       |qp AS (SELECT vec_id, e, nrm,
       |    CASE WHEN i = 0 THEN bucket
       |         ELSE substr(bucket, 1, i - 1) ||
       |           (CASE WHEN substr(bucket, i, 1) = '1' THEN '0' ELSE '1' END) ||
       |           substr(bucket, i + 1) END AS pbucket
       |  FROM q0, (SELECT CAST(unnest(range(0, 9)) AS INT) AS i)),
       |s AS (SELECT qp.vec_id AS q_id, p.vec_id AS n_id,
       |    round(list_inner_product(qp.e, p.e) / sqrt(qp.nrm * p.nrm), 4) AS sim
       |  FROM qp JOIN n p ON p.bucket = qp.pbucket AND p.vec_id <> qp.vec_id),
       |r AS (SELECT q_id, n_id, sim,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS BIGINT) AS rn
       |  FROM s)
       |SELECT q_id, n_id, rn, sim FROM r WHERE rn <= 3""".stripMargin
  }

  /** Recall@3 of the sign-LSH path against brute-force ground truth —
    * the evaluation op any approximate index needs before it replaces the
    * exact one. Both sides reuse the production queries; the oracle
    * composes the same two pipelines in SQL, so the recall numbers are
    * exact, per query vector.
    */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val truth = annBrute(spark, dir).filter(col("rn") <= 3)
      .select(col("q_id"), col("n_id"))
    val approx = annLsh(spark, dir)
      .select(col("q_id").as("a_q"), col("n_id").as("a_n"))
    truth.join(approx,
        col("q_id") === col("a_q") && col("n_id") === col("a_n"), "left")
      .groupBy(col("q_id"))
      .agg(count(col("a_n")).as("hits"))
      .select(col("q_id"), col("hits"),
        round(col("hits").cast("double") / 3.0, 6).as("recall_at_3"))
  }

  val annRecallSql: String =
    s"""WITH t0 AS ($annBruteSql),
       |t AS (SELECT q_id, n_id FROM t0 WHERE rn <= 3),
       |a AS ($annLshSql)
       |SELECT t.q_id, CAST(count(a.n_id) AS BIGINT) AS hits,
       |  round(CAST(count(a.n_id) AS DOUBLE) / 3.0, 6) AS recall_at_3
       |FROM t LEFT JOIN a ON a.q_id = t.q_id AND a.n_id = t.n_id
       |GROUP BY t.q_id""".stripMargin

  /** Distributed Lloyd k-means (k=4, 2 update rounds) over the
    * embeddings — the corpus-clustering step a training-data pipeline
    * runs for topic balancing / mixture design before sampling.
    *
    * 100 TB shape (the same split as Spark MLlib's KMeans): the model is
    * tiny and driver-held, the data never shuffles in full —
    *  - ASSIGNMENT is a narrow projection: centroids inlined as literals
    *    (the [[annIvf]] codebook pattern), per-point argmin over k
    *    integer distance keys, zero exchange;
    *  - UPDATE is a partial-agg'd `groupBy(cluster, dim)` over exploded
    *    components — exactly k×64 = 256 keys cross the exchange with
    *    map-side combine, then 256 rows collect to the driver to form
    *    the next codebook.
    *
    * Cross-engine exactness by construction (no float-summation-order
    * hazard, unlike a naive port): points quantize to integers
    * (round(e·100)), centroids to fixed-point ×10⁴ (HALF_UP — DuckDB's
    * round matches), and the distance key
    * 10⁸·q·q − 2·10⁴·q·s + s·s is integral and < 2⁵³, so every partial
    * sum is exact in BOTH engines regardless of order, and argmin can
    * never flip. Ties break to the smallest cluster id on both sides.
    */
  def kmeansAssign(spark: SparkSession, dir: String): DataFrame = {
    val k = 4
    val pts = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("cast(vec_id as long) as vec_id",
        "transform(embedding, x -> cast(round(cast(x as double) * 100) as bigint)) as q")

    val seeds = pts.filter(col("vec_id") < k).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    var clusterIds: Array[Long] = seeds.map(_._1)
    var cents: Array[Array[Long]] = seeds.map(_._2.map(_ * 10000L))

    def assigned(): DataFrame = {
      val distCols = cents.map { s =>
        val sLit = array(s.map(v => lit(v)).toIndexedSeq: _*)
        aggregate(
          zip_with(col("q"), sLit, (a, b) => {
            val d = a * lit(10000L) - b
            d * d
          }),
          lit(0L), (acc, x) => acc + x)
      }
      pts.withColumn("dks", array(distCols.toIndexedSeq: _*))
        .withColumn("dist_key", array_min(col("dks")))
        .withColumn("cluster",
          element_at(array(clusterIds.map(lit(_)).toIndexedSeq: _*),
            array_position(col("dks"), col("dist_key")).cast("int")))
        .drop("dks")
    }

    def halfUp(x: Double): Long =
      new java.math.BigDecimal(x).setScale(0, java.math.RoundingMode.HALF_UP).longValue

    var t = 0
    while (t < 2) {
      val rows = assigned()
        .select(col("cluster"), posexplode(col("q")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byCluster = rows.groupBy(_.getLong(0)).toArray.sortBy(_._1)
      clusterIds = byCluster.map(_._1)
      cents = byCluster.map { case (_, rs) =>
        val dim = new Array[Long](64)
        rs.foreach(r => dim(r.getInt(1)) = halfUp(10000.0 * r.getLong(2) / r.getLong(3)))
        dim
      }
      t += 1
    }
    assigned().select(col("vec_id"), col("cluster"), col("dist_key"))
  }

  val kmeansAssignSql: String = {
    // one assignment round against centroid CTE `cN` (s: fixed-point list)
    def assign(src: String, cn: String, out: String): String =
      s"""$out AS (SELECT vec_id, q, j AS cluster, dk FROM (
         |  SELECT p.vec_id, p.q, c.j,
         |    100000000 * list_inner_product(p.q, p.q)
         |      - 20000 * list_inner_product(p.q, c.s)
         |      + list_inner_product(c.s, c.s) AS dk,
         |    row_number() OVER (PARTITION BY p.vec_id ORDER BY
         |      100000000 * list_inner_product(p.q, p.q)
         |        - 20000 * list_inner_product(p.q, c.s)
         |        + list_inner_product(c.s, c.s), c.j) AS rn
         |  FROM $src p, $cn c) WHERE rn = 1)""".stripMargin
    // one update round: exact integer component sums → HALF_UP fixed point
    def update(an: String, out: String): String =
      s"""$out AS (SELECT cluster AS j, list(s_i ORDER BY i) AS s FROM (
         |  SELECT cluster, i, round(10000.0 * sum(q[i]) / count(*)) AS s_i
         |  FROM $an, (SELECT unnest(range(1, 65)) AS i) dims
         |  GROUP BY cluster, i) GROUP BY cluster)""".stripMargin
    s"""WITH p AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
       |    list_transform(embedding::DOUBLE[], x -> round(x * 100)) AS q
       |  FROM embeddings),
       |c0 AS (SELECT vec_id AS j, list_transform(q, x -> x * 10000) AS s
       |  FROM p WHERE vec_id < 4),
       |${assign("p", "c0", "a1")},
       |${update("a1", "c1")},
       |${assign("p", "c1", "a2")},
       |${update("a2", "c2")},
       |${assign("p", "c2", "a3")}
       |SELECT vec_id, cluster, CAST(dk AS BIGINT) AS dist_key FROM a3""".stripMargin
  }

  /** Per-vector int8 (0..255) min-max quantization — the storage-side
    * compression every large vector store applies (4× smaller than
    * float32 before any index). Outputs the dequant params, the exact
    * integer code sum (order-independent — pins every code), and the max
    * reconstruction error. Pure codegen projection, zero shuffle; the
    * same arithmetic formula text runs in both engines so the doubles
    * agree bit-for-bit before rounding.
    */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("cast(vec_id as long) as vec_id",
        "transform(embedding, x -> cast(x as double)) as de")
      .selectExpr("vec_id", "de",
        "array_min(de) as mn", "array_max(de) as mx")
      .selectExpr("vec_id", "de", "mn", "(mx - mn) / 255.0D as s",
        "round(mn, 6) as q_min", "round(mx, 6) as q_max")
      .selectExpr("vec_id", "q_min", "q_max",
        """aggregate(
          |  transform(de, x -> case when s = 0D then 0L
          |                     else cast(round((x - mn) / s) as bigint) end),
          |  0L, (acc, c) -> acc + c) as code_sum""".stripMargin,
        """round(array_max(transform(de, x ->
          |  abs(x - (mn + (case when s = 0D then 0D
          |                 else round((x - mn) / s) end) * s)))), 6) as max_err""".stripMargin)

  val embedQuantizeSql: String =
    """WITH b AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding::DOUBLE[] AS de
      |  FROM embeddings),
      |m AS (SELECT vec_id, de, list_min(de) AS mn, list_max(de) AS mx FROM b),
      |c AS (SELECT vec_id, de, mn, (mx - mn) / 255.0 AS s,
      |  round(mn, 6) AS q_min, round(mx, 6) AS q_max FROM m)
      |SELECT vec_id, q_min, q_max,
      |  CAST(list_sum(list_transform(de, x ->
      |    CASE WHEN s = 0 THEN 0 ELSE CAST(round((x - mn) / s) AS BIGINT) END)) AS BIGINT) AS code_sum,
      |  round(list_max(list_transform(de, x ->
      |    abs(x - (mn + (CASE WHEN s = 0 THEN 0 ELSE round((x - mn) / s) END) * s)))), 6) AS max_err
      |FROM c""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_quantize" -> (embedQuantize(_, _)),
    "q_kmeans_assign" -> (kmeansAssign(_, _)),
    "q_ann_brute" -> (annBrute(_, _)),
    "q_ann_lsh" -> (annLsh(_, _)),
    "q_ann_multiprobe" -> (annMultiprobe(_, _)),
    "q_ann_ivf" -> (annIvf(_, _)),
    "q_knn_label" -> (knnLabel(_, _)),
    "q_ann_recall" -> (annRecall(_, _)))

  def oracles: Map[String, String] = Map(
    "q_embed_quantize" -> embedQuantizeSql,
    "q_kmeans_assign" -> kmeansAssignSql,
    "q_ann_brute" -> annBruteSql,
    "q_ann_lsh" -> annLshSql,
    "q_ann_multiprobe" -> annMultiprobeSql,
    "q_ann_ivf" -> annIvfSql,
    "q_knn_label" -> knnLabelSql,
    "q_ann_recall" -> annRecallSql)
}

package graft.operators

import graft.{Q, Tables}
import graft.functions.{TextFns, VecFns}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (array<float> column).
  *
  * Two plans for the same ask:
  *  - brute-force cosine top-k with the (tiny) query set broadcast — the
  *    baseline: corpus is scanned once, never shuffled, never self-joined;
  *  - random-hyperplane LSH: corpus and queries are bucketed by sign bits and
  *    candidates come from an equi-join on the bucket id — the 100 TB path.
  *
  * Scores are rounded to 6 decimals BEFORE ranking, and LSH sign tests use
  * dots rounded to 9, so ordering and bucketing are reproducible bit-for-bit
  * against the DuckDB oracle despite float-summation order differences.
  */
object Similarity {

  private val K = 5           // neighbours returned per query (brute force)
  private val NQ = 5          // query vectors: vec_id < NQ
  private val Planes = 8      // LSH hyperplanes → 2^8 buckets
  private val Dims = 64

  /** Brute-force cosine top-k: one corpus scan × broadcast queries. Norms are
    * precomputed per side (once per vector, not once per pair) so the per-pair
    * work is a single dot fold.
    */
  def cosineTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        sqrt(VecFns.sqNorm(col("embedding"))).as("qnorm"))
    val c = embeddings.filter(col("vec_id") >= NQ)
      .select(col("vec_id").as("c_id"), col("embedding").as("ce"),
        sqrt(VecFns.sqNorm(col("embedding"))).as("cnorm"))
    // native codegen'd expression when the GraftExtensions session extension
    // is installed; HOF fallback otherwise — bit-identical either way
    val cos =
      if (embeddings.sparkSession.catalog.functionExists("graft_cosine"))
        expr("graft_cosine(qe, ce)")
      else VecFns.dot(col("qe"), col("ce")) / (col("qnorm") * col("cnorm"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("q_id"), col("c_id"), round(cos, 6).as("score"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("score").desc, col("c_id"))))
      .filter(col("rank") <= k)
      .orderBy("q_id", "rank")
  }

  val annCosine = Q(
    "q_ann_cosine",
    (s, d) => cosineTopK(Tables.embeddings(s, d), K),
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < $NQ),
       |c AS (SELECT vec_id AS c_id, embedding AS ce FROM embeddings WHERE vec_id >= $NQ),
       |sums AS (
       |  SELECT q_id, c_id,
       |    sum(CAST(qx AS DOUBLE)*CAST(cx AS DOUBLE)) AS dot,
       |    sum(CAST(qx AS DOUBLE)*CAST(qx AS DOUBLE)) AS qn,
       |    sum(CAST(cx AS DOUBLE)*CAST(cx AS DOUBLE)) AS cn
       |  FROM (SELECT q_id, c_id, unnest(qe) AS qx, unnest(ce) AS cx FROM q, c)
       |  GROUP BY q_id, c_id),
       |ranked AS (
       |  SELECT q_id, c_id, round(dot/(sqrt(qn)*sqrt(cn)), 6) AS score,
       |         row_number() OVER (PARTITION BY q_id ORDER BY round(dot/(sqrt(qn)*sqrt(cn)), 6) DESC, c_id) AS rank
       |  FROM sums)
       |SELECT q_id, c_id, score, CAST(rank AS BIGINT) AS rank FROM ranked
       |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin
  )

  /** Plan-build-time twin of TextFns.hash32 (see TextFns.hashN — the single
    * home of the md5-hex-prefix contract).
    */
  private def h32(s: String): Long = TextFns.hashN(s, 8)

  /** Random-hyperplane sign-bit bucket as ONE projection: for each plane j the
    * dot product is a left fold of the embedding against a literal weight
    * array — no posexplode, no broadcast join, no aggregation, zero shuffles.
    * Weights derive from md5 exactly as the oracle regenerates them
    * (w = (hash32("p<j>_<k>") % 2001 - 1000)/1000); the fold accumulates in k
    * order, the same order the previous grouped-sum and the oracle's unnest
    * sum use, and dots are rounded to 9 before the sign test, so bucket ids
    * are bit-identical to the oracle's.
    */
  def lshBucketExpr(embedding: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until Planes).map { j =>
      val w = array((0 until Dims).map(k => lit((h32(s"p${j}_$k") % 2001L - 1000L) / 1000.0)): _*)
      val dj = round(
        aggregate(zip_with(embedding, w, (x, wk) => x.cast("double") * wk),
          lit(0.0), (acc, v) => acc + v), 9)
      when(dj >= 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Embeddings with their LSH bucket attached — a single narrow projection
    * over the scan (the 100 TB shape: bucketing costs one pass, the only
    * shuffle in an LSH query is the candidate equi-join itself).
    *
    * zip_with pads a short array with nulls, which would silently force a
    * plane bit to 0 for a wrong-length embedding — so a dim != Dims vector
    * fails the job loudly here instead of corrupting its bucket.
    */
  def withLshBucket(embeddings: DataFrame): DataFrame = {
    val checked = when(size(col("embedding")) === Dims, col("embedding"))
      .otherwise(raise_error(concat(
        lit(s"graft: embedding dim != $Dims: "), size(col("embedding")).cast("string"))))
    embeddings.withColumn("bucket", lshBucketExpr(checked))
  }

  /** LSH ANN: candidates share a bucket (equi-join), cosine only on those. */
  def annLshTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val withVec = withLshBucket(embeddings)
    val q = withVec.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("bucket"), col("embedding").as("qe"))
    val c = withVec.filter(col("vec_id") >= NQ)
      .select(col("vec_id").as("c_id"), col("bucket"), col("embedding").as("ce"))
    val cos =
      if (embeddings.sparkSession.catalog.functionExists("graft_cosine"))
        expr("graft_cosine(qe, ce)")
      else VecFns.cosine(col("qe"), col("ce"))
    q.join(c, Seq("bucket"))
      .select(col("q_id"), col("c_id"), col("bucket"), round(cos, 6).as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("score").desc, col("c_id"))))
      .filter(col("rank") <= k)
      .orderBy("q_id", "rank")
  }

  val annLsh = Q(
    "q_ann_lsh",
    (s, d) => annLshTopK(Tables.embeddings(s, d), 3),
    s"""WITH planes AS (
       |  SELECT CAST(floor(i/$Dims.0) AS BIGINT) AS j, i % $Dims AS k,
       |    ((${TextFns.hash32Sql(s"'p'||CAST(CAST(floor(i/$Dims.0) AS BIGINT) AS VARCHAR)||'_'||CAST(i%$Dims AS VARCHAR)")} % 2001) - 1000)/1000.0 AS w
       |  FROM unnest(range(${Planes * Dims})) AS t(i)),
       |vx AS (SELECT vec_id, unnest(embedding) AS x, unnest(range($Dims)) AS k FROM embeddings),
       |dotj AS (SELECT vec_id, j, round(sum(CAST(x AS DOUBLE)*w), 9) AS dj
       |         FROM vx JOIN planes USING(k) GROUP BY vec_id, j),
       |buckets AS (SELECT vec_id, CAST(sum(CASE WHEN dj >= 0 THEN CAST(power(2,j) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
       |            FROM dotj GROUP BY vec_id),
       |q AS (SELECT b.vec_id AS q_id, b.bucket, e.embedding AS qe
       |      FROM buckets b JOIN embeddings e ON e.vec_id=b.vec_id WHERE b.vec_id < $NQ),
       |c AS (SELECT b.vec_id AS c_id, b.bucket, e.embedding AS ce
       |      FROM buckets b JOIN embeddings e ON e.vec_id=b.vec_id WHERE b.vec_id >= $NQ),
       |sums AS (
       |  SELECT q_id, c_id, bucket,
       |    sum(CAST(qx AS DOUBLE)*CAST(cx AS DOUBLE)) AS dot,
       |    sum(CAST(qx AS DOUBLE)*CAST(qx AS DOUBLE)) AS qn,
       |    sum(CAST(cx AS DOUBLE)*CAST(cx AS DOUBLE)) AS cn
       |  FROM (SELECT q.q_id, c.c_id, q.bucket, unnest(q.qe) AS qx, unnest(c.ce) AS cx
       |        FROM q JOIN c ON q.bucket = c.bucket)
       |  GROUP BY q_id, c_id, bucket),
       |ranked AS (
       |  SELECT q_id, c_id, bucket, round(dot/(sqrt(qn)*sqrt(cn)), 6) AS score,
       |         row_number() OVER (PARTITION BY q_id ORDER BY round(dot/(sqrt(qn)*sqrt(cn)), 6) DESC, c_id) AS rank
       |  FROM sums)
       |SELECT q_id, c_id, bucket, score, CAST(rank AS BIGINT) AS rank FROM ranked
       |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
  )

  /** Embedding-cosine near-dup: pairs of corpus vectors sharing an LSH bucket
    * with cosine ≥ threshold. The all-pairs comparison never happens — the
    * bucket equi-join is the only pair generator, exactly the dedup shape the
    * ANN path uses for queries.
    */
  val dedupEmbed = Q(
    "q_dedup_embed",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val withVec = withLshBucket(emb)
      val a = withVec.select(col("vec_id").as("v1"), col("bucket"), col("embedding").as("qe"))
      val b = withVec.select(col("vec_id").as("v2"), col("bucket"), col("embedding").as("ce"))
      val cos =
        if (emb.sparkSession.catalog.functionExists("graft_cosine")) expr("graft_cosine(qe, ce)")
        else VecFns.cosine(col("qe"), col("ce"))
      a.join(b, Seq("bucket"))
        .filter(col("v1") < col("v2"))
        .select(col("v1"), col("v2"), col("bucket"), round(cos, 6).as("cosine"))
        .filter(col("cosine") >= 0.4)
        .orderBy("v1", "v2")
    },
    s"""WITH planes AS (
       |  SELECT CAST(floor(i/$Dims.0) AS BIGINT) AS j, i % $Dims AS k,
       |    ((${TextFns.hash32Sql(s"'p'||CAST(CAST(floor(i/$Dims.0) AS BIGINT) AS VARCHAR)||'_'||CAST(i%$Dims AS VARCHAR)")} % 2001) - 1000)/1000.0 AS w
       |  FROM unnest(range(${Planes * Dims})) AS t(i)),
       |vx AS (SELECT vec_id, unnest(embedding) AS x, unnest(range($Dims)) AS k FROM embeddings),
       |dotj AS (SELECT vec_id, j, round(sum(CAST(x AS DOUBLE)*w), 9) AS dj
       |         FROM vx JOIN planes USING(k) GROUP BY vec_id, j),
       |buckets AS (SELECT vec_id, CAST(sum(CASE WHEN dj >= 0 THEN CAST(power(2,j) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
       |            FROM dotj GROUP BY vec_id),
       |withvec AS (SELECT b.vec_id, b.bucket, e.embedding FROM buckets b JOIN embeddings e ON e.vec_id = b.vec_id),
       |sums AS (
       |  SELECT v1, v2, bucket,
       |    sum(CAST(qx AS DOUBLE)*CAST(cx AS DOUBLE)) AS dot,
       |    sum(CAST(qx AS DOUBLE)*CAST(qx AS DOUBLE)) AS qn,
       |    sum(CAST(cx AS DOUBLE)*CAST(cx AS DOUBLE)) AS cn
       |  FROM (SELECT a.vec_id AS v1, b.vec_id AS v2, a.bucket, unnest(a.embedding) AS qx, unnest(b.embedding) AS cx
       |        FROM withvec a JOIN withvec b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |  GROUP BY v1, v2, bucket)
       |SELECT v1, v2, bucket, round(dot/(sqrt(qn)*sqrt(cn)), 6) AS cosine FROM sums
       |WHERE round(dot/(sqrt(qn)*sqrt(cn)), 6) >= 0.4 ORDER BY v1, v2""".stripMargin
  )

  /** IVF-style ANN: corpus is partitioned into cells around sampled centroid
    * vectors (vec_id 100..115 — IVF with sampled centroids, no iterative
    * k-means needed for determinism); queries probe only their own cell. Both
    * assignment and in-cell ranking order by pre-rounded cosine + id, so cell
    * membership and results reproduce exactly in the oracle. At 100 TB this is
    * the standard inverted-file layout: assignment is a broadcast of 16
    * centroids over one corpus scan, search touches ~1/16 of the corpus.
    */
  val annIvf = Q(
    "q_ann_ivf",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = emb.filter(col("vec_id") >= 100L && col("vec_id") < 116L)
        .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
      def cos =
        if (s.catalog.functionExists("graft_cosine")) expr("graft_cosine(qe, ce)")
        else VecFns.cosine(col("qe"), col("ce"))
      def assign(df: org.apache.spark.sql.DataFrame, idCol: String) = df
        .select(col("vec_id").as(idCol), col("embedding").as("qe"))
        .crossJoin(broadcast(cents))
        .select(col(idCol), col("cent_id"), round(cos, 6).as("cscore"), col("qe"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(idCol).orderBy(col("cscore").desc, col("cent_id"))))
        .filter(col("rn") === 1)
        .select(col(idCol), col("cent_id").as("cell"), col("qe"))
      val qCells = assign(emb.filter(col("vec_id") < NQ), "q_id")
      val cCells = assign(emb.filter(col("vec_id") >= NQ), "c_id")
        .withColumnRenamed("qe", "ce")
      qCells.join(cCells, Seq("cell"))
        .select(col("q_id"), col("c_id"), col("cell"), round(cos, 6).as("score"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(col("score").desc, col("c_id"))))
        .filter(col("rank") <= 3)
        .orderBy("q_id", "rank")
    },
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
       |               WHERE vec_id >= 100 AND vec_id < 116),
       |asums AS (
       |  SELECT vid, cent_id,
       |    sum(CAST(qx AS DOUBLE)*CAST(cx AS DOUBLE)) AS dot,
       |    sum(CAST(qx AS DOUBLE)*CAST(qx AS DOUBLE)) AS qn,
       |    sum(CAST(cx AS DOUBLE)*CAST(cx AS DOUBLE)) AS cn
       |  FROM (SELECT e.vec_id AS vid, c.cent_id, unnest(e.embedding) AS qx, unnest(c.ce) AS cx
       |        FROM embeddings e, cents c)
       |  GROUP BY vid, cent_id),
       |cells AS (
       |  SELECT vid, cent_id AS cell FROM (
       |    SELECT vid, cent_id,
       |      row_number() OVER (PARTITION BY vid ORDER BY round(dot/(sqrt(qn)*sqrt(cn)), 6) DESC, cent_id) AS rn
       |    FROM asums) WHERE rn = 1),
       |q AS (SELECT c.vid AS q_id, c.cell, e.embedding AS qe FROM cells c
       |      JOIN embeddings e ON e.vec_id = c.vid WHERE c.vid < $NQ),
       |co AS (SELECT c.vid AS c_id, c.cell, e.embedding AS ce FROM cells c
       |       JOIN embeddings e ON e.vec_id = c.vid WHERE c.vid >= $NQ),
       |sums AS (
       |  SELECT q_id, c_id, cell,
       |    sum(CAST(qx AS DOUBLE)*CAST(cx AS DOUBLE)) AS dot,
       |    sum(CAST(qx AS DOUBLE)*CAST(qx AS DOUBLE)) AS qn,
       |    sum(CAST(cx AS DOUBLE)*CAST(cx AS DOUBLE)) AS cn
       |  FROM (SELECT q.q_id, co.c_id, q.cell, unnest(q.qe) AS qx, unnest(co.ce) AS cx
       |        FROM q JOIN co ON q.cell = co.cell)
       |  GROUP BY q_id, c_id, cell),
       |ranked AS (
       |  SELECT q_id, c_id, cell, round(dot/(sqrt(qn)*sqrt(cn)), 6) AS score,
       |         row_number() OVER (PARTITION BY q_id ORDER BY round(dot/(sqrt(qn)*sqrt(cn)), 6) DESC, c_id) AS rank
       |  FROM sums)
       |SELECT q_id, c_id, cell, score, CAST(rank AS BIGINT) AS rank FROM ranked
       |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
  )

  /** Embedding column stats per label: norms via ordered double folds. */
  val embedStats = Q(
    "q_embed_stats",
    (s, d) => {
      val nrm = VecFns.norm(col("embedding"))
      Tables.embeddings(s, d)
        .select(col("label"), nrm.as("nrm"), size(col("embedding")).cast("long").as("dim"))
        .groupBy("label")
        .agg(
          count(lit(1)).as("n"),
          round(avg(col("nrm")), 6).as("avg_norm"),
          round(min(col("nrm")), 6).as("min_norm"),
          round(max(col("nrm")), 6).as("max_norm"),
          min(col("dim")).as("min_dim"),
          max(col("dim")).as("max_dim"))
        .orderBy("label")
    },
    """SELECT label, count(*) AS n,
      |round(avg(nrm), 6) AS avg_norm, round(min(nrm), 6) AS min_norm, round(max(nrm), 6) AS max_norm,
      |CAST(min(dim) AS BIGINT) AS min_dim, CAST(max(dim) AS BIGINT) AS max_dim
      |FROM (SELECT label, sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm,
      |      len(embedding) AS dim FROM embeddings)
      |GROUP BY label ORDER BY label""".stripMargin
  )

  val all: Seq[Q] = Seq(annCosine, annLsh, annIvf, dedupEmbed, embedStats)
}

package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text analysis for a training-data pipeline: stats, token counting,
  * language-ID heuristic, quality scoring, fingerprinting. All pure built-in
  * column functions (codegen'd, pushdown-safe) + single hash aggregates — the
  * shapes that stay linear at 100 TB.
  */
object TextAnalysis {

  private val wsTokens = size(split(col("text"), " ")).cast("long")

  /** Corpus stats by (lang, source) — distribution monitoring. */
  val textStats = Q(
    "q_text_stats",
    (s, d) =>
      Tables.documents(s, d)
        .groupBy("lang", "source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(wsTokens).as("total_tokens"),
          round(sum(wsTokens).cast("double") / count(lit(1)), 6).as("avg_tokens"))
        .orderBy("lang", "source"),
    """SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |CAST(sum(len(string_split(text,' '))) AS BIGINT) AS total_tokens,
      |round(CAST(sum(len(string_split(text,' '))) AS DOUBLE)/count(*), 6) AS avg_tokens
      |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin
  )

  /** Token counting: whitespace tokens, word-run tokens, and a BPE-ish
    * greedy-4-char-chunk count — all regexp-based, no UDF.
    */
  val tokenCount = Q(
    "q_token_count",
    (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        col("n_chars"),
        length(col("text")).cast("long").as("text_len"),
        wsTokens.as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z0-9]+")).cast("long").as("word_tokens"),
        regexp_count(col("text"), lit("[a-z]{1,4}")).cast("long").as("bpe_ish_tokens")
      ).orderBy("doc_id"),
    """SELECT doc_id, n_chars, CAST(length(text) AS BIGINT) AS text_len,
      |CAST(len(string_split(text,' ')) AS BIGINT) AS ws_tokens,
      |CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS word_tokens,
      |CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS BIGINT) AS bpe_ish_tokens
      |FROM documents ORDER BY doc_id""".stripMargin
  )

  private val markers = Seq(
    "m_common"     -> "(the|a|fast|slow|small|big)",
    "m_relational" -> "(table|row|column|key|join|filter)",
    "m_engine"     -> "(spark|stream|batch|window|vector|hash)")

  /** Language-ID heuristic: marker-word hit counts + argmax (the n-gram
    * heuristic shape; marker sets are over the synthetic vocab).
    */
  /** Marker counts + the argmax class prediction — the shared relation
    * behind q_lang_id (per-doc report) and q_langid_confusion (the eval).
    */
  private def withPredictedClass(docs: DataFrame): DataFrame = {
    val withM = markers.foldLeft(docs) { case (df, (name, re)) =>
      df.withColumn(name, regexp_count(col("text"), lit("\\b" + re + "\\b")).cast("long"))
    }
    withM.withColumn("pred_class",
      when(col("m_common") >= col("m_relational") && col("m_common") >= col("m_engine"), "common")
        .when(col("m_relational") >= col("m_engine"), "relational")
        .otherwise("engine"))
  }

  val langId = Q(
    "q_lang_id",
    (s, d) => withPredictedClass(Tables.documents(s, d))
      .select(col("doc_id"), col("lang"),
        col("m_common"), col("m_relational"), col("m_engine"), col("pred_class"))
      .orderBy("doc_id"), {
      val ms = markers.map { case (name, re) =>
        s"CAST(len(regexp_extract_all(text, '\\b$re\\b')) AS BIGINT) AS $name"
      }.mkString(", ")
      s"""SELECT doc_id, lang, m_common, m_relational, m_engine,
         |CASE WHEN m_common >= m_relational AND m_common >= m_engine THEN 'common'
         |     WHEN m_relational >= m_engine THEN 'relational' ELSE 'engine' END AS pred_class
         |FROM (SELECT doc_id, lang, $ms FROM documents) ORDER BY doc_id""".stripMargin
    }
  )

  /** Quality scoring: uniqueness / stopword / alphabetic ratios + a blended
    * score — the usual pre-training corpus filters.
    */
  val qualityScore = Q(
    "q_quality_score",
    (s, d) => {
      val t = split(col("text"), " ")
      val n = size(t).cast("double")
      val uniq = size(array_distinct(t)).cast("double") / n
      val stop = regexp_count(col("text"), lit("\\b(the|a)\\b")).cast("double") / n
      val alpha = length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") / length(col("text")).cast("double")
      // the weighted sum runs in exact DECIMAL over the pre-rounded
      // components: 6-decimal values × 0.4/0.3 weights produce exact
      // 7th-decimal halves, which double rounding resolves differently
      // across engines (observed: 1 row in 50k at sf0.1) — decimal HALF_UP
      // agrees everywhere
      val dec = org.apache.spark.sql.types.DecimalType(18, 6)
      val quality = round(
        round(uniq, 6).cast(dec) * lit(BigDecimal("0.4")) +
          (lit(BigDecimal("1.0")) - round(stop, 6).cast(dec)) * lit(BigDecimal("0.3")) +
          round(alpha, 6).cast(dec) * lit(BigDecimal("0.3")), 6).cast("double")
      Tables.documents(s, d).select(
        col("doc_id"),
        size(t).cast("long").as("n_tokens"),
        round(uniq, 6).as("uniq_ratio"),
        round(stop, 6).as("stop_ratio"),
        round(alpha, 6).as("alpha_ratio"),
        quality.as("quality")
      ).orderBy("doc_id")
    },
    """SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
      |round(uniq, 6) AS uniq_ratio, round(stop, 6) AS stop_ratio,
      |round(alpha, 6) AS alpha_ratio,
      |CAST(round(CAST(round(uniq,6) AS DECIMAL(18,6))*0.4
      |         + (1.0 - CAST(round(stop,6) AS DECIMAL(18,6)))*0.3
      |         + CAST(round(alpha,6) AS DECIMAL(18,6))*0.3, 6) AS DOUBLE) AS quality
      |FROM (SELECT doc_id, text,
      |  CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)/len(string_split(text,' ')) AS uniq,
      |  CAST(len(regexp_extract_all(text, '\b(the|a)\b')) AS DOUBLE)/len(string_split(text,' ')) AS stop,
      |  CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)/length(text) AS alpha
      |  FROM documents) ORDER BY doc_id""".stripMargin
  )

  /** MODEL-BASED quality filtering (the GPT-3/LLaMA pipeline stage: train a
    * tiny classifier against a reference signal, then score the whole
    * corpus): a LINEAR PROBE fit in CLOSED FORM by ridge-regularized least
    * squares, distilling the [[langId]] marker heuristic (label =
    * `m_common >= m_relational`) into dense weights over per-100-token
    * marker rates. The learned boundary recovers the teacher rule
    * (w1 ≈ −w2, accuracy 0.988 at sf0.01).
    *
    * Distributed discipline is the BPE/IVF "collect only the model"
    * contract, and — unlike iterated gradient descent, which costs one full
    * corpus scan PER step — the closed form needs exactly ONE aggregate
    * over the feature relation: the 9 Gram-matrix/moment sums (X'X, X'y
    * for bias + 2 features). The 3×3 normal equations are solved by
    * Cramer's rule on the driver (9 scalars in, 3 weights out; the corpus
    * never moves), and scoring is a map-side expression any 100 TB scan can
    * run. More features ⟹ a (k+1)×(k+1) solve — still driver-side scalar
    * work for any dense probe that fits a prompt, while the corpus-side
    * plan stays this exact one-aggregate shape.
    *
    * Cross-engine parity by construction: features are pre-rounded to 6
    * decimals, every moment is summed in exact DECIMAL (products of
    * DECIMAL(18,6) casts — exact at scale 12, so summation order cannot
    * matter), the Cramer expressions are written with IDENTICAL association
    * on both engines over the same correctly-rounded double moments, the
    * weights are rounded to 8 decimals, and the accuracy pass re-scores
    * with those ROUNDED weights so the reported margin comparisons are a
    * deterministic function of identical inputs. λ = 1e-6 on the diagonal
    * pins invertibility without visibly biasing the fit.
    *
    * `markerProbe` is the reusable body (any (doc_id, text) relation);
    * it returns the 4-row (param, value) model relation.
    */
  def markerProbe(documents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val s = documents.sparkSession
      import org.apache.spark.sql.types.DecimalType
      val d6 = DecimalType(18, 6)
      val nTok = size(split(col("text"), " ")).cast("double")
      def rate(re: String) =
        round(regexp_count(col("text"), lit("\\b" + re + "\\b")).cast("double") * 100.0 / nTok, 6)
      val mc = rate("(the|a|fast|slow|small|big)")
      val mr = rate("(table|row|column|key|join|filter)")
      val feats = documents.select(
        when(mc >= mr, 1.0).otherwise(0.0).as("y"),
        mc.as("x1"), mr.as("x2")
      ).persist()
      val x1 = col("x1").cast(d6); val x2 = col("x2").cast(d6); val y = col("y").cast(d6)
      // ONE pass: the 9 exact-decimal moments of [1, x1, x2] against itself
      // and against y
      val r = feats.agg(
        count(lit(1)).as("n"),
        sum(x1).as("s1"), sum(x2).as("s2"),
        sum(x1 * x1).as("s11"), sum(x1 * x2).as("s12"), sum(x2 * x2).as("s22"),
        sum(y).as("sy"), sum(y * x1).as("s1y"), sum(y * x2).as("s2y")
      ).collect()(0)
      val n = r.getLong(0).toDouble
      val Seq(s1, s2, s11, s12, s22, sy, s1y, s2y) =
        (1 to 8).map(i => r.getDecimal(i).doubleValue)
      val lam = 1e-6
      // Cramer's rule over A = X'X + λI, b = X'y — association mirrored
      // EXACTLY by the oracle's SQL expressions
      def det3(a: Double, b: Double, c: Double, dd: Double, e: Double, f: Double,
               g: Double, h: Double, i: Double): Double =
        a * (e * i - f * h) - b * (dd * i - f * g) + c * (dd * h - e * g)
      val det = det3(n + lam, s1, s2, s1, s11 + lam, s12, s2, s12, s22 + lam)
      def roundTo(v: Double, scale: Int): Double =
        BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
      val w0 = roundTo(det3(sy, s1, s2, s1y, s11 + lam, s12, s2y, s12, s22 + lam) / det, 8)
      val w1 = roundTo(det3(n + lam, sy, s2, s1, s1y, s12, s2, s2y, s22 + lam) / det, 8)
      val w2 = roundTo(det3(n + lam, s1, sy, s1, s11 + lam, s1y, s2, s12, s2y) / det, 8)
      // train accuracy at the regression threshold 0.5, scored with the
      // ROUNDED weights — one more map-side pass over the cached features
      val m = lit(w0) + lit(w1) * col("x1") + lit(w2) * col("x2")
      val acc = feats.agg(round(avg(
        when((m >= 0.5) === (col("y") === 1.0), 1.0).otherwise(0.0)), 6))
        .collect()(0).getDouble(0)
      feats.unpersist(blocking = false)
      import s.implicits._
      Seq("accuracy" -> acc, "w0" -> w0, "w1" -> w1, "w2" -> w2)
        .toDF("param", "value").orderBy("param")
  }

  val qualityClassifier = Q(
    "q_quality_classifier",
    (s, d) => markerProbe(Tables.documents(s, d)),
    """WITH feat AS (
      |  SELECT CASE WHEN x1 >= x2 THEN 1.0 ELSE 0.0 END AS y, x1, x2
      |  FROM (SELECT
      |    round(CAST(len(regexp_extract_all(text, '\b(the|a|fast|slow|small|big)\b')) AS DOUBLE)
      |          * 100.0 / len(string_split(text, ' ')), 6) AS x1,
      |    round(CAST(len(regexp_extract_all(text, '\b(table|row|column|key|join|filter)\b')) AS DOUBLE)
      |          * 100.0 / len(string_split(text, ' ')), 6) AS x2
      |  FROM documents)),
      |mom AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n,
      |    CAST(CAST(sum(CAST(x1 AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS s1,
      |    CAST(CAST(sum(CAST(x2 AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS s2,
      |    CAST(CAST(sum(CAST(x1 AS DECIMAL(18,6)) * CAST(x1 AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS s11,
      |    CAST(CAST(sum(CAST(x1 AS DECIMAL(18,6)) * CAST(x2 AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS s12,
      |    CAST(CAST(sum(CAST(x2 AS DECIMAL(18,6)) * CAST(x2 AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS s22,
      |    CAST(CAST(sum(CAST(y AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(sum(CAST(y AS DECIMAL(18,6)) * CAST(x1 AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS s1y,
      |    CAST(CAST(sum(CAST(y AS DECIMAL(18,6)) * CAST(x2 AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS s2y
      |  FROM feat),
      |solved AS (
      |  SELECT
      |    (n + 1e-6) * ((s11 + 1e-6) * (s22 + 1e-6) - s12 * s12)
      |      - s1 * (s1 * (s22 + 1e-6) - s12 * s2)
      |      + s2 * (s1 * s12 - (s11 + 1e-6) * s2) AS det,
      |    sy * ((s11 + 1e-6) * (s22 + 1e-6) - s12 * s12)
      |      - s1 * (s1y * (s22 + 1e-6) - s12 * s2y)
      |      + s2 * (s1y * s12 - (s11 + 1e-6) * s2y) AS d0,
      |    (n + 1e-6) * (s1y * (s22 + 1e-6) - s12 * s2y)
      |      - sy * (s1 * (s22 + 1e-6) - s12 * s2)
      |      + s2 * (s1 * s2y - s1y * s2) AS d1,
      |    (n + 1e-6) * ((s11 + 1e-6) * s2y - s1y * s12)
      |      - s1 * (s1 * s2y - s1y * s2)
      |      + sy * (s1 * s12 - (s11 + 1e-6) * s2) AS d2
      |  FROM mom),
      |w AS (SELECT round(d0 / det, 8) AS w0, round(d1 / det, 8) AS w1,
      |             round(d2 / det, 8) AS w2 FROM solved)
      |SELECT param, value FROM (
      |  SELECT 'w0' AS param, w0 AS value FROM w
      |  UNION ALL SELECT 'w1', w1 FROM w
      |  UNION ALL SELECT 'w2', w2 FROM w
      |  UNION ALL SELECT 'accuracy',
      |    (SELECT round(avg(CASE WHEN (w0 + w1 * x1 + w2 * x2 >= 0.5) = (y = 1.0)
      |                           THEN 1.0 ELSE 0.0 END), 6)
      |     FROM feat CROSS JOIN w)
      |) ORDER BY param""".stripMargin
  )

  /** Positional polynomial fingerprint (rolling-hash style), 31-bit-safe:
    * fp = Σ_i (i · (h32(tok_i) mod 2^20)) mod (2^31-1), all arithmetic exactly
    * reproducible in the oracle.
    */
  val fingerprint = Q(
    "q_fingerprint",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .select(col("doc_id"),
          ((col("pos") + 1L) * (TextFns.hash32(col("tok")) % 1048576L) % 2147483647L).as("term"))
        .groupBy("doc_id")
        .agg((sum(col("term")) % 2147483647L).as("fingerprint"), count(lit(1)).as("n_tokens"))
        .orderBy("doc_id"),
    s"""SELECT doc_id, CAST(sum((i * (h % 1048576)) % 2147483647) % 2147483647 AS BIGINT) AS fingerprint,
       |count(*) AS n_tokens FROM (
       |  SELECT doc_id, i, ${TextFns.hash32Sql("tok")} AS h FROM (
       |    SELECT doc_id, unnest(string_split(text,' ')) AS tok,
       |           unnest(range(1, len(string_split(text,' '))+1)) AS i FROM documents))
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )

  /** PII scrubbing: email + phone-shaped spans replaced with typed tags, with
    * per-doc redaction counts — the standard pre-training cleanup pass. Pure
    * regexp column functions (codegen'd, one scan, no shuffle until the
    * ORDER BY). The synthetic corpus has no PII, so deterministic contact
    * strings are seeded per doc first, making every row exercise both
    * patterns; the regexes live in the dialect-shared subset (character
    * classes + bounded repetition) so Java and RE2 agree.
    */
  val redact = Q(
    "q_redact",
    (s, d) => {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "[0-9]{3}-[0-9]{3,4}-[0-9]{3,4}"
      val seeded = concat(
        col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or call 555-"),
        lpad((col("doc_id") % 10000L).cast("string"), 4, "0"), lit("-123 now"))
      Tables.documents(s, d).select(
        col("doc_id"),
        regexp_replace(regexp_replace(seeded, emailRe, "[EMAIL]"), phoneRe, "[PHONE]")
          .as("redacted"),
        regexp_count(seeded, lit(emailRe)).as("n_emails"),
        regexp_count(seeded, lit(phoneRe)).as("n_phones")
      ).orderBy("doc_id")
    },
    """WITH seeded AS (
      |  SELECT doc_id,
      |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or call 555-' ||
      |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '-123 now' AS text
      |  FROM documents)
      |SELECT doc_id,
      |  regexp_replace(
      |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |    '[0-9]{3}-[0-9]{3,4}-[0-9]{3,4}', '[PHONE]', 'g') AS redacted,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3,4}-[0-9]{3,4}')) AS BIGINT) AS n_phones
      |FROM seeded ORDER BY doc_id""".stripMargin
  )

  /** Collocation / phrase detection: top-50 adjacent-word pairs by PMI
    * (pointwise mutual information) — the phrase-merging signal a tokenizer
    * pipeline computes before vocabulary construction. Bigrams come from a
    * per-row `transform` over the token array (no positional self-join on
    * the Spark side — the array is already adjacent in memory), then two
    * hash aggregates + broadcast-joined unigram counts. Scale shape: one
    * shuffle keyed on the pair, one on the word; the top-k is a global sort
    * of the (small) filtered pair set.
    */
  val collocations = Q(
    "q_collocations",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), TextFns.tokens(col("text")).as("ts"))
      val pairs = toks.filter(size(col("ts")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS w1, ts[i+1] AS w2))")).as("p"))
        .select(col("p.w1"), col("p.w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      val uni = toks.select(explode(col("ts")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("c"))
      val total = pairs.agg(sum(col("n_pair")).as("total"))
      val pmi = round(log(
        col("n_pair").cast("double") * col("total").cast("double") /
          (col("c1").cast("double") * col("c2").cast("double"))), 6)
      pairs.filter(col("n_pair") >= 5L)
        .crossJoin(broadcast(total))
        .join(uni.select(col("t").as("w1"), col("c").as("c1")), Seq("w1"))
        .join(uni.select(col("t").as("w2"), col("c").as("c2")), Seq("w2"))
        .select(col("w1"), col("w2"), col("n_pair"), pmi.as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(50)
    },
    """WITH toks AS (
      |  SELECT doc_id, t, i
      |  FROM (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
      |       unnest(range(len(ts))) AS u(i), LATERAL (SELECT ts[i+1] AS t) x),
      |uni AS (SELECT t, count(*) AS c FROM toks GROUP BY t),
      |big AS (
      |  SELECT a.t AS w1, b.t AS w2, count(*) AS c_xy
      |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |  GROUP BY 1, 2),
      |n AS (SELECT sum(c_xy) AS total FROM big)
      |SELECT w1, w2, CAST(c_xy AS BIGINT) AS n_pair,
      |  round(ln(CAST(c_xy AS DOUBLE) * CAST((SELECT total FROM n) AS DOUBLE) /
      |        (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))), 6) AS pmi
      |FROM big JOIN uni u1 ON u1.t = w1 JOIN uni u2 ON u2.t = w2
      |WHERE c_xy >= 5
      |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin
  )

  /** Vocabulary coverage: top-100 tokens by frequency with the cumulative
    * fraction of the corpus they cover — the curve that sizes a tokenizer
    * vocabulary. One hash aggregate over tokens, then a distributed top-k
    * (`orderBy().limit` → TakeOrderedAndProject) BEFORE any window, so the
    * ranking/cumulative window only ever sees ≤100 rows no matter how large
    * the vocabulary is. The window partitions on the (constant-valued, but
    * non-foldable — a literal would be optimized away, reintroducing
    * WindowExec's all-to-one-task warning) `total` column: with a bounded
    * 100-row input that is a deliberate single-partition window, not the
    * all-data-to-one-executor shape an unpartitioned window over the full
    * vocab would be. The coverage denominator is a separate scalar aggregate.
    */
  val vocabCoverage = Q(
    "q_vocab_coverage",
    (s, d) => {
      val counts = Tables.documents(s, d)
        .select(explode(TextFns.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("n_tok"))
      val total = counts.agg(sum(col("n_tok")).as("total"))
      val top = counts.orderBy(col("n_tok").desc, col("tok")).limit(100)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("total")).orderBy(col("n_tok").desc, col("tok"))
      top.crossJoin(broadcast(total))
        .withColumn("rank", row_number().over(w))
        .withColumn("coverage",
          round(sum(col("n_tok")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double") / col("total").cast("double"), 6))
        .select(col("rank").cast("long").as("rank"), col("tok"), col("n_tok"), col("coverage"))
        .orderBy("rank")
    },
    """WITH counts AS (
      |  SELECT tok, count(*) AS n_tok
      |  FROM (SELECT unnest(string_split(text,' ')) AS tok FROM documents)
      |  GROUP BY tok),
      |ranked AS (
      |  SELECT tok, n_tok,
      |    row_number() OVER (ORDER BY n_tok DESC, tok) AS rank,
      |    sum(n_tok) OVER (ORDER BY n_tok DESC, tok ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM counts)
      |SELECT CAST(rank AS BIGINT) AS rank, tok, CAST(n_tok AS BIGINT) AS n_tok,
      |  round(CAST(cum AS DOUBLE) / CAST((SELECT sum(n_tok) FROM counts) AS DOUBLE), 6) AS coverage
      |FROM ranked WHERE rank <= 100 ORDER BY rank""".stripMargin
  )

  /** Unigram language-model scoring: mean token log-probability and the
    * perplexity proxy per document — the classic LM-based quality filter
    * (low-probability token soup scores poorly). The corpus LM is the
    * token-frequency table; its size grows with the corpus, so the tok→vocab
    * join carries NO broadcast hint — AQE broadcasts it when it measures
    * small and falls back to a shuffled hash join when it doesn't, which is
    * the only posture that survives a 100 TB corpus. Per-doc math is one
    * join + one aggregate, and the log-prob sums go through pre-rounded
    * DECIMALs so group sums are exact at any parallelism.
    */
  /** Per-doc unigram-LM scores (n_tokens, mean logprob, perplexity) — the
    * shared relation behind q_lm_score and q_perplexity_buckets. The vocab is
    * joined (not broadcast-hinted): at 100 TB the vocabulary itself is large,
    * so the corpus-sized side must be allowed to shuffle-join.
    */
  private def docPpl(s: org.apache.spark.sql.SparkSession, d: String) = {
    // ONE cached token-array relation feeds the vocab aggregate and the
    // scoring probe (the q_lm_bigram r15 pattern — previously the corpus
    // scan + split + explode ran for each of the three consumers), the
    // corpus total comes from sum(vocab.c) at vocabulary grain (no second
    // corpus scan), and the log-prob is computed ONCE per DISTINCT token —
    // the model join runs at vocabulary grain, the corpus pays one join
    // against the finished (tok, lp) model. Same rounded values: lp depends
    // only on (c, total).
    val docs = Tables.documentsSpread(s, d)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t")).persist()
    val toks = docs.select(col("doc_id"), explode(col("t")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("c")).localCheckpoint()
    val total = vocab.agg(sum(col("c")).as("total"))
    val lp = round(log(col("c").cast("double") / col("total").cast("double")), 9)
      .cast(org.apache.spark.sql.types.DecimalType(28, 9))
    val model = vocab.crossJoin(broadcast(total)).select(col("tok"), lp.as("lp"))
    val meanLp = round(sum(col("lp")).cast("double") / count(lit(1)), 6)
    // repartition by doc_id before the per-doc aggregate: token occurrences
    // of every doc are spread across all tok-hash partitions, so the
    // map-side partial barely reduces and AQE coalesces the small-looking
    // partial shuffle into one final task (the q_lm_bigram measured lesson)
    toks.join(model, Seq("tok"))
      .repartition(col("doc_id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), meanLp.as("mean_logprob"),
        round(exp(-meanLp), 6).as("ppl"))
  }

  val lmScore = Q(
    "q_lm_score",
    (s, d) => docPpl(s, d).orderBy("doc_id"),
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
      |vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
      |n AS (SELECT count(*) AS total FROM toks),
      |scored AS (
      |  SELECT t.doc_id,
      |    CAST(round(ln(CAST(v.c AS DOUBLE) / CAST((SELECT total FROM n) AS DOUBLE)), 9) AS DECIMAL(28,9)) AS lp
      |  FROM toks t JOIN vocab v ON v.tok = t.tok)
      |SELECT doc_id, count(*) AS n_tokens,
      |  round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS mean_logprob,
      |  round(exp(-(round(CAST(sum(lp) AS DOUBLE) / count(*), 6))), 6) AS ppl
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )

  /** CCNet-style quality tiers: docs split into head/middle/tail by unigram
    * perplexity tertiles. The threshold model is ONE row (two exact
    * interpolated percentiles — Spark `percentile` and DuckDB `quantile_cont`
    * share the definition, both rounded to 6 dp before comparison) broadcast
    * back over the doc scores; the corpus is never globally sorted and no
    * unpartitioned window appears. At 100 TB the exact percentile swaps for
    * approx_percentile — the plan shape (tiny model ⋈ corpus) is unchanged.
    */
  val perplexityBuckets = Q(
    "q_perplexity_buckets",
    (s, d) => {
      // docPpl is a token-explode + vocab self-join — two corpus-sized
      // shuffles — consumed TWICE here (threshold aggregate + bucket scan).
      // localCheckpoint materializes it once at doc grain, the same
      // multi-consumer convention as ngramNoveltyReport/assocRules.
      val ppl = docPpl(s, d).localCheckpoint()
      val th = ppl.agg(
        round(expr("percentile(ppl, 1.0/3)"), 6).as("t1"),
        round(expr("percentile(ppl, 2.0/3)"), 6).as("t2"))
      ppl.crossJoin(broadcast(th))
        .withColumn("bucket",
          when(col("ppl") <= col("t1"), "head")
            .when(col("ppl") <= col("t2"), "middle")
            .otherwise("tail"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ppl").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
            .cast("double").as("ppl_sum"))
        .orderBy("bucket")
    },
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
      |vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
      |n AS (SELECT count(*) AS total FROM toks),
      |scored AS (
      |  SELECT t.doc_id,
      |    CAST(round(ln(CAST(v.c AS DOUBLE) / CAST((SELECT total FROM n) AS DOUBLE)), 9) AS DECIMAL(28,9)) AS lp
      |  FROM toks t JOIN vocab v ON v.tok = t.tok),
      |ppl AS (
      |  SELECT doc_id,
      |    round(exp(-(round(CAST(sum(lp) AS DOUBLE) / count(*), 6))), 6) AS ppl
      |  FROM scored GROUP BY doc_id),
      |th AS (
      |  SELECT round(quantile_cont(ppl, 1.0/3), 6) AS t1,
      |         round(quantile_cont(ppl, 2.0/3), 6) AS t2 FROM ppl)
      |SELECT CASE WHEN ppl <= t1 THEN 'head' WHEN ppl <= t2 THEN 'middle' ELSE 'tail' END AS bucket,
      |  count(*) AS n_docs,
      |  CAST(CAST(sum(CAST(ppl AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS ppl_sum
      |FROM ppl CROSS JOIN th GROUP BY 1 ORDER BY 1""".stripMargin
  )

  /** Boilerplate detection (C4/RefinedWeb-style template cleaning): a word
    * trigram is boilerplate WITHIN a source when it appears in ≥ 4% of that
    * source's shingled docs (and ≥ 2 of them — the floor that makes the rate
    * meaningful on small sources); each doc reports the fraction
    * of its distinct shingles that are boilerplate — high fractions mark
    * templated/navigation text. Shapes: the shared shingle relation (one
    * distinct shuffle), one (source, shingle) document-frequency aggregate,
    * a per-source doc-count model small enough to broadcast, and un-hinted
    * equi-joins back over the corpus — every step linear, the 4% threshold
    * compared in integer math (df*25 ≥ nd) so both engines agree exactly.
    */
  val boilerplate = Q(
    "q_boilerplate",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val sh = TextFns.shingles(docs, 3)
      val src = docs.select(col("doc_id"), col("source"))
      val shs = sh.join(src, Seq("doc_id"))
      val nd = shs.groupBy("source").agg(countDistinct(col("doc_id")).as("nd"))
      val dfRel = shs.groupBy("source", "sh").agg(count(lit(1)).as("df"))
      val boiler = dfRel.join(broadcast(nd), Seq("source"))
        .filter(col("df") >= 2 && col("df") * 25 >= col("nd"))
        .select("source", "sh")
      val tot = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val nb = shs.join(boiler, Seq("source", "sh"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_boiler"))
      tot.join(nb, Seq("doc_id"), "left")
        .join(src, Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("n_sh"),
          coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
          round(coalesce(col("n_boiler"), lit(0L)).cast("double") / col("n_sh"), 6)
            .as("boiler_frac"))
        .orderBy("doc_id")
    },
    s"""WITH sh AS (${TextFns.shinglesSql(3)}),
       |src AS (SELECT doc_id, source FROM documents),
       |shs AS (SELECT s.doc_id, src.source, s.sh FROM sh s JOIN src ON src.doc_id = s.doc_id),
       |nd AS (SELECT source, count(DISTINCT doc_id) AS nd FROM shs GROUP BY 1),
       |df AS (SELECT source, sh, count(*) AS df FROM shs GROUP BY 1, 2),
       |boiler AS (SELECT source, sh FROM df JOIN nd USING(source) WHERE df >= 2 AND df*25 >= nd),
       |tot AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
       |nb AS (SELECT shs.doc_id, count(*) AS n_boiler FROM shs JOIN boiler USING(source, sh) GROUP BY 1)
       |SELECT t.doc_id, src.source, t.n_sh,
       |       coalesce(nb.n_boiler, 0) AS n_boiler,
       |       round(CAST(coalesce(nb.n_boiler, 0) AS DOUBLE) / t.n_sh, 6) AS boiler_frac
       |FROM tot t LEFT JOIN nb ON nb.doc_id = t.doc_id
       |JOIN src ON src.doc_id = t.doc_id
       |ORDER BY t.doc_id""".stripMargin
  )

  /** Repetition-based quality signals (the Gopher-style repetition filters):
    * per doc, the fraction of bigram occurrences belonging to a repeated
    * bigram and the share of the single most frequent bigram. Shape: bigrams
    * are built ROW-LOCALLY (no shuffle spent on construction), then two
    * partial-aggregable hash aggregates — linear at any corpus size, and the
    * (doc_id, bigram) key never concentrates (a doc's bigrams bound the
    * group count).
    */
  val repetition = Q(
    "q_repetition",
    (s, d) => {
      val bg = Tables.documentsSpread(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(t) - 2), i -> concat_ws(' ', t[i], t[i + 1]))")).as("bg"))
      val dupFrac = col("dup_occ").cast("double") / col("total")
      bg.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("total"), max(col("c")).as("top_c"),
          sum(when(col("c") > 1L, col("c")).otherwise(0L)).as("dup_occ"))
        .select(col("doc_id"),
          col("total").cast("long").as("n_bigrams"),
          round(dupFrac, 6).as("dup_bigram_frac"),
          round(col("top_c").cast("double") / col("total"), 6).as("top_bigram_frac"),
          (dupFrac > 0.5).as("repetitive"))
        .orderBy("doc_id")
    },
    """WITH bg AS (
      |  SELECT doc_id, t[i+1] || ' ' || t[i+2] AS bg
      |  FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents
      |        WHERE len(string_split(text,' ')) >= 2),
      |       unnest(range(len(t)-1)) AS u(i)),
      |cnt AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1,2),
      |agg AS (SELECT doc_id, sum(c) AS total, max(c) AS top_c,
      |               sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_occ
      |        FROM cnt GROUP BY 1)
      |SELECT doc_id, CAST(total AS BIGINT) AS n_bigrams,
      |  round(CAST(dup_occ AS DOUBLE)/total, 6) AS dup_bigram_frac,
      |  round(CAST(top_c AS DOUBLE)/total, 6) AS top_bigram_frac,
      |  (CAST(dup_occ AS DOUBLE)/total > 0.5) AS repetitive
      |FROM agg ORDER BY doc_id""".stripMargin
  )

  /** Text normalization: case-fold, strip non-alphanumerics, collapse runs
    * of spaces, trim — the canonical pre-dedup/pre-tokenize cleanup pass.
    * Pure per-row column functions: embarrassingly parallel, zero shuffles,
    * stays in whole-stage codegen.
    */
  val normalize = Q(
    "q_normalize",
    (s, d) => {
      val normed = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
      Tables.documents(s, d)
        .select(col("doc_id"), normed.as("norm_text"),
          (length(col("text")) - length(normed)).as("removed_chars"))
        .orderBy("doc_id")
    },
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm_text,
      |  length(text) - length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS removed_chars
      |FROM documents ORDER BY doc_id""".stripMargin
  )

  /** Top-5 TF-IDF terms per document — the classic keyword/relevance
    * extraction. Two partial-aggregable hash aggregates (tf, then df over the
    * already-distinct (doc, tok) pairs), an un-hinted vocab join (AQE
    * broadcasts while the vocab measures small, shuffles when it doesn't —
    * the lm-score posture), and a top-k window PARTITIONED by doc_id (never
    * global). The idf is pre-rounded to 9 dp before the per-term product so
    * both engines rank identical values (ties then break on the token).
    */
  val tfidf = Q(
    "q_tfidf",
    (s, d) => {
      val toks = Tables.documentsSpread(s, d)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dfRel = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val nRel = tf.agg(countDistinct(col("doc_id")).as("n"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tfidf").desc, col("tok"))
      tf.join(dfRel, Seq("tok"))
        .crossJoin(broadcast(nRel))
        .select(col("doc_id"), col("tok"),
          round(col("tf") * round(log(col("n").cast("double") / col("df")), 9), 6).as("tfidf"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("doc_id"), col("rank").cast("long").as("rank"), col("tok"), col("tfidf"))
        .orderBy("doc_id", "rank")
    },
    """WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1,2),
      |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
      |scored AS (
      |  SELECT tf.doc_id, tf.tok,
      |    round(tf.tf * round(ln(CAST((SELECT n FROM n) AS DOUBLE) / df.df), 9), 6) AS tfidf
      |  FROM tf JOIN df ON df.tok = tf.tok),
      |ranked AS (
      |  SELECT doc_id, tok, tfidf,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rank
      |  FROM scored)
      |SELECT doc_id, CAST(rank AS BIGINT) AS rank, tok, tfidf
      |FROM ranked WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin
  )

  /** Quality-filter FUNNEL: how many documents survive each successive
    * pipeline stage (input → min length → unique-token ratio → exact dedup
    * keep-first) — the observability table every filtering pipeline reports.
    * All stage predicates are row-local except the dedup rank (one window
    * PARTITIONED by digest — bounded groups, never global); the funnel
    * itself is a single conditional aggregation over one scan.
    */
  val filterFunnel = Q(
    "q_filter_funnel",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = split(col("text"), " ")
      val stages = Tables.documents(s, d)
        .select(col("doc_id"),
          size(toks).cast("long").as("n_tok"),
          (size(array_distinct(toks)).cast("double") / size(toks)).as("uniq_ratio"),
          md5(trim(lower(col("text")))).as("digest"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("digest").orderBy("doc_id")))
      val passLen = col("n_tok") >= 30L
      val passUniq = passLen && col("uniq_ratio") >= 0.35
      val passDedup = passUniq && col("rn") === 1
      stages.agg(
          count(lit(1)).as("a_input"),
          sum(when(passLen, 1L).otherwise(0L)).as("b_min_length"),
          sum(when(passUniq, 1L).otherwise(0L)).as("c_uniq_ratio"),
          sum(when(passDedup, 1L).otherwise(0L)).as("d_exact_dedup"))
        .select(expr("stack(4, 'a_input', a_input, 'b_min_length', b_min_length," +
          " 'c_uniq_ratio', c_uniq_ratio, 'd_exact_dedup', d_exact_dedup) AS (stage, docs)"))
        .orderBy("stage")
    },
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks,
      |                  md5(trim(lower(text))) AS digest FROM documents),
      |s AS (SELECT doc_id, len(toks) AS n_tok,
      |             len(list_distinct(toks)) * 1.0 / len(toks) AS uniq_ratio,
      |             row_number() OVER (PARTITION BY digest ORDER BY doc_id) AS rn
      |      FROM t)
      |SELECT 'a_input' AS stage, count(*) AS docs FROM s
      |UNION ALL SELECT 'b_min_length', count(*) FROM s WHERE n_tok >= 30
      |UNION ALL SELECT 'c_uniq_ratio', count(*) FROM s WHERE n_tok >= 30 AND uniq_ratio >= 0.35
      |UNION ALL SELECT 'd_exact_dedup', count(*) FROM s
      |  WHERE n_tok >= 30 AND uniq_ratio >= 0.35 AND rn = 1
      |ORDER BY stage""".stripMargin
  )

  /** BM25 relevance ranking (Robertson/Spärck Jones, k1=1.2 b=0.75) of every
    * document against a fixed query term set — the retrieval scorer behind
    * benchmark-decontamination triage and search-based corpus curation. Scale
    * shape: term statistics (df per query term — |query| rows — and the
    * 1-row avgdl/N aggregate) are BROADCAST; the corpus relation only
    * shuffles for its per-doc aggregates, keyed by doc_id, so no global
    * state grows with corpus size. Per-term contributions are rounded to
    * 9 dp and summed as DECIMAL so the score is partitioning-invariant.
    */
  /** The BM25 scoring body (Robertson/Spärck Jones, k1=1.2 b=0.75), reusable
    * over any (doc_id, text) relation: returns one (doc_id, bm25) row per
    * document containing at least one query term. See q_bm25's doc for the
    * scale shape; q_hybrid_rrf reuses this as its lexical leg.
    */
  def bm25Scores(docs: org.apache.spark.sql.DataFrame, terms: Seq[String]): org.apache.spark.sql.DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("w"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val stats = dl.agg(
      (sum(col("len")).cast("double") / count(lit(1))).as("avgdl"),
      count(lit(1)).as("n_docs"))
    val qtoks = toks.filter(col("w").isin(terms: _*))
    val tf = qtoks.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfRel = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val contrib = tf.join(broadcast(dfRel), Seq("w"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(
          log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
            col("tf") * lit(2.2) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("len") / col("avgdl"))), 9)
          .cast("decimal(18,9)").as("c"))
    contrib.groupBy("doc_id")
      .agg(round(sum(col("c")).cast("double"), 6).as("bm25"))
  }

  val bm25 = Q(
    "q_bm25",
    (s, d) => {
      bm25Scores(Tables.documents(s, d), Seq("spark", "join", "hash"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(50)
    },
    """WITH tok AS (
      |  SELECT doc_id, unnest(split(text, ' ')) AS w FROM documents),
      |dl AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY 1),
      |stats AS (SELECT CAST(sum(len) AS DOUBLE) / count(*) AS avgdl, count(*) AS n_docs FROM dl),
      |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok
      |       WHERE w IN ('spark','join','hash') GROUP BY 1, 2),
      |df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
      |contrib AS (
      |  SELECT tf.doc_id,
      |    CAST(round(
      |      ln((n_docs - df + 0.5E0) / (df + 0.5E0) + 1.0E0) *
      |      tf * 2.2E0 / (tf + 1.2E0 * (0.25E0 + 0.75E0 * len / avgdl)), 9) AS DECIMAL(18,9)) AS c
      |  FROM tf JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN stats)
      |SELECT doc_id, round(CAST(sum(c) AS DOUBLE), 6) AS bm25
      |FROM contrib GROUP BY doc_id
      |ORDER BY round(CAST(sum(c) AS DOUBLE), 6) DESC, doc_id LIMIT 50""".stripMargin
  )

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every out-of-target
    * document by the mean log-likelihood ratio of its tokens under hashed
    * bag-of-words models of the TARGET distribution (source `src0`) vs the
    * general pool — the standard recipe for resampling a 100 TB crawl toward
    * a small high-quality domain. The feature space is hashed to a FIXED
    * 4096 buckets, so both count models are bounded broadcast relations no
    * matter how large the corpus, and the corpus-side plan is one broadcast
    * join + one per-doc aggregate (add-one smoothing keeps unseen buckets
    * finite). Contributions are rounded and decimal-summed for
    * partitioning-invariance.
    */
  val importanceWeights = Q(
    "q_importance_weights",
    (s, d) => {
      val nB = 4096
      // persist the hashed-token stream: it feeds the count models AND the
      // per-doc contribution pass, and the md5 bucket hash is the dominant
      // per-token cost — without the persist mark each consumer re-tokenizes
      // and re-hashes the whole corpus (measured ~2× the query). Lazy mark,
      // materialized by whichever consumer runs first; blocks released by
      // the harness sweep / caller (the BFS convention).
      val tok = Tables.documentsSpread(s, d)
        .select(col("doc_id"), col("source"), explode(TextFns.tokens(col("text"))).as("w"))
        .select(col("doc_id"), col("source"),
          (conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long") % nB).as("b"))
        .persist()
      // BOTH count models in one conditional aggregate — a single pass over
      // the corpus and a single ≤4096-row broadcast, instead of one
      // shuffle + join per model
      val counts = tok.groupBy("b").agg(
        sum(when(col("source") === "src0", 1L).otherwise(0L)).as("tc"),
        sum(when(col("source") =!= "src0", 1L).otherwise(0L)).as("sc"))
      val tots = counts.agg(sum(col("tc")).as("tgt_tot"), sum(col("sc")).as("src_tot"))
      val contrib = tok.filter(col("source") =!= "src0")
        .join(broadcast(counts), Seq("b"), "left")
        .crossJoin(broadcast(tots))
        .select(col("doc_id"),
          round(
            log((coalesce(col("tc"), lit(0L)) + lit(1.0)) / (col("tgt_tot") + lit(4096.0))) -
              log((coalesce(col("sc"), lit(0L)) + lit(1.0)) / (col("src_tot") + lit(4096.0))), 9)
            .cast("decimal(18,9)").as("c"))
      contrib.groupBy("doc_id")
        .agg(round(sum(col("c")).cast("double") / count(lit(1)), 6).as("logratio"))
        .orderBy(col("logratio").desc, col("doc_id"))
        .limit(100)
    },
    """WITH tok AS (
      |  SELECT doc_id, source,
      |    ('0x' || substr(md5(unnest(split(text, ' '))), 1, 15))::BIGINT % 4096 AS b
      |  FROM documents),
      |tgt AS (SELECT b, count(*) AS tc FROM tok WHERE source = 'src0' GROUP BY 1),
      |src AS (SELECT b, count(*) AS sc FROM tok WHERE source <> 'src0' GROUP BY 1),
      |tots AS (
      |  SELECT sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS tgt_tot,
      |         sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS src_tot
      |  FROM tok),
      |contrib AS (
      |  SELECT tok.doc_id,
      |    CAST(round(
      |      ln((COALESCE(tc, 0) + 1.0E0) / (tgt_tot + 4096.0E0)) -
      |      ln((COALESCE(sc, 0) + 1.0E0) / (src_tot + 4096.0E0)), 9) AS DECIMAL(18,9)) AS c
      |  FROM tok LEFT JOIN tgt USING (b) LEFT JOIN src USING (b) CROSS JOIN tots
      |  WHERE tok.source <> 'src0')
      |SELECT doc_id, round(CAST(sum(c) AS DOUBLE) / count(*), 6) AS logratio
      |FROM contrib GROUP BY doc_id
      |ORDER BY round(CAST(sum(c) AS DOUBLE) / count(*), 6) DESC, doc_id LIMIT 100""".stripMargin
  )

  /** Interpolated bigram language-model scoring: each document's mean log
    * probability under `0.7·P(w2|w1) + 0.3·P(w2)` with the bigram table
    * thresholded at count ≥ 5 (unseen/rare bigrams back off to the unigram
    * term — the Jelinek-Mercer recipe). Upgrades `q_lm_score`'s unigram model
    * with sequential structure. Scale shape (round 15): bigrams are built
    * ROW-LOCALLY (transform over the token array — no positions self-join),
    * and the log-probability is computed ONCE per DISTINCT bigram — the
    * model joins (bigram counts ⋈ unigram counts ⋈ corpus total) all run at
    * OBSERVED-BIGRAM grain, never per occurrence, and the corpus pays one
    * join against that finished model instead of three (the previous shape
    * joined every bigram occurrence through uni twice and bc once: three
    * corpus-sized string shuffles, sf1 5.4 s → 1.9 s). The corpus total
    * comes from sum(uni.c) at vocabulary grain, not a second corpus scan.
    * No broadcast hint anywhere — the observed-bigram relation grows with
    * the corpus (bounded by vocab²), so the planner must stay free to
    * shuffle the model join when it measures big (the q_lm_score round-4
    * lesson); AQE broadcasts it when it measures small.
    */
  val lmBigram = Q(
    "q_lm_bigram",
    (s, d) => {
      // ONE cached token-array relation feeds the unigram model, the bigram
      // model, and the scoring pass — without the persist each consumer
      // re-runs the spread shuffle and the split. Bigram occurrences carry
      // ONE string key ("w1 w2"); the constituent words are re-split at
      // MODEL grain only (tokens contain no spaces by split-on-space
      // construction, so the join key is lossless).
      val docs = Tables.documentsSpread(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t")).persist()
      val toks = docs.select(col("doc_id"), explode(col("t")).as("w"))
      val big = docs.filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(t) - 2), i -> concat_ws(' ', t[i], t[i + 1]))")).as("bg"))
      val uni = toks.groupBy("w").agg(count(lit(1)).as("c")).localCheckpoint()
      val tot = uni.agg(sum(col("c")).as("n"))
      val bcAll = big.groupBy("bg").agg(count(lit(1)).as("bc"))
        .select(col("bg"), element_at(split(col("bg"), " "), 1).as("w1"),
          element_at(split(col("bg"), " "), 2).as("w2"), col("bc"))
      val model = bcAll
        .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
        .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
        .crossJoin(broadcast(tot))
        .select(col("bg"),
          round(log(
            lit(0.7) * when(col("bc") >= 5L, col("bc").cast("double") / col("c1"))
              .otherwise(lit(0.0)) +
              lit(0.3) * col("c2").cast("double") / col("n")), 9)
            .cast("decimal(18,9)").as("lp"))
      // repartition by doc_id before the per-doc aggregate: bigram
      // occurrences of every doc are spread across all partitions, so the
      // map-side partial barely reduces (50k groups per partition) and AQE
      // then coalesces the small-LOOKING partial shuffle into one final
      // task — measured 0.9 s single-core. The explicit hash exchange keeps
      // the final aggregate 32-way (the q_tpch_q18 layout argument).
      big.join(model, Seq("bg"))
        .repartition(col("doc_id"))
        .groupBy("doc_id")
        .agg(round(sum(col("lp")).cast("double") / count(lit(1)), 6).as("avg_logp"),
          count(lit(1)).as("n_bigrams"))
        .orderBy("doc_id")
    },
    """WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |tok AS (SELECT doc_id, unnest(t) AS w FROM t0),
      |big AS (
      |  SELECT doc_id, t[i+1] AS w1, t[i+2] AS w2
      |  FROM (SELECT doc_id, t FROM t0 WHERE len(t) >= 2), unnest(range(len(t)-1)) AS u(i)),
      |uni AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
      |tot AS (SELECT count(*) AS n FROM tok),
      |bc AS (SELECT w1, w2, count(*) AS bc FROM big GROUP BY 1, 2 HAVING count(*) >= 5),
      |scored AS (
      |  SELECT big.doc_id,
      |    CAST(round(ln(
      |      0.7E0 * COALESCE(CAST(bc.bc AS DOUBLE) / u1.c, 0.0E0) +
      |      0.3E0 * CAST(u2.c AS DOUBLE) / n), 9) AS DECIMAL(18,9)) AS lp
      |  FROM big JOIN uni u1 ON u1.w = big.w1 JOIN uni u2 ON u2.w = big.w2
      |  LEFT JOIN bc ON bc.w1 = big.w1 AND bc.w2 = big.w2 CROSS JOIN tot)
      |SELECT doc_id, round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_logp,
      |       CAST(count(*) AS BIGINT) AS n_bigrams
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )

  /** ZIPF-LAW FIT: OLS slope of log10(freq) on log10(rank) over the top-200
    * vocabulary terms — the corpus-health audit (natural language sits near
    * slope −1; a synthetic or templated corpus does not, which is the
    * point of running it on generated training data). Scale shape: term
    * frequencies are one hash aggregate over the token stream; the top-200
    * cut is TakeOrderedAndProject, the rank window runs ABOVE that Limit
    * (≤200 rows), and the moments/slope algebra is the q_trend pattern —
    * logs rounded to 9 dp then DECIMAL products, so libm wobble and
    * summation order cannot reach the 6-dp slope.
    */
  val zipf = Q(
    "q_zipf",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val tf = Tables.documents(s, d)
        .select(explode(TextFns.tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
      val top = tf.orderBy(col("freq").desc, col("w")).limit(200)
        .withColumn("rnk", row_number().over(Window.orderBy(col("freq").desc, col("w"))))
      val pts = top.select(
        round(log(10.0, col("rnk").cast("double")), 9).cast(DecimalType(18, 9)).as("x"),
        round(log(10.0, col("freq").cast("double")), 9).cast(DecimalType(18, 9)).as("y"))
      pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum((col("x") * col("y")).cast(DecimalType(28, 9))).as("sxy"),
          sum((col("x") * col("x")).cast(DecimalType(28, 9))).as("sxx"))
        .select(col("n").cast("long").as("n_terms"),
          round((col("n") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
            (col("n") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")), 6).as("zipf_slope"))
    },
    """WITH tf AS (SELECT w, count(*) AS freq FROM (
      |    SELECT unnest(split(text, ' ')) AS w FROM documents) GROUP BY 1),
      |top AS (SELECT w, freq FROM tf ORDER BY freq DESC, w LIMIT 200),
      |ranked AS (SELECT freq, row_number() OVER (ORDER BY freq DESC, w) AS rnk FROM top),
      |pts AS (SELECT CAST(round(log10(CAST(rnk AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x,
      |               CAST(round(log10(CAST(freq AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
      |        FROM ranked),
      |m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |             sum(CAST(x*y AS DECIMAL(28,9))) AS sxy,
      |             sum(CAST(x*x AS DECIMAL(28,9))) AS sxx
      |      FROM pts)
      |SELECT CAST(n AS BIGINT) AS n_terms,
      |  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |        (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope
      |FROM m""".stripMargin
  )

  /** SEQUENCE PACKING — the step between a cleaned corpus and a training
    * run: documents are concatenated in a deterministic order and the token
    * stream is chunked into fixed-length training sequences (the GPT-style
    * concat-then-chunk packer; a document may straddle a boundary). Emitted
    * per document: the packing stream it belongs to, the sequence its
    * first token lands in and the offset within it — the placement
    * relation a loader shards by. The packing unit is (source, shard) —
    * shard an md5 slice of (doc_id, source), the `q_shuffle_shards`
    * convention — so streams pack in parallel and each window holds
    * ~1/8 of one source (round 10 partitioned by source alone, which
    * serialized each source's whole token stream through one task; at
    * 100 TB the shard count rises with corpus size, same plan). A single
    * global concatenation order would be exactly what the global-window
    * contract gate forbids. One window over one scan; the running sum is
    * exact integer math, and placement stays fully deterministic (the
    * shard hash and the within-shard doc_id order are both data-derived).
    */
  val seqPack = Q(
    "q_seq_pack",
    (s, d) => {
      val shard = (conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":"), col("source"))), 9, 6), 16, 10).cast("long") % 8L).as("shard")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source", "shard").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), shard, wsTokens.as("tokens"))
        .withColumn("cum", sum(col("tokens")).over(w))
        .select(col("doc_id"), col("source"), col("shard"), col("tokens"),
          expr("(cum - tokens) div 2048").as("seq_id"),
          expr("(cum - tokens) % 2048").as("seq_offset"))
        .orderBy("doc_id")
    },
    """SELECT doc_id, source, shard, tokens,
      |  (cum - tokens) // 2048 AS seq_id, (cum - tokens) % 2048 AS seq_offset
      |FROM (SELECT doc_id, source, shard,
      |        CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
      |        CAST(sum(len(string_split(text, ' '))) OVER (
      |          PARTITION BY source, shard ORDER BY doc_id) AS BIGINT) AS cum
      |      FROM (SELECT doc_id, source, text,
      |              ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 9, 6))::BIGINT % 8
      |                AS shard
      |            FROM documents))
      |ORDER BY doc_id""".stripMargin
  )

  /** SOURCE-DRIFT KL REPORT — per-source unigram distribution vs the whole
    * corpus, KL(source ‖ corpus) in nats over the global top-64 tokens plus
    * an `<other>` residual bucket. This is the distribution-shift audit a
    * mixture pipeline runs per snapshot: a source whose KL jumps between
    * crawls changed register (spam influx, template shift, language drift)
    * before any single quality filter fires. Bucketing to a FIXED top-K +
    * residual is what makes the statistic well-defined and scale-stable:
    * the support is the same 65 terms for every source (absent terms
    * contribute 0 by the 0·log 0 convention — they simply have no row), the
    * corpus marginal q is strictly positive on all of them, and the
    * per-source state is ≤65 rows no matter how large the corpus grows.
    *
    * Scale shape: one corpus-sized token count (map-side partial), a
    * TakeOrdered top-64 model broadcast into the token stream, then ALL
    * remaining grains are (source × 65) — broadcast-joined marginals, no
    * corpus-sized shuffle after the (source, term) count. The KL terms are
    * pre-rounded to DECIMAL(28,9) before the group sum (the lm_score
    * convention) so summation order — across partitions AND engines — can
    * never move the hash.
    */
  val klDrift = Q(
    "q_kl_drift",
    (s, d) => {
      // ONE corpus pass: the (source, tok) count grain is |sources|·|vocab|
      // rows — already tiny next to the corpus — and BOTH the global top-64
      // model and the bucketed counts derive from it (the pre-fused form
      // exploded the corpus twice, once per consumer). Checkpointed because
      // it genuinely has two consumers.
      val stRaw = Tables.documents(s, d)
        .select(col("source"), explode(TextFns.tokens(col("text"))).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val top = stRaw.groupBy("tok").agg(sum(col("n")).as("n_g"))
        .orderBy(col("n_g").desc, col("tok")).limit(64)
        .select(col("tok"), lit(true).as("in_top"))
      val st = stRaw.join(broadcast(top), Seq("tok"), "left")
        .select(col("source"),
          when(col("in_top").isNotNull, col("tok")).otherwise(lit("<other>")).as("term"),
          col("n"))
        .groupBy("source", "term").agg(sum(col("n")).as("n_st"))
      val sTot = st.groupBy("source").agg(sum(col("n_st")).as("n_s"))
      val tTot = st.groupBy("term").agg(sum(col("n_st")).as("n_t"))
      val total = st.agg(sum(col("n_st")).as("n_all"))
      val p = col("n_st").cast("double") / col("n_s").cast("double")
      val q = col("n_t").cast("double") / col("n_all").cast("double")
      val term9 = round((p * log(p / q)).cast("double"), 9)
        .cast(org.apache.spark.sql.types.DecimalType(28, 9))
      st.join(broadcast(sTot), Seq("source"))
        .join(broadcast(tTot), Seq("term"))
        .crossJoin(broadcast(total))
        .groupBy(col("source"))
        .agg(max(col("n_s")).as("n_tokens"),
          round(sum(term9).cast("double"), 6).as("kl_nats"))
        .orderBy("source")
    },
    """WITH tok AS (SELECT source, unnest(string_split(text,' ')) AS tok FROM documents),
      |top AS (SELECT tok FROM (SELECT tok, count(*) AS n_g FROM tok GROUP BY 1
      |                         ORDER BY n_g DESC, tok LIMIT 64)),
      |st AS (SELECT source,
      |         CASE WHEN top.tok IS NOT NULL THEN t.tok ELSE '<other>' END AS term,
      |         count(*) AS n_st
      |       FROM tok t LEFT JOIN top ON t.tok = top.tok GROUP BY 1, 2),
      |stot AS (SELECT source, sum(n_st) AS n_s FROM st GROUP BY 1),
      |ttot AS (SELECT term, sum(n_st) AS n_t FROM st GROUP BY 1),
      |tot AS (SELECT sum(n_st) AS n_all FROM st)
      |SELECT st.source, CAST(max(n_s) AS BIGINT) AS n_tokens,
      |  round(CAST(sum(CAST(round(
      |    (CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE))
      |    * ln((CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE))
      |         / (CAST(n_t AS DOUBLE) / CAST(n_all AS DOUBLE))), 9)
      |    AS DECIMAL(28,9))) AS DOUBLE), 6) AS kl_nats
      |FROM st JOIN stot USING (source) JOIN ttot USING (term) CROSS JOIN tot
      |GROUP BY st.source ORDER BY st.source""".stripMargin
  )

  /** LANG-ID CONFUSION MATRIX — the eval harness for the marker classifier
    * (the third member of the eval family, with the ANN recall report and
    * the MinHash error report): counts and row-normalized rates per
    * (labeled lang × predicted class). This is how a heuristic classifier
    * earns its place in the filter funnel — and how its drift is caught
    * when a new crawl source breaks the marker assumptions. One classify
    * pass (pure codegen'd column work) to a (|langs| × |classes|) grain,
    * broadcast per-lang totals for the rates.
    */
  val langidConfusion = Q(
    "q_langid_confusion",
    (s, d) => {
      val cm = withPredictedClass(Tables.documents(s, d))
        .groupBy(col("lang"), col("pred_class"))
        .agg(count(lit(1)).as("n"))
      val tot = cm.groupBy("lang").agg(sum(col("n")).as("n_lang"))
      cm.join(broadcast(tot), Seq("lang"))
        .select(col("lang"), col("pred_class"), col("n"),
          round(col("n").cast("double") / col("n_lang").cast("double"), 6).as("rate"))
        .orderBy("lang", "pred_class")
    }, {
      val ms = markers.map { case (name, re) =>
        s"CAST(len(regexp_extract_all(text, '\\b$re\\b')) AS BIGINT) AS $name"
      }.mkString(", ")
      s"""WITH pred AS (
         |  SELECT lang,
         |    CASE WHEN m_common >= m_relational AND m_common >= m_engine THEN 'common'
         |         WHEN m_relational >= m_engine THEN 'relational' ELSE 'engine' END AS pred_class
         |  FROM (SELECT lang, $ms FROM documents)),
         |cm AS (SELECT lang, pred_class, count(*) AS n FROM pred GROUP BY 1, 2),
         |tot AS (SELECT lang, sum(n) AS n_lang FROM cm GROUP BY 1)
         |SELECT cm.lang, cm.pred_class, cm.n,
         |  round(CAST(cm.n AS DOUBLE) / CAST(tot.n_lang AS DOUBLE), 6) AS rate
         |FROM cm JOIN tot ON cm.lang = tot.lang
         |ORDER BY cm.lang, cm.pred_class""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(textStats, tokenCount, langId, qualityScore, qualityClassifier,
    fingerprint, redact,
    collocations, vocabCoverage, lmScore, repetition, normalize, tfidf, filterFunnel,
    bm25, importanceWeights, lmBigram, perplexityBuckets, boilerplate, zipf, seqPack,
    klDrift, langidConfusion)
}

package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampling / data-mixing operators for assembling a training corpus.
  *
  * Both are map-dominant: the sampler is a pure per-row filter (no shuffle at
  * all — the decision is a deterministic hash of the row's own id), and the
  * mixture table is one small grouped aggregate joined to a broadcast scalar.
  */
object Sampling {

  /** Stratified downsampling with DETERMINISTIC hash-mod buckets: a doc is
    * kept iff md5-hash32(doc_id) mod 100 falls under its stratum's rate
    * (en 50%, de 25%, rest 10%). Unlike `rand()`-based sampling this is
    * reproducible across runs/engines (the oracle applies the identical
    * rule), re-runnable incrementally (a doc's fate never changes), and
    * needs no shuffle or count pass — the filter is evaluated at the scan.
    */
  val stratifiedSample = Q(
    "q_stratified_sample",
    (s, d) => {
      val bucket = TextFns.hash32(col("doc_id").cast("string")) % 100L
      val rate = when(col("lang") === "en", 50L)
        .when(col("lang") === "de", 25L)
        .otherwise(10L)
      Tables.documents(s, d)
        .filter(bucket < rate)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },
    s"""SELECT doc_id, lang, source
       |FROM documents
       |WHERE (${TextFns.hash32Sql("CAST(doc_id AS VARCHAR)")} % 100) <
       |      CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 25 ELSE 10 END
       |ORDER BY doc_id""".stripMargin
  )

  /** Domain-mixture table: per language, document/token counts, the token
    * share of the corpus, and the upsampling weight that would equalize the
    * mixture (`uniform-share / actual-share`) — the bookkeeping behind
    * "mix domains to target proportions" in a training-data pipeline. One
    * grouped aggregate (partial-aggregable) + a broadcast scalar join; the
    * group cardinality is the number of domains, so the second stage is
    * trivially small at any corpus size.
    */
  val domainMix = Q(
    "q_domain_mix",
    (s, d) => {
      val g = Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("toks"))
      val t = g.agg(sum(col("toks")).as("total"), count(lit(1)).as("ngroups"))
      g.crossJoin(broadcast(t))
        .select(col("lang"), col("docs"), col("toks").cast("long").as("tokens"),
          round(col("toks").cast("double") / col("total"), 6).as("token_share"),
          round((col("total").cast("double") / col("ngroups")) / col("toks"), 6).as("mix_weight"))
        .orderBy("lang")
    },
    """WITH g AS (SELECT lang, count(*) AS docs, sum(len(string_split(text,' '))) AS toks
      |           FROM documents GROUP BY 1),
      |t AS (SELECT sum(toks) AS total, count(*) AS ngroups FROM g)
      |SELECT lang, docs, CAST(toks AS BIGINT) AS tokens,
      |  round(CAST(toks AS DOUBLE)/total, 6) AS token_share,
      |  round((CAST(total AS DOUBLE)/ngroups)/toks, 6) AS mix_weight
      |FROM g, t ORDER BY lang""".stripMargin
  )

  /** Training-sequence PACKING: assign documents to fixed-token-budget bins
    * (512 tokens) within each (source, shard) packing stream by start-offset
    * packing — a doc goes to the bin its running-token offset falls in. This
    * is the deterministic, order-stable packing real pretraining pipelines
    * use to batch variable-length documents into fixed-length sequences.
    * The packing unit is (source, shard) — the same md5 shard slice as
    * `q_seq_pack`/`q_shuffle_shards` (round 11: a window keyed by source
    * alone serialized each source's whole token stream through one task);
    * streams pack in parallel, shard count rises with corpus size, and the
    * running sum inside one stream is the same per-partition sequential
    * pass a sort within the stream already pays. Grouped aggregate over
    * (source, shard, bin) finishes the report.
    */
  val packSequences = Q(
    "q_pack_sequences",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val shard = (conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":"), col("source"))), 9, 6), 16, 10).cast("long") % 8L).as("shard")
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), shard,
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val w = Window.partitionBy("source", "shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.withColumn("off", sum(col("n_tok")).over(w) - col("n_tok"))
        .withColumn("bin_id", expr("off div 512"))
        .groupBy("source", "shard", "bin_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("bin_tokens"))
        .orderBy("source", "shard", "bin_id")
    },
    """WITH t AS (SELECT doc_id, source,
      |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 9, 6))::BIGINT % 8
      |          AS shard,
      |        len(split(text, ' ')) AS n_tok
      |      FROM documents),
      |c AS (SELECT doc_id, source, shard, n_tok,
      |        sum(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
      |                         ROWS UNBOUNDED PRECEDING) - n_tok AS off
      |      FROM t)
      |SELECT source, shard, CAST(off // 512 AS BIGINT) AS bin_id,
      |       CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS bin_tokens
      |FROM c GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  )

  /** Sliding token-window chunking — the context-length prep step every
    * pretraining / RAG pipeline runs: split each document into windows of
    * `Size` tokens advancing by `Stride` (overlap = Size − Stride), so long
    * documents become model-sized pieces and no boundary sentence is lost to
    * a hard cut. Entirely ROW-LOCAL (split + bounded transform + explode —
    * fan-out ceil(n/stride), no shuffle until the final order), which makes
    * it free at 100 TB: chunking is a map over the corpus scan. A short
    * document yields exactly one (possibly short) chunk; chunk_id preserves
    * in-document order for downstream packing.
    */
  /** The chunker over any (doc_id, text) frame — the body of
    * `q_chunk_overlap`, parameterized so ChunkOverlapSpec can property-test
    * coverage/reconstruction at arbitrary sizes and strides.
    */
  def chunkWindows(docs: org.apache.spark.sql.DataFrame,
                   size: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    // stride > size would leave UNCOVERED gaps between windows — reject at
    // build time (the coverage property ChunkOverlapSpec proves holds only
    // for stride <= size)
    require(stride >= 1 && stride <= size,
      s"chunkWindows: need 1 <= stride <= size, got size=$size stride=$stride")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, greatest(cast(ceil((size(ws) - $size) / $stride.0) as int), 0)), " +
          s"i -> array_join(slice(ws, i*$stride + 1, $size), ' '))")))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        col("col").as("chunk"),
        org.apache.spark.sql.functions.size(split(col("col"), " ")).cast("long").as("n_tok"))
  }

  val chunkOverlap = Q(
    "q_chunk_overlap",
    (s, d) => chunkWindows(Tables.documents(s, d), 32, 24).orderBy("doc_id", "chunk_id"),
    """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |SELECT doc_id, i AS chunk_id,
      |       array_to_string(w[i*24+1 : i*24+32], ' ') AS chunk,
      |       CAST(len(w[i*24+1 : i*24+32]) AS BIGINT) AS n_tok
      |FROM ws, unnest(range(CAST(greatest(ceil((len(w) - 32) / 24.0), 0) AS BIGINT) + 1)) AS t(i)
      |ORDER BY doc_id, chunk_id""".stripMargin
  )

  /** WEIGHTED sampling without replacement per stratum — the
    * Efraimidis–Spirakis priority trick made deterministic: each doc draws
    * u ∈ (0,1) from its md5 hash (reproducible across runs AND engines, the
    * stratified-sampler discipline) and is ranked by priority ln(u)/w with
    * w = n_chars, so longer documents win proportionally more often;
    * top-3 per source survive. The distributed shape is ONE keyed window
    * (bounded per-source groups) — at 100 TB the per-key top-k goes through
    * the graft_topk partial heap like q_window_topk's scale note; priorities
    * are pre-rounded to 9 dp so the cut is engine-invariant (the
    * rounded-sort-key house rule).
    */
  val weightedSample = Q(
    "q_weighted_sample",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val M = 1048576L
      val u = ((TextFns.hash32(col("text")) % M).cast("double") + 0.5) / M.toDouble
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"),
          round(log(u) / col("n_chars"), 9).as("priority"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("source").orderBy(col("priority").desc, col("doc_id"))))
        .filter(col("rank") <= 3)
        .orderBy("source", "rank")
    },
    s"""WITH pr AS (
       |  SELECT source, doc_id, n_chars,
       |    round(ln(((${TextFns.hash32Sql("text")} % 1048576) + 0.5) / 1048576.0) / n_chars, 9) AS priority
       |  FROM documents),
       |rk AS (SELECT source, doc_id, n_chars, priority,
       |         row_number() OVER (PARTITION BY source ORDER BY priority DESC, doc_id) AS rank
       |       FROM pr)
       |SELECT source, doc_id, n_chars, priority, CAST(rank AS BIGINT) AS rank
       |FROM rk WHERE rank <= 3 ORDER BY source, rank""".stripMargin
  )

  /** TEMPERATURE-SAMPLED data mixture (the multilingual/data-mixing standard
    * from XLM-R / GPT-3 style pipelines): sampling weight ∝ share^α with
    * α = 0.3 — flattens the head, upweights the tail, interpolating between
    * proportional (α=1) and uniform (α=0) mixing; q_domain_mix is the
    * uniform endpoint. Plan: same two tiny aggregates over the per-group
    * grain (the corpus shuffles once at group grain, everything after is
    * KB-sized). Cross-engine determinism: pow() is libm-dependent, so each
    * group's share^α is rounded to 9 dp and the normalizer is the DECIMAL
    * sum of the ROUNDED terms (the bm25-contrib pattern) — the final weight
    * divides two identical numbers on both engines before its 6 dp round.
    */
  val temperatureMix = Q(
    "q_temperature_mix",
    (s, d) => {
      val g = Tables.documents(s, d)
        .groupBy("source")
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("toks"))
      val t = g.agg(sum(col("toks")).as("total"))
      val shares = g.crossJoin(broadcast(t))
        .select(col("source"), col("toks").cast("long").as("tokens"),
          round(pow(col("toks").cast("double") / col("total"), 0.3), 9)
            .cast("decimal(18,9)").as("a"))
      val z = shares.agg(sum(col("a")).as("z"))
      shares.crossJoin(broadcast(z))
        .select(col("source"), col("tokens"),
          round(col("a").cast("double") / col("z").cast("double"), 6).as("mix_weight"))
        .orderBy("source")
    },
    """WITH g AS (SELECT source, sum(len(string_split(text,' '))) AS toks
      |           FROM documents GROUP BY 1),
      |t AS (SELECT sum(toks) AS total FROM g),
      |sh AS (SELECT source, CAST(toks AS BIGINT) AS tokens,
      |         CAST(round(pow(CAST(toks AS DOUBLE)/total, 0.3), 9) AS DECIMAL(18,9)) AS a
      |       FROM g, t),
      |z AS (SELECT sum(a) AS z FROM sh)
      |SELECT source, tokens, round(CAST(a AS DOUBLE)/CAST(z AS DOUBLE), 6) AS mix_weight
      |FROM sh, z ORDER BY source""".stripMargin
  )

  /** CURRICULUM STAGING: token-weighted equi-depth binning by a difficulty
    * score — 10 training stages each holding ~equal TOKEN mass (not equal
    * doc counts; long docs weigh more), the data-ordering step of
    * curriculum-style pretraining. Plan: the corpus aggregates ONCE at the
    * rounded-score grain (the grid is bounded — avg word length to 2 dp),
    * the ≤O(grid) bucket histogram is collected as the MODEL (the
    * q_running_total "collect only the model" pattern), stage boundaries
    * are exact-long cumulative sums computed driver-side, and the stage map
    * broadcasts back over the bucket relation for the final 10-row
    * aggregate. Determinism: `floor(10·cum/total)` is floor of a
    * correctly-rounded IEEE quotient of exact longs — exactly-divisible
    * cases yield the representable integer on both engines, everything
    * else sits strictly between integers; floor (unlike round-half) has no
    * cross-engine boundary.
    */
  val curriculum = Q(
    "q_curriculum",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("toks"),
          round(col("n_chars").cast("double") /
            size(split(col("text"), " ")), 2).as("score"))
      val buckets = docs.groupBy("score")
        .agg(sum(col("toks")).as("btoks"), count(lit(1)).as("bdocs"))
      val model = buckets.orderBy("score").collect()
      val total = model.map(_.getLong(1)).sum
      var cum = 0L
      val stages = model.map { r =>
        val stage = math.min(9L, math.floor(10.0 * cum / total).toLong)
        cum += r.getLong(1)
        (r.getDouble(0), stage)
      }.toSeq
      val stageDf = s.createDataFrame(stages).toDF("m_score", "stage")
      buckets.join(broadcast(stageDf), col("score") === col("m_score"))
        .groupBy("stage")
        .agg(sum(col("bdocs")).cast("long").as("n_docs"),
          sum(col("btoks")).cast("long").as("tokens"))
        .orderBy("stage")
    },
    """WITH d AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS toks,
      |         round(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')), 2) AS score
      |  FROM documents),
      |b AS (SELECT score, sum(toks) AS btoks, count(*) AS bdocs FROM d GROUP BY 1),
      |c AS (SELECT score, btoks, bdocs,
      |        coalesce(sum(btoks) OVER (ORDER BY score
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
      |        (SELECT sum(btoks) FROM b) AS total
      |      FROM b),
      |s AS (SELECT score, least(CAST(floor(10.0 * cum_before / total) AS BIGINT), 9) AS stage,
      |             btoks, bdocs FROM c)
      |SELECT stage, CAST(sum(bdocs) AS BIGINT) AS n_docs, CAST(sum(btoks) AS BIGINT) AS tokens
      |FROM s GROUP BY 1 ORDER BY 1""".stripMargin
  )

  /** GLOBAL TRAINING SHUFFLE + SPLIT + SHARDING — the last stage before a
    * corpus hits the trainer: every doc gets (a) a deterministic train/val/
    * test split by hash bucket (90/5/5 — reproducible, incremental, no
    * coordination), (b) a shard assignment from an INDEPENDENT hash slice
    * (8 shards), and (c) its position inside the shard by hash order — the
    * SGD shuffle, without a global sort. The per-shard position runs as a
    * TWO-LEVEL RANK (round 11 — 8 shards is a low-cardinality partition
    * key, so a plain per-shard window put n/8 docs through one task): the
    * order key's own first hex byte is an ORDER-PRESERVING bucket (fixed-
    * width hex, lexicographic == numeric), within-(shard, bucket) windows
    * rank ~1/256 of a shard, and exclusive bucket offsets live on the
    * bounded 8×256 grain — pos = offset + local row_number, exact integers,
    * hash-identical to the oracle's sequential per-shard window. The three
    * hash slices come from different md5 offsets so split, shard and order
    * are independent: a val doc doesn't land on a fixed shard subset.
    */
  val shuffleShards = Q(
    "q_shuffle_shards",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hx = md5(concat(col("doc_id").cast("string"), lit(":"), col("source")))
      val k = Tables.documents(s, d)
        .select(col("doc_id"), hx.as("hx"))
        .select(col("doc_id"),
          (conv(substring(col("hx"), 1, 8), 16, 10).cast("long") % 100L).as("b"),
          (conv(substring(col("hx"), 9, 6), 16, 10).cast("long") % 8L).as("shard"),
          substring(col("hx"), 15, 12).as("ord"))
        .withColumn("split",
          when(col("b") < 90L, "train").when(col("b") < 95L, "val").otherwise("test"))
        .withColumn("obkt", conv(substring(col("ord"), 1, 2), 16, 10).cast("long"))
        .localCheckpoint() // feeds the offset grain AND the ranked scan
      val offs = k.groupBy(col("shard"), col("obkt")).agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum(col("cnt")).over(
          Window.partitionBy("shard").orderBy("obkt")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("shard"), col("obkt"), col("off"))
      k.join(broadcast(offs), Seq("shard", "obkt"))
        .withColumn("pos", row_number().over(
          Window.partitionBy("shard", "obkt").orderBy(col("ord"), col("doc_id")))
          .cast("long") + col("off"))
        .select(col("doc_id"), col("split"), col("shard"), col("pos"))
        .orderBy("shard", "pos")
    },
    """WITH h AS (
      |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':' || source) AS hx
      |  FROM documents),
      |k AS (
      |  SELECT doc_id,
      |    ('0x'||substr(hx,1,8))::BIGINT % 100 AS b,
      |    ('0x'||substr(hx,9,6))::BIGINT % 8 AS shard,
      |    substr(hx,15,12) AS ord
      |  FROM h)
      |SELECT doc_id,
      |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
      |  shard,
      |  CAST(row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS BIGINT) AS pos
      |FROM k ORDER BY shard, pos""".stripMargin
  )

  /** TOKEN-BUDGET WATER-FILLING — the mixture SOLVER the share reports
    * (q_domain_mix, q_temperature_mix) feed: given a global token budget
    * B = ⌊total/2⌋, find the per-source cap τ (the "water level") with
    * Σ min(n_s, τ) = B and allot each source min(n_s, τ). Small sources
    * keep everything, large sources are clipped to the common level — the
    * classic fair-allocation answer to "we can only afford half the corpus,
    * what do we drop?", and the closed form is exact: sort sources by size
    * ascending, take the longest prefix that fits under budget with the
    * remainder levelled (feasible_i ⟺ c_i + n_i·(m−i) ≤ B), then
    * τ = (B − c_j)/(m − j) for the last feasible j (τ = B/m when even the
    * smallest source is clipped; full allocation when B ≥ total).
    *
    * Scale shape: ONE corpus-sized token count down to |sources| rows
    * (checkpointed — the solver must not re-scan the corpus per consumer);
    * everything after is solver algebra on that bounded grain — the
    * vocab_coverage constant-partition window trick for the sort/cumsum,
    * broadcast scalars for (total, m) and the chosen (j, c_j). Exact
    * integer feasibility tests; the single τ division is the only double,
    * identical in both engines.
    */
  /** The water-filling solver over a (source, n_tok) relation — factored out
    * of [[tokenBudget]] so the edge cases (budget ≥ total, everything
    * clipped, single source) are unit-testable on crafted inputs. Input must
    * be SMALL (one row per source); the caller owns reducing the corpus to
    * that grain. Budget is ⌊total/2⌋.
    */
  def waterFill(gIn: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val g = gIn.localCheckpoint()
      val t = g.agg(sum(col("n_tok")).as("total"), count(lit(1)).as("m"))
      val w = Window.partitionBy(col("total")).orderBy(col("n_tok").asc, col("source").asc)
      val ranked = g.crossJoin(broadcast(t))
        // integer division — a double round-trip loses exactness for totals
        // ≥ 2^53 tokens, the solver's stated 100 TB regime
        .withColumn("budget", expr("total div 2"))
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("c", sum(col("n_tok")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("feasible",
          col("c") + col("n_tok") * (col("m") - col("i")) <= col("budget"))
      val sel = ranked.agg(
        coalesce(max(when(col("feasible"), col("i"))), lit(0L)).as("j"),
        coalesce(max(when(col("feasible"), col("c"))), lit(0L)).as("cj"))
      ranked.crossJoin(broadcast(sel))
        .withColumn("tau",
          when(col("m") === col("j"), col("n_tok").cast("double"))
            .otherwise((col("budget") - col("cj")).cast("double")
              / (col("m") - col("j")).cast("double")))
        .select(col("source"), col("n_tok").as("n_tokens"),
          round(least(col("n_tok").cast("double"), col("tau")), 6).as("allotted"),
          round(least(col("n_tok").cast("double"), col("tau"))
            / col("n_tok").cast("double"), 6).as("sample_rate"))
        .orderBy("source")
  }

  val tokenBudget = Q(
    "q_token_budget",
    (s, d) => waterFill(
      Tables.documents(s, d)
        .groupBy("source")
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_tok"))),
    """WITH g AS (SELECT source, CAST(sum(len(string_split(text,' '))) AS BIGINT) AS n_tok
      |           FROM documents GROUP BY 1),
      |t AS (SELECT CAST(sum(n_tok) AS BIGINT) AS total, count(*) AS m FROM g),
      |r AS (SELECT source, n_tok, total, m,
      |        total // 2 AS budget,
      |        CAST(row_number() OVER (ORDER BY n_tok, source) AS BIGINT) AS i,
      |        CAST(sum(n_tok) OVER (ORDER BY n_tok, source ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
      |      FROM g, t),
      |sel AS (SELECT coalesce(max(CASE WHEN c + n_tok*(m-i) <= budget THEN i END), 0) AS j,
      |               coalesce(max(CASE WHEN c + n_tok*(m-i) <= budget THEN c END), 0) AS cj
      |        FROM r)
      |SELECT source, n_tok AS n_tokens,
      |  round(least(CAST(n_tok AS DOUBLE), tau), 6) AS allotted,
      |  round(least(CAST(n_tok AS DOUBLE), tau)/CAST(n_tok AS DOUBLE), 6) AS sample_rate
      |FROM (SELECT r.*, CASE WHEN m = j THEN CAST(n_tok AS DOUBLE)
      |                       ELSE CAST(budget - cj AS DOUBLE)/CAST(m - j AS DOUBLE) END AS tau
      |      FROM r, sel)
      |ORDER BY source""".stripMargin
  )

  val all: Seq[Q] = Seq(stratifiedSample, domainMix, packSequences, chunkOverlap,
    weightedSample, temperatureMix, curriculum, shuffleShards, tokenBudget)
}

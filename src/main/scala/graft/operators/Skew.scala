package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew mitigation: salted join.
  *
  * When one join key dominates (a hot supplier, a null-heavy foreign key), a
  * plain shuffled join lands the whole hot key on one reducer. Salting splits
  * every big-side row across `nSalts` sub-keys and replicates the small side
  * once per salt — the hot key's work fans out `nSalts`-ways. AQE's skew-join
  * handles moderate skew automatically; explicit salting is the tool for the
  * pathological keys AQE can't split (single-value keys in a hash join).
  */
object Skew {

  /** Join `big` to `small` on big(key) == small(smallKey), salted `nSalts`
    * ways. Produces exactly the rows of the unsalted join (salt values never
    * affect matches — both sides agree on all salts).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, smallKey: String,
                 nSalts: Int): DataFrame = {
    val salted = big.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(nSalts.toLong)))
    val expanded = small
      .withColumn("_salt", explode(array((0 until nSalts).map(i => lit(i.toLong)): _*)))
      .withColumnRenamed(smallKey, key)
    salted.join(expanded, Seq(key, "_salt")).drop("_salt")
  }

  /** Registered instance: lineitem (600k rows over 10 supplier keys — heavy
    * skew) ⋈ supplier, salted 8 ways. The oracle is the PLAIN join: salting
    * must be invisible in the result.
    */
  val saltedJoinQ = Q(
    "q_salted_join",
    (s, d) => {
      saltedJoin(Tables.lineitem(s, d), Tables.supplier(s, d), "l_suppkey", "s_suppkey", 8)
        .groupBy("s_name")
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast(DecimalType(18, 6))).cast("double").as("qty_sum"))
        .orderBy("s_name")
    },
    """SELECT s_name, count(*) AS n_items,
      |CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS qty_sum
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name ORDER BY s_name""".stripMargin
  )

  /** JOIN-KEY SKEW REPORT — the diagnostic that DECIDES when the salting /
    * AQE armor in this file is needed: per candidate join key of the fact
    * table, the frequency profile a planner (or an on-call engineer) reads
    * before picking a join strategy — distinct keys, max/mean per-key
    * multiplicity, the skew ratio between them, and the share of all rows
    * owned by the single hottest key. At 100 TB this runs ahead of every new
    * pipeline: a skew_ratio near 1 means plain shuffled joins are safe; a
    * hot-key share of 10%+ says this exact key needs salting. Shape: one
    * count aggregate per key column to key grain (map-side partial), then a
    * 1-row moment aggregate per column — scan → KB, never a sort of the
    * frequency table (max and argmax-by-(count, key) replace top-k).
    */
  val skewReport = Q(
    "q_skew_report",
    (s, d) => {
      def profile(df: DataFrame, keyCol: String): DataFrame =
        df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
          .agg(
            sum(col("c")).as("n_rows"),
            count(lit(1)).as("n_keys"),
            max(col("c")).as("max_freq"),
            // deterministic hottest key: max by (count, key) via the packed
            // struct max — no sort, no window
            max(struct(col("c"), col("k"))).getField("k").cast("long").as("hot_key"))
          .select(lit(keyCol).as("key_col"), col("n_rows"), col("n_keys"), col("max_freq"),
            round(col("max_freq").cast("double")
              / (col("n_rows").cast("double") / col("n_keys").cast("double")), 6).as("skew_ratio"),
            round(col("max_freq").cast("double") / col("n_rows").cast("double"), 6).as("hot_share"),
            col("hot_key"))
      val li = Tables.lineitem(s, d)
      profile(li, "l_suppkey")
        .unionByName(profile(li, "l_partkey"))
        .unionByName(profile(li, "l_orderkey"))
        .unionByName(profile(Tables.events(s, d), "user_id"))
        .orderBy("key_col")
    },
    """WITH p AS (
      |  SELECT key_col, sum(c) AS n_rows, count(*) AS n_keys, max(c) AS max_freq,
      |         max(struct_pack(c := c, k := k))['k'] AS hot_key
      |  FROM (
      |    SELECT 'l_suppkey' AS key_col, l_suppkey AS k, count(*) AS c FROM lineitem GROUP BY 1, 2
      |    UNION ALL SELECT 'l_partkey', l_partkey, count(*) FROM lineitem GROUP BY 1, 2
      |    UNION ALL SELECT 'l_orderkey', l_orderkey, count(*) FROM lineitem GROUP BY 1, 2
      |    UNION ALL SELECT 'user_id', user_id, count(*) FROM events GROUP BY 1, 2)
      |  GROUP BY key_col)
      |SELECT key_col, CAST(n_rows AS BIGINT) AS n_rows, CAST(n_keys AS BIGINT) AS n_keys,
      |  CAST(max_freq AS BIGINT) AS max_freq,
      |  round(CAST(max_freq AS DOUBLE) / (CAST(n_rows AS DOUBLE)/CAST(n_keys AS DOUBLE)), 6) AS skew_ratio,
      |  round(CAST(max_freq AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS hot_share,
      |  CAST(hot_key AS BIGINT) AS hot_key
      |FROM p ORDER BY key_col""".stripMargin
  )

  val all: Seq[Q] = Seq(saltedJoinQ, skewReport)
}

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
      |CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty_sum
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name ORDER BY s_name""".stripMargin
  )

  val all: Seq[Q] = Seq(saltedJoinQ)
}

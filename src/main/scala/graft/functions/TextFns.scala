package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text primitives shared by the dedup / text-analysis operators.
  *
  * All hashing is md5-hex-prefix → BIGINT so the DuckDB oracle can reproduce it
  * exactly (`('0x'||substr(md5(x),1,N))::BIGINT`); widths are capped so every
  * product in downstream arithmetic stays under 2^62 (overflow-free in both
  * engines). Everything is built-in-function Catalyst — no UDFs — so the whole
  * pipeline stays inside whole-stage codegen.
  */
object TextFns {
  /** 32-bit hash of a string column, as BIGINT in [0, 2^32). */
  def hash32(c: Column): Column = conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 28-bit hash (used to derive permutation coefficients). */
  def hash28(c: Column): Column = conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** A SECOND independent 32-bit hash family from the SAME md5 digest: hex
    * chars 9–16 (bytes 4–7). md5 output bytes are independent, so (hash32,
    * hash32b) is an independent pair at zero extra hashing cost — the hi half
    * of the 64-bit simhash.
    */
  def hash32b(c: Column): Column = conv(substring(md5(c), 9, 8), 16, 10).cast("long")

  def hash32Sql(e: String): String = s"(('0x'||substr(md5($e),1,8))::BIGINT)"
  def hash32bSql(e: String): String = s"(('0x'||substr(md5($e),9,8))::BIGINT)"
  def hash28Sql(e: String): String = s"(('0x'||substr(md5($e),1,7))::BIGINT)"

  /** JVM-side twin of [[hash32]]/[[hash28]] for plan-build-time constants
    * (permutation coefficients, literal plane weights). The single source of
    * the md5-hex-prefix contract — keep every caller on this, never a local
    * copy, so the Column, SQL, and literal renderings can't drift.
    */
  def hashN(s: String, hexChars: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(hexChars), 16)
  }

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles per doc: (doc_id, sh). Docs with fewer than
    * n tokens are dropped (deterministic on both sides).
    *
    * Shape note: explode + DISTINCT keeps the md5-heavy shingle hashing
    * inside whole-stage codegen. The tempting row-local alternative
    * (`array_distinct(transform(...))` per doc, no dedup shuffle) measures
    * SLOWER end-to-end because higher-order-function lambdas evaluate
    * interpreted, outside codegen — a measured 1.5-2× regression on the
    * downstream join queries at sf0.1.
    *
    * Document-frequency capping deliberately does NOT live here: the one
    * consumer that needs it (q_ngram_jaccard) folds the cap into a bounded
    * per-shingle doc-list aggregate (`graft_topk`), which needs neither a
    * stop-shingle broadcast (unbounded driver list when the cap is small
    * relative to the corpus) nor a count-over-window pass.
    */
  def shingles(documents: DataFrame, n: Int): DataFrame =
    documents
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= n)
      .select(col("doc_id"), explode(sequence(lit(0), size(col("t")) - n)).as("i"), col("t"))
      .select(col("doc_id"),
        concat_ws(" ", (1 to n).map(k => element_at(col("t"), col("i") + k)): _*).as("sh"))
      .distinct()

  /** DuckDB rendering of [[shingles]] as a CTE body over `documents`. */
  def shinglesSql(n: Int, maxDf: Option[Int] = None): String = {
    val parts = (1 to n).map(k => s"t[i+$k]").mkString(" || ' ' || ")
    val base =
      s"""SELECT DISTINCT doc_id, $parts AS sh
         |FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents
         |      WHERE len(string_split(text,' ')) >= $n),
         |     unnest(range(len(t)-${n - 1})) AS u(i)""".stripMargin
    maxDf match {
      case None => base
      case Some(cap) =>
        s"""SELECT doc_id, sh FROM (
           |  SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM ($base))
           |WHERE df <= $cap""".stripMargin
    }
  }
}

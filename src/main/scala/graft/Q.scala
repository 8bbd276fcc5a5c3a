package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A registered operator query: Spark-side builder + DuckDB oracle SQL.
  *
  * The driver's correctness gate runs `fn` at sf0.01, dumps parquet, runs
  * `oracle` in DuckDB over the same tables, and hash-compares (columns sorted
  * by name). Column names/aliases must therefore match exactly on both sides,
  * and every query ends in a deterministic ORDER BY.
  */
final case class Q(name: String, fn: (SparkSession, String) => DataFrame, oracle: String)

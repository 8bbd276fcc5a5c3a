package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic synthetic geometry.
  *
  * The reference operates on route geometries (easting/northing in EPSG:27700,
  * see reference src/process_cycle_networks.py:70-99). The driver's testdata has
  * no geometry columns, so geo operators synthesize easting/northing from
  * integer key columns with EXACTLY the same integer arithmetic on the Spark
  * side (these Columns) and in the DuckDB oracle (the *Sql strings). All inputs
  * are non-negative so `%` agrees between engines.
  *
  * Kept as plain column expressions: fully whole-stage-codegen'd, pushdown-safe.
  */
object Geom {
  // lineitem → a 2-point "route" in BNG-ish coordinate space.
  val e1: Column = lit(100000L) + (col("l_orderkey") * 37L + col("l_linenumber") * 1009L) % 500000L
  val n1: Column = lit(100000L) + (col("l_partkey") * 53L + col("l_suppkey") * 211L) % 900000L
  val dx: Column = col("l_partkey") % 2000L - 1000L
  val dy: Column = (col("l_suppkey") * 7919L) % 2000L - 1000L
  val e2: Column = e1 + dx
  val n2: Column = n1 + dy

  val e1Sql = "(100000 + (l_orderkey*37 + l_linenumber*1009) % 500000)"
  val n1Sql = "(100000 + (l_partkey*53 + l_suppkey*211) % 900000)"
  val dxSql = "((l_partkey % 2000) - 1000)"
  val dySql = "((l_suppkey*7919) % 2000 - 1000)"
  val e2Sql = s"($e1Sql + $dxSql)"
  val n2Sql = s"($n1Sql + $dySql)"

  // part / orders → a point (easting < 700 km, northing < 1000 km, i.e. the
  // well-defined domain of the OS grid letter pairs).
  def pointE(key: String): Column = (col(key) * 131L) % 700000L
  def pointN(key: String): Column = (col(key) * 197L) % 1000000L
  def pointESql(key: String): String = s"(($key*131) % 700000)"
  def pointNSql(key: String): String = s"(($key*197) % 1000000)"
}

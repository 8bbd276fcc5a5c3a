package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) encoding of 2-D coordinates — the data-LAYOUT primitive
  * for spatial locality at scale: sorting/range-partitioning a 100 TB point
  * table by `morton(x, y)` clusters spatially-near rows into the same files,
  * so a bounding-box scan prunes row groups by parquet min/max stats instead
  * of reading the whole table (the same technique Delta/Iceberg expose as
  * `OPTIMIZE ZORDER BY`). Pure codegen'd integer bit-math — usable in
  * projections, `repartitionByRange`, and `sortWithinPartitions` alike.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to even bit positions (magic-number bit
    * interleave, the standard O(log w) Morton construction).
    */
  def spread(v: Column): Column = {
    val a = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(16711935L))    // 0x00FF00FF
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(252645135L))   // 0x0F0F0F0F
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(858993459L))   // 0x33333333
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(1431655765L))          // 0x55555555
  }

  /** 32-bit Morton code of two 16-bit quantized coordinates (x in even
    * bits, y in odd bits).
    */
  def morton(qx: Column, qy: Column): Column =
    spread(qx).bitwiseOR(shiftleft(spread(qy), 1))

  /** DuckDB rendering of [[spread]] for oracle SQL. */
  def spreadSql(v: String): String = {
    var s = s"(($v | ($v << 8)) & 16711935)"
    s = s"(($s | ($s << 4)) & 252645135)"
    s = s"(($s | ($s << 2)) & 858993459)"
    s"(($s | ($s << 1)) & 1431655765)"
  }

  /** DuckDB rendering of [[morton]] for oracle SQL. */
  def mortonSql(qx: String, qy: String): String =
    s"(${spreadSql(qx)} | (${spreadSql(qy)} << 1))"
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** OS grid-reference conversion (easting/northing → "NT 25940 73060").
  *
  * Same semantics as reference src/utils/geotiles.py:12-59 (precision 6 = 100 m,
  * 8 = 10 m, 10 = 1 m; grid letters skip 'I'), re-expressed as pure Catalyst
  * column arithmetic — no UDF, whole-stage-codegen'd, so it runs at scan speed
  * on 100 TB. A plain-Scala twin ([[OsGrid.gridRefScala]]) exists for
  * property-based tests.
  */
object OsGrid {
  private val Chars = "ABCDEFGHJKLMNOPQRSTUVWXYZ" // no I

  /** Grid letters + digits at the given precision, as a Column. */
  def gridRef(e: Column, n: Column, precision: Int): Column = {
    val e100k = floor(e / 100000.0d).cast("long")
    // The reference computes letter indices from the RAW northing (including
    // n >= 1,000,000, where it then subtracts 1,000,000 only from the digit
    // remainder — geotiles.py:40-45); we mirror that.
    val n100k = floor(n / 100000.0d).cast("long")
    val l1 = (lit(19L) - n100k) - (lit(19L) - n100k) % 5L + floor((e100k + 10L) / 5.0d).cast("long")
    val l2 = ((lit(19L) - n100k) * 5L) % 25L + e100k % 5L
    val letters = concat(
      substring(lit(Chars), 1, 25).substr(l1.cast("int") + 1, lit(1)),
      substring(lit(Chars), 1, 25).substr(l2.cast("int") + 1, lit(1))
    )
    val eRem = e.cast("long") - e100k * 100000L
    val nAdj = when(n >= 1000000L, n.cast("long") - 1000000L).otherwise(n.cast("long"))
    val nRem = nAdj - n100k * 100000L
    // Python's rjust pads but never truncates (matters for the degenerate
    // n>=1M inputs, where the reference emits negative digit groups); Spark's
    // lpad truncates, so guard it.
    def digits(v: Column, div: Long, w: Int): Column = {
      val s = floor(v / lit(div.toDouble)).cast("long").cast("string")
      when(length(s) >= w, s).otherwise(lpad(s, w, "0"))
    }
    val body = precision match {
      case 6  => concat(letters, digits(eRem, 100L, 3), digits(nRem, 100L, 3))
      case 8  => concat_ws(" ", letters, digits(eRem, 10L, 4), digits(nRem, 10L, 4))
      case 10 => concat_ws(" ", letters, digits(eRem, 1L, 5), digits(nRem, 1L, 5))
      case p  => throw new IllegalArgumentException(s"precision must be 6, 8 or 10, got $p")
    }
    // Out-of-range → empty string, as in the reference (geotiles.py:29-30).
    when(e100k < 0L || e100k > 6L || n100k < 0L || n100k > 12L, lit("")).otherwise(body)
  }

  /** DuckDB-SQL rendering of the same math over easting/northing SQL snippets
    * (restricted to the tested domain e<700k, n<1M — no out-of-range branch).
    */
  def gridRefSql(e: String, n: String, precision: Int): String = {
    val e100k = s"CAST(floor($e/100000.0) AS BIGINT)"
    val n100k = s"CAST(floor($n/100000.0) AS BIGINT)"
    val l1 = s"((19-$n100k) - ((19-$n100k)%5) + CAST(floor(($e100k+10)/5.0) AS BIGINT))"
    val l2 = s"(((19-$n100k)*5)%25 + ($e100k%5))"
    val letters = s"(substr('$Chars', CAST($l1 AS INTEGER)+1, 1) || substr('$Chars', CAST($l2 AS INTEGER)+1, 1))"
    val eRem = s"($e - $e100k*100000)"
    val nRem = s"($n - $n100k*100000)"
    def digits(v: String, div: Long, w: Int): String =
      s"lpad(CAST(CAST(floor($v/$div.0) AS BIGINT) AS VARCHAR), $w, '0')"
    precision match {
      case 6  => s"($letters || ${digits(eRem, 100L, 3)} || ${digits(nRem, 100L, 3)})"
      case 8  => s"($letters || ' ' || ${digits(eRem, 10L, 4)} || ' ' || ${digits(nRem, 10L, 4)})"
      case 10 => s"($letters || ' ' || ${digits(eRem, 1L, 5)} || ' ' || ${digits(nRem, 1L, 5)})"
      case p  => throw new IllegalArgumentException(s"precision must be 6, 8 or 10, got $p")
    }
  }

  /** Plain-Scala twin for tests (mirrors geotiles.py exactly, incl. the
    * out-of-range empty string and the n>=1M digit adjustment).
    */
  def gridRefScala(e: Double, n: Double, precision: Int): String = {
    val e100k = math.floor(e / 100000).toLong
    val n100k = math.floor(n / 100000).toLong
    if (e100k < 0 || e100k > 6 || n100k < 0 || n100k > 12) return ""
    val l1 = (19 - n100k) - (19 - n100k) % 5 + math.floor((e100k + 10) / 5.0).toLong
    val l2 = (19 - n100k) * 5 % 25 + e100k % 5
    val letters = s"${Chars(l1.toInt)}${Chars(l2.toInt)}"
    val eRem = e - e100k * 100000
    val nAdj = if (n >= 1000000) n - 1000000 else n
    val nRem = nAdj - n100k * 100000
    def d(v: Double, div: Long, w: Int): String = {
      val s = math.floor(v / div).toLong.toString
      ("0" * math.max(0, w - s.length)) + s
    }
    precision match {
      case 6  => s"$letters${d(eRem, 100, 3)}${d(nRem, 100, 3)}"
      case 8  => s"$letters ${d(eRem, 10, 4)} ${d(nRem, 10, 4)}"
      case 10 => s"$letters ${d(eRem, 1, 5)} ${d(nRem, 1, 5)}"
      case p  => throw new IllegalArgumentException(s"precision must be 6, 8 or 10, got $p")
    }
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** WKT serialize/parse as column expressions.
  *
  * Mirrors the reference's round-trip: ST_AsText on read (app/app.py:69,86) and
  * WKT dumps on write (src/utils/db_helpers.py:185-190,
  * src/process_cycle_networks.py:146-153). Geometry here is the synthesized
  * integer easting/northing pairs (see [[Geom]]); serialization is plain string
  * building and parsing is regexp extraction — both codegen'd, no UDF.
  */
object Wkt {
  /** 'POINT(e n)' */
  def point(e: Column, n: Column): Column =
    concat(lit("POINT("), e.cast("string"), lit(" "), n.cast("string"), lit(")"))

  /** 'LINESTRING(x1 y1, x2 y2)' */
  def lineString(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    concat(
      lit("LINESTRING("),
      x1.cast("string"), lit(" "), y1.cast("string"), lit(", "),
      x2.cast("string"), lit(" "), y2.cast("string"), lit(")"))

  /** First X coordinate back out of a LINESTRING WKT (integer coords). */
  def parseFirstX(wkt: Column): Column =
    regexp_extract(wkt, "LINESTRING\\(([0-9-]+) ", 1).cast("long")

  /** Last Y coordinate back out of a LINESTRING WKT (integer coords). */
  def parseLastY(wkt: Column): Column =
    regexp_extract(wkt, " ([0-9-]+)\\)$", 1).cast("long")

  def pointSql(e: String, n: String): String =
    s"('POINT(' || CAST($e AS VARCHAR) || ' ' || CAST($n AS VARCHAR) || ')')"

  def lineStringSql(x1: String, y1: String, x2: String, y2: String): String =
    s"('LINESTRING(' || CAST($x1 AS VARCHAR) || ' ' || CAST($y1 AS VARCHAR) || ', ' || " +
      s"CAST($x2 AS VARCHAR) || ' ' || CAST($y2 AS VARCHAR) || ')')"

  def parseFirstXSql(wkt: String): String =
    s"CAST(regexp_extract($wkt, 'LINESTRING\\(([0-9-]+) ', 1) AS BIGINT)"

  def parseLastYSql(wkt: String): String =
    s"CAST(regexp_extract($wkt, ' ([0-9-]+)\\)$$', 1) AS BIGINT)"

  /** 'MULTILINESTRING((x1 y1, x2 y2), (x3 y3, x4 y4))' — two 2-point parts
    * (the multi-part geometry the reference handles via shapely,
    * app/app.py:11, process_cycle_networks.py:91).
    */
  def multiLineString2(x1: Column, y1: Column, x2: Column, y2: Column,
                       x3: Column, y3: Column, x4: Column, y4: Column): Column =
    concat(
      lit("MULTILINESTRING(("),
      x1.cast("string"), lit(" "), y1.cast("string"), lit(", "),
      x2.cast("string"), lit(" "), y2.cast("string"), lit("), ("),
      x3.cast("string"), lit(" "), y3.cast("string"), lit(", "),
      x4.cast("string"), lit(" "), y4.cast("string"), lit("))"))

  /** Number of parts in a MULTILINESTRING WKT (split on the '), (' part
    * separator — a literal in DuckDB's string_split, regex-escaped here).
    */
  def numParts(wkt: Column): Column =
    size(split(wkt, "\\), \\(")).cast("long")

  /** First X of the first part of a MULTILINESTRING WKT. */
  def parseMultiFirstX(wkt: Column): Column =
    regexp_extract(wkt, "MULTILINESTRING\\(\\(([0-9-]+) ", 1).cast("long")

  /** Last Y of the last part of a MULTILINESTRING WKT. */
  def parseMultiLastY(wkt: Column): Column =
    regexp_extract(wkt, " ([0-9-]+)\\)\\)$", 1).cast("long")

  def multiLineString2Sql(x1: String, y1: String, x2: String, y2: String,
                          x3: String, y3: String, x4: String, y4: String): String =
    s"('MULTILINESTRING((' || CAST($x1 AS VARCHAR) || ' ' || CAST($y1 AS VARCHAR) || ', ' || " +
      s"CAST($x2 AS VARCHAR) || ' ' || CAST($y2 AS VARCHAR) || '), (' || " +
      s"CAST($x3 AS VARCHAR) || ' ' || CAST($y3 AS VARCHAR) || ', ' || " +
      s"CAST($x4 AS VARCHAR) || ' ' || CAST($y4 AS VARCHAR) || '))')"

  def numPartsSql(wkt: String): String =
    s"CAST(len(string_split($wkt, '), (')) AS BIGINT)"

  def parseMultiFirstXSql(wkt: String): String =
    s"CAST(regexp_extract($wkt, 'MULTILINESTRING\\(\\(([0-9-]+) ', 1) AS BIGINT)"

  def parseMultiLastYSql(wkt: String): String =
    s"CAST(regexp_extract($wkt, ' ([0-9-]+)\\)\\)$$', 1) AS BIGINT)"
}

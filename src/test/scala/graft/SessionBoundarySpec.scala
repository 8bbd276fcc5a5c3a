package graft

import org.apache.spark.sql.functions._

/** Pins the exact session-merge boundary rule of `session_window` that the
  * q_session_window oracle mirrors: Spark starts a new session only when the
  * next event is STRICTLY past the current session's end (start > end in
  * MergingSessionsIterator), so two events exactly gap-apart MERGE, and one
  * microsecond past the gap SPLITS. The production data essentially never
  * lands on the boundary, so without this spec an inverted oracle rule
  * (split at >=) would stay green indefinitely.
  */
class SessionBoundarySpec extends SparkSpec {

  private val gapUs = 1800000000L // 30 min in micros

  private def sessions(deltaUs: Long): Long = {
    val t0 = 1704067200000000L // 2024-01-01T00:00:00Z in micros
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, t0),
        org.apache.spark.sql.Row(1L, t0 + deltaUs)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("tus", org.apache.spark.sql.types.LongType))))
      .withColumn("t", timestamp_micros(col("tus")))
    df.groupBy(col("user_id"), session_window(col("t"), "30 minutes"))
      .agg(count(lit(1)).as("n")).count()
  }

  test("events exactly gap-apart merge into one session") {
    assert(sessions(gapUs) == 1L,
      "Spark merges at start == current end; the oracle must split only at diff > gap")
  }

  test("events one microsecond past the gap split into two sessions") {
    assert(sessions(gapUs + 1L) == 2L)
  }

  test("the oracle's lag-cumsum rule agrees on both sides of the boundary") {
    // the oracle formulation, executed by Spark SQL (same SQL semantics):
    // new session at diff > gap — must give the same session counts
    def oracleSessions(deltaUs: Long): Long = {
      import org.apache.spark.sql.expressions.Window
      val t0 = 1704067200000000L
      val df = spark.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row(1L, t0),
          org.apache.spark.sql.Row(1L, t0 + deltaUs)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("tus", org.apache.spark.sql.types.LongType))))
      val w = Window.partitionBy("user_id").orderBy("tus")
      df.withColumn("new_sess",
          when(col("tus") - lag("tus", 1).over(w) > gapUs, 1L).otherwise(0L))
        .withColumn("sid", sum("new_sess").over(w))
        .groupBy("user_id", "sid").agg(count(lit(1))).count()
    }
    assert(oracleSessions(gapUs) == sessions(gapUs))
    assert(oracleSessions(gapUs + 1L) == sessions(gapUs + 1L))
  }
}

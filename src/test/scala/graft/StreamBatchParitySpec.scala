package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming oracle parity: the windowed streaming aggregate, run over the
  * REAL sf0.01 events file through Spark's file streaming source to
  * completion, must produce exactly the rows of the oracle-checked batch
  * query `q_time_window`. This closes the loop the in-memory EventsStreamSpec
  * can't: same parquet bytes, same nanos-ts edge conversion, file-source
  * listing/scheduling in the path — and the comparison target is a query the
  * DuckDB oracle hash-verifies every round.
  */
class StreamBatchParitySpec extends SparkSpec {

  test("file-source streaming hourly agg equals the oracle-checked batch result") {
    val dir = sf("sf0.01")
    // file streaming sources list directories; stage the single parquet file
    val staged = Files.createTempDirectory("events-stream")
    Files.copy(Paths.get(s"$dir/events.parquet"), staged.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = Tables.normalizeEventsTs(
        spark.readStream.schema(schema).parquet(staged.toString))
      .withColumn("t", timestamp_micros(expr("ts DIV 1000")))
    val q = EventsStream.hourlyAgg(stream)
      .writeStream.format("memory").queryName("hourly_file").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hourly_file").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet

      val want = SparkEntry.queries("q_time_window")(spark, dir).collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet

      assert(got.size == want.size, s"row counts differ: stream ${got.size} vs batch ${want.size}")
      assert(got == want, "streaming result diverges from the oracle-checked batch rows")
    } finally q.stop()
  }

  test("file-source streaming HOPPING agg equals the oracle-checked batch result") {
    val dir = sf("sf0.01")
    val staged = Files.createTempDirectory("events-hop-stream")
    Files.copy(Paths.get(s"$dir/events.parquet"), staged.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = Tables.normalizeEventsTs(
        spark.readStream.schema(schema).parquet(staged.toString))
      .withColumn("t", timestamp_micros(expr("ts DIV 1000")))
    val q = streaming.EventsStream.hoppingAgg(stream)
      .writeStream.format("memory").queryName("hopping_file").outputMode("complete").start()
    try {
      q.processAllAvailable()
      // stream emits window_start as timestamp; the oracle-checked batch
      // query reports epoch micros — compare in millis (starts are
      // 15-min-aligned, so nothing is lost)
      val got = spark.table("hopping_file").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val want = SparkEntry.queries("q_hop_window")(spark, dir).collect()
        .map(r => (r.getLong(0) / 1000L, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(want.nonEmpty && got.size == want.size,
        s"row counts differ: stream ${got.size} vs batch ${want.size}")
      assert(got == want, "streaming hopping result diverges from the oracle-checked batch rows")
    } finally q.stop()
  }

  test("file-source streaming SESSION windows equal the oracle-checked batch result") {
    val dir = sf("sf0.01")
    val staged = Files.createTempDirectory("events-session-stream")
    Files.copy(Paths.get(s"$dir/events.parquet"), staged.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = Tables.normalizeEventsTs(
        spark.readStream.schema(schema).parquet(staged.toString))
      .withColumn("t", timestamp_micros(expr("ts DIV 1000")))
    val q = EventsStream.sessionAgg(stream)
      .writeStream.format("memory").queryName("session_file").outputMode("complete").start()
    try {
      q.processAllAvailable()
      // session boundaries are event times at MICROsecond precision —
      // compare exact micros (millis would silently forgive drift)
      val got = spark.table("session_file")
        .select(col("user_id"), unix_micros(col("session_start")),
          unix_micros(col("session_end")), col("n_events"), col("value_sum"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      val want = SparkEntry.queries("q_session_window")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(want.nonEmpty && got.size == want.size,
        s"row counts differ: stream ${got.size} vs batch ${want.size}")
      assert(got == want, "streaming session result diverges from the oracle-checked batch rows")
    } finally q.stop()
  }

  test("streaming CDC compaction equals the oracle-checked latest-per-key rows") {
    val dir = sf("sf0.01")
    val staged = Files.createTempDirectory("events-latest-stream")
    Files.copy(Paths.get(s"$dir/events.parquet"), staged.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = Tables.normalizeEventsTs(
      spark.readStream.schema(schema).parquet(staged.toString))
    val q = EventsStream.latestState(stream)
      .writeStream.format("memory").queryName("latest_file").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("latest_file").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))
        .toSet
      val want = SparkEntry.queries("q_latest_per_key")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))
        .toSet
      assert(want.nonEmpty && got == want,
        "streaming compacted state diverges from the oracle-checked batch rows")
    } finally q.stop()
  }

  test("stream-static broadcast enrichment equals the batch join, row for row") {
    val dir = sf("sf0.01")
    val staged = Files.createTempDirectory("events-enrich-stream")
    Files.copy(Paths.get(s"$dir/events.parquet"), staged.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val dim = spark.read.parquet(s"$dir/customer.parquet")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(staged.toString)
    // inner join vs a STATIC broadcast side: append mode, no watermark, no
    // state store — each micro-batch is a map-side probe
    val q = EventsStream.enriched(stream, dim)
      .writeStream.format("memory").queryName("enrich_file").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("enrich_file").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
          r.getInt(4), r.getString(5))).toSet
      val want = EventsStream.enriched(spark.read.parquet(s"$dir/events.parquet"), dim)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
          r.getInt(4), r.getString(5))).toSet
      assert(want.nonEmpty && got.size == want.size,
        s"row counts differ: stream ${got.size} vs batch ${want.size}")
      assert(got == want, "stream-static enrichment diverges from the batch join")
    } finally q.stop()
  }

  test("stream-static POINT-IN-TIME enrichment equals the oracle-checked as-of join") {
    val dir = sf("sf0.01")
    val staged = Files.createTempDirectory("events-pit-stream")
    Files.copy(Paths.get(s"$dir/events.parquet"), staged.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    // the SCD2 dimension builds in batch (it is the static side), with
    // valid_to retained for the interval predicate
    val ev = Tables.events(spark, dir).select(
      col("user_id"), col("event_type"), expr("ts DIV 1000").as("tus"), col("event_id"))
    val dim = operators.Analytics.scd2History(
        ev.filter(col("event_type").isin("signup", "purchase", "error")))
      .select(col("user_id").as("d_uid"), col("event_type").as("state"),
        col("valid_from"), col("valid_to"))
      .cache()

    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = Tables.normalizeEventsTs(
        spark.readStream.schema(schema).parquet(staged.toString))
      .filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("tus"))
    // interval containment vs a broadcast STATIC side: append mode, no
    // watermark, no state — at most one version matches per fact because
    // SCD2 intervals tile each key's timeline
    val q = EventsStream.pitEnriched(stream, dim)
      .writeStream.format("memory").queryName("pit_file").outputMode("append").start()
    try {
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getString(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))
      val got = spark.table("pit_file").collect().map(key).toSet
      val want = SparkEntry.queries("q_pit_join")(spark, dir).collect().map(key).toSet
      assert(want.nonEmpty && got.size == want.size,
        s"row counts differ: stream ${got.size} vs batch ${want.size}")
      assert(got == want,
        "stream-static PIT enrichment diverges from the oracle-checked as-of rows")
    } finally { q.stop(); dim.unpersist(blocking = false) }
  }
}

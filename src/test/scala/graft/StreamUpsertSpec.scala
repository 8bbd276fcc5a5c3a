package graft

import graft.streaming.StreamUpsert
import graft.streaming.StreamUpsert.{Change, KeyState, Upsert}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming MERGE/upsert with tombstones: the `flatMapGroupsWithState`
  * operator folds the REAL sf0.01 events file (through the file streaming
  * source) into per-key state, and the final applied state must equal the
  * batch truth — latest event per user, users whose latest event is the
  * tombstone type absent. Plus pure unit tests of the fold.
  */
class StreamUpsertSpec extends SparkSpec {

  test("advance: newest-wins tiebreak, tombstone deletes, stale updates ignored") {
    val c1 = Change(1L, 100L, 5L, "view")
    val c2 = Change(1L, 100L, 9L, "click") // same ts, higher id wins
    val c3 = Change(1L, 50L, 99L, "signup") // older ts — never wins
    assert(StreamUpsert.advance(None, Seq(c1, c2, c3)) ===
      ((Some(KeyState(100L, 9L, "click")), Some(Upsert(1L, "click", 100L, deleted = false)))))
    // a stale batch against existing state emits nothing
    assert(StreamUpsert.advance(Some(KeyState(100L, 9L, "click")), Seq(c3)) ===
      ((Some(KeyState(100L, 9L, "click")), None)))
    // tombstone RETAINS state (carrying the delete's position in the change
    // order) and emits a delete
    val del = Change(1L, 200L, 1L, "error")
    assert(StreamUpsert.advance(Some(KeyState(100L, 9L, "click")), Seq(del)) ===
      ((Some(KeyState(200L, 1L, "error")), Some(Upsert(1L, "error", 200L, deleted = true)))))
    // the ADVICE r9 regression: an OLDER change arriving AFTER the delete
    // (out-of-order, later micro-batch) must NOT resurrect the key — it
    // compares against the tombstone's (ts, id), not Long.MinValue
    assert(StreamUpsert.advance(Some(KeyState(200L, 1L, "error")),
      Seq(Change(1L, 150L, 7L, "click"))) ===
      ((Some(KeyState(200L, 1L, "error")), None)))
    // a genuinely NEWER change after a delete re-creates the key
    assert(StreamUpsert.advance(Some(KeyState(200L, 1L, "error")),
      Seq(Change(1L, 300L, 2L, "view"))) ===
      ((Some(KeyState(300L, 2L, "view")), Some(Upsert(1L, "view", 300L, deleted = false)))))
  }

  test("out-of-order change in a later micro-batch does not resurrect a deleted key") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Change]
    val q = StreamUpsert.upserts(in.toDS())
      .writeStream.format("memory").queryName("upsert_ooo")
      .outputMode("update").start()
    try {
      // batch 1: create then delete key 1; create key 2
      in.addData(Change(1L, 100L, 1L, "view"), Change(1L, 200L, 2L, "error"),
        Change(2L, 100L, 3L, "click"))
      q.processAllAvailable()
      // batch 2: an out-of-order STALE change for the deleted key 1 (ts 150 <
      // the tombstone's 200) and a stale one for live key 2
      in.addData(Change(1L, 150L, 9L, "click"), Change(2L, 50L, 9L, "view"))
      q.processAllAvailable()
      val applied = scala.collection.mutable.LinkedHashMap[Long, Upsert]()
      spark.table("upsert_ooo").collect().foreach { r =>
        val u = Upsert(r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3))
        applied(u.user_id) = u
      }
      assert(applied(1L).deleted, s"deleted key resurrected: ${applied(1L)}")
      assert(applied(2L) === Upsert(2L, "click", 100L, deleted = false))
    } finally q.stop()
  }

  test("file-source streaming upserts apply to the batch latest-state truth") {
    import spark.implicits._
    val dir = sf("sf0.01")
    val staged = Files.createTempDirectory("events-upsert-stream")
    Files.copy(Paths.get(s"$dir/events.parquet"), staged.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val changes = Tables.normalizeEventsTs(
        spark.readStream.schema(schema).parquet(staged.toString))
      .select(col("user_id"), expr("ts DIV 1000").as("ts_us"),
        col("event_id"), col("event_type"))
      .as[Change]
    val q = StreamUpsert.upserts(changes)
      .writeStream.format("memory").queryName("upsert_file")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // apply the upsert log in emission order: last row per key wins
      val applied = scala.collection.mutable.LinkedHashMap[Long, Upsert]()
      spark.table("upsert_file").collect().foreach { r =>
        val u = Upsert(r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3))
        applied(u.user_id) = u
      }
      val got = applied.values.filterNot(_.deleted)
        .map(u => (u.user_id, u.event_type, u.ts_us)).toSet

      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("tus").desc, col("event_id").desc)
      val want = Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("tus"),
          col("event_id"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .filter(col("event_type") =!= StreamUpsert.Tombstone)
        .select(col("user_id"), col("event_type"), col("tus"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

      assert(want.nonEmpty && got == want,
        s"streaming upsert state diverges: stream ${got.size} vs batch ${want.size}")
    } finally q.stop()
  }
}

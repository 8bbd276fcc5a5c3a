package graft

import graft.operators.Behavior
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The z-score anomaly scorer is a broadcast-model + stateless-predicate
  * transform, so the SAME function (`Behavior.scoreAnomalies`) must run
  * unchanged over a structured stream and emit exactly the oracle-checked
  * batch rows: model trained once on the static history, stream scored as
  * it lands — no watermark, no state store. This is the monitoring twin of
  * StreamDecontaminate's "screen the crawl" shape.
  */
class StreamAnomalySpec extends SparkSpec {

  test("streaming anomaly scoring equals the batch result over the same parquet") {
    val dir = sf("sf0.01")
    val staged = Files.createTempDirectory("events-stream")
    Files.copy(Paths.get(s"$dir/events.parquet"), staged.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val batch = Tables.events(spark, dir)
    val model = typeStatsOnce(batch)

    val schema = batch.schema
    val stream = spark.readStream.schema(schema).parquet(staged.toString)
    val q = Behavior.scoreAnomalies(stream, model)
      .writeStream.format("memory").queryName("anomalies").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("anomalies").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3))).toSet
      val want = SparkEntry.queries("q_anomaly_zscore")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3))).toSet
      assert(want.nonEmpty, "the batch query must flag some anomalies")
      assert(got == want, "streaming anomaly rows diverge from the batch rows")
    } finally q.stop()
  }

  /** Materialize the tiny model so the streaming join sees a static local
    * relation (the deployment shape: the trained model ships with the job).
    */
  private def typeStatsOnce(ev: org.apache.spark.sql.DataFrame) = {
    val rows = Behavior.typeStats(ev).collect().toSeq
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      Behavior.typeStats(ev).schema)
  }
}

package graft

import org.apache.spark.sql.functions.col
import java.nio.file.Files

/** The `geojson` connector's streaming read: a document-queue directory is
  * consumed incrementally — each micro-batch picks up only newly arrived
  * files — and the streamed rows must equal the batch read of the same
  * documents (same fetch+parse path underneath).
  */
class GeoJsonStreamSpec extends SparkSpec {

  private def feature(id: String) =
    s"""{"type": "Feature",
       | "properties": {"route_id": "$id", "local_authority": "Edinburgh"},
       | "geometry": {"type": "LineString", "coordinates": [[325000.0, 673000.0], [325300.0, 673400.0]]}}""".stripMargin

  test("streaming read consumes a document queue incrementally, matching batch") {
    val dir = Files.createTempDirectory("gjq").toFile
    def writeDoc(name: String, ids: Seq[String]): Unit =
      Files.writeString(new java.io.File(dir, name).toPath,
        s"""{"type": "FeatureCollection", "features": [${ids.map(feature).mkString(",")}]}""")

    writeDoc("doc_001.geojson", Seq("R1", "R2"))

    val q = spark.readStream.format("geojson").load(dir.getAbsolutePath)
      .select(col("properties")("route_id").as("route_id"), col("source_file"))
      .writeStream.format("memory").queryName("gj_stream").start()
    try {
      q.processAllAvailable()
      val afterBatch1 = spark.table("gj_stream").collect().map(_.getString(0)).sorted.toSeq
      assert(afterBatch1 == Seq("R1", "R2"), s"first micro-batch: $afterBatch1")

      // two more documents arrive — ONLY they should be read in batch 2
      writeDoc("doc_002.geojson", Seq("R3"))
      writeDoc("doc_003.geojson", Seq("R4", "R5"))
      q.processAllAvailable()
      val streamed = spark.table("gj_stream").collect()
        .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      assert(streamed.map(_._1) == Seq("R1", "R2", "R3", "R4", "R5"), s"after arrivals: $streamed")
      // no re-reads: R1/R2 appear exactly once
      assert(streamed.size == 5)

      // parity: the same documents batch-read through the same connector
      val batch = spark.read.format("geojson")
        .load(dir.listFiles().filter(_.getName.endsWith(".geojson")).map(_.getAbsolutePath).sorted: _*)
        .select(col("properties")("route_id").as("route_id"), col("source_file"))
        .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      assert(streamed == batch, s"stream vs batch:\n$streamed\n$batch")
    } finally q.stop()
  }

  test("streaming WRITE lands per-epoch geojson files that read back through the batch reader") {
    val srcDir = Files.createTempDirectory("gjw-src").toFile
    val outDir = Files.createTempDirectory("gjw-out").toFile
    val ckpt = Files.createTempDirectory("gjw-ckpt").toFile
    def writeDoc(name: String, ids: Seq[String]): Unit =
      Files.writeString(new java.io.File(srcDir, name).toPath,
        s"""{"type": "FeatureCollection", "features": [${ids.map(feature).mkString(",")}]}""")

    writeDoc("in_001.geojson", Seq("W1", "W2"))
    val q = spark.readStream.format("geojson").load(srcDir.getAbsolutePath)
      .writeStream.format("geojson")
      .option("path", outDir.getAbsolutePath)
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .start()
    try {
      q.processAllAvailable()
      writeDoc("in_002.geojson", Seq("W3"))
      q.processAllAvailable()

      // per-epoch part files appended across micro-batches
      val parts = outDir.listFiles().filter(_.getName.endsWith(".geojson")).map(_.getName)
      assert(parts.exists(_.startsWith("part-e")), s"epoch-named parts missing: ${parts.toSeq}")

      // round-trip: streamed output re-reads through the batch geojson reader
      val ids = spark.read.format("geojson")
        .load(outDir.listFiles().filter(_.getName.endsWith(".geojson")).map(_.getAbsolutePath): _*)
        .select(col("properties")("route_id"))
        .collect().map(_.getString(0)).sorted.toSeq
      assert(ids == Seq("W1", "W2", "W3"), s"round-trip ids: $ids")
    } finally q.stop()
  }
}

package graft

import graft.streaming.StreamDecontaminate
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The Bloom contamination pre-filter must run UNCHANGED over a document
  * stream (stateless per-row probe, no watermark/state store) and keep the
  * no-false-negatives contract: every (doc, shingle) hit the batch probe
  * reports appears in the streamed hits over the same parquet bytes.
  */
class StreamDecontaminateSpec extends SparkSpec {

  test("streaming bloom probe equals the batch probe over the same parquet") {
    val dir = sf("sf0.01")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val eval = docs.filter(col("source") === "src0").select("doc_id", "text")
    val train = docs.filter(col("source") =!= "src0").select("doc_id", "text")

    val staged = Files.createTempDirectory("decon-stream")
    train.write.parquet(staged.resolve("train").toString)
    val schema = train.schema
    val stream = spark.readStream.schema(schema).parquet(staged.resolve("train").toString)

    val q = StreamDecontaminate.suspectHits(stream, eval)
      .writeStream.format("memory").queryName("decon_hits").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("decon_hits").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = StreamDecontaminate.suspectHits(train, eval).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(want.nonEmpty, "fixture must produce candidate hits")
      assert(got == want, "streaming bloom probe diverges from the batch probe")
      // and the prefilter is doing real work: candidates are a strict subset
      // of the full train shingle relation
      val all = train.select(col("doc_id"),
        explode(expr("graft_shingle_hashes(split(text, ' '), 2)")).as("h")).count()
      assert(got.size < all, "prefilter dropped nothing — bloom is a no-op")
    } finally q.stop()
  }
}

package graft

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The map-only corpus operators (deterministic stratified sampling, text
  * normalization) are stateless per-row transforms, so they must run
  * UNCHANGED as structured-streaming stages and produce exactly the
  * oracle-checked batch rows over the same parquet bytes. This is the
  * "filter the crawl as it lands" deployment shape — the same plan serves
  * batch backfill and the streaming ingest path.
  */
class StreamFilterParitySpec extends SparkSpec {

  /** The q_stratified_sample / q_normalize row logic applied to any input
    * relation (batch or stream) — shared so the spec proves the SAME
    * transform, not a re-implementation.
    */
  private def sampleThenNormalize(docs: DataFrame): DataFrame = {
    val bucket = TextFns.hash32(col("doc_id").cast("string")) % 100L
    val rate = when(col("lang") === "en", 50L)
      .when(col("lang") === "de", 25L)
      .otherwise(10L)
    val normed = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    docs.filter(bucket < rate)
      .select(col("doc_id"), col("lang"), normed.as("norm_text"))
  }

  test("streaming sample+normalize equals the batch result over the same parquet") {
    val dir = sf("sf0.01")
    val staged = Files.createTempDirectory("docs-stream")
    Files.copy(Paths.get(s"$dir/documents.parquet"), staged.resolve("documents.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(staged.toString)
    val q = sampleThenNormalize(stream)
      .writeStream.format("memory").queryName("sampled_docs").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sampled_docs").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      val want = sampleThenNormalize(spark.read.parquet(s"$dir/documents.parquet")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(want.nonEmpty && want.size < 500, "sample must keep a strict non-empty subset")
      assert(got == want, "streaming filter diverges from the batch rows")
    } finally q.stop()
  }
}

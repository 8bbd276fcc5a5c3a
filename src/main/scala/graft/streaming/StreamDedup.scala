package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming twin of the batch
  * `q_dedup_exact` operator, for ingest pipelines where duplicates must be
  * dropped as documents arrive rather than in a later batch pass.
  *
  * `dropDuplicatesWithinWatermark` keys state on the content digest and, with
  * the event-time watermark, BOUNDS the dedup state: a digest is held only
  * until the watermark passes it, instead of growing forever like a plain
  * streaming dropDuplicates would — the only state shape that survives an
  * unbounded 100 TB ingest stream. Duplicates arriving within the watermark
  * horizon (the realistic crawl-recrawl window) are suppressed; the digest is
  * the same md5-of-normalized-text key the batch operator groups on.
  */
object StreamDedup {

  /** Input must expose `t: timestamp` and `text`; emits the surviving rows
    * with their digest attached. Works on both batch and streaming frames
    * (watermark is a no-op in batch).
    */
  def dedup(docs: DataFrame, horizon: String = "10 minutes"): DataFrame =
    docs
      .withColumn("digest", md5(trim(lower(col("text")))))
      .withWatermark("t", horizon)
      .dropDuplicatesWithinWatermark("digest")
}

package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque `binary` with typed metadata.
  *
  * The Spark-side plumbing (schema, batch shape, partition-parallel decode) is
  * real; the actual byte decode is a clearly-marked deterministic stub because
  * no image/audio codec libraries exist in this environment. At production
  * scale the stub body is the ONLY thing that changes — the schema, the
  * `mapPartitions` batch shape and the metadata derivation stay as-is.
  */
object Multimodal {

  /** Decoded-media metadata record produced by the decode stage. */
  final case class MediaMeta(doc_id: Long, byte_len: Long, img_format: String,
                             width: Long, height: Long, digest: String)

  /** Partition-parallel decode over binary payloads.
    *
    * STUB: a real implementation hands `bytes` to a codec; here dimensions are
    * derived deterministically from the payload hash so tests are stable. The
    * batch shape (iterator-to-iterator, no per-row session state) is the real
    * production pattern for codec-heavy decode on executors.
    */
  def decodeStub(blobs: Dataset[(Long, Array[Byte])]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, bytes) =>
        md.reset()
        val hex = md.digest(bytes).map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(hex.take(8), 16)
        MediaMeta(
          doc_id = id,
          byte_len = bytes.length.toLong,
          img_format = (bytes.length % 3) match {
            case 0 => "jpeg"; case 1 => "png"; case _ => "webp"
          },
          width = 64L + h % 1024L,
          height = 64L + (h / 1024L) % 1024L,
          digest = hex)
      }
    }
  }

  /** Declarative twin of the decode stub — identical metadata as pure column
    * expressions, used for the oracle-checked query (and as the scan-speed
    * path when no real codec is needed).
    */
  val meta = Q(
    "q_multimodal_meta",
    (s, d) => {
      val blob = col("text").cast("binary")
      val h = TextFns.hash32(col("text")) // md5 of the same bytes
      Tables.documents(s, d).select(
        col("doc_id"),
        length(blob).cast("long").as("byte_len"),
        when(length(blob) % 3 === 0, "jpeg")
          .when(length(blob) % 3 === 1, "png")
          .otherwise("webp").as("img_format"),
        (lit(64L) + h % 1024L).as("width"),
        (lit(64L) + floor(h / 1024.0d).cast("long") % 1024L).as("height"),
        md5(blob).as("digest")
      ).orderBy("doc_id")
    },
    s"""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       |CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS img_format,
       |64 + ${TextFns.hash32Sql("text")} % 1024 AS width,
       |64 + CAST(floor(${TextFns.hash32Sql("text")}/1024.0) AS BIGINT) % 1024 AS height,
       |md5(text) AS digest
       |FROM documents ORDER BY doc_id""".stripMargin
  )

  val all: Seq[Q] = Seq(meta)
}

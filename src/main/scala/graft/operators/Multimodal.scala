package graft.operators

import graft.{Q, Tables}
import graft.functions.{MediaHeader, TextFns}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque `binary` with typed metadata.
  *
  * The decode is REAL for the container layer: PNG / GIF / BMP width, height
  * and format are parsed from the file's leading bytes (fixed header offsets —
  * see [[graft.functions.MediaHeader]]), both as pure column expressions and
  * as a typed `mapPartitions` path; JPEG dims ride the same typed path via a
  * SOF marker-segment walk (variable offsets, so JVM-side only). PIXEL decode is real too, for the formats
  * the JDK ships codecs for (PNG/GIF/BMP/JPEG via `javax.imageio`, no extra
  * dependency): [[dhashMedia]] decodes actual pixels partition-parallel and
  * emits the canonical 64-bit dHash, feeding the SAME banded hamming join as
  * the oracle-checked signature path ([[Dedup.hammingPairs]]). AUDIO decode
  * is real as well ([[decodePcm]]/[[audioFeatures]], `javax.sound.sampled`):
  * WAV payloads yield normalized samples, RMS energy and zero-crossing
  * counts, spec-verified against a synthesized sine's closed-form values.
  * Only formats needing external codecs (webp, video) remain behind the
  * documented seam; they slot into the same iterator bodies without touching
  * schema, partitioning, or the header parse.
  */
object Multimodal {

  /** REAL pixel decode via the JDK's built-in codecs. Returns None for
    * payloads ImageIO has no codec for (or corrupt files) — the caller
    * decides drop-vs-quarantine; decode never throws on bad bytes.
    */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    // catch Exception, not just IOException: the JDK readers throw
    // ArrayIndexOutOfBounds / IllegalArgument / CMMException on corrupt
    // payloads, and one bad blob must drop, not kill the partition
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Box-downsample to a (gw × gh) luma grid: each cell is the integer mean
    * of the BT.601 luma (299r+587g+114b)/1000 over the source pixels it
    * covers — the standard pre-hash reduction, deterministic integer math.
    */
  def lumaGrid(img: java.awt.image.BufferedImage, gw: Int, gh: Int): Array[Array[Long]] = {
    val (w, h) = (img.getWidth, img.getHeight)
    Array.tabulate(gh, gw) { (cy, cx) =>
      val (x0, x1) = (cx * w / gw, math.max((cx + 1) * w / gw, cx * w / gw + 1))
      val (y0, y1) = (cy * h / gh, math.max((cy + 1) * h / gh, cy * h / gh + 1))
      var sum = 0L
      var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) {
          val rgb = img.getRGB(x, y)
          sum += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
            114L * (rgb & 0xff)) / 1000L
          x += 1
        }
        y += 1
      }
      sum / ((x1 - x0).toLong * (y1 - y0))
    }
  }

  /** Canonical 64-bit DIFFERENCE HASH over real pixels: 9×8 luma grid, bit
    * r·8+c set iff cell (r, c+1) is brighter than (r, c). Hamming distance
    * between two dHashes tracks visual similarity — the production twin of
    * `q_phash_pairs`' hash-derived 32-bit signature.
    */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val g = lumaGrid(img, 9, 8)
    var ph = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      if (g(r)(c + 1) > g(r)(c)) ph |= 1L << (r * 8 + c)
    ph
  }

  /** Partition-parallel REAL featurizer: payload → ImageIO pixel decode →
    * dHash64. Undecodable payloads are dropped (None-filtered) — same
    * iterator-to-iterator shape as [[decodeMedia]], and the output
    * (doc_id, ph) relation flows straight into [[Dedup.hammingPairs]]'
    * banded near-dup join with no adaptation.
    */
  def dhashMedia(blobs: Dataset[(Long, Array[Byte])]): Dataset[(Long, Long)] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.flatMap { case (id, bytes) => decodeImage(bytes).map(img => (id, dHash64(img))) }
    }
  }

  /** Decoded-media metadata record produced by the decode stage. */
  final case class MediaMeta(doc_id: Long, byte_len: Long, img_format: String,
                             width: Long, height: Long, digest: String)

  /** Partition-parallel header decode over binary payloads: real PNG IHDR /
    * GIF logical-screen / BMP BITMAPINFOHEADER parsing, iterator-to-iterator
    * (no per-row session state) — the production batch shape for codec-heavy
    * decode on executors.
    */
  def decodeMedia(blobs: Dataset[(Long, Array[Byte])]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, bytes) =>
        md.reset()
        val hex = md.digest(bytes).map("%02x".format(_)).mkString
        val (fmt, w, h) = MediaHeader.parseBytes(bytes)
        MediaMeta(id, bytes.length.toLong, fmt, w, h, hex)
      }
    }
  }

  /** REAL PCM decode for WAV payloads via `javax.sound.sampled` (JDK
    * built-in — the audio twin of [[decodeImage]]): sample rate, channel
    * count and the samples normalized to [-1, 1]. Canonical 8/16-bit PCM;
    * anything the JDK has no codec for returns None rather than throwing.
    */
  def decodePcm(bytes: Array[Byte]): Option[(Float, Int, Array[Double])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      val data = ais.readAllBytes()
      // Gate on (encoding, width) PAIRS, not width alone: a 16-bit
      // PCM_UNSIGNED stream read as signed would flip the sign bit (full-scale
      // DC error), and 8-bit PCM_SIGNED read as offset-binary likewise — both
      // must fall to None, not decode wrong.
      import javax.sound.sampled.AudioFormat.Encoding.{PCM_SIGNED, PCM_UNSIGNED}
      val samples: Option[Array[Double]] = (fmt.getEncoding, fmt.getSampleSizeInBits) match {
        case (PCM_SIGNED, 16) =>
          val n = data.length / 2
          Some(Array.tabulate(n) { i =>
            val (b0, b1) = (data(2 * i), data(2 * i + 1))
            val s = if (fmt.isBigEndian) ((b0 << 8) | (b1 & 0xff)).toShort
                    else ((b1 << 8) | (b0 & 0xff)).toShort
            s / 32768.0
          })
        case (PCM_UNSIGNED, 8) => Some(data.map(b => ((b & 0xff) - 128) / 128.0))
        case _ => None
      }
      samples.map(s => (fmt.getSampleRate, fmt.getChannels, s))
    } catch { case _: Exception => None }

  /** Decoded-audio features from REAL samples. */
  final case class AudioFeat(doc_id: Long, sample_rate: Double, channels: Long,
                             n_samples: Long, rms: Double, zero_crossings: Long)

  /** Partition-parallel REAL audio featurizer: payload → PCM decode →
    * per-frame mono DOWNMIX (channel mean — decodePcm returns interleaved
    * samples, and a zero-crossing count across the L/R seam of a stereo
    * stream would count phase differences, not pitch) → RMS energy +
    * zero-crossing count (the two classic first-pass audio quality
    * signals — silence/clipping detection and a pitch proxy). `n_samples`
    * is FRAMES (per-channel length). Undecodable payloads are dropped;
    * same iterator shape as [[dhashMedia]].
    */
  def audioFeatures(blobs: Dataset[(Long, Array[Byte])]): Dataset[AudioFeat] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        decodePcm(bytes).map { case (rate, ch, interleaved) =>
          val frames = interleaved.length / math.max(ch, 1)
          val s = Array.tabulate(frames) { f =>
            var sum = 0.0
            var c = 0
            while (c < ch) { sum += interleaved(f * ch + c); c += 1 }
            sum / ch
          }
          val rms = math.sqrt(s.map(x => x * x).sum / math.max(s.length, 1))
          var zc = 0L
          var i = 1
          while (i < s.length) {
            if ((s(i - 1) < 0 && s(i) >= 0) || (s(i - 1) >= 0 && s(i) < 0)) zc += 1
            i += 1
          }
          AudioFeat(id, rate.toDouble, ch.toLong, s.length.toLong, rms, zc)
        }
      }
    }
  }

  /** Typed-metadata projection over an opaque payload: schema plumbing for a
    * media column (byte length, format tag, per-payload digest + derived
    * dims). Retained as the declarative scan-speed twin; the header-accurate
    * path is [[mediaDecode]].
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

  /** Real header decode, oracle-checked end to end: synthesize a valid
    * PNG/GIF/BMP header per document (dims derived deterministically from the
    * text hash, container by doc_id % 3), then parse format/width/height back
    * out of the BYTES with [[MediaHeader]]'s column parsers. The parse sees
    * only the binary column — synthesis and parse share no expressions — so a
    * wrong offset or endianness breaks the hash match against the oracle,
    * which performs the same round-trip in DuckDB blob functions.
    */
  val mediaDecode = Q(
    "q_media_decode",
    (s, d) => {
      val h = TextFns.hash32(col("text"))
      val w = lit(64L) + h % 1024L
      val ht = lit(64L) + floor(h / 1024.0d).cast("long") % 1024L
      val blobHex = when(col("doc_id") % 3 === 0, MediaHeader.pngHex(w, ht))
        .when(col("doc_id") % 3 === 1, MediaHeader.gifHex(w, ht))
        .otherwise(MediaHeader.bmpHex(w, ht))
      Tables.documents(s, d)
        .select(col("doc_id"), unhex(blobHex).as("blob"))
        .select(col("doc_id"), hex(col("blob")).as("hb"),
          length(col("blob")).cast("long").as("byte_len"))
        .select(
          col("doc_id"), col("byte_len"),
          MediaHeader.format(col("hb")).as("img_format"),
          MediaHeader.width(col("hb")).as("width"),
          MediaHeader.height(col("hb")).as("height"),
          md5(col("hb")).as("digest"))
        .orderBy("doc_id")
    },
    s"""WITH dims AS (
       |  SELECT doc_id, 64 + ${TextFns.hash32Sql("text")} % 1024 AS w,
       |         64 + CAST(floor(${TextFns.hash32Sql("text")}/1024.0) AS BIGINT) % 1024 AS h
       |  FROM documents),
       |synth AS (
       |  SELECT doc_id, unhex(CASE doc_id % 3
       |    WHEN 0 THEN ${MediaHeader.pngHexSql("w", "h")}
       |    WHEN 1 THEN ${MediaHeader.gifHexSql("w", "h")}
       |    ELSE ${MediaHeader.bmpHexSql("w", "h")}
       |  END) AS blob
       |  FROM dims),
       |hx AS (SELECT doc_id, hex(blob) AS hb, CAST(octet_length(blob) AS BIGINT) AS byte_len FROM synth)
       |SELECT doc_id, byte_len,
       |  ${MediaHeader.formatSql("hb")} AS img_format,
       |  ${MediaHeader.widthSql("hb")} AS width,
       |  ${MediaHeader.heightSql("hb")} AS height,
       |  md5(hb) AS digest
       |FROM hx ORDER BY doc_id""".stripMargin
  )

  /** Feature-extract STAGE with a deterministic fake featurizer: per payload,
    * an 8-dim vector f_i = md5(payload ‖ ':' ‖ i) mapped to [0,1) — the
    * Spark-side plumbing (schema `array<double>`, row-local map over the
    * scan, no shuffle until the output order) is exactly what a real encoder
    * UDF slots into; only the hash-math inside the lambda is the stub, per
    * the codec-free environment. The fake being md5-based keeps the whole
    * stage oracle-checkable bit-for-bit, unlike a real model.
    */
  val mediaFeatures = Q(
    "q_media_features",
    (s, d) =>
      // The 6-dp rounding is INTEGER math on both engines — round(x, 6) on a
      // DOUBLE is implementation-defined at the ulp level and has differed
      // across oracle-engine versions; (v·10⁶ + 2³¹) div 2³² is exact in
      // int64 (v < 2³², so v·10⁶ < 2⁵²) and the final /10⁶ is one
      // correctly-rounded IEEE division, bit-identical everywhere.
      Tables.documents(s, d).select(
        col("doc_id"),
        posexplode(expr("""transform(sequence(0, 7), i ->
             (cast(conv(substring(md5(concat(text, ':', i)), 1, 8), 16, 10) as bigint)
              * 1000000L + 2147483648L) div 4294967296L / cast(1000000 as double))""")))
        .select(col("doc_id"), col("pos").cast("long").as("feature_idx"),
          col("col").as("feature"))
        .orderBy("doc_id", "feature_idx"),
    """SELECT doc_id, i AS feature_idx,
      |  ((CAST(('0x'||substr(md5(text || ':' || i), 1, 8)) AS BIGINT) * 1000000
      |    + 2147483648) // 4294967296) / 1000000.0 AS feature
      |FROM documents, unnest(range(8)) AS t(i)
      |ORDER BY doc_id, feature_idx""".stripMargin
  )

  /** FRAME-SAMPLE plumbing for a video-like payload: stride-sample fixed
    * windows (37-byte stride, 16-byte frames) and fingerprint each — the
    * row-local explode shape (bounded fan-out ⌈len/stride⌉) a real
    * frame-decoder plugs into, with per-frame digests standing in for frame
    * tensors. No shuffle until the output order; at 100 TB the sampler is a
    * map over the payload scan like every other row-local stage here.
    */
  val frameSample = Q(
    "q_frame_sample",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          explode(expr("sequence(0, (length(text) - 1) div 37)")).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          md5(expr("substring(text, cast(frame_idx * 37 + 1 as int), 16)")).as("frame_digest"))
        .orderBy("doc_id", "frame_idx"),
    """SELECT doc_id, i AS frame_idx,
      |       md5(substr(text, CAST(i*37+1 AS BIGINT), 16)) AS frame_digest
      |FROM documents, unnest(range((len(text)-1)//37 + 1)) AS t(i)
      |ORDER BY doc_id, frame_idx""".stripMargin
  )

  /** RESIZE planning — aspect-preserving box-fit to 224 px (the standard
    * vision-model input): compute each image's target dims from the decoded
    * width/height, downscale-only, in EXACT integer arithmetic
    * (round(w·224/m) = (448w + m) div 2m — no float in either engine, so
    * the oracle matches without a rounding contract). The pixel resample
    * itself is the codec-bound stub, as with decode; the dims plan is what
    * the pipeline schedules work and allocates tensors by.
    */
  val mediaResize = Q(
    "q_media_resize",
    (s, d) => {
      val h32 = TextFns.hash32(col("text"))
      val w = lit(64L) + h32 % 1024L
      val ht = lit(64L) + floor(h32 / 1024.0d).cast("long") % 1024L
      def fit(dim: String) =
        s"CASE WHEN greatest(width, height) <= 224 THEN $dim " +
          s"ELSE ($dim*448 + greatest(width, height)) div (2*greatest(width, height)) END"
      Tables.documents(s, d)
        .select(col("doc_id"), w.as("width"), ht.as("height"))
        .selectExpr("doc_id", "width", "height",
          s"${fit("width")} AS out_w", s"${fit("height")} AS out_h")
        .orderBy("doc_id")
    },
    s"""WITH dims AS (
       |  SELECT doc_id, 64 + ${TextFns.hash32Sql("text")} % 1024 AS w,
       |         64 + CAST(floor(${TextFns.hash32Sql("text")}/1024.0) AS BIGINT) % 1024 AS h
       |  FROM documents)
       |SELECT doc_id, w AS width, h AS height,
       |  CASE WHEN greatest(w, h) <= 224 THEN w
       |       ELSE (w*448 + greatest(w, h)) // (2*greatest(w, h)) END AS out_w,
       |  CASE WHEN greatest(w, h) <= 224 THEN h
       |       ELSE (h*448 + greatest(w, h)) // (2*greatest(w, h)) END AS out_h
       |FROM dims ORDER BY doc_id""".stripMargin
  )

  /** AUDIO container decode — the WAV/RIFF twin of [[mediaDecode]]: a valid
    * canonical PCM header is synthesized per document (channels / sample rate
    * / bit depth derived deterministically from the text hash, payload length
    * from `n_chars`), then channels, sample rate, byte rate and bit depth are
    * parsed back out of the BYTES at the RIFF fmt-chunk offsets. Duration is
    * the decoder's own arithmetic — payload·1000 div byteRate, exact integer
    * math on both engines. Same scale posture as every media stage: one
    * row-local projection over the scan, no shuffle until the output order;
    * a real audio codec slots into the same binary column without touching
    * schema or partitioning.
    */
  val audioMeta = Q(
    "q_audio_meta",
    (s, d) => {
      val h = TextFns.hash32(col("text"))
      // h < 2³², so /2 and /8 are exact in double; cast(long) floors — the
      // same `//` integer division the oracle states
      val h2 = (h / 2d).cast("long") % 4L
      val h8 = (h / 8d).cast("long") % 4L
      val ch = (lit(1L) + h % 2L).cast("long")
      val rate = when(h2 === 0L, 8000L).when(h2 === 1L, 16000L)
        .when(h2 === 2L, 22050L).otherwise(44100L).cast("long")
      val bits = (lit(8L) * (lit(1L) + h8)).cast("long")
      Tables.documents(s, d)
        .select(col("doc_id"),
          unhex(MediaHeader.wavHex(ch, rate, bits, col("n_chars"))).as("blob"),
          col("n_chars"))
        .select(col("doc_id"), hex(col("blob")).as("hb"), col("n_chars"))
        .select(
          col("doc_id"),
          when(MediaHeader.isWav(col("hb")), "wav").otherwise("unknown").as("audio_format"),
          MediaHeader.wavChannels(col("hb")).as("channels"),
          MediaHeader.wavSampleRate(col("hb")).as("sample_rate"),
          MediaHeader.wavBits(col("hb")).as("bits"),
          MediaHeader.wavByteRate(col("hb")).as("byte_rate"),
          col("n_chars"), md5(col("hb")).as("digest"))
        .withColumn("duration_ms", expr("n_chars * 1000 div byte_rate"))
        .select(col("doc_id"), col("audio_format"), col("channels"),
          col("sample_rate"), col("bits"), col("byte_rate"),
          col("duration_ms"), col("digest"))
        .orderBy("doc_id")
    },
    s"""WITH p AS (
       |  SELECT doc_id, n_chars, ${TextFns.hash32Sql("text")} AS h FROM documents),
       |q AS (
       |  SELECT doc_id, n_chars, 1 + h % 2 AS ch,
       |    CASE (h // 2) % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
       |         WHEN 2 THEN 22050 ELSE 44100 END AS rate,
       |    8 * (1 + (h // 8) % 4) AS bits
       |  FROM p),
       |synth AS (
       |  SELECT doc_id, n_chars,
       |    unhex(${MediaHeader.wavHexSql("ch", "rate", "bits", "n_chars")}) AS blob
       |  FROM q),
       |hx AS (SELECT doc_id, n_chars, hex(blob) AS hb FROM synth)
       |SELECT doc_id,
       |  CASE WHEN ${MediaHeader.isWavSql("hb")} THEN 'wav' ELSE 'unknown' END AS audio_format,
       |  ${MediaHeader.wavChannelsSql("hb")} AS channels,
       |  ${MediaHeader.wavSampleRateSql("hb")} AS sample_rate,
       |  ${MediaHeader.wavBitsSql("hb")} AS bits,
       |  ${MediaHeader.wavByteRateSql("hb")} AS byte_rate,
       |  n_chars * 1000 // ${MediaHeader.wavByteRateSql("hb")} AS duration_ms,
       |  md5(hb) AS digest
       |FROM hx ORDER BY doc_id""".stripMargin
  )

  val all: Seq[Q] = Seq(meta, mediaDecode, mediaFeatures, frameSample, mediaResize,
    audioMeta)
}

package graft

import graft.functions.MediaHeader
import graft.operators.Multimodal

/** Header decode over real container bytes: the JVM parser and the typed
  * Dataset path agree with hand-built PNG/GIF/BMP headers.
  */
class MultimodalSpec extends SparkSpec {

  private def hexBytes(hx: String): Array[Byte] =
    hx.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // 800x600 PNG: sig + IHDR len/tag + BE dims + depth/color/etc
  private val png800x600 = hexBytes(
    "89504E470D0A1A0A0000000D49484452" + "00000320" + "00000258" + "0806000000")
  // 320x200 GIF89a: LE16 dims
  private val gif320x200 = hexBytes("474946383961" + "4001" + "C800" + "F70000")
  // 1024x768 BMP: BITMAPINFOHEADER LE32 dims at offsets 18/22
  private val bmp1024x768 = hexBytes(
    "424D00000000000000003600000028000000" + "00040000" + "00030000")

  test("parseBytes reads PNG/GIF/BMP header dims at the right offsets") {
    assert(MediaHeader.parseBytes(png800x600) === (("png", 800L, 600L)))
    assert(MediaHeader.parseBytes(gif320x200) === (("gif", 320L, 200L)))
    assert(MediaHeader.parseBytes(bmp1024x768) === (("bmp", 1024L, 768L)))
    assert(MediaHeader.parseBytes("not an image".getBytes("UTF-8"))._1 === "unknown")
  }

  test("property: WAV fmt-chunk fields round-trip through the column synth and byte parse") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.functions._
    val cases = for {
      ch <- Gen.oneOf(1L, 2L)
      rate <- Gen.oneOf(8000L, 16000L, 22050L, 44100L)
      bits <- Gen.oneOf(8L, 16L, 24L, 32L)
      dataLen <- Gen.choose(0L, 1000000L)
    } yield (ch, rate, bits, dataLen)
    val prop = Prop.forAll(cases) { case (ch, rate, bits, dataLen) =>
      // synthesize via the COLUMN builder, parse via the BYTE parser — the
      // two paths share no code, so an offset/endianness slip breaks this
      val hx = spark.range(1).select(
        MediaHeader.wavHex(lit(ch), lit(rate), lit(bits), lit(dataLen)).as("hx"))
        .head().getString(0)
      val bytes = hexBytes(hx)
      MediaHeader.parseWavBytes(bytes) == (("wav", ch, rate, bits)) &&
        MediaHeader.parseWavBytes("RIFFxxxxNOTWAVE!".getBytes("UTF-8"))._1 == "unknown"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, s"WAV round-trip property failed: ${res.status}")
  }

  test("property: header dims round-trip for random sizes in each container") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    def be32(v: Long) = f"$v%08X"
    def le32(v: Long) = be32(v).grouped(2).toSeq.reverse.mkString
    def le16(v: Long) = f"$v%04X".grouped(2).toSeq.reverse.mkString
    val pngDim = Gen.choose(1L, Int.MaxValue.toLong)
    val gifDim = Gen.choose(1L, 65535L)
    val cases: Gen[(String, Long, Long, Array[Byte])] = Gen.oneOf(
      for { w <- pngDim; h <- pngDim } yield ("png", w, h, hexBytes(
        "89504E470D0A1A0A0000000D49484452" + be32(w) + be32(h) + "0806000000")),
      for { w <- gifDim; h <- gifDim } yield ("gif", w, h, hexBytes(
        "474946383961" + le16(w) + le16(h) + "F70000")),
      for { w <- pngDim; h <- pngDim } yield ("bmp", w, h, hexBytes(
        "424D00000000000000003600000028000000" + le32(w) + le32(h))))
    val prop = Prop.forAll(cases) { case (fmt, w, h, bytes) =>
      MediaHeader.parseBytes(bytes) == ((fmt, w, h))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"header round-trip property failed: ${res.status}")
  }

  test("real PNG pixel decode feeds the dHash band-join pipeline unchanged") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    // craft real PNGs in memory with the JDK encoder; decode reads actual
    // pixels back (no shared expressions with the synthesis)
    def pngOf(f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v = f(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val base = pngOf((x, _) => x * 4)                              // horizontal gradient
    val near = pngOf((x, y) => if (x == 0 && y == 0) 255 else x * 4) // 1-px perturbation
    val far = pngOf((x, y) => ((x / 8 + y / 8) % 2) * 255)         // checkerboard
    val blobs = Seq((1L, base), (2L, near), (3L, far), (4L, "not an image".getBytes("UTF-8"))).toDS()

    // the header parser agrees with the real encoder's output
    val metas = Multimodal.decodeMedia(blobs.filter(_._1 <= 3L)).collect()
    assert(metas.forall(m => m.img_format == "png" && m.width == 64 && m.height == 64))

    // real pixel decode → dHash64; undecodable payload dropped, near-dup
    // hamming-close, structurally different image hamming-far
    val ph = Multimodal.dhashMedia(blobs)
    val hs = ph.collect().toMap
    assert(hs.keySet == Set(1L, 2L, 3L), s"decode set wrong: ${hs.keySet}")
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(2L)) <= 2,
      s"near-dup hamming too large: ${java.lang.Long.bitCount(hs(1L) ^ hs(2L))}")
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(3L)) > 8,
      s"distinct images hamming too small: ${java.lang.Long.bitCount(hs(1L) ^ hs(3L))}")

    // the SAME banded pipeline as q_phash_pairs consumes the 64-bit real
    // hash unchanged — only the band geometry widens (4×16 ⊇ hamming ≤ 3)
    val pairs = operators.Dedup.hammingPairs(
        ph.toDF("doc_id", "ph"), nBands = 4, bandBits = 16, maxHamming = 2L)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"expected only the near-dup pair: $pairs")
  }

  test("real JPEG pixel decode feeds the dHash band-join pipeline unchanged") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    // craft real JPEGs in memory with the JDK encoder (lossy — the decoded
    // pixels are NOT the synthesized ones, which is the point: the hash must
    // survive a real codec round-trip, not byte equality)
    def jpegOf(f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v = f(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val base = jpegOf((x, _) => x * 4)                               // horizontal gradient
    val near = jpegOf((x, y) => if (x == 0 && y == 0) 255 else x * 4) // 1-px perturbation
    val far = jpegOf((x, y) => ((x / 8 + y / 8) % 2) * 255)          // checkerboard
    val blobs = Seq((1L, base), (2L, near), (3L, far)).toDS()

    // the SOF marker walk finds the real encoder's frame dims
    val metas = Multimodal.decodeMedia(blobs).collect()
    assert(metas.forall(m => m.img_format == "jpeg" && m.width == 64 && m.height == 64),
      s"JPEG header walk failed: ${metas.toSeq}")

    // real pixel decode → dHash64 over the lossy round-trip; near-dup stays
    // hamming-close, structurally different image stays hamming-far
    val ph = Multimodal.dhashMedia(blobs)
    val hs = ph.collect().toMap
    assert(hs.keySet == Set(1L, 2L, 3L), s"decode set wrong: ${hs.keySet}")
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(2L)) <= 2,
      s"near-dup hamming too large: ${java.lang.Long.bitCount(hs(1L) ^ hs(2L))}")
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(3L)) > 8,
      s"distinct images hamming too small: ${java.lang.Long.bitCount(hs(1L) ^ hs(3L))}")

    // the SAME banded pipeline as the PNG fixture and q_phash_pairs
    val pairs = operators.Dedup.hammingPairs(
        ph.toDF("doc_id", "ph"), nBands = 4, bandBits = 16, maxHamming = 2L)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"expected only the near-dup pair: $pairs")
  }

  test("parseBytes walks JPEG markers past APP/comment segments to SOF") {
    // hand-built stream: SOI, APP0 (JFIF, 16 bytes), COM (5 bytes),
    // SOF0 with height=300 width=500 — dims sit after two variable segments
    val jpeg = hexBytes(
      "FFD8" +
        "FFE0" + "0010" + "4A46494600010100000100010000" + // APP0 len 16
        "FFFE" + "0005" + "414243" +                        // COM len 5
        "FFC0" + "0011" + "08" + "012C" + "01F4" + "03" +   // SOF0: h=300 w=500
        "012200021101031101" +
        "FFD9")
    assert(MediaHeader.parseBytes(jpeg) === (("jpeg", 500L, 300L)))
    // SOS before any SOF: format recognized, dims unavailable
    val noSof = hexBytes("FFD8" + "FFDA" + "0008" + "01010000003F00" + "FFD9")
    assert(MediaHeader.parseBytes(noSof) === (("jpeg", -1L, -1L)))
    // truncated right after SOI
    assert(MediaHeader.parseBytes(hexBytes("FFD8FFE0")) === (("jpeg", -1L, -1L)))
  }

  test("real WAV PCM decode extracts verifiable signal features") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // craft real WAVs with the JDK encoder: a 440 Hz sine and pure silence
    def wavOf(sample: Int => Double, n: Int, rate: Float): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, 1, true, false)
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val v = math.round(sample(i) * 32767).toInt
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // stereo twin: interleaved 2-channel frames
    def stereoWavOf(l: Int => Double, r: Int => Double, n: Int, rate: Float): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, 2, true, false)
      val pcm = new Array[Byte](n * 4)
      for (i <- 0 until n; (v, c) <- Seq((l(i), 0), (r(i), 1))) {
        val s = math.round(v * 32767).toInt
        pcm(4 * i + 2 * c) = (s & 0xff).toByte
        pcm(4 * i + 2 * c + 1) = ((s >> 8) & 0xff).toByte
      }
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rate = 8000f
    val amp = 0.5
    def sig(i: Int) = amp * math.sin(2 * math.Pi * 440 * i / rate)
    val sine = wavOf(sig, 8000, rate)
    val silence = wavOf(_ => 0.0, 8000, rate)
    // L = sine, R = -sine: the mono downmix cancels exactly — an interleaved
    // (non-downmixed) zero-crossing count would instead see ~16k crossings
    val antiphase = stereoWavOf(sig, i => -sig(i), 8000, rate)
    // the RIFF header parser agrees with the real encoder's output
    assert(MediaHeader.parseWavBytes(sine) === (("wav", 1L, 8000L, 16L)))
    val blobs = Seq((1L, sine), (2L, silence), (3L, "not audio".getBytes("UTF-8")),
      (4L, antiphase)).toDS()
    val feats = Multimodal.audioFeatures(blobs).collect().map(f => f.doc_id -> f).toMap
    assert(feats.keySet == Set(1L, 2L, 4L)) // non-audio payload dropped, not thrown
    val s = feats(1L)
    assert(s.sample_rate == 8000.0 && s.channels == 1L && s.n_samples == 8000L)
    // RMS of a sine = A/sqrt(2); one second of 440 Hz crosses zero ~880 times
    assert(math.abs(s.rms - amp / math.sqrt(2)) < 0.01, s"rms ${s.rms}")
    assert(math.abs(s.zero_crossings - 880L) <= 2, s"zc ${s.zero_crossings}")
    assert(feats(2L).rms == 0.0 && feats(2L).zero_crossings == 0L)
    val st = feats(4L)
    assert(st.channels == 2L && st.n_samples == 8000L, s"stereo meta $st")
    // ±1-lsb quantization asymmetry keeps the downmix from being exactly 0
    assert(st.rms < 0.001 && st.zero_crossings < 50L,
      s"downmix failed: rms ${st.rms} zc ${st.zero_crossings}")
  }

  test("hammingPairs equals brute force on clustered random 64-bit hashes") {
    import spark.implicits._
    // Pigeonhole: 4 bands of 16 bits and hamming <= 3 flipped bits leave at
    // least one band intact, so the band join must find EXACTLY the
    // brute-force pair set (completeness from the pigeonhole, soundness from
    // the exact bit_count verify). Clustered fixtures (<=3-bit perturbations
    // of shared bases) populate the positive case densely; a fixed seed
    // keeps the certificate reproducible.
    val rnd = new scala.util.Random(0xD1FF5EED)
    val bases = Seq.fill(10)(rnd.nextLong())
    val near = bases.flatMap { b =>
      Seq.fill(4) {
        var h = b
        (0 until rnd.nextInt(4)).foreach(_ => h ^= 1L << rnd.nextInt(64))
        h
      }
    }
    val hashes = (bases ++ near ++ Seq.fill(20)(rnd.nextLong()))
      .distinct.zipWithIndex.map { case (h, i) => (i.toLong, h) }
    val expected = (for {
      (d1, h1) <- hashes; (d2, h2) <- hashes
      if d1 < d2 && java.lang.Long.bitCount(h1 ^ h2) <= 3
    } yield (d1, d2)).toSet
    assert(expected.size >= 30, s"fixture too sparse: ${expected.size} pairs")
    val got = operators.Dedup.hammingPairs(
        hashes.toDF("doc_id", "ph"), nBands = 4, bandBits = 16, maxHamming = 3L)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got == expected,
      s"missed ${(expected -- got).take(5)} extra ${(got -- expected).take(5)}")
  }

  test("decodeMedia Dataset path parses headers partition-parallel") {
    import spark.implicits._
    val blobs = Seq(
      (1L, png800x600), (2L, gif320x200), (3L, bmp1024x768),
      (4L, "plain text payload".getBytes("UTF-8"))).toDS()
    val out = Multimodal.decodeMedia(blobs).collect().sortBy(_.doc_id)
    assert(out.map(m => (m.doc_id, m.img_format, m.width, m.height)).toSeq === Seq(
      (1L, "png", 800L, 600L), (2L, "gif", 320L, 200L),
      (3L, "bmp", 1024L, 768L), (4L, "unknown", -1L, -1L)))
    assert(out.forall(m => m.byte_len > 0 && m.digest.length == 32))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Image-container header arithmetic over `binary` columns — pure column
  * expressions, no codec library.
  *
  * PNG stores IHDR width/height big-endian at byte offsets 16/20; GIF87a/89a
  * stores the logical-screen size little-endian at offsets 6/8; BMP stores the
  * BITMAPINFOHEADER dims little-endian at offsets 18/22. All three are fixed
  * offsets from the start of the file, so dimension extraction is string
  * slicing over `hex(blob)` — one projection, fully codegen'd, no UDF.
  *
  * Each Column builder has a DuckDB SQL twin so oracle queries reproduce the
  * same bytes and the same parse bit-for-bit (`hex()` is uppercase in both
  * engines; `conv(x,16,10)` ≡ `('0x'||x)::BIGINT`).
  */
object MediaHeader {

  /** Big-endian hex of the low `nBytes` bytes of an integral column. */
  def beHex(v: Column, nBytes: Int): Column = lpad(hex(v), 2 * nBytes, "0")

  /** Little-endian hex: [[beHex]] with byte pairs reversed. */
  def leHex(v: Column, nBytes: Int): Column =
    concat((nBytes - 1 to 0 by -1).map(i =>
      substring(lpad(hex(v), 2 * nBytes, "0"), 2 * i + 1, 2)): _*)

  def beHexSql(v: String, nBytes: Int): String =
    s"lpad(upper(to_hex($v)), ${2 * nBytes}, '0')"

  def leHexSql(v: String, nBytes: Int): String = {
    val b = beHexSql(v, nBytes)
    (nBytes - 1 to 0 by -1).map(i => s"substr($b, ${2 * i + 1}, 2)").mkString("(", "||", ")")
  }

  // container magic as hex prefixes
  val PngMagic = "89504E470D0A1A0A"
  val Gif89 = "474946383961"
  val Gif87 = "474946383761"
  val BmpMagic = "424D"

  /** Minimal valid PNG header hex: signature + IHDR length/tag + dims +
    * bit-depth/color-type/compression/filter/interlace.
    */
  def pngHex(w: Column, h: Column): Column =
    concat(lit(PngMagic + "0000000D49484452"), beHex(w, 4), beHex(h, 4), lit("0806000000"))

  /** GIF89a header hex: magic + LE16 logical-screen dims + GCT flags. */
  def gifHex(w: Column, h: Column): Column =
    concat(lit(Gif89), leHex(w, 2), leHex(h, 2), lit("F70000"))

  /** BMP header hex: "BM" + (size/reserved/offset zeroed, offset 0x36) +
    * BITMAPINFOHEADER size 40 + LE32 dims.
    */
  def bmpHex(w: Column, h: Column): Column =
    concat(lit(BmpMagic + "00000000000000003600000028000000"), leHex(w, 4), leHex(h, 4))

  def pngHexSql(w: String, h: String): String =
    s"'${PngMagic}0000000D49484452' || ${beHexSql(w, 4)} || ${beHexSql(h, 4)} || '0806000000'"
  def gifHexSql(w: String, h: String): String =
    s"'$Gif89' || ${leHexSql(w, 2)} || ${leHexSql(h, 2)} || 'F70000'"
  def bmpHexSql(w: String, h: String): String =
    s"'${BmpMagic}00000000000000003600000028000000' || ${leHexSql(w, 4)} || ${leHexSql(h, 4)}"

  // ---- WAV (RIFF/WAVE, canonical 16-byte PCM fmt chunk) -------------------
  // Layout: "RIFF" + LE32 chunk size + "WAVE" + "fmt " + LE32 16 +
  // LE16 audio format + LE16 channels + LE32 sample rate + LE32 byte rate +
  // LE16 block align + LE16 bits/sample. All fixed offsets, same
  // hex-slicing parse as the image containers.
  val RiffMagic = "52494646" // "RIFF"
  val WaveFmtMagic = "57415645666D7420" // "WAVE" + "fmt "

  /** Canonical PCM WAV header hex from channels / sample rate / bits. The
    * derived fields (byte rate, block align) are computed the way an encoder
    * would: blockAlign = ch·bits/8, byteRate = rate·blockAlign.
    */
  def wavHex(ch: Column, rate: Column, bits: Column, dataLen: Column): Column = {
    val blockAlign = (ch * bits / lit(8)).cast("long")
    val byteRate = (rate * blockAlign).cast("long")
    concat(lit(RiffMagic), leHex(dataLen + lit(36L), 4), lit(WaveFmtMagic),
      lit("10000000"), lit("0100"), leHex(ch, 2), leHex(rate, 4),
      leHex(byteRate, 4), leHex(blockAlign, 2), leHex(bits, 2))
  }

  def wavHexSql(ch: String, rate: String, bits: String, dataLen: String): String = {
    val blockAlign = s"(($ch) * ($bits) // 8)"
    val byteRate = s"(($rate) * $blockAlign)"
    s"'$RiffMagic' || ${leHexSql(s"(($dataLen) + 36)", 4)} || '$WaveFmtMagic' || " +
      s"'10000000' || '0100' || ${leHexSql(ch, 2)} || ${leHexSql(rate, 4)} || " +
      s"${leHexSql(byteRate, 4)} || ${leHexSql(blockAlign, 2)} || ${leHexSql(bits, 2)}"
  }

  def isWav(hb: Column): Column =
    substring(hb, 1, 8) === RiffMagic && substring(hb, 17, 16) === WaveFmtMagic
  def wavChannels(hb: Column): Column = leAt(hb, 22, 2)
  def wavSampleRate(hb: Column): Column = leAt(hb, 24, 4)
  def wavByteRate(hb: Column): Column = leAt(hb, 28, 4)
  def wavBits(hb: Column): Column = leAt(hb, 34, 2)

  def isWavSql(hb: String): String =
    s"(substr($hb,1,8)='$RiffMagic' AND substr($hb,17,16)='$WaveFmtMagic')"
  def wavChannelsSql(hb: String): String = leAtSql(hb, 22, 2)
  def wavSampleRateSql(hb: String): String = leAtSql(hb, 24, 4)
  def wavByteRateSql(hb: String): String = leAtSql(hb, 28, 4)
  def wavBitsSql(hb: String): String = leAtSql(hb, 34, 2)

  private def beAt(hb: Column, bytePos: Int, nBytes: Int): Column =
    conv(substring(hb, 2 * bytePos + 1, 2 * nBytes), 16, 10).cast("long")

  private def leAt(hb: Column, bytePos: Int, nBytes: Int): Column =
    conv(concat((nBytes - 1 to 0 by -1).map(i =>
      substring(hb, 2 * (bytePos + i) + 1, 2)): _*), 16, 10).cast("long")

  /** Container detected from the hex of the leading bytes. */
  def format(hb: Column): Column =
    when(substring(hb, 1, 16) === PngMagic, "png")
      .when(substring(hb, 1, 12).isin(Gif89, Gif87), "gif")
      .when(substring(hb, 1, 4) === BmpMagic, "bmp")
      .otherwise("unknown")

  /** Pixel width parsed from the header (null for unknown containers). */
  def width(hb: Column): Column =
    when(substring(hb, 1, 16) === PngMagic, beAt(hb, 16, 4))
      .when(substring(hb, 1, 12).isin(Gif89, Gif87), leAt(hb, 6, 2))
      .when(substring(hb, 1, 4) === BmpMagic, leAt(hb, 18, 4))

  /** Pixel height parsed from the header (null for unknown containers). */
  def height(hb: Column): Column =
    when(substring(hb, 1, 16) === PngMagic, beAt(hb, 20, 4))
      .when(substring(hb, 1, 12).isin(Gif89, Gif87), leAt(hb, 8, 2))
      .when(substring(hb, 1, 4) === BmpMagic, leAt(hb, 22, 4))

  private def beAtSql(hb: String, bytePos: Int, nBytes: Int): String =
    s"('0x'||substr($hb, ${2 * bytePos + 1}, ${2 * nBytes}))::BIGINT"

  private def leAtSql(hb: String, bytePos: Int, nBytes: Int): String =
    "('0x'||" + (nBytes - 1 to 0 by -1).map(i =>
      s"substr($hb, ${2 * (bytePos + i) + 1}, 2)").mkString("||") + ")::BIGINT"

  def formatSql(hb: String): String =
    s"""CASE WHEN substr($hb,1,16)='$PngMagic' THEN 'png'
       |WHEN substr($hb,1,12) IN ('$Gif89','$Gif87') THEN 'gif'
       |WHEN substr($hb,1,4)='$BmpMagic' THEN 'bmp' ELSE 'unknown' END""".stripMargin

  def widthSql(hb: String): String =
    s"""CASE WHEN substr($hb,1,16)='$PngMagic' THEN ${beAtSql(hb, 16, 4)}
       |WHEN substr($hb,1,12) IN ('$Gif89','$Gif87') THEN ${leAtSql(hb, 6, 2)}
       |WHEN substr($hb,1,4)='$BmpMagic' THEN ${leAtSql(hb, 18, 4)} ELSE NULL END""".stripMargin

  def heightSql(hb: String): String =
    s"""CASE WHEN substr($hb,1,16)='$PngMagic' THEN ${beAtSql(hb, 20, 4)}
       |WHEN substr($hb,1,12) IN ('$Gif89','$Gif87') THEN ${leAtSql(hb, 8, 2)}
       |WHEN substr($hb,1,4)='$BmpMagic' THEN ${leAtSql(hb, 22, 4)} ELSE NULL END""".stripMargin

  /** JVM-side header parse over raw bytes, for the typed `Dataset` decode
    * path (`Multimodal.decodeMedia`). Same offsets as the Column parsers for
    * the fixed-offset containers (PNG/GIF/BMP); JPEG dims live in a
    * variable-offset SOF marker segment, so JPEG is parsed here on the typed
    * path only — the Column parsers stay fixed-offset by design (a SQL
    * marker walk would be an unbounded recursive expression).
    * Returns (format, width, height); (-1, -1) dims for unknown containers.
    */
  def parseBytes(bytes: Array[Byte]): (String, Long, Long) = {
    def u(i: Int): Long = bytes(i) & 0xffL
    def be(off: Int, n: Int): Long = (0 until n).foldLeft(0L)((a, i) => (a << 8) | u(off + i))
    def le(off: Int, n: Int): Long = (n - 1 to 0 by -1).foldLeft(0L)((a, i) => (a << 8) | u(off + i))
    if (bytes.length >= 24 &&
        bytes.take(8).map(b => f"${b & 0xff}%02X").mkString == PngMagic)
      ("png", be(16, 4), be(20, 4))
    else if (bytes.length >= 10 && {
        val m = bytes.take(6).map(b => f"${b & 0xff}%02X").mkString
        m == Gif89 || m == Gif87
      })
      ("gif", le(6, 2), le(8, 2))
    else if (bytes.length >= 26 && u(0) == 0x42L && u(1) == 0x4dL)
      ("bmp", le(18, 4), le(22, 4))
    else if (bytes.length >= 4 && u(0) == 0xffL && u(1) == 0xd8L)
      parseJpegSof(bytes)
    else ("unknown", -1L, -1L)
  }

  /** Walk JPEG marker segments from SOI to the first SOF frame header
    * (FFC0–FFCF except the non-frame C4/C8/CC) and read the big-endian
    * dims at fixed offsets within it: height at +5, width at +7 (after
    * marker, 2-byte length, 1-byte precision). Stops at SOS (entropy data
    * follows, no skippable lengths) or EOI; a truncated or SOF-less stream
    * reports ("jpeg", -1, -1) — format recognized, dims unavailable — so
    * the caller's drop-vs-quarantine contract matches a corrupt PNG's.
    */
  private def parseJpegSof(bytes: Array[Byte]): (String, Long, Long) = {
    def u(i: Int): Long = bytes(i) & 0xffL
    def be(off: Int, n: Int): Long = (0 until n).foldLeft(0L)((a, i) => (a << 8) | u(off + i))
    var i = 2
    while (i + 3 < bytes.length) {
      if (u(i) != 0xffL) return ("jpeg", -1L, -1L) // desynced: not a marker
      val m = u(i + 1)
      if (m == 0xffL) i += 1 // fill byte before a marker
      else if (m == 0x01L || (m >= 0xd0L && m <= 0xd7L)) i += 2 // standalone
      else if (m == 0xd9L || m == 0xdaL) return ("jpeg", -1L, -1L) // EOI/SOS first
      else {
        val len = be(i + 2, 2)
        if (m >= 0xc0L && m <= 0xcfL && m != 0xc4L && m != 0xc8L && m != 0xccL)
          return if (i + 8 < bytes.length) ("jpeg", be(i + 7, 2), be(i + 5, 2))
                 else ("jpeg", -1L, -1L)
        if (len < 2) return ("jpeg", -1L, -1L) // corrupt segment length
        i += 2 + len.toInt
      }
    }
    ("jpeg", -1L, -1L)
  }

  /** JVM-side WAV fmt-chunk parse, the audio twin of [[parseBytes]] for the
    * typed decode path. Returns (format, channels, sampleRate, bitsPerSample);
    * ("unknown", -1, -1, -1) when the RIFF/WAVE+fmt magic is absent.
    */
  def parseWavBytes(bytes: Array[Byte]): (String, Long, Long, Long) = {
    def u(i: Int): Long = bytes(i) & 0xffL
    def le(off: Int, n: Int): Long = (n - 1 to 0 by -1).foldLeft(0L)((a, i) => (a << 8) | u(off + i))
    def hex(off: Int, n: Int): String =
      bytes.slice(off, off + n).map(b => f"${b & 0xff}%02X").mkString
    if (bytes.length >= 36 && hex(0, 4) == RiffMagic && hex(8, 8) == WaveFmtMagic)
      ("wav", le(22, 2), le(24, 4), le(34, 2))
    else ("unknown", -1L, -1L, -1L)
  }
}

package graft.multimodal

import java.nio.charset.StandardCharsets.US_ASCII
import java.util.zip.CRC32

/** Real media container encode/decode for the multimodal path — pure JVM
  * byte-level readers/writers for the PNG, GIF, and BMP image headers and
  * the RIFF/WAVE audio header (no external codec libraries needed). The
  * DECODE side is what the pipeline uses: [[Multimodal.decodeFeatures]]
  * parses actual payload bytes to recover dimensions / audio geometry, so
  * the q24 oracle gates real header decoding, not a fabricated stand-in.
  * The ENCODE side exists to build synthetic-but-structurally-valid
  * fixtures ([[Multimodal.syntheticMedia]]) whose properties an oracle can
  * re-derive independently.
  *
  * Formats follow the public container specs:
  *  - PNG: 8-byte signature, then chunks of (len u32 BE, type, data,
  *    CRC32 over type+data); IHDR carries width/height as u32 BE.
  *  - GIF: "GIF87a"/"GIF89a", then logical-screen width/height as u16 LE.
  *  - BMP: "BM" file header (14 bytes), then BITMAPINFOHEADER with
  *    width/height as i32 LE at offsets 18/22.
  *  - WAV: "RIFF"<size>"WAVE", then chunks of (tag, len u32 LE, data);
  *    the "fmt " chunk carries channels (u16 LE @+2), sample rate
  *    (u32 LE @+4) and bits per sample (u16 LE @+14); the "data" chunk's
  *    declared length gives the PCM byte count.
  */
object MediaCodec {

  private val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG header byte count produced by [[encodePng]]: signature (8) +
    * IHDR chunk (8 + 13 + 4) + IEND chunk (8 + 0 + 4).
    */
  val PngHeaderLen = 45

  /** GIF header byte count: signature (6) + logical screen descriptor (7). */
  val GifHeaderLen = 13

  /** BMP header byte count: file header (14) + BITMAPINFOHEADER (40). */
  val BmpHeaderLen = 54

  /** JPEG header byte count produced by [[encodeJpeg]]: SOI (2) +
    * APP0/JFIF segment (2 + 16) + SOF0 baseline segment for 3 components
    * (2 + 17).
    */
  val JpegHeaderLen = 39

  /** Canonical PCM WAV header byte count: RIFF descriptor (12) +
    * "fmt " chunk (8 + 16) + "data" chunk header (8).
    */
  val WavHeaderLen = 44

  /** MP4 header byte count produced by [[encodeMp4]]: ftyp (24) +
    * moov { mvhd (108) + trak { tkhd (92) + mdia { minf { stbl {
    * stsz (20) } } } } } (260 with container headers) + mdat box
    * header (8). Body bytes appended by callers live inside mdat.
    */
  val Mp4HeaderLen = 292

  private def u32be(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  private def u32le(v: Long): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  private def u16le(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte)

  private def chunk(chunkType: String, data: Array[Byte]): Array[Byte] = {
    val tag = chunkType.getBytes(US_ASCII)
    val crc = new CRC32
    crc.update(tag)
    crc.update(data)
    u32be(data.length.toLong) ++ tag ++ data ++ u32be(crc.getValue)
  }

  /** A structurally valid PNG prefix: signature + IHDR (8-bit truecolor,
    * real CRC32s) + IEND. Callers append arbitrary trailing bytes as fake
    * pixel data; header parsers — this one, `javax.imageio`, DuckDB blob
    * slicing — all recover the dimensions.
    */
  def encodePng(width: Int, height: Int): Array[Byte] = {
    val ihdr = u32be(width.toLong) ++ u32be(height.toLong) ++
      Array[Byte](8, 2, 0, 0, 0) // bit depth, truecolor, deflate, none, none
    PngSignature ++ chunk("IHDR", ihdr) ++ chunk("IEND", Array.empty)
  }

  /** "GIF89a" + logical screen descriptor (dims are u16 LE; no GCT). */
  def encodeGif(width: Int, height: Int): Array[Byte] = {
    require(width <= 0xffff && height <= 0xffff, "GIF dims are u16")
    "GIF89a".getBytes(US_ASCII) ++ u16le(width) ++ u16le(height) ++
      Array[Byte](0, 0, 0) // no GCT, bg index, aspect
  }

  /** A structurally valid JPEG prefix: SOI + APP0 (JFIF 1.1, no thumbnail)
    * + SOF0 (baseline, 8-bit, 3 components with standard 4:2:0/1:1
    * sampling) carrying height then width as u16 BE. Callers append
    * arbitrary trailing bytes as fake entropy-coded data; any marker walk
    * (this one, `javax.imageio`, exif tooling) recovers the dimensions
    * from SOF0.
    */
  def encodeJpeg(width: Int, height: Int): Array[Byte] = {
    require(width <= 0xffff && height <= 0xffff, "JPEG dims are u16")
    val soi = Array(0xff, 0xd8).map(_.toByte)
    val app0 = Array(0xff, 0xe0, 0x00, 0x10).map(_.toByte) ++
      "JFIF".getBytes(US_ASCII) ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0) // v1.1, no density/thumb
    val sof0 = Array(0xff, 0xc0, 0x00, 0x11, 0x08).map(_.toByte) ++
      u16be(height) ++ u16be(width) ++
      Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    soi ++ app0 ++ sof0
  }

  /** "BM" file header + BITMAPINFOHEADER (24bpp, uncompressed). */
  def encodeBmp(width: Int, height: Int): Array[Byte] = {
    "BM".getBytes(US_ASCII) ++
      u32le(BmpHeaderLen.toLong) ++ // file size (header only; data appended)
      u32le(0L) ++ // reserved
      u32le(BmpHeaderLen.toLong) ++ // pixel data offset
      u32le(40L) ++ // DIB header size
      u32le(width.toLong) ++ u32le(height.toLong) ++
      u16le(1) ++ u16le(24) ++ // planes, bits per pixel
      u32le(0L) ++ u32le(0L) ++ // compression, image size
      u32le(0L) ++ u32le(0L) ++ // x/y pixels per meter
      u32le(0L) ++ u32le(0L) // colors used / important
  }

  /** Canonical 44-byte PCM WAV header declaring `dataLen` bytes of sample
    * data to follow. Callers append `dataLen` arbitrary bytes as fake PCM;
    * any spec-conforming reader recovers (rate, channels, bits, frames).
    */
  def encodeWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
      dataLen: Int): Array[Byte] = {
    require(channels > 0 && bitsPerSample % 8 == 0, "PCM geometry")
    val blockAlign = channels * bitsPerSample / 8
    "RIFF".getBytes(US_ASCII) ++
      u32le(36L + dataLen) ++ // RIFF chunk size: 4 ("WAVE") + 24 (fmt) + 8 + data
      "WAVEfmt ".getBytes(US_ASCII) ++
      u32le(16L) ++ // fmt chunk length (PCM)
      u16le(1) ++ // audio format: PCM
      u16le(channels) ++
      u32le(sampleRate.toLong) ++
      u32le(sampleRate.toLong * blockAlign) ++ // byte rate
      u16le(blockAlign) ++
      u16le(bitsPerSample) ++
      "data".getBytes(US_ASCII) ++
      u32le(dataLen.toLong)
  }

  private def u16be(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)

  /** An ISO-BMFF box: u32 BE size (including the 8-byte header) + 4cc tag. */
  private def box(tag: String, payload: Array[Byte]): Array[Byte] =
    u32be(8L + payload.length) ++ tag.getBytes(US_ASCII) ++ payload

  // The identity transformation matrix every mvhd/tkhd carries
  // (ISO 14496-12 §8.2.2.2): fixed-point 16.16 / 2.30 values.
  private val IsoIdentityMatrix: Array[Byte] =
    u32be(0x00010000L) ++ u32be(0L) ++ u32be(0L) ++
      u32be(0L) ++ u32be(0x00010000L) ++ u32be(0L) ++
      u32be(0L) ++ u32be(0L) ++ u32be(0x40000000L)

  /** A structurally valid MP4 prefix: ftyp + moov{mvhd, trak{tkhd,
    * mdia{minf{stbl{stsz}}}}} + an mdat box header. Callers append
    * arbitrary trailing bytes as fake mdat payload; a spec-conforming
    * box walk recovers (width, height) from tkhd (16.16 fixed point),
    * (timescale, duration) from mvhd, and the sample count from stsz.
    * The synthetic encoder sets timescale = 30 (ticks = 1/30 s) and
    * duration = frames ticks, i.e. a 30 fps clip of `frames` samples.
    */
  def encodeMp4(width: Int, height: Int, frames: Int, mdatLen: Int): Array[Byte] = {
    val timescale = 30L
    val ftyp = box("ftyp",
      "isom".getBytes(US_ASCII) ++ u32be(0x200L) ++
        "isommp42".getBytes(US_ASCII))
    val mvhd = box("mvhd",
      u32be(0L) ++ // version 0 + flags
        u32be(0L) ++ u32be(0L) ++ // creation / modification time
        u32be(timescale) ++ u32be(frames.toLong) ++ // timescale, duration
        u32be(0x00010000L) ++ // rate 1.0
        u16be(0x0100) ++ u16be(0) ++ // volume 1.0, reserved
        u32be(0L) ++ u32be(0L) ++ // reserved
        IsoIdentityMatrix ++
        Array.fill[Byte](24)(0) ++ // pre_defined
        u32be(2L)) // next_track_ID
    val tkhd = box("tkhd",
      u32be(7L) ++ // version 0 + flags (enabled | in movie | in preview)
        u32be(0L) ++ u32be(0L) ++ // creation / modification time
        u32be(1L) ++ u32be(0L) ++ // track_ID, reserved
        u32be(frames.toLong) ++ // duration (movie timescale ticks)
        u32be(0L) ++ u32be(0L) ++ // reserved
        u16be(0) ++ u16be(0) ++ u16be(0) ++ u16be(0) ++ // layer, group, volume, reserved
        IsoIdentityMatrix ++
        u32be(width.toLong << 16) ++ u32be(height.toLong << 16)) // 16.16 fixed
    val stsz = box("stsz",
      u32be(0L) ++ // version + flags
        u32be(0L) ++ // sample_size 0 = per-sample table (elided: header-only fixture)
        u32be(frames.toLong)) // sample_count
    val moov = box("moov", mvhd ++ box("trak", tkhd ++
      box("mdia", box("minf", box("stbl", stsz)))))
    ftyp ++ moov ++ u32be(8L + mdatLen) ++ "mdat".getBytes(US_ASCII)
  }

  /** Decoded MP4 geometry: display dimensions (tkhd), movie timescale and
    * duration in ticks (mvhd), and the track's sample count (stsz).
    */
  final case class Mp4Info(width: Int, height: Int, timescale: Long,
      duration: Long, samples: Long)

  /** Sniff the ftyp magic and walk the ISO-BMFF box tree for mvhd, tkhd
    * and stsz. Pure containers (moov, trak, mdia, minf, stbl) are recursed
    * into; version-1 full boxes (64-bit times) shift the field offsets and
    * are handled; unknown boxes are skipped by declared size. None when the
    * payload is not a parseable MP4 — callers route those to an
    * undecodable bucket, never a fabricated geometry.
    */
  def decodeMp4(bytes: Array[Byte]): Option[Mp4Info] = {
    if (bytes.length < 12 || !tagAt(bytes, 4, "ftyp")) return None
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    var wh: Option[(Int, Int)] = None
    var ts: Option[(Long, Long)] = None // (timescale, duration)
    var samples = -1L

    def readU64be(off: Int): Long = (readU32be(bytes, off) << 32) | readU32be(bytes, off + 4)

    def walk(start: Long, end: Long): Unit = {
      var off = start
      while (off + 8 <= end) {
        val o = off.toInt
        var size = readU32be(bytes, o)
        var payload = off + 8
        if (size == 1 && off + 16 <= end) { // 64-bit largesize
          size = readU64be(o + 8); payload = off + 16
        } else if (size == 0) size = end - off // box extends to end of enclosure
        if (size < 8 || off + size > end) return // malformed: stop the walk
        val tag = new String(bytes, o + 4, 4, US_ASCII)
        val p = payload.toInt
        if (containers(tag)) walk(payload, off + size)
        else if (tag == "mvhd" && payload + 4 <= end) {
          val version = bytes(p) & 0xff
          if (version == 1 && payload + 32 <= end)
            ts = Some((readU32be(bytes, p + 20), readU64be(p + 24)))
          else if (version == 0 && payload + 20 <= end)
            ts = Some((readU32be(bytes, p + 12), readU32be(bytes, p + 16)))
        } else if (tag == "tkhd" && payload + 4 <= end) {
          val version = bytes(p) & 0xff
          val whOff = if (version == 1) 88 else 76
          if (payload + whOff + 8 <= end)
            wh = Some(((readU32be(bytes, p + whOff) >> 16).toInt,
              (readU32be(bytes, p + whOff + 4) >> 16).toInt))
        } else if (tag == "stsz" && payload + 12 <= end)
          samples = readU32be(bytes, p + 8)
        off += size
      }
    }

    walk(0L, bytes.length.toLong)
    for ((w, h) <- wh; (timescale, duration) <- ts)
      yield Mp4Info(w, h, timescale, duration, math.max(samples, 0L))
  }

  def encodeHeader(format: String, width: Int, height: Int): Array[Byte] =
    format match {
      case "png" => encodePng(width, height)
      case "gif" => encodeGif(width, height)
      case "bmp" => encodeBmp(width, height)
      case "jpg" => encodeJpeg(width, height)
      case other => throw new IllegalArgumentException(s"unknown format: $other")
    }

  def headerLen(format: String): Int = format match {
    case "png" => PngHeaderLen
    case "gif" => GifHeaderLen
    case "bmp" => BmpHeaderLen
    case "jpg" => JpegHeaderLen
    case other => throw new IllegalArgumentException(s"unknown format: $other")
  }

  private def readU32be(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def readU32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def readU16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def startsWith(b: Array[Byte], prefix: Array[Byte]): Boolean =
    b.length >= prefix.length && {
      var i = 0
      while (i < prefix.length && b(i) == prefix(i)) i += 1
      i == prefix.length
    }

  /** Sniff the container by magic bytes and read the dimensions out of the
    * header. Returns (format, width, height); None when the payload is not
    * a recognized image container (callers route those to the non-image
    * path or an undecodable bucket — never a fabricated size).
    */
  def decodeImage(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    if (startsWith(bytes, PngSignature) && bytes.length >= 24 &&
        bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R')
      Some(("png", readU32be(bytes, 16).toInt, readU32be(bytes, 20).toInt))
    else if ((startsWith(bytes, "GIF87a".getBytes(US_ASCII)) ||
        startsWith(bytes, "GIF89a".getBytes(US_ASCII))) && bytes.length >= 10)
      Some(("gif", readU16le(bytes, 6), readU16le(bytes, 8)))
    else if (startsWith(bytes, "BM".getBytes(US_ASCII)) && bytes.length >= 26)
      Some(("bmp", readU32le(bytes, 18).toInt, readU32le(bytes, 22).toInt))
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff)
      decodeJpegSof(bytes)
    else None
  }

  /** JPEG marker walk: from SOI, skip segments by their declared u16 BE
    * length until a start-of-frame marker (SOF0–SOF15 except DHT/JPG/DAC),
    * whose payload carries precision (1), height (u16 BE), width (u16 BE).
    * Standalone markers (TEM, RSTn) have no length; the walk stops at SOS —
    * dimensions always precede entropy-coded data in a well-formed stream.
    */
  private def decodeJpegSof(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    var off = 2
    while (off + 4 <= bytes.length) {
      // Fill bytes: markers may be preceded by any number of 0xFF bytes.
      if ((bytes(off) & 0xff) != 0xff) return None
      var m = off + 1
      while (m < bytes.length && (bytes(m) & 0xff) == 0xff) m += 1
      if (m >= bytes.length) return None
      val marker = bytes(m) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS: no SOF seen
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
        off = m + 1 // standalone marker, no length field
      } else {
        if (m + 3 > bytes.length) return None
        val len = ((bytes(m + 1) & 0xff) << 8) | (bytes(m + 2) & 0xff)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          val p = m + 3 // past marker + length field
          if (p + 5 > bytes.length) return None
          val h = ((bytes(p + 1) & 0xff) << 8) | (bytes(p + 2) & 0xff)
          val w = ((bytes(p + 3) & 0xff) << 8) | (bytes(p + 4) & 0xff)
          return Some(("jpg", w, h))
        }
        off = m + 1 + len
      }
    }
    None
  }

  /** Decoded WAV geometry: sample rate, channel count, bits per sample, and
    * PCM frame count (data bytes / block align — "frame" = one sample
    * across all channels).
    */
  final case class WavInfo(sampleRate: Int, channels: Int,
      bitsPerSample: Int, frames: Long)

  private def tagAt(b: Array[Byte], off: Int, tag: String): Boolean = {
    val t = tag.getBytes(US_ASCII)
    off + t.length <= b.length && {
      var i = 0
      while (i < t.length && b(off + i) == t(i)) i += 1
      i == t.length
    }
  }

  /** Sniff RIFF/WAVE magic and walk the chunk list for "fmt " and "data".
    * Chunks may appear in any order with vendor chunks interleaved (the
    * spec allows e.g. LIST before data), so this is a real walk, not a
    * fixed-offset read. None when the payload is not a parseable WAV —
    * callers route those to an undecodable bucket, never a fabricated
    * geometry.
    */
  def decodeWav(bytes: Array[Byte]): Option[WavInfo] = {
    if (!tagAt(bytes, 0, "RIFF") || bytes.length < 12 || !tagAt(bytes, 8, "WAVE"))
      return None
    var off = 12L
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var dataLen = -1L
    while (off + 8 <= bytes.length && (fmt.isEmpty || dataLen < 0)) {
      val o = off.toInt
      val len = readU32le(bytes, o + 4)
      if (tagAt(bytes, o, "fmt ") && len >= 16 && o + 8 + 16 <= bytes.length)
        fmt = Some((readU16le(bytes, o + 10), readU32le(bytes, o + 12).toInt,
          readU16le(bytes, o + 22)))
      else if (tagAt(bytes, o, "data"))
        dataLen = len
      // chunks are word-aligned (odd lengths carry a pad byte); a declared
      // length that runs past the buffer just terminates the walk
      off += 8 + len + (len & 1)
    }
    fmt.collect { case (ch, rate, bits) if ch > 0 && bits >= 8 && dataLen >= 0 =>
      WavInfo(rate, ch, bits, dataLen / (ch.toLong * bits / 8))
    }
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct
  * riding alongside — the schema a 100 TB multimodal corpus would use
  * (payload + metadata in parquet, partitioned by format/shard). The
  * Spark-side machinery here is real and tested: schema, typed Datasets,
  * per-partition batched decode (the JVM analog of a vectorized pandas-UDF:
  * rows are chunked into fixed-size batches inside `mapPartitions`, so a
  * real decoder could amortize model/codec setup per batch), frame
  * sampling, and feature extraction — all without any driver-side collect.
  *
  * Decoders: [[PpmDecoder]] (binary PPM/P6), [[BmpDecoder]]
  * (uncompressed 24-bit BMP), [[WavDecoder]] (RIFF WAVE integer PCM),
  * [[PngDecoder]] (zlib-compressed PNG — the JDK's `Inflater` plus the
  * five scanline filters), [[GifDecoder]] (LZW-compressed GIF 87a/89a
  * incl. interlace), [[TiffDecoder]] (tagged-IFD baseline TIFF in
  * either byte order), [[JpegDecoder]] (baseline-sequential T.81 SOF0),
  * and [[Mp3Decoder]] (MPEG Layer III frame-header walk — container
  * metadata without audio synthesis) are REAL decoders — no codec
  * library anywhere. Only genuinely-unavailable lossy codecs (video
  * containers, modern image/audio codecs) fall back to [[FakeDecoder]],
  * which stands in with deterministic pseudo-features from the bytes;
  * [[decoderFor]] dispatches on the metadata format tag.
  * All run behind the same [[MediaDecoder]] contract, so swapping in a
  * real codec is a one-line change at the call site; nothing else moves.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  case class MediaMeta(format: String, widthPx: Int, heightPx: Int, nBytes: Long)

  /** One media row: id + opaque payload + typed metadata. */
  case class MediaRecord(id: Long, media: Array[Byte], meta: MediaMeta)

  /** Decoder output: per-item features a downstream pipeline would train on. */
  case class MediaFeatures(id: Long, format: String, nFrames: Int,
                           checksum: Long, thumbFirstByte: Int)

  /** The decode contract. Implementations MUST be pure per-record functions
    * (no shared mutable state) — they run concurrently on executor threads. */
  trait MediaDecoder extends Serializable {
    /** Decode one payload into features. `frameStride`/`frameLen` define
      * the sampling grid a video decoder would honor. */
    def decode(rec: MediaRecord): MediaFeatures
  }

  /** STUB decoder — deterministic pseudo-decode standing in for a real
    * codec (not available in this container). "Frames" are fixed-stride
    * byte slices; the checksum is a rolling hash of sampled frames; the
    * "thumbnail" is the first sampled byte. Everything is reproducible so
    * the plumbing around it can be tested end-to-end. */
  final class FakeDecoder(frameStride: Int = 16, frameLen: Int = 8)
      extends MediaDecoder {
    override def decode(rec: MediaRecord): MediaFeatures = {
      val frames = sampleFrames(rec.media, frameStride, frameLen)
      val checksum = rollingChecksum(frames)
      MediaFeatures(rec.id, rec.meta.format, frames.length, checksum,
        if (frames.nonEmpty && frames.head.nonEmpty) frames.head.head & 0xff else -1)
    }
  }

  /** REAL decoder for binary PPM (P6) — an uncompressed format that needs
    * no codec library, so the decode step stops being a stub for at least
    * one real on-disk image format. Header per the Netpbm spec: `P6`,
    * then whitespace-separated width/height/maxval (with `#` comments
    * allowed between tokens), one whitespace byte, then `w*h*3` raw RGB
    * bytes. Each pixel ROW is one "frame": `nFrames` = image height, the
    * checksum is the same rolling hash [[FakeDecoder]] uses (over rows
    * instead of stride slices), and the thumbnail byte is the first
    * pixel's red channel. Malformed payloads throw `IllegalArgumentException`
    * with the offending offset — a decode error must surface per-record,
    * not corrupt the batch. */
  final class PpmDecoder extends MediaDecoder {
    override def decode(rec: MediaRecord): MediaFeatures = {
      val b = rec.media
      require(b.length >= 2 && b(0) == 'P' && b(1) == '6',
        s"not a P6 PPM payload (magic=${b.take(2).map(_.toChar).mkString})")
      var pos = 2
      def skipSeparators(): Unit = {
        var going = true
        while (going && pos < b.length) {
          if (Character.isWhitespace(b(pos))) pos += 1
          else if (b(pos) == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
          else going = false
        }
      }
      def readInt(): Int = {
        skipSeparators()
        val start = pos
        while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') pos += 1
        require(pos > start, s"expected integer at offset $start")
        new String(b, start, pos - start, "US-ASCII").toInt
      }
      val w = readInt(); val h = readInt(); val maxval = readInt()
      require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
      require(maxval > 0 && maxval < 256, s"maxval $maxval unsupported (1-byte samples only)")
      // exactly one whitespace byte separates header from raster (P6
      // spec) — VERIFY it: consuming an arbitrary byte here would let a
      // malformed header silently shift the raster by one byte instead
      // of throwing the contractual IAE
      require(pos < b.length && Character.isWhitespace(b(pos)),
        s"expected single whitespace after maxval at offset $pos")
      pos += 1
      require(b.length - pos >= w.toLong * h * 3,
        s"truncated raster: need ${w.toLong * h * 3} bytes, have ${b.length - pos}")
      val rowLen = w * 3
      val rows = (0 until h).map(r => b.slice(pos + r * rowLen, pos + (r + 1) * rowLen))
      val checksum = rollingChecksum(rows)
      MediaFeatures(rec.id, "ppm", h, checksum, b(pos) & 0xff)
    }
  }

  /** REAL decoder for uncompressed 24-bit BMP (BITMAPINFOHEADER) — like
    * [[PpmDecoder]], pure byte arithmetic, no codec library. Layout:
    * 14-byte file header (`BM`, file size, reserved, pixel-data offset),
    * then a >=40-byte info header (width, height, planes=1, bpp=24,
    * compression=0/BI_RGB), then the raster: rows padded to 4-byte
    * multiples, stored bottom-up when height is positive and top-down
    * when negative, pixels in BGR order.
    *
    * Features mirror [[PpmDecoder]]'s: each VISUAL (top-down) pixel row
    * is one "frame" with its padding stripped, `nFrames` = image height,
    * the checksum is the same rolling row hash, and the thumbnail byte is
    * the top-left pixel's red channel (offset 2 of the stored BGR
    * triple). Malformed payloads throw `IllegalArgumentException` naming
    * the violated field — decode errors surface per-record. */
  final class BmpDecoder extends MediaDecoder {
    private def u16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def i32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

    override def decode(rec: MediaRecord): MediaFeatures = {
      val b = rec.media
      require(b.length >= 54 && b(0) == 'B' && b(1) == 'M',
        s"not a BMP payload (len=${b.length})")
      val dataOff = i32(b, 10)
      val hdrSize = i32(b, 14)
      require(hdrSize >= 40, s"info header size $hdrSize < BITMAPINFOHEADER")
      val w = i32(b, 18)
      val hRaw = i32(b, 22)
      val planes = u16(b, 26)
      val bpp = u16(b, 28)
      val comp = i32(b, 30)
      require(planes == 1, s"planes=$planes (must be 1)")
      require(bpp == 24, s"bpp=$bpp unsupported (24-bit uncompressed only)")
      require(comp == 0, s"compression=$comp unsupported (BI_RGB only)")
      val h = math.abs(hRaw)
      require(w > 0 && h > 0, s"bad dimensions ${w}x$hRaw")
      // row arithmetic in Long: a crafted width near 2^31 would wrap an
      // Int rowLen past the truncated-raster check and decode garbage
      // (or AIOOBE) instead of throwing the contractual IAE
      val strideL = (w.toLong * 3 + 3) & ~3L // rows pad to 4-byte multiples
      // division-form bound: the product strideL*h can itself overflow Long
      // for crafted w,h near 2^31 (wrapping negative and passing a
      // product-form check); strideL >= 4 here since w > 0, so the
      // division is safe and cannot wrap
      require(dataOff >= 54 && dataOff <= b.length &&
        (b.length - dataOff) / strideL >= h.toLong,
        s"truncated raster: need ${strideL}x$h bytes at $dataOff, have ${b.length - dataOff}")
      // the require bounds strideL by the payload length, so Int is safe now
      val rowLen = w * 3
      val stride = strideL.toInt
      val rows = (0 until h).map { r =>
        val srcRow = if (hRaw > 0) h - 1 - r else r // bottom-up -> visual order
        val start = dataOff + srcRow * stride
        b.slice(start, start + rowLen)
      }
      val checksum = rollingChecksum(rows)
      MediaFeatures(rec.id, "bmp", h, checksum, rows.head(2) & 0xff)
    }
  }

  /** REAL decoder for PCM WAV (RIFF WAVE, integer PCM) — the audio
    * analog of [[PpmDecoder]]/[[BmpDecoder]]: pure byte arithmetic, no
    * codec library. Layout per the RIFF spec: `RIFF` + chunk size +
    * `WAVE`, then tagged sub-chunks (each `id` + little-endian size +
    * payload, padded to even length); `fmt ` must declare audioFormat=1
    * (integer PCM) with 8- or 16-bit samples, `data` carries the raster.
    * Unknown sub-chunks (LIST/INFO/fact/...) are skipped, as a real
    * reader must.
    *
    * Features mirror the image decoders': one "frame" is a 256
    * sample-frame block of the data raster (the hop a feature extractor
    * would window over), `nFrames` counts those blocks (tail included),
    * the checksum is the same rolling block hash, and the thumbnail byte
    * is the first data byte. Malformed payloads throw
    * `IllegalArgumentException` naming the violated field. */
  final class WavDecoder(blockFrames: Int = 256) extends MediaDecoder {
    private def u16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    override def decode(rec: MediaRecord): MediaFeatures = {
      val b = rec.media
      require(b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE",
        s"not a RIFF WAVE payload (len=${b.length})")
      var pos = 12
      var blockAlign = -1
      var dataOff = -1
      var dataLen = -1L
      while (pos + 8 <= b.length && (blockAlign < 0 || dataOff < 0)) {
        val id = tag(b, pos)
        val sz = u32(b, pos + 4)
        require(pos + 8 + sz <= b.length,
          s"chunk $id at $pos overruns payload (size=$sz)")
        if (id == "fmt ") {
          require(sz >= 16, s"fmt chunk size $sz < 16")
          val audioFormat = u16(b, pos + 8)
          val channels = u16(b, pos + 10)
          val bits = u16(b, pos + 22)
          require(audioFormat == 1, s"audioFormat=$audioFormat (PCM only)")
          require(channels > 0, "zero channels")
          require(bits == 8 || bits == 16, s"bits=$bits (8/16-bit PCM only)")
          blockAlign = u16(b, pos + 20)
          require(blockAlign == channels * bits / 8,
            s"blockAlign $blockAlign != channels*bytes ${channels * bits / 8}")
        } else if (id == "data") {
          dataOff = pos + 8
          dataLen = sz
        }
        pos += 8 + sz.toInt + (sz.toInt & 1) // chunks pad to even length
      }
      require(blockAlign > 0, "missing fmt chunk")
      require(dataOff > 0, "missing data chunk")
      require(dataLen % blockAlign == 0,
        s"data length $dataLen not a multiple of blockAlign $blockAlign")
      val blockBytes = blockAlign * blockFrames
      val nBlocks = ((dataLen + blockBytes - 1) / blockBytes).toInt
      val blocks = (0 until nBlocks).map { i =>
        val start = dataOff + i.toLong * blockBytes
        val end = math.min(start + blockBytes, dataOff + dataLen)
        b.slice(start.toInt, end.toInt)
      }
      val checksum = rollingChecksum(blocks)
      MediaFeatures(rec.id, "wav", nBlocks, checksum,
        if (dataLen > 0) b(dataOff) & 0xff else -1)
    }
  }

  /** REAL decoder for PNG (8-bit depth, non-interlaced) — unlike
    * JPEG/MP3/video, PNG needs NO external codec: the compression is
    * zlib (`java.util.zip.Inflater`, in the JDK) and everything else is
    * byte arithmetic like [[BmpDecoder]]. Layout per the PNG spec
    * (RFC 2083 / ISO 15948): an 8-byte signature, then chunks of
    * (big-endian length, 4-char type, payload, CRC32 over type+payload).
    * `IHDR` carries dimensions/depth/color-type, the concatenation of
    * all `IDAT` payloads is ONE zlib stream of filtered scanlines,
    * `IEND` terminates. Each scanline is a filter-type byte followed by
    * `w*channels` bytes, filtered against the reconstructed bytes to its
    * left/above via one of five filters (None/Sub/Up/Average/Paeth) —
    * all five are implemented. Supported: bit depth 8 with color types
    * 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA); interlaced files,
    * other depths, and palette images throw. Chunk CRCs are verified —
    * corruption surfaces per-record as `IllegalArgumentException`, like
    * the other decoders' malformed-payload contract.
    *
    * Features mirror [[PpmDecoder]]/[[BmpDecoder]]: each reconstructed
    * pixel row is one "frame" (native channel order, filter byte
    * stripped), `nFrames` = image height, the checksum is the same
    * rolling row hash, and the thumbnail byte is the first byte of the
    * top-left pixel (the red channel for RGB/RGBA). */
  final class PngDecoder extends MediaDecoder {
    private def be32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    private val signature =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    override def decode(rec: MediaRecord): MediaFeatures = {
      val b = rec.media
      require(b.length >= 8 && b.take(8).sameElements(signature),
        s"not a PNG payload (len=${b.length})")
      var pos = 8
      var w = 0; var h = 0; var channels = 0
      var seenIhdr = false; var seenIend = false
      val idat = new java.io.ByteArrayOutputStream()
      while (!seenIend && pos + 12 <= b.length) {
        val len = be32(b, pos)
        require(len >= 0, s"negative chunk length at $pos")
        val typ = new String(b, pos + 4, 4, "US-ASCII")
        require(pos + 12L + len <= b.length,
          s"chunk $typ at $pos overruns payload (len=$len)")
        val crc = new java.util.zip.CRC32()
        crc.update(b, pos + 4, 4 + len)
        require(crc.getValue == (be32(b, pos + 8 + len) & 0xffffffffL),
          s"CRC mismatch in $typ chunk at $pos")
        typ match {
          case "IHDR" =>
            require(!seenIhdr, "duplicate IHDR")
            require(len == 13, s"IHDR length $len != 13")
            w = be32(b, pos + 8); h = be32(b, pos + 12)
            val depth = b(pos + 16) & 0xff
            val colorType = b(pos + 17) & 0xff
            val comp = b(pos + 18) & 0xff
            val filterMethod = b(pos + 19) & 0xff
            val interlace = b(pos + 20) & 0xff
            require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
            require(depth == 8, s"bit depth $depth unsupported (8 only)")
            channels = colorType match {
              case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
              case ct => throw new IllegalArgumentException(
                s"color type $ct unsupported (0/2/4/6 only)")
            }
            require(comp == 0, s"compression method $comp (zlib=0 only)")
            require(filterMethod == 0, s"filter method $filterMethod (adaptive=0 only)")
            require(interlace == 0, "interlaced (Adam7) PNGs unsupported")
            // division-form bound like BmpDecoder's: (w*ch+1)*h must fit
            // an Int raster — a crafted header must throw, not OOM
            val stride = w.toLong * channels + 1
            require(stride < Int.MaxValue && h <= (Int.MaxValue - 8) / stride,
              s"raster ${w}x$h x$channels too large")
            seenIhdr = true
          case "IDAT" =>
            require(seenIhdr, "IDAT before IHDR")
            idat.write(b, pos + 8, len)
          case "IEND" => seenIend = true
          case _ => () // ancillary chunks (tEXt, pHYs, gAMA, ...) skipped
        }
        pos += 12 + len
      }
      require(seenIhdr, "missing IHDR chunk")
      require(seenIend, "missing IEND chunk")
      val stride = w * channels
      val expected = (stride + 1) * h
      // allocation bound BEFORE the buffer: zlib's maximum expansion is
      // 1032:1, so a tiny payload whose valid-CRC IHDR claims a huge
      // raster must throw here instead of OOMing the executor on the
      // allocation below (the BMP decoder's crafted-header contract)
      require(expected <= idat.size.toLong * 1032 + 64,
        s"raster $expected bytes exceeds what the ${idat.size}-byte " +
          "IDAT stream could inflate")
      val raw = new Array[Byte](expected)
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(idat.toByteArray)
        var off = 0
        var n = -1
        while (off < expected && n != 0) {
          n = try inf.inflate(raw, off, expected - off)
          catch { case e: java.util.zip.DataFormatException =>
            throw new IllegalArgumentException(s"corrupt zlib stream: ${e.getMessage}")
          }
          off += n
        }
        require(off == expected,
          s"truncated raster: zlib stream yielded $off of $expected bytes")
        require(inf.finished || inf.inflate(new Array[Byte](1)) == 0,
          s"zlib stream continues past the $expected-byte raster")
      } finally inf.end()
      // unfilter scanline by scanline; bpp = bytes per COMPLETE pixel,
      // the left-neighbor distance every filter predicts against
      val bpp = channels
      val rows = new Array[Array[Byte]](h)
      var r = 0
      while (r < h) {
        val ft = raw(r * (stride + 1)) & 0xff
        val cur = java.util.Arrays.copyOfRange(
          raw, r * (stride + 1) + 1, (r + 1) * (stride + 1))
        val prev = if (r == 0) null else rows(r - 1)
        def up(i: Int): Int = if (prev == null) 0 else prev(i) & 0xff
        def left(i: Int): Int = if (i < bpp) 0 else cur(i - bpp) & 0xff
        def upLeft(i: Int): Int =
          if (prev == null || i < bpp) 0 else prev(i - bpp) & 0xff
        ft match {
          case 0 => // None
          case 1 => var i = 0; while (i < stride) { // Sub
            cur(i) = (cur(i) + left(i)).toByte; i += 1 }
          case 2 => var i = 0; while (i < stride) { // Up
            cur(i) = (cur(i) + up(i)).toByte; i += 1 }
          case 3 => var i = 0; while (i < stride) { // Average
            cur(i) = (cur(i) + (left(i) + up(i)) / 2).toByte; i += 1 }
          case 4 => var i = 0; while (i < stride) { // Paeth
            val a = left(i); val bb = up(i); val c = upLeft(i)
            val p = a + bb - c
            val pa = math.abs(p - a); val pb = math.abs(p - bb)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c
            cur(i) = (cur(i) + pred).toByte; i += 1 }
          case x => throw new IllegalArgumentException(
            s"unknown scanline filter $x in row $r")
        }
        rows(r) = cur
        r += 1
      }
      val checksum = rollingChecksum(rows)
      MediaFeatures(rec.id, "png", h, checksum, rows.head(0) & 0xff)
    }
  }

  /** REAL decoder for GIF (87a/89a, first frame, incl. interlace) — the
    * fourth codec-library-free image format: LZW decompression (Welch
    * 1984; the GIF89a spec's variable-code-width LSB-first variant) is
    * ~60 lines of table-walking, everything else is byte arithmetic.
    * Layout per the spec: 6-byte signature, logical screen descriptor
    * (+ optional global color table), then blocks — 0x21 extensions
    * (skipped via their length-prefixed sub-block chains), 0x2C image
    * descriptor (+ optional local color table) followed by the LZW
    * minimum code size and the compressed index stream in sub-blocks,
    * 0x3B trailer. The FIRST image block is decoded (animated GIFs'
    * later frames are composition state, not raster); GIF's four-pass
    * interlacing is supported (it's pure row reordering — the JDK's own
    * writer emits interlaced files).
    *
    * Features mirror the other image decoders: each pixel row is one
    * "frame" as RGB bytes through the active color table, `nFrames` =
    * image height, same rolling row hash, thumbnail byte = top-left
    * pixel's red channel. Malformed payloads (bad signature, truncated
    * blocks, code overflow, missing color table) throw
    * `IllegalArgumentException` per-record. */
  final class GifDecoder extends MediaDecoder {
    private def u16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

    override def decode(rec: MediaRecord): MediaFeatures = {
      val b = rec.media
      require(b.length >= 13, s"not a GIF payload (len=${b.length})")
      val sig = new String(b, 0, 6, "US-ASCII")
      require(sig == "GIF87a" || sig == "GIF89a", s"bad GIF signature '$sig'")
      var pos = 6
      val packed = b(pos + 4) & 0xff
      val gctSize = if ((packed & 0x80) != 0) 2 << (packed & 7) else 0
      pos += 7
      val gct = pos
      require(pos + 3 * gctSize <= b.length, "truncated global color table")
      pos += 3 * gctSize
      // walk blocks to the first image descriptor
      var imgAt = -1
      while (imgAt < 0) {
        require(pos < b.length, "no image block before end of payload")
        (b(pos) & 0xff) match {
          case 0x2c => imgAt = pos
          case 0x21 => // extension: label byte then length-prefixed sub-blocks
            pos += 2
            while ({ require(pos < b.length, "truncated extension")
              val n = b(pos) & 0xff; pos += 1 + n; n != 0 }) ()
          case 0x3b => throw new IllegalArgumentException("trailer before any image")
          case x => throw new IllegalArgumentException(
            s"unknown block 0x${x.toHexString} at $pos")
        }
      }
      pos = imgAt + 1
      require(pos + 9 <= b.length, "truncated image descriptor")
      val w = u16(b, pos + 4); val h = u16(b, pos + 6)
      val ipacked = b(pos + 8) & 0xff
      require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
      val interlaced = (ipacked & 0x40) != 0
      require(w.toLong * h <= (Int.MaxValue - 8) / 3, s"raster ${w}x$h too large")
      pos += 9
      val lctSize = if ((ipacked & 0x80) != 0) 2 << (ipacked & 7) else 0
      val ct = if (lctSize > 0) pos else gct
      val ctSize = if (lctSize > 0) lctSize else gctSize
      require(ctSize > 0, "no color table (global absent, local absent)")
      if (lctSize > 0) {
        require(pos + 3 * lctSize <= b.length, "truncated local color table")
        pos += 3 * lctSize
      }
      require(pos < b.length, "missing LZW minimum code size")
      val minCode = b(pos) & 0xff; pos += 1
      require(minCode >= 2 && minCode <= 8, s"LZW min code size $minCode out of [2,8]")
      // concatenate the image data sub-blocks
      val data = new java.io.ByteArrayOutputStream()
      while ({ require(pos < b.length, "truncated image data")
        val n = b(pos) & 0xff
        require(pos + 1 + n <= b.length, s"image sub-block at $pos overruns")
        data.write(b, pos + 1, n); pos += 1 + n; n != 0 }) ()
      val indices = lzwDecode(minCode, data.toByteArray, w * h)
      // interlace (GIF89a appendix E): stored rows come in four passes —
      // every 8th from 0, every 8th from 4, every 4th from 2, every 2nd
      // from 1 — so storedOf(visual row) inverts that order
      val storedOf: Int => Int =
        if (!interlaced) identity
        else {
          val order = Seq(0 until h by 8, 4 until h by 8,
            2 until h by 4, 1 until h by 2).flatten
          val inv = new Array[Int](h)
          order.zipWithIndex.foreach { case (visual, stored) => inv(visual) = stored }
          inv
        }
      // palette-map each VISUAL row to RGB
      val rows = (0 until h).map { vr =>
        val r = storedOf(vr)
        val out = new Array[Byte](w * 3)
        var x = 0
        while (x < w) {
          val idx = indices(r * w + x) & 0xff
          require(idx < ctSize, s"pixel index $idx outside color table ($ctSize)")
          out(x * 3) = b(ct + 3 * idx)
          out(x * 3 + 1) = b(ct + 3 * idx + 1)
          out(x * 3 + 2) = b(ct + 3 * idx + 2)
          x += 1
        }
        out
      }
      val checksum = rollingChecksum(rows)
      MediaFeatures(rec.id, "gif", h, checksum, rows.head(0) & 0xff)
    }

    /** GIF-variant LZW: variable code width starting at minCode+1,
      * LSB-first bit packing, clear/end control codes, 12-bit cap. */
    private def lzwDecode(minCode: Int, data: Array[Byte], npix: Int): Array[Byte] = {
      val clear = 1 << minCode
      val endCode = clear + 1
      // allocation bound BEFORE the buffer: n codes can emit at most
      // n·(n+3)/2 symbols (each code extends the longest expansion by
      // one), so a tiny payload whose descriptor claims a huge raster
      // must throw instead of OOMing on the allocation below
      val maxCodes = data.length.toLong * 8 / (minCode + 1) + 1
      require(npix <= maxCodes * (maxCodes + 3) / 2,
        s"raster $npix pixels exceeds what the ${data.length}-byte " +
          "LZW stream could decode")
      val prefix = new Array[Int](4096)
      val suffix = new Array[Byte](4096)
      var dictSize = endCode + 1
      var codeSize = minCode + 1
      java.util.Arrays.fill(prefix, -1)
      for (i <- 0 until clear) suffix(i) = i.toByte
      val out = new Array[Byte](npix)
      var outPos = 0
      var bitPos = 0
      var prev = -1
      val stack = new Array[Byte](4096)
      def firstOf(code: Int): Byte = {
        var c = code
        while (prefix(c) >= 0) c = prefix(c)
        suffix(c)
      }
      while (outPos < npix) {
        // read `codeSize` bits LSB-first
        require(bitPos + codeSize <= data.length * 8,
          s"LZW stream exhausted at $outPos of $npix pixels")
        var code = 0
        var i = 0
        while (i < codeSize) {
          val bp = bitPos + i
          if ((data(bp >> 3) >> (bp & 7) & 1) != 0) code |= 1 << i
          i += 1
        }
        bitPos += codeSize
        if (code == clear) {
          dictSize = endCode + 1; codeSize = minCode + 1; prev = -1
        } else if (code == endCode) {
          require(outPos == npix, s"end code after $outPos of $npix pixels")
        } else {
          require(code < dictSize || (code == dictSize && prev >= 0),
            s"LZW code $code beyond dictionary ($dictSize)")
          // expand: the KwKwK case (code == dictSize) is prev + first(prev)
          var sp = 0
          if (code == dictSize) { stack(sp) = firstOf(prev); sp += 1 }
          var c = if (code == dictSize) prev else code
          while (c >= 0) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
          require(outPos + sp <= npix, s"LZW output overruns raster at $outPos")
          while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
          if (prev >= 0 && dictSize < 4096) {
            prefix(dictSize) = prev
            suffix(dictSize) = firstOf(code)
            dictSize += 1
            if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prev = code
        }
      }
      out
    }
  }

  /** REAL decoder for baseline uncompressed TIFF — the fifth
    * codec-library-free format, and a structurally different file
    * family from the chunk-walk formats (PNG/RIFF/GIF): a TAGGED
    * directory (IFD) of typed entries, in EITHER byte order ("II"
    * little-endian or "MM" big-endian, per the TIFF 6.0 spec), with
    * the raster in strips addressed by offset/length tag arrays.
    * Supported: compression 1 (none), 8-bit samples, photometric
    * 0/1 (grayscale, raw samples kept — no WhiteIsZero inversion) and
    * 2 (RGB), any strip layout. The first IFD's image is decoded.
    * Values are read type-aware: a SHORT count-1 value sits
    * left-justified in the 4-byte value field in the FILE's byte order
    * — the classic TIFF parsing trap.
    *
    * Features mirror the other image decoders: each pixel row is one
    * "frame" in native sample order, `nFrames` = image height, same
    * rolling row hash, thumbnail byte = first sample of the top-left
    * pixel. Malformed payloads throw `IllegalArgumentException`
    * per-record; every strip is bounds-checked against the payload, so
    * the raster can never exceed the file's own data (no crafted-header
    * allocation path). */
  final class TiffDecoder extends MediaDecoder {
    override def decode(rec: MediaRecord): MediaFeatures = {
      val b = rec.media
      require(b.length >= 8, s"not a TIFF payload (len=${b.length})")
      val le = b(0) == 'I' && b(1) == 'I'
      val be = b(0) == 'M' && b(1) == 'M'
      require(le || be, "not a TIFF payload (no II/MM byte-order mark)")
      def u16(off: Int): Int = {
        require(off >= 0 && off + 2 <= b.length, s"u16 read at $off overruns")
        if (le) (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
        else ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
      }
      def u32(off: Int): Long = {
        require(off >= 0 && off + 4 <= b.length, s"u32 read at $off overruns")
        if (le) (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
          ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
        else ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
          ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
      }
      require(u16(2) == 42, s"TIFF magic ${u16(2)} != 42")
      val ifd = u32(4).toInt
      val nEntries = u16(ifd)
      // tag -> (fieldType, count, entry offset of the value field)
      val entries = (0 until nEntries).map { i =>
        val e = ifd + 2 + i * 12
        u16(e) -> ((u16(e + 2), u32(e + 4), e + 8))
      }.toMap
      def scalar(tag: Int, default: Long = -1L): Long =
        entries.get(tag) match {
          case Some((3, 1, v)) => u16(v).toLong // SHORT, left-justified
          case Some((4, 1, v)) => u32(v)
          case Some((t, c, _)) => throw new IllegalArgumentException(
            s"tag $tag has unsupported type $t count $c for a scalar")
          case None =>
            require(default >= 0, s"required TIFF tag $tag missing")
            default
        }
      /** SHORT/LONG value array: inline when it fits the 4-byte field,
        * else at the pointed-to offset. */
      def array(tag: Int): Seq[Long] = entries.get(tag) match {
        case Some((t, c, v)) =>
          require(t == 3 || t == 4, s"tag $tag type $t not SHORT/LONG")
          val width = if (t == 3) 2 else 4
          val base = if (c * width <= 4) v else u32(v).toInt
          (0 until c.toInt).map(i =>
            if (t == 3) u16(base + i * width).toLong else u32(base + i * width))
        case None => throw new IllegalArgumentException(s"required TIFF tag $tag missing")
      }
      val w = scalar(256).toInt
      val h = scalar(257).toInt
      require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
      require(scalar(259, 1L) == 1L, "compression unsupported (uncompressed only)")
      // a planar (=2) RGB TIFF would pass every size check below but
      // interleave wrong: per-row bytes are per-plane, not per-pixel
      require(scalar(284, 1L) == 1L,
        "planar configuration unsupported (chunky only)")
      val photometric = scalar(262).toInt
      require(photometric >= 0 && photometric <= 2,
        s"photometric $photometric unsupported (gray/RGB only)")
      val spp = scalar(277, 1L).toInt
      require(spp == (if (photometric == 2) 3 else 1),
        s"samplesPerPixel $spp inconsistent with photometric $photometric")
      require(array(258).forall(_ == 8L), "bits-per-sample must be 8")
      val offsets = array(273)
      val counts = array(279)
      require(offsets.length == counts.length,
        s"strip offsets (${offsets.length}) and counts (${counts.length}) disagree")
      val rowLen = w * spp
      val total = counts.sum
      require(total == rowLen.toLong * h,
        s"strip bytes $total != raster ${rowLen.toLong * h}")
      offsets.zip(counts).foreach { case (o, c) =>
        require(o >= 0 && c >= 0 && o + c <= b.length,
          s"strip at $o (+$c) overruns payload")
      }
      val raster = new Array[Byte](total.toInt)
      var pos = 0
      offsets.zip(counts).foreach { case (o, c) =>
        System.arraycopy(b, o.toInt, raster, pos, c.toInt); pos += c.toInt
      }
      val rows = (0 until h).map(r =>
        java.util.Arrays.copyOfRange(raster, r * rowLen, (r + 1) * rowLen))
      val checksum = rollingChecksum(rows)
      MediaFeatures(rec.id, "tiff", h, checksum, rows.head(0) & 0xff)
    }
  }

  /** REAL decoder for baseline sequential JPEG (ITU-T T.81, SOF0) — the
    * last common container format that was still behind [[FakeDecoder]],
    * and the first LOSSY one decoded from raw bytes: marker segments
    * (DQT/DHT/DRI/SOF0/SOS), canonical Huffman entropy decoding with
    * 0xFF00 byte unstuffing and RSTn restart handling, dequantization in
    * zigzag order, a double-precision separable 8×8 IDCT, nearest
    * upsampling of subsampled chroma planes, and BT.601 YCbCr→RGB.
    * Supported: 8-bit precision, 1 component (grayscale, decoded
    * non-interleaved per F.2.3) or 3 components (YCbCr, interleaved),
    * sampling factors 1–4, restart intervals. Rejected loudly:
    * progressive/extended/lossless/arithmetic SOFs (SOF1/2/3/5–15),
    * 16-bit quantization tables, truncated scans, markers inside
    * entropy-coded data.
    *
    * Lossy caveat, by design: unlike the lossless decoders there is no
    * bit-exact "right answer" to pin — different conformant decoders
    * differ by ±1–2 per sample from IDCT rounding and by more at chroma
    * edges from upsampling filters. MultimodalSpec therefore compares
    * against ImageIO's independent decode with a small per-pixel
    * tolerance rather than by checksum (the T.81 Annex A accuracy
    * framing), and pins the rejection surface exactly like PNG/GIF/TIFF.
    *
    * Features mirror the other image decoders: each output pixel row is
    * one "frame" (gray 1 byte/px or RGB 3 bytes/px), `nFrames` = height,
    * same rolling row hash, thumbnail byte = first sample of the
    * top-left pixel. All plane/raster sizes are division-form bounded
    * before allocation, so a crafted header throws instead of OOMing. */
  final class JpegDecoder extends MediaDecoder {
    import JpegDecoder._

    override def decode(rec: MediaRecord): MediaFeatures = {
      val (w, h, ch, pix) = decodeRaster(rec.media)
      val rowLen = w * ch
      val rows = (0 until h).map(r =>
        java.util.Arrays.copyOfRange(pix, r * rowLen, (r + 1) * rowLen))
      val checksum = rollingChecksum(rows)
      MediaFeatures(rec.id, "jpeg", h, checksum, rows.head(0) & 0xff)
    }

    /** Full decode to (width, height, channels, interleaved samples) —
      * exposed for the spec's tolerance compare against ImageIO. */
    private[graft] def decodeRaster(b: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
      require(b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
        s"not a JPEG payload (no SOI, len=${b.length})")
      var pos = 2
      def u8(i: Int): Int = { require(i < b.length, "truncated JPEG"); b(i) & 0xff }
      def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)

      // ---- marker-segment parse up to SOS ----
      val qtab = Array.ofDim[Int](4, 64) // zigzag order
      val qSeen = new Array[Boolean](4)
      val huff = Array.ofDim[Huff](2, 4) // (class dc=0/ac=1)(id)
      var w = 0; var h = 0; var nComp = 0
      var compId: Array[Int] = null; var compHs: Array[Int] = null
      var compVs: Array[Int] = null; var compTq: Array[Int] = null
      var compTd: Array[Int] = null; var compTa: Array[Int] = null
      var restartInterval = 0
      var sofSeen = false
      var scanStart = -1
      while (scanStart < 0) {
        require(u8(pos) == 0xff, f"expected a marker at $pos, got ${u8(pos)}%02x")
        var mPos = pos + 1
        while (u8(mPos) == 0xff) mPos += 1 // fill bytes
        val m = u8(mPos)
        pos = mPos + 1
        m match {
          case 0xd9 => throw new IllegalArgumentException("EOI before SOS")
          case 0x01 => () // TEM, standalone
          case x if x >= 0xd0 && x <= 0xd7 =>
            throw new IllegalArgumentException("RST marker outside scan")
          case 0xdb => // DQT
            val len = u16(pos); var p = pos + 2
            while (p < pos + len) {
              val pq = u8(p) >> 4; val tq = u8(p) & 15
              require(pq == 0, s"16-bit quantization table $tq unsupported (8-bit only)")
              require(tq < 4, s"bad quant table id $tq")
              var i = 0
              while (i < 64) { qtab(tq)(i) = u8(p + 1 + i); i += 1 }
              qSeen(tq) = true
              p += 65
            }
            require(p == pos + len, "DQT length inconsistent")
            pos += len
          case 0xc4 => // DHT
            val len = u16(pos); var p = pos + 2
            while (p < pos + len) {
              val tc = u8(p) >> 4; val th = u8(p) & 15
              require(tc <= 1, s"bad Huffman class $tc")
              require(th < 4, s"bad Huffman table id $th")
              val bits = Array.tabulate(16)(i => u8(p + 1 + i))
              val n = bits.sum
              require(n <= 256, s"Huffman table with $n codes")
              val vals = Array.tabulate(n)(i => u8(p + 17 + i))
              huff(tc)(th) = buildHuff(bits, vals)
              p += 17 + n
            }
            require(p == pos + len, "DHT length inconsistent")
            pos += len
          case 0xdd => // DRI
            require(u16(pos) == 4, "bad DRI length")
            restartInterval = u16(pos + 2)
            pos += 4
          case 0xc0 => // SOF0 baseline sequential
            require(!sofSeen, "duplicate SOF")
            val len = u16(pos)
            require(u8(pos + 2) == 8, s"precision ${u8(pos + 2)} unsupported (8-bit only)")
            h = u16(pos + 3); w = u16(pos + 5)
            nComp = u8(pos + 7)
            require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
            require(nComp == 1 || nComp == 3,
              s"$nComp components unsupported (grayscale or YCbCr only)")
            require(len == 8 + 3 * nComp, "SOF0 length inconsistent")
            compId = new Array[Int](nComp); compHs = new Array[Int](nComp)
            compVs = new Array[Int](nComp); compTq = new Array[Int](nComp)
            var c = 0
            while (c < nComp) {
              compId(c) = u8(pos + 8 + 3 * c)
              val hv = u8(pos + 9 + 3 * c)
              compHs(c) = hv >> 4; compVs(c) = hv & 15
              require(compHs(c) >= 1 && compHs(c) <= 4 &&
                compVs(c) >= 1 && compVs(c) <= 4,
                s"sampling ${compHs(c)}x${compVs(c)} out of range")
              compTq(c) = u8(pos + 10 + 3 * c)
              require(compTq(c) < 4, s"bad quant selector ${compTq(c)}")
              c += 1
            }
            sofSeen = true
            pos += len
          case x if (x >= 0xc1 && x <= 0xcf) && x != 0xc4 && x != 0xc8 && x != 0xcc =>
            throw new IllegalArgumentException(
              f"SOF${x - 0xc0} unsupported (baseline sequential SOF0 only)")
          case 0xcc => throw new IllegalArgumentException(
            "arithmetic coding conditioning (DAC) unsupported")
          case 0xda => // SOS
            require(sofSeen, "SOS before SOF0")
            val len = u16(pos)
            val ns = u8(pos + 2)
            require(ns == nComp,
              s"scan has $ns components, frame $nComp (interleaved single scan only)")
            compTd = new Array[Int](nComp); compTa = new Array[Int](nComp)
            var s = 0
            var prevIdx = -1
            while (s < ns) {
              val cs = u8(pos + 3 + 2 * s)
              val c = compId.indexOf(cs)
              require(c >= 0, s"scan component $cs not in frame")
              // T.81 B.2.3: scan components must appear in frame-header
              // order — the MCU decode loop below walks data units in
              // frame order, so a reordered scan would silently pair the
              // wrong Huffman/quant tables with each component
              require(c > prevIdx,
                s"scan component $cs out of frame order (T.81 B.2.3)")
              prevIdx = c
              compTd(c) = u8(pos + 4 + 2 * s) >> 4
              compTa(c) = u8(pos + 4 + 2 * s) & 15
              require(compTd(c) < 4 && compTa(c) < 4,
                s"scan component $cs selects Huffman table " +
                  s"${compTd(c)}/${compTa(c)} (0-3 only)")
              s += 1
            }
            require(u8(pos + 3 + 2 * ns) == 0 && u8(pos + 4 + 2 * ns) == 63 &&
              u8(pos + 5 + 2 * ns) == 0,
              "spectral selection / successive approximation must be 0/63/0 (baseline)")
            scanStart = pos + len
          case _ => // APPn, COM, anything else with a length field
            val len = u16(pos)
            require(len >= 2, s"bad segment length $len")
            pos += len
        }
      }
      (0 until nComp).foreach(c => require(qSeen(compTq(c)),
        s"component $c references undefined quant table ${compTq(c)}"))
      (0 until nComp).foreach { c =>
        require(huff(0)(compTd(c)) != null, s"undefined DC table ${compTd(c)}")
        require(huff(1)(compTa(c)) != null, s"undefined AC table ${compTa(c)}")
      }

      // ---- geometry (F.2.3: a single-component scan is non-interleaved:
      // one data unit per MCU, no subsampling regardless of hs/vs) ----
      val hs = if (nComp == 1) Array(1) else compHs
      val vs = if (nComp == 1) Array(1) else compVs
      val hMax = hs.max; val vMax = vs.max
      val mcusX = (w + hMax * 8 - 1) / (hMax * 8)
      val mcusY = (h + vMax * 8 - 1) / (vMax * 8)
      // division-form allocation bounds: every plane and the final raster
      // must fit an Int array even for crafted 65535x65535 headers
      require(w.toLong * nComp <= Int.MaxValue / math.max(h, 1),
        s"raster ${w}x$h x$nComp too large")
      val planeW = new Array[Int](nComp); val planeH = new Array[Int](nComp)
      val planes = new Array[Array[Byte]](nComp)
      var c = 0
      while (c < nComp) {
        planeW(c) = mcusX * hs(c) * 8; planeH(c) = mcusY * vs(c) * 8
        require(planeW(c) > 0 && planeW(c) <= Int.MaxValue / planeH(c),
          s"component $c plane ${planeW(c)}x${planeH(c)} too large")
        planes(c) = new Array[Byte](planeW(c) * planeH(c))
        c += 1
      }

      // ---- entropy-coded scan ----
      var sp = scanStart
      var bitBuf = 0; var bitCnt = 0
      def nextByte(): Int = {
        require(sp < b.length, "truncated entropy-coded data")
        val v = b(sp) & 0xff; sp += 1
        if (v == 0xff) {
          require(sp < b.length, "truncated after 0xFF in scan")
          val nx = b(sp) & 0xff
          if (nx == 0x00) { sp += 1; 0xff }
          else throw new IllegalArgumentException(
            f"marker ff$nx%02x inside entropy-coded data (truncated scan?)")
        } else v
      }
      def getBit(): Int = {
        if (bitCnt == 0) { bitBuf = nextByte(); bitCnt = 8 }
        bitCnt -= 1
        (bitBuf >> bitCnt) & 1
      }
      def receive(n: Int): Int = {
        var v = 0; var i = 0
        while (i < n) { v = (v << 1) | getBit(); i += 1 }
        v
      }
      def decodeSym(hf: Huff): Int = {
        var code = getBit(); var l = 1
        while (code > hf.maxcode(l)) {
          code = (code << 1) | getBit(); l += 1
          require(l <= 16, "invalid Huffman code in scan")
        }
        hf.vals(hf.valptr(l) + code - hf.mincode(l))
      }
      def extend(v: Int, t: Int): Int =
        if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

      val pred = new Array[Int](nComp)
      val coefs = new Array[Int](64)
      val pixels = new Array[Int](64)
      var rstIdx = 0
      var mcusSinceRestart = 0
      val totalMcus = mcusX.toLong * mcusY
      var mcu = 0L
      while (mcu < totalMcus) {
        if (restartInterval > 0 && mcusSinceRestart == restartInterval) {
          // align to byte, expect RSTn, reset DC predictors
          bitCnt = 0
          require(sp + 1 < b.length, "truncated at restart marker")
          require((b(sp) & 0xff) == 0xff, "expected RST marker")
          var mp = sp + 1
          // bounded fill-byte skip: a payload TAIL of 0xFFs must throw
          // the contractual IAE, not walk off the array
          while (mp < b.length && (b(mp) & 0xff) == 0xff) mp += 1
          require(mp < b.length, "truncated inside restart fill bytes")
          require((b(mp) & 0xff) == 0xd0 + rstIdx,
            f"expected RST$rstIdx, got ff${b(mp) & 0xff}%02x")
          sp = mp + 1
          rstIdx = (rstIdx + 1) % 8
          java.util.Arrays.fill(pred, 0)
          mcusSinceRestart = 0
        }
        val mx = (mcu % mcusX).toInt; val my = (mcu / mcusX).toInt
        c = 0
        while (c < nComp) {
          val q = qtab(compTq(c))
          var by = 0
          while (by < vs(c)) {
            var bx = 0
            while (bx < hs(c)) {
              // decode one 8x8 block: DC diff + AC run/size, dequantized
              // into natural order
              java.util.Arrays.fill(coefs, 0)
              val t = decodeSym(huff(0)(compTd(c)))
              require(t <= 11, s"DC category $t out of range")
              pred(c) += extend(receive(t), t)
              coefs(0) = pred(c) * q(0)
              var k = 1
              while (k < 64) {
                val rs = decodeSym(huff(1)(compTa(c)))
                val r = rs >> 4; val s = rs & 15
                if (s == 0) {
                  if (r == 15) k += 16 // ZRL: sixteen zeros
                  else k = 64 // EOB
                } else {
                  k += r
                  require(k < 64, "AC coefficient run overflows the block")
                  coefs(ZIGZAG(k)) = extend(receive(s), s) * q(k)
                  k += 1
                }
              }
              idct8x8(coefs, pixels)
              // place into the component plane (replicated-edge MCUs may
              // extend past w/h; the plane is MCU-aligned so no clipping)
              val px0 = (mx * hs(c) + bx) * 8
              val py0 = (my * vs(c) + by) * 8
              val plane = planes(c); val pw = planeW(c)
              var yy = 0
              while (yy < 8) {
                var xx = 0
                val rowOff = (py0 + yy) * pw + px0
                while (xx < 8) {
                  plane(rowOff + xx) = pixels(yy * 8 + xx).toByte
                  xx += 1
                }
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        mcusSinceRestart += 1
        mcu += 1
      }

      // ---- upsample + color convert ----
      val out = new Array[Byte](w * h * nComp)
      if (nComp == 1) {
        val plane = planes(0); val pw = planeW(0)
        var y = 0
        while (y < h) {
          System.arraycopy(plane, y * pw, out, y * w, w)
          y += 1
        }
      } else {
        val py = planes(0); val pcb = planes(1); val pcr = planes(2)
        var y = 0
        while (y < h) {
          val yY = y * vs(0) / vMax * planeW(0)
          val yCb = y * vs(1) / vMax * planeW(1)
          val yCr = y * vs(2) / vMax * planeW(2)
          var x = 0
          while (x < w) {
            val lum = py(yY + x * hs(0) / hMax) & 0xff
            val cb = (pcb(yCb + x * hs(1) / hMax) & 0xff) - 128
            val cr = (pcr(yCr + x * hs(2) / hMax) & 0xff) - 128
            val o = (y * w + x) * 3
            out(o) = clamp8(lum + 1.402 * cr)
            out(o + 1) = clamp8(lum - 0.344136 * cb - 0.714136 * cr)
            out(o + 2) = clamp8(lum + 1.772 * cb)
            x += 1
          }
          y += 1
        }
      }
      (w, h, nComp, out)
    }
  }

  object JpegDecoder {
    /** Canonical Huffman decode tables (T.81 Annex C): per code length
      * 1..16, the smallest/largest code and the index of the first value. */
    private[operators] final case class Huff(mincode: Array[Int],
        maxcode: Array[Int], valptr: Array[Int], vals: Array[Int])

    private[operators] def buildHuff(bits: Array[Int], vals: Array[Int]): Huff = {
      val mincode = new Array[Int](17)
      val maxcode = new Array[Int](17)
      val valptr = new Array[Int](17)
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valptr(l) = k
        mincode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxcode(l) = if (bits(l - 1) == 0) -1 else code - 1
        require(code <= (1 << l), s"over-subscribed Huffman code lengths at $l")
        code <<= 1
        l += 1
      }
      Huff(mincode, maxcode, valptr, vals)
    }

    /** Zigzag index -> natural (row-major) index, T.81 Figure A.6. */
    private val ZIGZAG: Array[Int] = Array(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

    /** COS(u)(x) = C(u)/2 · cos((2x+1)uπ/16) — the separable IDCT basis
      * with normalization folded in (C(0)=1/√2). */
    private val COS: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
      (if (u == 0) math.sqrt(0.5) else 1.0) / 2.0 *
        math.cos((2 * x + 1) * u * math.Pi / 16)
    }

    /** Double-precision separable 8×8 inverse DCT with +128 level shift
      * and clamp — slow-but-exact reference arithmetic (the accuracy
      * anchor; a production path would swap in AAN fixed-point). */
    private def idct8x8(coefs: Array[Int], outPix: Array[Int]): Unit = {
      val tmp = new Array[Double](64)
      // horizontal pass: rows indexed by vertical frequency v
      var v = 0
      while (v < 8) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          var u = 0
          while (u < 8) { s += coefs(v * 8 + u) * COS(u)(x); u += 1 }
          tmp(v * 8 + x) = s
          x += 1
        }
        v += 1
      }
      // vertical pass
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          var vv = 0
          while (vv < 8) { s += tmp(vv * 8 + x) * COS(vv)(y); vv += 1 }
          val p = math.round(s + 128.0).toInt
          outPix(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
          x += 1
        }
        y += 1
      }
    }

    private def clamp8(v: Double): Byte = {
      val r = math.round(v).toInt
      (if (r < 0) 0 else if (r > 255) 255 else r).toByte
    }
  }

  /** MPEG-1/2/2.5 Layer III frame-header walk: REAL audio metadata —
    * frame count, total samples, duration, average bitrate — without
    * synthesizing a single audio sample. The MP3 frame header is public
    * byte arithmetic (ISO/IEC 11172-3 §2.4.1.3 layout; bitrate /
    * sampling-rate index tables; `frame_len = spf/8 · bitrate / rate +
    * padding`), so walking a stream frame-to-frame needs no codec — the
    * same "parse the container, stub only the lossy synthesis" line the
    * JPEG/video decoders draw. This shrinks [[FakeDecoder]]'s domain to
    * codecs whose CONTAINERS are genuinely out of reach here.
    *
    * Accepted stream shape: optional ID3v2 prefix (syncsafe-sized,
    * skipped), back-to-back Layer III frames (VBR welcome — bitrate is
    * per frame; version/sampling-rate must stay constant, as every real
    * encoder keeps them), optional trailing ID3v1 tag. Anything else —
    * lost sync, reserved version/emphasis, free-format or bad bitrate
    * index, a frame overrunning the payload — throws the contractual
    * `IllegalArgumentException` naming the offset.
    *
    * Features: `nFrames` = MPEG frame count; checksum folds every
    * frame header word plus the stream's total-samples count (so two
    * streams with identical headers but different durations can't
    * collide trivially); thumb byte = first payload byte of the first
    * frame. [[Mp3Decoder.walk]] exposes the full
    * duration/bitrate/sample-rate record for tests and richer
    * pipelines. */
  final class Mp3Decoder extends MediaDecoder {
    override def decode(rec: MediaRecord): MediaFeatures = {
      val info = Mp3Decoder.walk(rec.media)
      MediaFeatures(rec.id, "mp3", info.nFrames, info.checksum, info.thumb)
    }
  }

  object Mp3Decoder {
    /** What a header walk knows about a stream without decoding audio. */
    case class Mp3Info(nFrames: Int, sampleRateHz: Int, totalSamples: Long,
        durationMs: Long, avgBitrateBps: Long, checksum: Long, thumb: Int)

    // Layer III bitrate tables, kbps, indexed by the 4-bit field
    // (0 = free-format, unsupported; 15 = forbidden)
    private val KbpsV1 =
      Array(-1, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)
    private val KbpsV2 =
      Array(-1, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, -1)
    // MPEG-1 sampling rates by the 2-bit index; V2 halves, V2.5 quarters
    private val RateV1 = Array(44100, 48000, 32000, -1)

    def walk(b: Array[Byte]): Mp3Info = {
      var pos = 0
      // ID3v2: "ID3" vv flags + 4 SYNCSAFE size bytes (7 bits each).
      // The size does NOT include the 10-byte header, nor — ID3v2.4
      // §3.1 — the optional 10-byte footer the flags byte (bit 4)
      // announces; skipping only the sized body would land the frame
      // walk on the '3DI' footer and mis-report a valid stream as lost
      // sync.
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        val flags = b(5) & 0xff
        var sz = 0
        var i = 0
        while (i < 4) {
          val s = b(6 + i) & 0xff
          require(s < 0x80, s"ID3v2 size byte $i not syncsafe")
          sz = (sz << 7) | s
          i += 1
        }
        pos = 10 + sz + (if ((flags & 0x10) != 0) 10 else 0)
        require(pos <= b.length, s"ID3v2 tag ($sz bytes) overruns payload")
      }
      var end = b.length
      if (end - pos >= 128 && b(end - 128) == 'T' && b(end - 127) == 'A' &&
          b(end - 126) == 'G')
        end -= 128
      var nFrames = 0
      var rate = -1
      var samples = 0L
      var bits = 0L
      var checksum = 0L
      var thumb = -1
      while (pos < end) {
        require(end - pos >= 4, s"truncated frame header at $pos")
        val h = ((b(pos) & 0xffL) << 24) | ((b(pos + 1) & 0xff) << 16) |
          ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
        require((h >>> 21) == 0x7ff, f"lost sync at $pos (0x$h%08x)")
        val ver = ((h >>> 19) & 3).toInt // 0=V2.5 1=reserved 2=V2 3=V1
        require(ver != 1, s"reserved MPEG version at $pos")
        require(((h >>> 17) & 3) == 1, s"not Layer III at $pos")
        val bi = ((h >>> 12) & 15).toInt
        require(bi != 0, s"free-format bitrate unsupported at $pos")
        require(bi != 15, s"forbidden bitrate index at $pos")
        val ri = ((h >>> 10) & 3).toInt
        require(ri != 3, s"reserved sampling-rate index at $pos")
        require((h & 3) != 2, s"reserved emphasis at $pos")
        val padding = ((h >>> 9) & 1).toInt
        val v1 = ver == 3
        val kbps = (if (v1) KbpsV1 else KbpsV2)(bi)
        val sr = ver match {
          case 3 => RateV1(ri)
          case 2 => RateV1(ri) / 2
          case _ => RateV1(ri) / 4
        }
        require(rate < 0 || (sr == rate),
          s"sampling rate changed mid-stream at $pos ($rate -> $sr)")
        rate = sr
        val spf = if (v1) 1152 else 576
        val flen = spf / 8 * (kbps * 1000) / sr + padding
        require(flen > 4, s"degenerate frame length $flen at $pos")
        require(pos + flen <= end, s"frame at $pos (len $flen) overruns payload")
        if (thumb < 0 && flen > 4) thumb = b(pos + 4) & 0xff
        checksum = (checksum * 131 + (h & 0xffffffffL)) % 1000000007L
        samples += spf
        bits += flen.toLong * 8
        nFrames += 1
        pos += flen
      }
      require(nFrames > 0, "no MPEG frames in payload")
      checksum = (checksum * 131 + samples) % 1000000007L
      val durationMs = samples * 1000 / rate
      val avgBps = if (durationMs == 0) 0L else bits * 1000 / durationMs
      Mp3Info(nFrames, rate, samples, durationMs, avgBps, checksum,
        math.max(thumb, 0))
    }
  }

  /** FLAC STREAMINFO + metadata-block walk: REAL lossless-audio
    * metadata — sample rate, channels, bit depth, total samples,
    * duration — from the container alone (the Mp3Decoder line: parse
    * the public byte layout, stub only sample synthesis; FLAC's
    * metadata section is pure big-endian bit arithmetic, RFC 9639 §8).
    *
    * Accepted shape: "fLaC" magic, a STREAMINFO block FIRST (the spec
    * mandates it), any further metadata blocks (padding, seektable,
    * Vorbis comments, …) each sized by its 24-bit header, the
    * last-block flag terminating the chain, then (optionally) audio
    * frames, whose first two bytes must carry the 14-bit frame sync.
    * Violations — bad magic, STREAMINFO not first or mis-sized, a
    * block overrunning the payload, zero sample rate, lost frame sync
    * — throw the contractual `IllegalArgumentException`. */
  final class FlacDecoder extends MediaDecoder {
    override def decode(rec: MediaRecord): MediaFeatures = {
      val info = FlacDecoder.walk(rec.media)
      MediaFeatures(rec.id, "flac", info.nBlocks, info.checksum, info.thumb)
    }
  }

  object FlacDecoder {
    /** Everything the metadata section knows without decoding audio. */
    case class FlacInfo(nBlocks: Int, sampleRateHz: Int, channels: Int,
        bitsPerSample: Int, totalSamples: Long, durationMs: Long,
        checksum: Long, thumb: Int)

    def walk(b: Array[Byte]): FlacInfo = {
      require(b.length >= 4 + 4 + 34, "payload shorter than fLaC + STREAMINFO")
      require(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C',
        "bad magic: not a fLaC stream")
      def u8(i: Int): Int = b(i) & 0xff
      var pos = 4
      var last = false
      var nBlocks = 0
      var checksum = 0L
      var rate = -1; var ch = -1; var bps = -1; var samples = -1L
      while (!last) {
        require(pos + 4 <= b.length, s"metadata block header at $pos overruns payload")
        val h = u8(pos)
        last = (h & 0x80) != 0
        val btype = h & 0x7f
        require(btype != 127, s"invalid (reserved) block type 127 at $pos")
        val len = (u8(pos + 1) << 16) | (u8(pos + 2) << 8) | u8(pos + 3)
        require(pos + 4 + len <= b.length,
          s"metadata block at $pos ($len bytes) overruns payload")
        if (nBlocks == 0) {
          // RFC 9639 §8.1: the first block MUST be STREAMINFO (34 bytes)
          require(btype == 0, s"first metadata block is type $btype, not STREAMINFO")
          require(len == 34, s"STREAMINFO length $len != 34")
          val s = pos + 4
          // 16+16 blocksizes and 24+24 framesizes precede the packed
          // 20-bit rate / 3-bit channels-1 / 5-bit bps-1 / 36-bit samples
          rate = (u8(s + 10) << 12) | (u8(s + 11) << 4) | (u8(s + 12) >> 4)
          ch = ((u8(s + 12) >> 1) & 0x7) + 1
          bps = (((u8(s + 12) & 0x1) << 4) | (u8(s + 13) >> 4)) + 1
          samples = ((u8(s + 13) & 0xf).toLong << 32) |
            (u8(s + 14).toLong << 24) | (u8(s + 15).toLong << 16) |
            (u8(s + 16).toLong << 8) | u8(s + 17).toLong
          require(rate > 0, "STREAMINFO sample rate is zero")
          // fold the MD5 signature bytes too: streams with identical
          // shape but different audio must not collide trivially
          var i = s + 18
          while (i < s + 34) { checksum = (checksum * 31 + u8(i)) % 1000000007L; i += 1 }
        }
        checksum = (checksum * 131 + btype * 16777259L + len) % 1000000007L
        nBlocks += 1
        pos += 4 + len
      }
      // audio frames, if present, open with the 14-bit sync 0b11111111111110
      if (pos < b.length) {
        require(pos + 2 <= b.length && u8(pos) == 0xff && (u8(pos + 1) & 0xfc) == 0xf8,
          s"lost FLAC frame sync at $pos")
      }
      val durationMs = samples * 1000 / rate
      checksum = (checksum * 131 + samples) % 1000000007L
      FlacInfo(nBlocks, rate, ch, bps, samples, durationMs, checksum,
        if (pos < b.length) u8(pos) else 0)
    }
  }

  /** ISO BMFF (MP4/MOV) box walk: REAL container metadata — brand,
    * movie timescale/duration, track count and per-track handler types
    * — from pure box structure (ISO/IEC 14496-12: 4-byte big-endian
    * size + 4-char type, size 1 → 64-bit largesize, size 0 → to end of
    * file at top level), no codec anywhere.
    *
    * Accepted shape: an `ftyp` box FIRST (the spec's requirement for
    * non-QT brands), a `moov` somewhere at top level containing one
    * `mvhd` (version 0 or 1) and the `trak` boxes, each trak carrying
    * `mdia`/`hdlr` whose handler type names the track kind (vide/soun/
    * text/…). Violations — missing ftyp/moov/mvhd, a box overrunning
    * its parent, a sub-8-byte box size, zero timescale — throw the
    * contractual `IllegalArgumentException` naming the offset. */
  final class Mp4Decoder extends MediaDecoder {
    override def decode(rec: MediaRecord): MediaFeatures = {
      val info = Mp4Decoder.walk(rec.media)
      MediaFeatures(rec.id, "mp4", info.nTracks, info.checksum, info.thumb)
    }
  }

  object Mp4Decoder {
    /** What the box tree knows without touching a sample. */
    case class Mp4Info(brand: String, timescaleHz: Long, durationMs: Long,
        nTracks: Int, handlers: Seq[String], checksum: Long, thumb: Int)

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def u32(b: Array[Byte], i: Int): Long =
      (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
        (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong
    private def u64(b: Array[Byte], i: Int): Long =
      (u32(b, i) << 32) | u32(b, i + 4)
    private def fourcc(b: Array[Byte], i: Int): String =
      new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "US-ASCII")

    /** (type, bodyStart, bodyEnd) for each box in [start, end). */
    private def boxes(b: Array[Byte], start: Int, end: Int,
        topLevel: Boolean): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var pos = start
      while (pos < end) {
        require(pos + 8 <= end, s"box header at $pos overruns parent")
        val sz32 = u32(b, pos)
        val typ = fourcc(b, pos + 4)
        val (bodyStart, boxEnd) =
          if (sz32 == 1) {
            require(pos + 16 <= end, s"largesize box at $pos overruns parent")
            val sz = u64(b, pos + 8)
            require(sz >= 16, s"largesize box at $pos under-sized ($sz)")
            (pos + 16, pos + sz)
          } else if (sz32 == 0) {
            require(topLevel, s"size-0 box at $pos below top level")
            (pos + 8, end.toLong)
          } else {
            require(sz32 >= 8, s"box at $pos under-sized ($sz32)")
            (pos + 8, pos + sz32)
          }
        require(boxEnd <= end, s"box '$typ' at $pos overruns parent")
        out += ((typ, bodyStart, boxEnd.toInt))
        pos = boxEnd.toInt
      }
      out.result()
    }

    def walk(b: Array[Byte]): Mp4Info = {
      require(b.length >= 8, "payload shorter than one box header")
      val top = boxes(b, 0, b.length, topLevel = true)
      require(top.headOption.exists(_._1 == "ftyp"),
        s"first box is '${top.headOption.map(_._1).getOrElse("")}', not ftyp")
      val (_, fs, fe) = top.head
      require(fe - fs >= 8, "ftyp too short for brand + version")
      val brand = fourcc(b, fs)
      val moov = top.find(_._1 == "moov").getOrElse(
        throw new IllegalArgumentException("no moov box at top level"))
      val kids = boxes(b, moov._2, moov._3, topLevel = false)
      val mvhd = kids.find(_._1 == "mvhd").getOrElse(
        throw new IllegalArgumentException("moov carries no mvhd"))
      val (ts, dur) = {
        val s = mvhd._2
        require(mvhd._3 - s >= 4, "mvhd too short for version")
        u8(b, s) match {
          case 0 =>
            require(mvhd._3 - s >= 20, "mvhd v0 too short")
            (u32(b, s + 12), u32(b, s + 16))
          case 1 =>
            require(mvhd._3 - s >= 32, "mvhd v1 too short")
            (u32(b, s + 20), u64(b, s + 24))
          case v => throw new IllegalArgumentException(s"mvhd version $v")
        }
      }
      require(ts > 0, "mvhd timescale is zero")
      val handlers = kids.filter(_._1 == "trak").map { case (_, ts0, te0) =>
        val mdia = boxes(b, ts0, te0, topLevel = false).find(_._1 == "mdia")
          .getOrElse(throw new IllegalArgumentException("trak carries no mdia"))
        val hdlr = boxes(b, mdia._2, mdia._3, topLevel = false).find(_._1 == "hdlr")
          .getOrElse(throw new IllegalArgumentException("mdia carries no hdlr"))
        // FullBox: version/flags (4), pre_defined (4), handler_type (4)
        require(hdlr._3 - hdlr._2 >= 12, "hdlr too short for handler type")
        fourcc(b, hdlr._2 + 8)
      }
      var checksum = 0L
      (brand +: handlers).foreach(s =>
        s.foreach(c => checksum = (checksum * 31 + c.toLong) % 1000000007L))
      checksum = ((checksum * 131 + ts) * 131 + dur) % 1000000007L
      Mp4Info(brand, ts, dur * 1000 / ts, handlers.size, handlers, checksum,
        u8(b, 4))
    }
  }

  /** AVI RIFF walk: REAL video-container metadata — frame count, frame
    * period, stream count and per-stream types, raster dimensions,
    * duration — from the `hdrl` header list alone (the WavDecoder's
    * RIFF chunk arithmetic, one level deeper: LIST chunks carry a list
    * type then sub-chunks; `avih` is the 56-byte main header, each
    * `strl`'s `strh` opens with the stream's fccType). No codec: frame
    * DATA stays untouched, exactly the Mp3/Mp4 container line.
    *
    * Violations — bad RIFF/AVI magic, a chunk overrunning its parent,
    * missing hdrl/avih, zero frame period, stream-count mismatch
    * between avih and the strl list — throw the contractual
    * `IllegalArgumentException` naming the offset. */
  final class AviDecoder extends MediaDecoder {
    override def decode(rec: MediaRecord): MediaFeatures = {
      val info = AviDecoder.walk(rec.media)
      MediaFeatures(rec.id, "avi", info.totalFrames, info.checksum, info.thumb)
    }
  }

  object AviDecoder {
    /** What the header list knows without touching frame data. */
    case class AviInfo(usPerFrame: Long, totalFrames: Int, nStreams: Int,
        widthPx: Int, heightPx: Int, streamTypes: Seq[String],
        durationMs: Long, checksum: Long, thumb: Int)

    private def u32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    /** (id, listType-or-"", bodyStart, bodyEnd) for the chunks in
      * [start, end); LIST bodies exclude their 4-byte list type. */
    private def chunks(b: Array[Byte], start: Int,
        end: Int): Seq[(String, String, Int, Int)] = {
      val out = Seq.newBuilder[(String, String, Int, Int)]
      var pos = start
      while (pos < end) {
        require(pos + 8 <= end, s"chunk header at $pos overruns parent")
        val id = tag(b, pos)
        val sz = u32(b, pos + 4)
        require(pos + 8 + sz <= end, s"chunk $id at $pos overruns parent (size=$sz)")
        if (id == "LIST" || id == "RIFF") {
          require(sz >= 4, s"LIST at $pos too short for a list type")
          out += ((id, tag(b, pos + 8), pos + 12, pos + 8 + sz.toInt))
        } else out += ((id, "", pos + 8, pos + 8 + sz.toInt))
        pos += 8 + sz.toInt + (sz.toInt & 1) // chunks pad to even length
      }
      out.result()
    }

    def walk(b: Array[Byte]): AviInfo = {
      require(b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "AVI ",
        s"not a RIFF AVI payload (len=${b.length})")
      require(12 + u32(b, 4) - 4 <= b.length, "RIFF size overruns payload")
      val top = chunks(b, 12, (8 + u32(b, 4)).toInt)
      val hdrl = top.find(c => c._1 == "LIST" && c._2 == "hdrl").getOrElse(
        throw new IllegalArgumentException("no LIST hdrl"))
      val inHdrl = chunks(b, hdrl._3, hdrl._4)
      val avih = inHdrl.find(_._1 == "avih").getOrElse(
        throw new IllegalArgumentException("hdrl carries no avih"))
      require(avih._4 - avih._3 >= 40, "avih shorter than the main header")
      val s = avih._3
      val usPerFrame = u32(b, s)
      require(usPerFrame > 0, "avih frame period is zero")
      val totalFrames = u32(b, s + 16)
      val nStreams = u32(b, s + 24)
      val (w, h) = (u32(b, s + 32), u32(b, s + 36))
      val streamTypes = inHdrl.filter(c => c._1 == "LIST" && c._2 == "strl")
        .map { case (_, _, ss, se) =>
          val strh = chunks(b, ss, se).find(_._1 == "strh").getOrElse(
            throw new IllegalArgumentException("strl carries no strh"))
          require(strh._4 - strh._3 >= 4, "strh shorter than fccType")
          tag(b, strh._3)
        }
      require(streamTypes.size == nStreams,
        s"avih says $nStreams streams, hdrl lists ${streamTypes.size}")
      var checksum = 0L
      streamTypes.foreach(t =>
        t.foreach(c => checksum = (checksum * 31 + c.toLong) % 1000000007L))
      checksum = (((checksum * 131 + usPerFrame) * 131 + totalFrames) * 131 +
        (w * 65536 + h)) % 1000000007L
      AviInfo(usPerFrame, totalFrames.toInt, nStreams.toInt, w.toInt, h.toInt,
        streamTypes, usPerFrame * totalFrames / 1000, checksum,
        (u32(b, 4) & 0xff).toInt)
    }
  }

  /** WebP RIFF walk: REAL container metadata — bitstream variant
    * (VP8 lossy / VP8L lossless / VP8X extended), pixel dimensions and
    * animation frame count — from pure chunk structure (the same
    * even-padded RIFF grammar as [[AviDecoder]]/WAV; container spec at
    * developers.google.com/speed/webp/docs/riff_container), no codec.
    *
    * Dimensions come from whichever chunk carries them authoritatively:
    * VP8X's 24-bit canvas fields when present, else the VP8 keyframe's
    * 14-bit fields behind the 0x9D012A start code, else VP8L's packed
    * 14+14 bits behind the 0x2F signature. `nFrames` is the ANMF count
    * for an animated file, 1 otherwise. Violations — bad magic, a chunk
    * overrunning the RIFF size, a non-key first VP8 frame, missing
    * start code/signature, an animated flag with zero ANMF frames —
    * throw the contractual `IllegalArgumentException`. */
  final class WebpDecoder extends MediaDecoder {
    override def decode(rec: MediaRecord): MediaFeatures = {
      val info = WebpDecoder.walk(rec.media)
      MediaFeatures(rec.id, "webp", info.nFrames, info.checksum, info.thumb)
    }
  }

  object WebpDecoder {
    /** What the chunk walk knows without decoding a pixel. */
    case class WebpInfo(variant: String, widthPx: Int, heightPx: Int,
        animated: Boolean, nFrames: Int, checksum: Long, thumb: Int)

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def u16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    private def u24(b: Array[Byte], i: Int): Int =
      u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)
    private def u32(b: Array[Byte], i: Int): Long =
      u24(b, i).toLong | (u8(b, i + 3).toLong << 24)
    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    def walk(b: Array[Byte]): WebpInfo = {
      require(b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WEBP",
        s"not a RIFF WEBP payload (len=${b.length})")
      require(8 + u32(b, 4) <= b.length, "RIFF size overruns payload")
      val end = (8 + u32(b, 4)).toInt
      var pos = 12
      var variant = ""
      var w = -1; var h = -1
      var animated = false; var anmf = 0
      var checksum = 0L
      while (pos < end) {
        require(pos + 8 <= end, s"chunk header at $pos overruns RIFF")
        val id = tag(b, pos)
        val sz = u32(b, pos + 4)
        require(pos + 8 + sz <= end, s"chunk $id at $pos overruns RIFF (size=$sz)")
        val s = pos + 8
        id match {
          case "VP8 " =>
            require(sz >= 10, s"VP8 chunk too short for a keyframe header ($sz)")
            // frame tag bit 0: 0 = keyframe — only keyframes carry dims
            require((u8(b, s) & 1) == 0, "VP8 bitstream opens on a non-keyframe")
            require(u8(b, s + 3) == 0x9d && u8(b, s + 4) == 0x01 &&
              u8(b, s + 5) == 0x2a, "bad VP8 keyframe start code")
            if (variant.isEmpty) variant = "VP8"
            if (w < 0) { w = u16(b, s + 6) & 0x3fff; h = u16(b, s + 8) & 0x3fff }
          case "VP8L" =>
            require(sz >= 5, s"VP8L chunk too short for the dimension bits ($sz)")
            require(u8(b, s) == 0x2f, "bad VP8L signature byte")
            if (variant.isEmpty) variant = "VP8L"
            if (w < 0) {
              val bits = u32(b, s + 1)
              w = (bits & 0x3fff).toInt + 1
              h = ((bits >> 14) & 0x3fff).toInt + 1
            }
          case "VP8X" =>
            require(sz >= 10, s"VP8X chunk too short ($sz)")
            variant = "VP8X"
            animated = (u8(b, s) & 0x02) != 0
            // canvas is authoritative: override whatever a bitstream said
            w = u24(b, s + 4) + 1
            h = u24(b, s + 7) + 1
          case "ANMF" => anmf += 1
          case _ => () // ALPH/ANIM/ICCP/EXIF/XMP: sized metadata, skipped
        }
        id.foreach(c => checksum = (checksum * 31 + c.toLong) % 1000000007L)
        checksum = (checksum * 131 + sz) % 1000000007L
        pos += 8 + sz.toInt + (sz.toInt & 1) // chunks pad to even length
      }
      require(variant.nonEmpty, "no VP8 /VP8L/VP8X bitstream chunk")
      require(w > 0 && h > 0, s"no dimensions decoded (${w}x$h)")
      if (animated) require(anmf > 0, "animated flag set but no ANMF frames")
      val frames = if (animated) anmf else 1
      checksum = (((checksum * 131 + w) * 131 + h) * 131 + frames) % 1000000007L
      WebpInfo(variant, w, h, animated, frames, checksum, (u32(b, 4) & 0xff).toInt)
    }
  }

  /** Ogg page walk (RFC 3533): REAL container metadata — page/stream
    * counts, per-stream codec from the BOS identification header
    * (Vorbis / Opus / Theora / Speex / FLAC-in-Ogg recognized by their
    * published signatures), sample rate + channels for the audio codecs,
    * and duration from the final granule position — from pure page
    * structure, no codec anywhere.
    *
    * Duration: a Vorbis granule counts PCM samples at the id header's
    * rate; an Opus granule counts 48 kHz samples with the id header's
    * pre-skip subtracted (RFC 7845 §4/§5.1). The reported duration is
    * the max across streams that define one. Violations — bad capture
    * pattern, nonzero version, a segment table or body overrunning the
    * payload, a BOS id header too short for its signature's fields —
    * throw the contractual `IllegalArgumentException` naming the
    * offset. */
  final class OggDecoder extends MediaDecoder {
    override def decode(rec: MediaRecord): MediaFeatures = {
      val info = OggDecoder.walk(rec.media)
      MediaFeatures(rec.id, "ogg", info.nPages, info.checksum, info.thumb)
    }
  }

  object OggDecoder {
    /** What the page walk knows without decoding a packet. */
    case class OggInfo(nStreams: Int, nPages: Int, codecs: Seq[String],
        sampleRateHz: Int, channels: Int, durationMs: Long,
        checksum: Long, thumb: Int)

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def u16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    private def u32(b: Array[Byte], i: Int): Long =
      u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
        (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
    private def i64(b: Array[Byte], i: Int): Long =
      u32(b, i) | (u32(b, i + 4) << 32)

    private def sigIs(b: Array[Byte], off: Int, len: Int, sig: String): Boolean =
      len >= sig.length &&
        sig.zipWithIndex.forall { case (c, i) => (b(off + i) & 0xff) == (c & 0xff) }

    def walk(b: Array[Byte]): OggInfo = {
      require(b.length >= 27, s"payload shorter than one Ogg page header (${b.length})")
      var pos = 0
      var nPages = 0
      var checksum = 0L
      // insertion-ordered per-serial state: codec, rate, channels,
      // pre-skip, last granule
      val serials = scala.collection.mutable.LinkedHashMap
        .empty[Long, (String, Int, Int, Int)]
      val lastGranule = scala.collection.mutable.Map.empty[Long, Long]
      while (pos < b.length) {
        require(pos + 27 <= b.length, s"page header at $pos overruns payload")
        require(b(pos) == 'O' && b(pos + 1) == 'g' && b(pos + 2) == 'g' &&
          b(pos + 3) == 'S', s"lost Ogg capture pattern at $pos")
        require(u8(b, pos + 4) == 0, s"unsupported Ogg version ${u8(b, pos + 4)}")
        val htype = u8(b, pos + 5)
        val granule = i64(b, pos + 6)
        val serial = u32(b, pos + 14)
        val nSegs = u8(b, pos + 26)
        require(pos + 27 + nSegs <= b.length, s"segment table at $pos overruns payload")
        var bodyLen = 0
        var i = 0
        while (i < nSegs) { bodyLen += u8(b, pos + 27 + i); i += 1 }
        val body = pos + 27 + nSegs
        require(body + bodyLen <= b.length, s"page body at $body overruns payload")
        if ((htype & 0x02) != 0) { // BOS: the codec id header opens this body
          val (codec, rate, ch, preskip) =
            if (sigIs(b, body, bodyLen, "\u0001vorbis")) {
              // id packet: 0x01 "vorbis", u32 version, u8 channels at
              // +11, u32 rate at +12 (Vorbis I spec section 4.2.2)
              require(bodyLen >= 16, s"Vorbis id header too short ($bodyLen)")
              ("vorbis", u32(b, body + 12).toInt, u8(b, body + 11), 0)
            } else if (sigIs(b, body, bodyLen, "OpusHead")) {
              require(bodyLen >= 12, s"Opus id header too short ($bodyLen)")
              // granules run on the 48 kHz Opus clock regardless of the
              // id header's input-rate field
              ("opus", 48000, u8(b, body + 9), u16(b, body + 10))
            } else if (sigIs(b, body, bodyLen, "\u0080theora")) ("theora", 0, 0, 0)
            else if (sigIs(b, body, bodyLen, "Speex   ")) ("speex", 0, 0, 0)
            else if (sigIs(b, body, bodyLen, "\u007fFLAC")) ("flac", 0, 0, 0)
            else ("other", 0, 0, 0)
          serials.put(serial, (codec, rate, ch, preskip))
        }
        if (granule >= 0) lastGranule.put(serial, granule)
        checksum = (((checksum * 131 + serial) * 131 +
          (granule & 0x7fffffffL)) * 131 + bodyLen) % 1000000007L
        nPages += 1
        pos = body + bodyLen
      }
      require(serials.nonEmpty, "no BOS page — not a well-formed Ogg stream")
      val durations = serials.flatMap { case (ser, (codec, rate, _, preskip)) =>
        lastGranule.get(ser).flatMap { g =>
          codec match {
            case "vorbis" if rate > 0 => Some(g * 1000 / rate)
            case "opus" => Some(math.max(0L, g - preskip) * 1000 / 48000)
            case _ => None
          }
        }
      }
      val codecs = serials.values.map(_._1).toSeq
      codecs.foreach(_.foreach(c =>
        checksum = (checksum * 31 + c.toLong) % 1000000007L))
      val (rate, ch) = serials.values
        .collectFirst { case (c, r, n, _) if r > 0 => (r, n) }
        .getOrElse((0, 0))
      val durationMs = if (durations.isEmpty) 0L else durations.max
      checksum = ((checksum * 131 + durationMs) * 131 + nPages) % 1000000007L
      OggInfo(serials.size, nPages, codecs, rate, ch, durationMs, checksum,
        u8(b, 5))
    }
  }

  /** Format-dispatched decoder selection — the call-site convenience a
    * mixed-format corpus needs: REAL decoders for every format this
    * library decodes without a codec (ppm, bmp, wav, png, gif, tiff,
    * jpeg, mp3's frame-header walk, flac's STREAMINFO walk, the
    * mp4/mov box walk, the avi and webp RIFF walks, and the ogg page
    * walk), the deterministic [[FakeDecoder]] for
    * genuinely-unavailable codecs (explicit allowlist below).
    * Case-insensitive on the metadata format tag. An UNKNOWN tag throws
    * rather than silently fake-decoding: a typo ("tiif") or a new
    * format must surface as a per-record error, not corrupt features
    * downstream. */
  def decoderFor(format: String): MediaDecoder = format.toLowerCase match {
    case "ppm" => new PpmDecoder
    case "bmp" => new BmpDecoder
    case "wav" => new WavDecoder()
    case "png" => new PngDecoder
    case "gif" => new GifDecoder
    case "tiff" | "tif" => new TiffDecoder
    case "jpeg" | "jpg" => new JpegDecoder
    case "mp3" => new Mp3Decoder
    case "flac" => new FlacDecoder
    case "mp4" | "mov" => new Mp4Decoder
    case "avi" => new AviDecoder
    case "webp" => new WebpDecoder
    case "ogg" | "oga" | "ogv" => new OggDecoder
    case "webm" | "heic" | "avif" | "aac" =>
      new FakeDecoder()
    case other => throw new IllegalArgumentException(
      s"unknown media format tag '$other': not a decodable format and " +
        "not on the lossy-codec allowlist")
  }

  /** Nearest-neighbor raster resize over decoded pixel rows (the
    * decode → RESIZE → feature pipeline stage: thumbnails, fixed-size
    * model inputs). Rows are interleaved samples (`channels` bytes per
    * pixel) exactly as every image decoder above emits them; the
    * mapping is the standard floor(x·srcW/dstW) nearest pick — pure
    * integer arithmetic, deterministic, identical up- and downscale
    * path. Pure per-record function: safe inside the batched
    * mapPartitions decode surface. */
  def resizeNearest(rows: Seq[Array[Byte]], channels: Int,
      dstW: Int, dstH: Int): Seq[Array[Byte]] = {
    require(rows.nonEmpty, "empty raster")
    require(channels > 0 && dstW > 0 && dstH > 0,
      s"bad resize geometry ch=$channels ${dstW}x$dstH")
    val srcH = rows.length
    val srcW = rows.head.length / channels
    require(srcW > 0 && rows.forall(_.length == srcW * channels),
      "ragged raster rows")
    (0 until dstH).map { y =>
      val src = rows(y * srcH / dstH)
      val out = new Array[Byte](dstW * channels)
      var x = 0
      while (x < dstW) {
        val sx = (x * srcW / dstW) * channels
        var c = 0
        while (c < channels) { out(x * channels + c) = src(sx + c); c += 1 }
        x += 1
      }
      out
    }
  }

  /** THE feature-checksum definition, shared by every decoder: a rolling
    * hash over the decoded row/frame/block set. One definition — a
    * per-decoder copy would let the feature semantics silently fork
    * across formats on the next edit. */
  private[operators] def rollingChecksum(frames: Seq[Array[Byte]]): Long =
    frames.foldLeft(0L) { (acc, f) =>
      (acc * 131 +
        f.foldLeft(0L)((a, x) => (a * 31 + (x & 0xff)) % 1000000007L)) %
        1000000007L
    }

  /** Fixed-stride frame sampling over an opaque payload — the byte-level
    * skeleton of video frame extraction. Pure, allocation-light. */
  def sampleFrames(bytes: Array[Byte], stride: Int, frameLen: Int): Seq[Array[Byte]] = {
    require(stride > 0 && frameLen > 0, s"stride=$stride frameLen=$frameLen must be positive")
    (0 to (bytes.length - frameLen) / stride)
      .filter(i => i * stride + frameLen <= bytes.length)
      .map(i => bytes.slice(i * stride, i * stride + frameLen))
  }

  /** Wrap an (id, payload) DataFrame into the typed media schema, deriving
    * metadata from the payload (format bucketed by content hash — a stand-in
    * for magic-byte sniffing; dimensions faked deterministically).
    *
    * The stand-in tags are all [[FakeDecoder]]-handled codecs on
    * purpose: the payloads are arbitrary bytes, and tagging them with a
    * REAL decoder's format ("png"/"wav"/…) would make the documented
    * ingest → [[extractFeaturesAuto]] path throw that decoder's
    * contractual not-a-valid-payload IAE on ~every record. Real
    * corpora carry real magic-byte sniffing here. (Round 13: "ogg"
    * graduated to the real [[OggDecoder]], so "aac" replaces it in the
    * stand-in rotation.) */
  def ingest(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    val h = conv(substring(md5(col(payloadCol)), 1, 8), 16, 10).cast("long")
    df.select(
        col(idCol).cast("long").as("id"),
        col(payloadCol).cast("binary").as("media"),
        struct(
          element_at(array(lit("webm"), lit("aac"), lit("heic"), lit("avif")),
            (h % 4 + 1).cast("int")).as("format"),
          (lit(320) + h % 320).cast("int").as("widthPx"),
          (lit(240) + floor(h / 320).cast("long") % 240).cast("int").as("heightPx"),
          octet_length(col(payloadCol).cast("binary")).cast("long").as("nBytes")
        ).as("meta"))
      .as[MediaRecord]
  }

  /** Batched per-partition decode: rows are grouped into `batchSize` chunks
    * inside each partition (the vectorized-UDF batch shape), decoded, and
    * re-flattened. Narrow transformation — partitioning is preserved, no
    * shuffle, no driver involvement. */
  def extractFeatures(ds: Dataset[MediaRecord], decoder: MediaDecoder,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary: a real codec would set up / tear down here
        batch.iterator.map(decoder.decode)
      }
    }
  }

  /** MIXED-FORMAT batched decode — the production shape, where one
    * partition carries whatever formats the corpus shard holds: each
    * record routes through [[decoderFor]] on its metadata format tag,
    * with decoders memoized PER PARTITION (one instance per format seen,
    * never per record — the setup-amortization a real codec needs).
    * Same narrow, shuffle-free contract as [[extractFeatures]]. */
  def extractFeaturesAuto(ds: Dataset[MediaRecord],
                          batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      val decoders = scala.collection.mutable.Map.empty[String, MediaDecoder]
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { rec =>
          decoders.getOrElseUpdate(rec.meta.format.toLowerCase,
            decoderFor(rec.meta.format)).decode(rec)
        }
      }
    }
  }
}

package graft.ops

/** Real, library-free media codecs implemented from their public format
  * specifications — no image/audio libraries exist in this environment, but
  * these formats need none:
  *
  *  - PGM (netpbm P5): binary grayscale — header "P5 <w> <h> <maxval>" with
  *    #-comments, then w·h raw bytes.
  *  - PPM (netpbm P6): binary RGB, decoded to luma (BT.601 integer approx).
  *  - BMP: uncompressed 24-bit bottom-up Windows bitmap (BITMAPINFOHEADER),
  *    BGR rows padded to 4 bytes, decoded to luma.
  *  - WAV: RIFF PCM 16-bit, channels averaged to mono.
  *  - Y4M (YUV4MPEG2): uncompressed planar video, luma planes extracted —
  *    the one VIDEO container that needs no codec.
  *
  * These give [[Multimodal]] a REAL decode boundary for the formats that are
  * self-describing; compressed formats (jpeg/png/mp4) remain represented by
  * the declared GFT0 stub container.
  */
object MediaCodecs {

  /** One decoded grayscale frame (row-major, unsigned bytes). */
  final case class Raster(width: Int, height: Int, pixels: Array[Byte])

  // ------------------------------------------------------------------ netpbm

  /** Skip netpbm whitespace/comments and read the next ASCII integer;
    * returns (value, next index) or None on malformed input.
    */
  private def pbmInt(b: Array[Byte], at0: Int): Option[(Int, Int)] = {
    var at = at0
    while (at < b.length) {
      val c = b(at).toChar
      if (c == '#') { while (at < b.length && b(at) != '\n') at += 1 }
      else if (c.isWhitespace) at += 1
      else {
        var v = 0L // Long accumulator: a crafted 10-digit dim must FAIL, not wrap
        var any = false
        while (at < b.length && b(at).toChar.isDigit) {
          v = v * 10 + (b(at) - '0'); at += 1; any = true
          if (v > Int.MaxValue) return None
        }
        return if (any) Some((v.toInt, at)) else None
      }
    }
    None
  }

  def decodePgm(b: Array[Byte]): Option[Raster] = {
    if (b == null || b.length < 10 || b(0) != 'P' || b(1) != '5') return None
    for {
      (w, i1) <- pbmInt(b, 2)
      (h, i2) <- pbmInt(b, i1)
      (maxv, i3) <- pbmInt(b, i2)
      // long arithmetic: crafted huge dims must fail the guard, not overflow
      if maxv > 0 && maxv < 256 && w > 0 && h > 0 && i3 < b.length &&
        (b.length - (i3 + 1)).toLong >= w.toLong * h
    } yield Raster(w, h, java.util.Arrays.copyOfRange(b, i3 + 1, i3 + 1 + w * h))
  }

  /** Integer BT.601 luma: (77 R + 150 G + 29 B) >> 8. */
  private def luma(r: Int, g: Int, bl: Int): Byte = ((77 * r + 150 * g + 29 * bl) >> 8).toByte

  def decodePpm(b: Array[Byte]): Option[Raster] = {
    if (b == null || b.length < 10 || b(0) != 'P' || b(1) != '6') return None
    for {
      (w, i1) <- pbmInt(b, 2)
      (h, i2) <- pbmInt(b, i1)
      (maxv, i3) <- pbmInt(b, i2)
      if maxv > 0 && maxv < 256 && w > 0 && h > 0 && i3 < b.length &&
        (b.length - (i3 + 1)).toLong >= w.toLong * h * 3
    } yield {
      val px = new Array[Byte](w * h)
      var p = i3 + 1
      var i = 0
      while (i < w * h) {
        px(i) = luma(b(p) & 0xff, b(p + 1) & 0xff, b(p + 2) & 0xff)
        p += 3; i += 1
      }
      Raster(w, h, px)
    }
  }

  def encodePgm(r: Raster): Array[Byte] = {
    val header = s"P5\n${r.width} ${r.height}\n255\n".getBytes("US-ASCII")
    header ++ r.pixels
  }

  // --------------------------------------------------------------------- BMP

  private def le32(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | (b(at + 1) & 0xff) << 8 | (b(at + 2) & 0xff) << 16 | (b(at + 3) & 0xff) << 24
  private def le16(b: Array[Byte], at: Int): Int = (b(at) & 0xff) | (b(at + 1) & 0xff) << 8

  /** Uncompressed 24-bit BMP (BI_RGB), positive height = bottom-up rows. */
  def decodeBmp(b: Array[Byte]): Option[Raster] = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = le32(b, 10)
    val w = le32(b, 18)
    val h = le32(b, 22) // positive ⇒ bottom-up (the common case; top-down unsupported)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (bpp != 24 || compression != 0 || w <= 0 || h <= 0) return None
    // long arithmetic: dims from untrusted bytes must fail, not wrap
    val rowBytesL = ((w.toLong * 3 + 3) / 4) * 4
    if (dataOff < 0 || b.length.toLong < dataOff.toLong + rowBytesL * h ||
        w.toLong * h > Int.MaxValue) return None
    val rowBytes = rowBytesL.toInt
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val src = dataOff + (h - 1 - y) * rowBytes // bottom-up
      var x = 0
      while (x < w) {
        val p = src + x * 3 // BGR order
        px(y * w + x) = luma(b(p + 2) & 0xff, b(p + 1) & 0xff, b(p) & 0xff)
        x += 1
      }
      y += 1
    }
    Some(Raster(w, h, px))
  }

  def encodeBmp24(r: Raster, rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = ((r.width * 3 + 3) / 4) * 4
    val size = 54 + rowBytes * r.height
    val out = new Array[Byte](size)
    def putLe32(at: Int, v: Int): Unit = {
      out(at) = (v & 0xff).toByte; out(at + 1) = ((v >> 8) & 0xff).toByte
      out(at + 2) = ((v >> 16) & 0xff).toByte; out(at + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, size); putLe32(10, 54); putLe32(14, 40)
    putLe32(18, r.width); putLe32(22, r.height)
    out(26) = 1; out(28) = 24
    putLe32(34, rowBytes * r.height)
    var y = 0
    while (y < r.height) {
      val dst = 54 + (r.height - 1 - y) * rowBytes
      var x = 0
      while (x < r.width) {
        val (rr, gg, bb) = rgb(x, y)
        out(dst + x * 3) = bb.toByte; out(dst + x * 3 + 1) = gg.toByte; out(dst + x * 3 + 2) = rr.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  // --------------------------------------------------------------------- WAV

  /** RIFF/WAVE PCM 16-bit → (sampleRate, mono samples, channel-averaged). */
  def decodeWav(b: Array[Byte]): Option[(Int, Array[Short])] = {
    if (b == null || b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var at = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, sampleRate, bits)
    var data: Option[(Int, Int)] = None     // (offset, length)
    while (at + 8 <= b.length) {
      val id = new String(b, at, 4, "US-ASCII")
      val len = le32(b, at + 4)
      if (len < 0) return None // malformed 32-bit length: never loop or wrap
      if (id == "fmt " && at + 8 + 16 <= b.length) {
        val audioFormat = le16(b, at + 8)
        if (audioFormat != 1) return None // PCM only
        fmt = Some((le16(b, at + 10), le32(b, at + 12), le16(b, at + 22)))
      } else if (id == "data") {
        data = Some((at + 8, math.max(0, math.min(len, b.length - at - 8))))
      }
      val step = 8L + len + (len & 1) // chunks are word-aligned
      if (at + step > b.length) at = b.length else at += step.toInt
    }
    for {
      (channels, rate, bits) <- fmt
      if bits == 16 && channels > 0
      (off, len) <- data
    } yield {
      val frames = len / (2 * channels)
      val mono = new Array[Short](frames)
      var f = 0
      while (f < frames) {
        var sum = 0
        var c = 0
        while (c < channels) {
          val p = off + (f * channels + c) * 2
          sum += (le16(b, p).toShort).toInt // sign via Short cast
          c += 1
        }
        mono(f) = (sum / channels).toShort
        f += 1
      }
      (rate, mono)
    }
  }

  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putLe32(at: Int, v: Int): Unit = {
      out(at) = (v & 0xff).toByte; out(at + 1) = ((v >> 8) & 0xff).toByte
      out(at + 2) = ((v >> 16) & 0xff).toByte; out(at + 3) = ((v >> 24) & 0xff).toByte
    }
    def putLe16(at: Int, v: Int): Unit = {
      out(at) = (v & 0xff).toByte; out(at + 1) = ((v >> 8) & 0xff).toByte
    }
    "RIFF".getBytes.copyToArray(out, 0); putLe32(4, 36 + dataLen)
    "WAVE".getBytes.copyToArray(out, 8)
    "fmt ".getBytes.copyToArray(out, 12); putLe32(16, 16); putLe16(20, 1)
    putLe16(22, channels); putLe32(24, sampleRate)
    putLe32(28, sampleRate * channels * 2); putLe16(32, channels * 2); putLe16(34, 16)
    "data".getBytes.copyToArray(out, 36); putLe32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      putLe16(44 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  // --------------------------------------------------------------------- Y4M

  /** YUV4MPEG2 (the mjpegtools interchange format — uncompressed planar
    * video, the one video container that needs no codec): stream header
    * `YUV4MPEG2 W<w> H<h> ...[ C<cs>]\n`, then per frame `FRAME...\n`
    * followed by raw planes. Luma plane is w·h bytes; chroma size follows
    * the C tag (default C420: two (w/2)·(h/2) planes; C422: two (w/2)·h;
    * C444: two w·h; Cmono: none). Decoded to the LUMA planes only — the
    * same grayscale normalization the image codecs apply.
    * Returns (width, height, yPlanes). None on any malformed structure.
    */
  def decodeY4m(b: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] = {
    val magic = "YUV4MPEG2"
    if (b == null || b.length < magic.length + 1) return None
    var i = 0
    while (i < magic.length) {
      if (b(i) != magic.charAt(i)) return None
      i += 1
    }
    var nl = magic.length
    while (nl < b.length && b(nl) != '\n') nl += 1
    if (nl >= b.length) return None
    val header = new String(b, 0, nl, "US-ASCII")
    var w = -1
    var h = -1
    var cs = "C420"
    header.split(' ').drop(1).foreach { tag =>
      if (tag.nonEmpty) tag.charAt(0) match {
        case 'W' => w = tag.drop(1).toIntOption.getOrElse(-1)
        case 'H' => h = tag.drop(1).toIntOption.getOrElse(-1)
        case 'C' => cs = tag
        case _   => // F/I/A/X tags don't affect plane layout
      }
    }
    if (w <= 0 || h <= 0) return None
    // a luma plane can't exceed the buffer — rejects absurd header dims
    // BEFORE w·h arithmetic could overflow Int into a negative allocation
    if (w.toLong * h > b.length) return None
    // chroma in LONG: ySize + chroma can reach ~1.5× b.length, so for blobs
    // approaching 2 GB the Int sum could wrap negative, slip past the bound
    // check, and crash arraycopy instead of returning None (advisor r7) —
    // the per-frame bound below is evaluated in Long for the same reason
    val chroma: Long =
      if (cs.startsWith("C420")) 2L * ((w / 2) * (h / 2))
      else if (cs.startsWith("C422")) 2L * ((w / 2).toLong * h)
      else if (cs.startsWith("C444")) 2L * (w.toLong * h)
      else if (cs == "Cmono") 0L
      else return None
    val ySize = w * h
    val frames = Seq.newBuilder[Array[Byte]]
    var at = nl + 1
    while (at < b.length) {
      // frame marker: "FRAME" + optional parameters, '\n'-terminated
      if (at + 5 > b.length || new String(b, at, 5, "US-ASCII") != "FRAME") return None
      var fe = at + 5
      while (fe < b.length && b(fe) != '\n') fe += 1
      if (fe >= b.length || fe.toLong + 1 + ySize + chroma > b.length) return None
      val y = new Array[Byte](ySize)
      System.arraycopy(b, fe + 1, y, 0, ySize)
      frames += y
      at = (fe.toLong + 1 + ySize + chroma).toInt // ≤ b.length by the guard
    }
    val fs = frames.result()
    if (fs.isEmpty) None else Some((w, h, fs))
  }

  /** Y4M encoder (test/data-gen side): luma planes in, `Cmono` or a
    * chroma-carrying colourspace out (chroma planes filled neutral 128).
    */
  def encodeY4m(w: Int, h: Int, yPlanes: Seq[Array[Byte]],
      colourspace: String = "Cmono"): Array[Byte] = {
    require(yPlanes.forall(_.length == w * h), "luma plane size mismatch")
    val chroma =
      if (colourspace.startsWith("C420")) 2 * ((w / 2) * (h / 2))
      else if (colourspace.startsWith("C422")) 2 * ((w / 2) * h)
      else if (colourspace.startsWith("C444")) 2 * (w * h)
      else 0
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 $colourspace\n".getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length +
      yPlanes.length * (marker.length + w * h + chroma))
    header.copyToArray(out, 0)
    var at = header.length
    yPlanes.foreach { y =>
      marker.copyToArray(out, at); at += marker.length
      y.copyToArray(out, at); at += y.length
      java.util.Arrays.fill(out, at, at + chroma, 128.toByte); at += chroma
    }
    out
  }
}

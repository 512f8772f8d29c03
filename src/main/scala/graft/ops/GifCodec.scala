package graft.ops

/** Pure-JVM GIF decoder — the MULTI-FRAME container that makes
  * [[Multimodal]]'s frame-sample plumbing real (round 14 — r13
  * verdict item 8 / §8.r14 "GIF/LZW multi-frame decode").
  *
  * GIF87a/89a (CompuServe spec): logical screen descriptor + global
  * color table, then a block stream — image descriptors (optional
  * local color table, optional interlacing, LZW-compressed color
  * indices in length-prefixed sub-blocks), graphic-control
  * extensions (transparency index, disposal method), other
  * extensions (skipped), 0x3B trailer. The LZW here is the real
  * variable-width GIF dialect: codes start at minCodeSize+1 bits,
  * CLEAR resets the dictionary, width grows as the table fills,
  * table caps at 4096.
  *
  * Supported profile: any frame count, global/local palettes,
  * interlaced or sequential rows, transparency (transparent pixels
  * keep the canvas — the standard compositing), and ALL disposal
  * methods — 0/1 (leave canvas), 2 (restore region to background),
  * 3 (restore-previous: the pre-frame pixels of the region are
  * saved before drawing and restored after the snapshot — one
  * region-sized copy, the bounded canvas history the spec requires).
  * Frames composite onto the logical screen; each decoded frame is
  * the FULL-CANVAS RGB snapshot after drawing, which is exactly
  * what a frame-sampling training pipeline consumes.
  *
  * Hardening, same stance as [[ImageCodec]] (the r13 ADVICE class):
  * every dimension/length field is untrusted — canvas and frame
  * allocations are gated in LONG arithmetic against
  * [[ImageCodec.MaxDecodedBytes]], sub-block walks bounds-check
  * before every read, LZW rejects out-of-range codes, truncated
  * streams, and output overruns. Decoders never throw on hostile
  * input; every failure is None (the quarantine path).
  *
  * The encoder (real LZW compression, fixture palettes) exists for
  * specs: round-trips and a HAND-ASSEMBLED container with a
  * hand-traced LZW stream pin the decoder independently.
  */
object GifCodec {

  def isGif(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 13 &&
      bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Header-only metadata: (canvasW, canvasH, nFrames). Walks the
    * block stream skipping data, so it is O(bytes) with no
    * allocation beyond the counters.
    */
  def gifMeta(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (!isGif(bytes)) return None
    val w = u16(bytes, 6); val h = u16(bytes, 8)
    if (w <= 0 || h <= 0) return None
    val packed = bytes(10) & 0xff
    var off = 13 + (if ((packed & 0x80) != 0) 3 * (2 << (packed & 7)) else 0)
    var frames = 0
    while (off < bytes.length) {
      (bytes(off) & 0xff) match {
        case 0x3b => // trailer: a zero-frame stream is quarantined to
          // match decodeGif's contract (r14 ADVICE — meta must not
          // report ok for media the decode path rejects structurally)
          return if (frames > 0) Some((w, h, frames)) else None
        case 0x21 => // extension: label + sub-blocks
          off += 2
          var ok = true
          while (ok && off < bytes.length && bytes(off) != 0) {
            off += 1 + (bytes(off) & 0xff)
            if (off > bytes.length) ok = false
          }
          if (!ok || off >= bytes.length) return None
          off += 1 // block terminator
        case 0x2c => // image descriptor
          if (off + 10 > bytes.length) return None
          val ip = bytes(off + 9) & 0xff
          off += 10 + (if ((ip & 0x80) != 0) 3 * (2 << (ip & 7)) else 0)
          if (off >= bytes.length) return None
          off += 1 // LZW min code size
          var ok = true
          while (ok && off < bytes.length && bytes(off) != 0) {
            off += 1 + (bytes(off) & 0xff)
            if (off > bytes.length) ok = false
          }
          if (!ok || off >= bytes.length) return None
          off += 1
          frames += 1
        case _ => return None
      }
    }
    None // ran off the end without a trailer
  }

  /** GIF-dialect LZW decode: `data` is the concatenated sub-block
    * payload, `expected` the exact pixel count. None on bad codes,
    * truncation, or overrun. An early EOI with too few pixels is
    * corrupt; missing EOI after the last pixel is tolerated
    * (robust-reader stance — encoders in the wild omit it).
    */
  private[graft] def lzwDecode(minCodeSize: Int, data: Array[Byte],
      expected: Int): Option[Array[Byte]] = {
    if (minCodeSize < 2 || minCodeSize > 8 || expected < 0) return None
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](expected)
    var outPos = 0
    var width = minCodeSize + 1
    var next = eoi + 1
    var prev = -1
    var prevFirst = 0
    var bitBuf = 0L; var bitCnt = 0; var pos = 0
    while (outPos < expected) {
      while (bitCnt < width && pos < data.length) {
        bitBuf |= (data(pos) & 0xffL) << bitCnt
        bitCnt += 8; pos += 1
      }
      if (bitCnt < width) return None // truncated
      val code = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width; bitCnt -= width
      if (code == clear) {
        width = minCodeSize + 1; next = eoi + 1; prev = -1
      } else if (code == eoi) {
        return None // EOI before the full pixel count = corrupt
      } else {
        var cur = code
        var first = 0
        var sp = 0
        if (code >= next) {
          // only the KwKwK case is legal
          if (code != next || prev < 0) return None
          stack(sp) = prevFirst.toByte; sp += 1
          cur = prev
        }
        while (cur >= eoi + 1) {
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
        }
        if (cur >= clear) return None // root beyond palette space
        first = cur
        stack(sp) = cur.toByte; sp += 1
        if (outPos + sp > expected) return None // overrun
        while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev; suffix(next) = first.toByte
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
        prevFirst = first
      }
    }
    Some(out)
  }

  /** GIF-dialect LZW encode (fixtures): real dictionary compression,
    * width progression mirroring the decoder's (the decoder's table
    * runs one entry behind the encoder's — width is driven off the
    * DECODER-side count so both read/write the same bit widths).
    */
  private[graft] def lzwEncode(minCodeSize: Int, pixels: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val outBits = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var width = minCodeSize + 1
    var dNext = eoi + 1 // the DECODER's next — one behind ours
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += width
      while (bitCnt >= 8) {
        outBits.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    var dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    var eNext = eoi + 1
    emit(clear)
    var prev = -1
    var i = 0
    var emitted = 0
    while (i < pixels.length) {
      val b = pixels(i) & 0xff
      if (prev < 0) prev = b
      else dict.get((prev, b)) match {
        case Some(c) => prev = c
        case None =>
          emit(prev); emitted += 1
          // decoder adds an entry per code AFTER the first post-clear
          if (emitted >= 2 && dNext < 4096) {
            dNext += 1
            if (dNext == (1 << width) && width < 12) width += 1
          } else if (emitted == 1) () // decoder adds nothing on its first code
          if (eNext < 4096) { dict((prev, b)) = eNext; eNext += 1 }
          else {
            emit(clear); emitted = 0
            dict = scala.collection.mutable.HashMap.empty
            eNext = eoi + 1; dNext = eoi + 1; width = minCodeSize + 1
          }
          prev = b
      }
      i += 1
    }
    if (prev >= 0) { emit(prev); emitted += 1 }
    if (emitted >= 2 && dNext < 4096) {
      dNext += 1
      if (dNext == (1 << width) && width < 12) width += 1
    }
    emit(eoi)
    if (bitCnt > 0) outBits.write((bitBuf & 0xff).toInt)
    outBits.toByteArray
  }

  /** The interlace row order (4 passes: every 8th from 0, every 8th
    * from 4, every 4th from 2, every 2nd from 1).
    */
  private def interlaceRows(h: Int): Array[Int] = {
    val out = new Array[Int](h)
    var i = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < h) { out(i) = y; i += 1; y += step }
    }
    out
  }

  /** Full decode → (canvasW, canvasH, frames), each RETAINED frame
    * the full-canvas RGB snapshot after compositing that image block.
    * `keepEvery` retains every k-th composited frame (indices 0, k,
    * 2k, … — skipped frames are composited into the canvas but never
    * copied out, so a sampler's memory is bounded by what it keeps,
    * not by what LZW forces it to decode); `maxFrames` bounds the
    * RETAINED count and stops the decode right after the last kept
    * frame. None on unsupported profile or any corruption.
    *
    * Bomb gate (round 15, the r14 ADVICE item): the per-canvas and
    * per-frame-rect gates bound any SINGLE allocation, and the
    * CUMULATIVE retained output is gated too — a few-KB file
    * declaring a large canvas plus thousands of 1×1 frame rects
    * would otherwise clone tens of GB of snapshots. Total retained
    * bytes above [[ImageCodec.MaxDecodedBytes]] ⇒ None (the
    * quarantine row, like every other hostile shape).
    */
  def decodeGif(bytes: Array[Byte],
      maxFrames: Int = Int.MaxValue,
      keepEvery: Int = 1): Option[(Int, Int, Vector[Array[Byte]])] = {
    require(keepEvery >= 1, s"keepEvery=$keepEvery")
    if (!isGif(bytes)) return None
    val w = u16(bytes, 6); val h = u16(bytes, 8)
    if (w <= 0 || h <= 0) return None
    if (w.toLong * h * 3 > ImageCodec.MaxDecodedBytes) return None // bomb gate
    val packed = bytes(10) & 0xff
    val bgIndex = bytes(11) & 0xff
    val globalPal: Option[Array[Byte]] =
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        if (13 + 3 * n > bytes.length) return None
        Some(java.util.Arrays.copyOfRange(bytes, 13, 13 + 3 * n))
      } else None
    var off = 13 + globalPal.map(_.length).getOrElse(0)
    val canvas = new Array[Byte](w * h * 3)
    // initial canvas: background color if the global palette defines
    // it, else black
    globalPal.foreach { p =>
      if (bgIndex * 3 + 2 < p.length) {
        var i = 0
        while (i < w * h) {
          canvas(i * 3) = p(bgIndex * 3)
          canvas(i * 3 + 1) = p(bgIndex * 3 + 1)
          canvas(i * 3 + 2) = p(bgIndex * 3 + 2)
          i += 1
        }
      }
    }
    val frames = Vector.newBuilder[Array[Byte]]
    var nComposited = 0
    var nRetained = 0
    var transparentIdx = -1
    var disposal = 0
    while (off < bytes.length) {
      (bytes(off) & 0xff) match {
        case 0x3b =>
          return if (nRetained > 0) Some((w, h, frames.result())) else None
        case 0x21 =>
          if (off + 2 > bytes.length) return None
          val label = bytes(off + 1) & 0xff
          off += 2
          if (label == 0xf9) { // graphic control extension
            if (off + 6 > bytes.length || (bytes(off) & 0xff) != 4) return None
            val flags = bytes(off + 1) & 0xff
            disposal = (flags >> 2) & 7
            transparentIdx = if ((flags & 1) != 0) bytes(off + 4) & 0xff else -1
            off += 6 // size byte + 4 data + terminator
          } else {
            while (off < bytes.length && bytes(off) != 0) {
              off += 1 + (bytes(off) & 0xff)
              if (off > bytes.length) return None
            }
            if (off >= bytes.length) return None
            off += 1
          }
        case 0x2c =>
          if (off + 10 > bytes.length) return None
          val fx = u16(bytes, off + 1); val fy = u16(bytes, off + 3)
          val fw = u16(bytes, off + 5); val fh = u16(bytes, off + 7)
          val ip = bytes(off + 9) & 0xff
          if (fw <= 0 || fh <= 0 || fx.toLong + fw > w || fy.toLong + fh > h)
            return None
          if (fw.toLong * fh > ImageCodec.MaxDecodedBytes) return None
          off += 10
          val pal: Array[Byte] =
            if ((ip & 0x80) != 0) {
              val n = 2 << (ip & 7)
              if (off + 3 * n > bytes.length) return None
              val p = java.util.Arrays.copyOfRange(bytes, off, off + 3 * n)
              off += 3 * n
              p
            } else globalPal.getOrElse(return None)
          if (off >= bytes.length) return None
          val minCode = bytes(off) & 0xff
          off += 1
          // gather LZW sub-blocks
          val lzw = new java.io.ByteArrayOutputStream()
          while (off < bytes.length && bytes(off) != 0) {
            val bl = bytes(off) & 0xff
            if (off + 1 + bl > bytes.length) return None
            lzw.write(bytes, off + 1, bl)
            off += 1 + bl
          }
          if (off >= bytes.length) return None
          off += 1 // terminator
          val idx = lzwDecode(minCode, lzw.toByteArray, fw * fh) match {
            case Some(px) => px
            case None => return None
          }
          // disposal 3 (restore-previous): save the region's pre-frame
          // pixels — one fw·fh·3 copy, restored after the snapshot
          val savedRegion: Array[Byte] =
            if (disposal == 3) {
              val sv = new Array[Byte](fw * fh * 3)
              var sy = 0
              while (sy < fh) {
                System.arraycopy(canvas, ((fy + sy) * w + fx) * 3,
                  sv, sy * fw * 3, fw * 3)
                sy += 1
              }
              sv
            } else null
          val rows = if ((ip & 0x40) != 0) interlaceRows(fh)
            else Array.tabulate(fh)(identity)
          var ry = 0
          while (ry < fh) {
            val cy = fy + rows(ry)
            var x = 0
            while (x < fw) {
              val ci = idx(ry * fw + x) & 0xff
              if (ci != transparentIdx) {
                if (ci * 3 + 2 >= pal.length) return None // index beyond palette
                val o = (cy * w + fx + x) * 3
                canvas(o) = pal(ci * 3)
                canvas(o + 1) = pal(ci * 3 + 1)
                canvas(o + 2) = pal(ci * 3 + 2)
              }
              x += 1
            }
            ry += 1
          }
          if (nComposited % keepEvery == 0) {
            // cumulative bomb gate: retained snapshots, not file bytes
            if ((nRetained + 1).toLong * w * h * 3 > ImageCodec.MaxDecodedBytes)
              return None
            frames += canvas.clone()
            nRetained += 1
            if (nRetained >= maxFrames) return Some((w, h, frames.result()))
          }
          nComposited += 1
          // disposal AFTER snapshot: 3 = restore the region's
          // pre-frame pixels, 2 = restore region to background
          if (disposal == 3) {
            var sy = 0
            while (sy < fh) {
              System.arraycopy(savedRegion, sy * fw * 3,
                canvas, ((fy + sy) * w + fx) * 3, fw * 3)
              sy += 1
            }
          }
          if (disposal == 2) {
            val (br, bg, bb) = globalPal match {
              case Some(p) if bgIndex * 3 + 2 < p.length =>
                (p(bgIndex * 3), p(bgIndex * 3 + 1), p(bgIndex * 3 + 2))
              case _ => (0.toByte, 0.toByte, 0.toByte)
            }
            var dy = 0
            while (dy < fh) {
              var dx = 0
              while (dx < fw) {
                val o = ((fy + dy) * w + fx + dx) * 3
                canvas(o) = br; canvas(o + 1) = bg; canvas(o + 2) = bb
                dx += 1
              }
              dy += 1
            }
          }
          transparentIdx = -1
          disposal = 0
        case _ => return None
      }
    }
    None // no trailer
  }

  /** Fixture encoder: palette (≤256 RGB triples) + per-frame
    * (x, y, fw, fh, indices, interlaced, transparentIdx, disposal)
    * image blocks over a w×h canvas. Real LZW compression.
    */
  case class FrameSpec(x: Int, y: Int, fw: Int, fh: Int, idx: Array[Byte],
    interlaced: Boolean = false, transparent: Int = -1, disposal: Int = 0)

  def encodeGif(w: Int, h: Int, palette: Array[Byte], bgIndex: Int,
      frames: Seq[FrameSpec]): Array[Byte] = {
    require(palette.length % 3 == 0 && palette.length <= 768, "palette")
    val nCol = palette.length / 3
    var bits = 1
    while ((1 << bits) < nCol) bits += 1
    val palSize = 1 << bits // physical table is a power of two
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(w); w16(h)
    out.write(0x80 | (bits - 1)) // global table, 2^bits entries
    out.write(bgIndex); out.write(0)
    out.write(palette)
    out.write(new Array[Byte](3 * (palSize - nCol))) // pad table
    frames.foreach { f =>
      require(f.idx.length == f.fw * f.fh, "frame body")
      if (f.transparent >= 0 || f.disposal != 0) {
        out.write(0x21); out.write(0xf9); out.write(4)
        out.write((f.disposal << 2) | (if (f.transparent >= 0) 1 else 0))
        w16(0) // delay
        out.write(math.max(0, f.transparent)); out.write(0)
      }
      out.write(0x2c)
      w16(f.x); w16(f.y); w16(f.fw); w16(f.fh)
      out.write(if (f.interlaced) 0x40 else 0)
      val minCode = math.max(2, bits)
      out.write(minCode)
      val body = if (f.interlaced) {
        val rows = interlaceRows(f.fh)
        val b = new Array[Byte](f.idx.length)
        var i = 0
        while (i < f.fh) {
          System.arraycopy(f.idx, rows(i) * f.fw, b, i * f.fw, f.fw)
          i += 1
        }
        b
      } else f.idx
      val lzw = lzwEncode(minCode, body)
      var p = 0
      while (p < lzw.length) {
        val n = math.min(255, lzw.length - p)
        out.write(n); out.write(lzw, p, n)
        p += n
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }
}

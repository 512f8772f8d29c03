package graft

/** ops.ImageCodec + its Multimodal wiring: the pure-JVM PNG/BMP
  * decoders (round 13 — compressed-codec carry reduced to jpeg).
  * Decode correctness is pinned two independent ways: (1) a
  * HAND-BUILT PNG whose filtered scanlines and expected pixels are
  * computed by hand (catches symmetric encoder/decoder bugs that a
  * round-trip alone would hide), (2) round-trips across every filter
  * type and channel count. BMP gets the padding/bottom-up/BGR cases.
  * Integration: PNG/BMP media produce BIT-IDENTICAL resize/feature
  * output to the equivalent GFTI raw container.
  */
class MultimodalCodecSpec extends SparkSpec {

  import spark.implicits._

  private def crc32(parts: Array[Byte]*): Int = {
    val c = new java.util.zip.CRC32()
    parts.foreach(c.update)
    c.getValue.toInt
  }

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val tb = typ.getBytes("US-ASCII")
    be32(data.length) ++ tb ++ data ++ be32(crc32(tb, data))
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
    d.end()
    out.toByteArray
  }

  private def ihdr(w: Int, h: Int, depth: Int, color: Int,
      interlace: Int = 0): Array[Byte] =
    be32(w) ++ be32(h) ++ Array(depth.toByte, color.toByte, 0.toByte,
      0.toByte, interlace.toByte)

  test("PNG decode of a HAND-BUILT container: filter bytes undone to hand-computed pixels") {
    // 2x2 gray, pixels [[100, 200], [50, 25]]
    // row 0 filtered with Average(3): 100-((0+0)>>1)=100, 200-((100+0)>>1)=150
    // row 1 filtered with Paeth(4):
    //   x0: a=0 b=100 c=0 -> p=100, pred=b=100, 50-100 = -50 -> 206
    //   x1: a=50 b=200 c=100 -> p=150, pa=100 pb=50 pc=50 -> pred=b=200,
    //       25-200 = -175 -> 81
    val filtered = Array[Byte](3, 100, 150.toByte, 4, 206.toByte, 81)
    val png = ops.ImageCodec.PngSignature ++
      chunk("IHDR", ihdr(2, 2, 8, 0)) ++
      chunk("IDAT", deflate(filtered)) ++
      chunk("IEND", Array.empty[Byte])
    val Some((w, h, c, body)) = ops.ImageCodec.decodePng(png)
    assert((w, h, c) === ((2, 2, 1)))
    assert(body.map(_ & 0xff).toSeq === Seq(100, 200, 50, 25))
    // and Sub/Up on a 3x2: row0 Sub [10,10,10] -> [10,20,30];
    // row1 Up [30,30,30] -> [40,50,60]
    val f2 = Array[Byte](1, 10, 10, 10, 2, 30, 30, 30)
    val png2 = ops.ImageCodec.PngSignature ++
      chunk("IHDR", ihdr(3, 2, 8, 0)) ++
      chunk("IDAT", deflate(f2)) ++ chunk("IEND", Array.empty[Byte])
    val Some((_, _, _, b2)) = ops.ImageCodec.decodePng(png2)
    assert(b2.map(_ & 0xff).toSeq === Seq(10, 20, 30, 40, 50, 60))
  }

  test("PNG round-trip: every filter type x every channel count, exact bytes") {
    val rnd = new scala.util.Random(42)
    for (c <- Seq(1, 2, 3, 4); ft <- 0 to 4) {
      val (w, h) = (7, 5) // odd sizes exercise bpp offsets
      val body = Array.fill[Byte](w * h * c)(rnd.nextInt(256).toByte)
      val png = ops.ImageCodec.encodePng(w, h, c, body, _ => ft)
      val got = ops.ImageCodec.decodePng(png)
      assert(got.isDefined, s"c=$c ft=$ft")
      val (gw, gh, gc, gb) = got.get
      assert((gw, gh, gc) === ((w, h, c)), s"c=$c ft=$ft")
      assert(gb.toSeq === body.toSeq, s"c=$c ft=$ft")
    }
    // mixed filters per row + multiple IDAT consumers: cycle 0..4
    val body = Array.tabulate[Byte](16 * 9 * 3)(i => ((i * 31 + 7) % 251).toByte)
    val png = ops.ImageCodec.encodePng(16, 9, 3, body, y => y % 5)
    assert(ops.ImageCodec.decodePng(png).get._4.toSeq === body.toSeq)
    // EDGE DIMENSIONS: 1-pixel rows/columns exercise the x < bpp and
    // y = 0 branches of every filter (Sub with no left, Paeth with no
    // up-left) — exhaustive over small dims × channels × mixed filters
    for (w <- Seq(1, 2, 3, 8); h <- Seq(1, 2, 5); c <- 1 to 4) {
      val b = Array.tabulate[Byte](w * h * c)(i => ((i * 131 + 17) % 256).toByte)
      val p2 = ops.ImageCodec.encodePng(w, h, c, b, y => (y + w + c) % 5)
      assert(ops.ImageCodec.decodePng(p2).get._4.toSeq === b.toSeq,
        s"w=$w h=$h c=$c")
    }
  }

  test("PNG unsupported profiles and corrupt streams quarantine (None), never throw") {
    val body = Array.fill[Byte](4 * 4)(9)
    val good = ops.ImageCodec.encodePng(4, 4, 1, body)
    assert(ops.ImageCodec.decodePng(good).isDefined)
    // 16-bit depth
    val deep = ops.ImageCodec.PngSignature ++ chunk("IHDR", ihdr(4, 4, 16, 0)) ++
      chunk("IDAT", deflate(Array.fill[Byte](4 * (1 + 8))(0))) ++
      chunk("IEND", Array.empty[Byte])
    assert(ops.ImageCodec.decodePng(deep).isEmpty, "16-bit")
    // palette color type
    val pal = ops.ImageCodec.PngSignature ++ chunk("IHDR", ihdr(4, 4, 8, 3)) ++
      chunk("IEND", Array.empty[Byte])
    assert(ops.ImageCodec.decodePng(pal).isEmpty, "palette")
    // Adam7 interlace
    val il = ops.ImageCodec.PngSignature ++
      chunk("IHDR", ihdr(4, 4, 8, 0, interlace = 1)) ++
      chunk("IEND", Array.empty[Byte])
    assert(ops.ImageCodec.decodePng(il).isEmpty, "interlaced")
    // truncated IDAT (cut the deflate stream short)
    val idat = deflate(Array.fill[Byte](4 * (1 + 4))(0))
    val cut = ops.ImageCodec.PngSignature ++ chunk("IHDR", ihdr(4, 4, 8, 0)) ++
      chunk("IDAT", idat.take(idat.length / 2)) ++ chunk("IEND", Array.empty[Byte])
    assert(ops.ImageCodec.decodePng(cut).isEmpty, "truncated deflate")
    // missing IEND / bytes chopped mid-chunk
    assert(ops.ImageCodec.decodePng(good.take(good.length - 4)).isEmpty, "chopped")
    // garbage deflate payload
    val junk = ops.ImageCodec.PngSignature ++ chunk("IHDR", ihdr(4, 4, 8, 0)) ++
      chunk("IDAT", Array.fill[Byte](10)(77)) ++ chunk("IEND", Array.empty[Byte])
    assert(ops.ImageCodec.decodePng(junk).isEmpty, "bad deflate")
  }

  test("PNG/BMP crafted-input hardening: bad filter bytes, FDICT stall, bomb dims, trailer checks (r13 ADVICE)") {
    // (1) out-of-range scanline filter byte — comes from the INFLATED
    // stream, so pngMeta's profile gate never sees it; must
    // quarantine, not NPE downstream (ADVICE item 1).
    val badFilter = Array[Byte](5, 1, 2, 3, 0, 4, 5, 6) // ft=5 on row 0
    val pBad = ops.ImageCodec.PngSignature ++ chunk("IHDR", ihdr(3, 2, 8, 0)) ++
      chunk("IDAT", deflate(badFilter)) ++ chunk("IEND", Array.empty[Byte])
    assert(ops.ImageCodec.decodePng(pBad).isEmpty, "filter byte 5")
    // (2) zlib header with the FDICT bit set: Inflater stalls with
    // n=0, needsDictionary=true, needsInput=FALSE — the old
    // needsInput-only check spun forever (ADVICE item 2). 0x78 0x20
    // is a valid header ((0x78*256+0x20) % 31 == 0) with FDICT set.
    val fdict = Array[Byte](0x78, 0x20, 1, 2, 3, 4) ++ // header + DICTID
      deflate(Array.fill[Byte](2 * (1 + 2))(0)).drop(2)
    val pDict = ops.ImageCodec.PngSignature ++ chunk("IHDR", ihdr(2, 2, 8, 0)) ++
      chunk("IDAT", fdict) ++ chunk("IEND", Array.empty[Byte])
    assert(ops.ImageCodec.decodePng(pDict).isEmpty, "FDICT stall")
    // (3) decompression-bomb / Int-overflow dimensions: a ~150-byte
    // file claiming 2^30 x 2^30 (overflows to a negative Int size)
    // and a 10^10-byte honest claim — both quarantine BEFORE any
    // allocation (ADVICE item 3).
    for ((w, h) <- Seq((1 << 30, 1 << 30), (100000, 100000))) {
      val bomb = ops.ImageCodec.PngSignature ++ chunk("IHDR", ihdr(w, h, 8, 0)) ++
        chunk("IDAT", deflate(Array.fill[Byte](16)(0))) ++
        chunk("IEND", Array.empty[Byte])
      assert(ops.ImageCodec.decodePng(bomb).isEmpty, s"bomb dims $w x $h")
      assert(ops.ImageCodec.pngMeta(bomb).isDefined,
        "meta itself allocates nothing and may report the claim")
    }
    // (4) the zlib trailer is now actually verified (ADVICE item 4):
    // a corrupted adler32 and a chopped trailer both quarantine, and
    // excess decompressed data (stream longer than the declared body)
    // is corrupt too.
    val okFiltered = Array[Byte](0, 10, 20, 0, 30, 40)
    def container(idat: Array[Byte]) =
      ops.ImageCodec.PngSignature ++ chunk("IHDR", ihdr(2, 2, 8, 0)) ++
        chunk("IDAT", idat) ++ chunk("IEND", Array.empty[Byte])
    val goodZ = deflate(okFiltered)
    assert(ops.ImageCodec.decodePng(container(goodZ)).isDefined, "control")
    val flipped = goodZ.clone()
    flipped(flipped.length - 1) = (flipped.last ^ 0x5a).toByte
    assert(ops.ImageCodec.decodePng(container(flipped)).isEmpty, "bad adler32")
    assert(ops.ImageCodec.decodePng(container(goodZ.dropRight(2))).isEmpty,
      "chopped trailer")
    assert(ops.ImageCodec.decodePng(
      container(deflate(okFiltered ++ Array[Byte](1, 2, 3)))).isEmpty,
      "excess decompressed data")
    // (5) BMP sibling: 31-bit dims overflowed rowBytes/body products —
    // long-math gate quarantines (same class as item 3).
    val bigBmp = {
      val o = new Array[Byte](64)
      o(0) = 'B'; o(1) = 'M'
      def le32(off: Int, v: Int): Unit = {
        o(off) = (v & 0xff).toByte; o(off + 1) = ((v >> 8) & 0xff).toByte
        o(off + 2) = ((v >> 16) & 0xff).toByte; o(off + 3) = ((v >> 24) & 0xff).toByte
      }
      le32(10, 54); le32(14, 40); le32(18, 1 << 29); le32(22, 4)
      o(26) = 1; o(28) = 24
      o
    }
    assert(ops.ImageCodec.decodeBmp(bigBmp).isEmpty, "BMP bomb dims")
  }

  test("BMP: hand-built bottom-up padded file decodes; round-trip exact; top-down honored") {
    // 3x2 RGB — rowBytes = 12 (3 padding bytes per row), bottom-up
    val rgb = Array[Byte](
      10, 20, 30, 40, 50, 60, 70, 80, 90, // row 0 (top)
      1, 2, 3, 4, 5, 6, 7, 8, 9) // row 1 (bottom)
    val bmp = ops.ImageCodec.encodeBmp(3, 2, rgb)
    assert(bmp.length === 54 + 2 * 12)
    val Some((w, h, c, body)) = ops.ImageCodec.decodeBmp(bmp)
    assert((w, h, c) === ((3, 2, 3)))
    assert(body.toSeq === rgb.toSeq)
    // hand-check the file layout: bottom row stored FIRST, BGR order
    assert(bmp(54) === 3 && bmp(55) === 2 && bmp(56) === 1,
      "bottom-left pixel stored first as BGR")
    // top-down variant: negate height in place, reorder rows
    val td = bmp.clone()
    val hNeg = -2
    td(22) = (hNeg & 0xff).toByte; td(23) = ((hNeg >> 8) & 0xff).toByte
    td(24) = ((hNeg >> 16) & 0xff).toByte; td(25) = ((hNeg >> 24) & 0xff).toByte
    val Some((_, _, _, tdBody)) = ops.ImageCodec.decodeBmp(td)
    assert(tdBody.toSeq === (rgb.slice(9, 18) ++ rgb.slice(0, 9)).toSeq,
      "top-down reads rows in file order")
    // 8-bit / compressed headers quarantine
    val bad = bmp.clone(); bad(28) = 8
    assert(ops.ImageCodec.decodeBmp(bad).isEmpty)
  }

  test("Multimodal: PNG and BMP media produce BIT-IDENTICAL pixel-kernel output to raw") {
    val (w, h) = (8, 8)
    val rgb = Array.tabulate[Byte](w * h * 3)(i => ((i * 13 + 5) % 256).toByte)
    val rawC = ops.Multimodal.encodeHeader(w, h, 3, 0, rgb)
    val png = ops.ImageCodec.encodePng(w, h, 3, rgb, y => y % 5)
    val bmp = ops.ImageCodec.encodeBmp(w, h, rgb)
    val media = Seq((1L, rawC), (2L, png), (3L, bmp)).toDS()
    val resized = ops.Multimodal.resizeRaw(media, 4, 4).collect()
      .map(r => r.getLong(0) -> (r.getAs[Array[Byte]](1), r.getBoolean(2))).toMap
    assert(resized(1L)._2 && resized(2L)._2 && resized(3L)._2)
    assert(resized(2L)._1.toSeq === resized(1L)._1.toSeq, "png == raw resize")
    assert(resized(3L)._1.toSeq === resized(1L)._1.toSeq, "bmp == raw resize")
    val feats = ops.Multimodal.extractFeaturesRaw(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(2L) === feats(1L), "png == raw features")
    assert(feats(3L) === feats(1L), "bmp == raw features")
    // metadata surfaces the real formats; corrupt png quarantines
    val cut = png.take(png.length / 2)
    val meta = ops.Multimodal.withDecodedMeta(Seq((2L, png), (3L, bmp),
        (4L, cut)).toDS())
      .select("media_id", "width", "channels", "format")
      .as[(Long, Option[Int], Option[Int], Option[String])].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(meta(2L) === ((Some(8), Some(3), Some("png"))))
    assert(meta(3L) === ((Some(8), Some(3), Some("bmp"))))
    val cutResize = ops.Multimodal.resizeRaw(Seq((4L, cut)).toDS(), 4, 4)
      .collect().head
    assert(!cutResize.getBoolean(2), "truncated png quarantines in the kernel")
  }

  test("JPEG via the JDK codec: dims/channels exact, pixels near-lossless on smooth content, corrupt quarantines") {
    // uniform gray: JPEG is near-exact on constant blocks
    val flat = Array.fill[Byte](16 * 16)(100)
    val jf = ops.ImageCodec.encodeJpeg(16, 16, 1, flat)
    assert(ops.ImageCodec.isJpeg(jf))
    assert(ops.ImageCodec.jpegMeta(jf) === Some((16, 16, 1)))
    val Some((w1, h1, c1, b1)) = ops.ImageCodec.decodeJpeg(jf)
    assert((w1, h1, c1) === ((16, 16, 1)))
    assert(b1.forall(b => math.abs((b & 0xff) - 100) <= 2), "uniform gray ±2")
    // smooth RGB gradient: every channel within the codec's loss band
    val grad = Array.tabulate[Byte](16 * 16 * 3) { i =>
      val p = i / 3
      (((p % 16) * 8 + (p / 16) * 8) & 0xff).toByte
    }
    val jc = ops.ImageCodec.encodeJpeg(16, 16, 3, grad)
    val Some((w2, h2, c2, b2)) = ops.ImageCodec.decodeJpeg(jc)
    assert((w2, h2, c2) === ((16, 16, 3)))
    val maxErr = b2.indices.map(i => math.abs((b2(i) & 0xff) - (grad(i) & 0xff))).max
    assert(maxErr <= 32, s"smooth-gradient loss band, maxErr=$maxErr")
    // the decoded jpeg flows through the pixel kernels like any media
    val media = Seq((1L, jc), (2L, ops.Multimodal.encodeHeader(16, 16, 3, 0, grad))).toDS()
    val f = ops.Multimodal.extractFeaturesRaw(media).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Float](1), r.getBoolean(2))).toMap
    assert(f(1L)._2 && f(2L)._2)
    val cosSim = f(1L)._1.zip(f(2L)._1).map { case (a, b) => a.toDouble * b }.sum
    assert(cosSim > 0.999, s"jpeg features track raw features, cos=$cosSim")
    val meta = ops.Multimodal.withDecodedMeta(Seq((1L, jc)).toDS())
      .select("format").collect().head.getString(0)
    assert(meta === "jpeg")
    // corrupt: truncated stream and bare-marker junk both quarantine
    assert(ops.ImageCodec.decodeJpeg(jc.take(jc.length / 4)).isEmpty)
    assert(ops.ImageCodec.decodeJpeg(Array[Byte](0xff.toByte, 0xd8.toByte, 1, 2, 3)).isEmpty)
  }

  test("JPEG boundary fixtures: PROGRESSIVE decodes, 4-component (CMYK-class) quarantines (r14 verdict item)") {
    // --- progressive JFIF: the JDK reader supports SOF2 scans, so a
    // progressive re-encode of the gradient must decode with the same
    // dims/channels and stay inside the loss band of the baseline form
    val grad = Array.tabulate[Byte](16 * 16 * 3) { i =>
      val p = i / 3
      (((p % 16) * 8 + (p / 16) * 8) & 0xff).toByte
    }
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 16, 16, Array.tabulate(16 * 16)(p =>
      ((grad(p * 3) & 0xff) << 16) | ((grad(p * 3 + 1) & 0xff) << 8) |
        (grad(p * 3 + 2) & 0xff)), 0, 16)
    val wj = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val prm = wj.getDefaultWriteParam
    prm.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wj.setOutput(ios)
    wj.write(null, new javax.imageio.IIOImage(img, null, null), prm)
    ios.close(); wj.dispose()
    val prog = bos.toByteArray
    def findMarker(b: Array[Byte], m: Int): Int =
      (0 until b.length - 1).find(i =>
        (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == m).getOrElse(-1)
    assert(findMarker(prog, 0xc2) >= 0, "fixture is genuinely SOF2/progressive")
    assert(findMarker(prog, 0xc0) < 0, "no baseline SOF0 frame")
    assert(ops.ImageCodec.jpegMeta(prog) === Some((16, 16, 3)))
    val Some((pw, ph, pc, pb)) = ops.ImageCodec.decodeJpeg(prog)
    assert((pw, ph, pc) === ((16, 16, 3)))
    val maxErr = pb.indices.map(i => math.abs((pb(i) & 0xff) - (grad(i) & 0xff))).max
    assert(maxErr <= 32, s"progressive decode inside the loss band, maxErr=$maxErr")
    // a truncated progressive stream quarantines like any corruption
    assert(ops.ImageCodec.decodeJpeg(prog.take(prog.length / 3)).isEmpty)
    // --- 4-component frame (the CMYK class): the JDK tier rejects
    // streams it cannot color-convert; pin that the rejection is a
    // quarantine (None), never a throw. Crafted by patching the
    // baseline fixture's SOF0 component count 3 -> 4 (the cheapest
    // stream whose frame header declares four components).
    val base = ops.ImageCodec.encodeJpeg(16, 16, 3, grad)
    val sof = findMarker(base, 0xc0)
    assert(sof >= 0)
    val cmyk4 = base.clone()
    assert((cmyk4(sof + 9) & 0xff) == 3, "SOF0 Nf byte located")
    cmyk4(sof + 9) = 4
    assert(ops.ImageCodec.decodeJpeg(cmyk4).isEmpty, "4-component frame quarantines")
    // meta stays header-only: whatever it reports, the decode path's
    // quarantine is what gates the pipeline (the documented split)
  }

  test("multimodal_codec_features: per-label cells replay from a driver-side codec loop; every decode ok") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val got = ops.Llm2.multimodalCodecFeatures(spark, dir).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val emb = io.Readers.table(spark, dir, "embeddings")
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val want = emb.groupBy(_._1).map { case (l, g) =>
      val cells = g.map { case (_, e) =>
        val body = e.map(x =>
          math.max(0, math.min(255, ((x + 1.0f) * 127.5f).toInt)).toByte)
        val png = ops.ImageCodec.encodePng(8, 8, 1, body, y => y % 5)
        val f = ops.Multimodal.featuresOf(png).get
        (math.floor(f(0).toDouble * 1048576.0).toLong,
          f.drop(1).foldLeft(0L)((a, v) =>
            a + math.floor(v.toDouble * 1048576.0).toLong))
      }
      l -> ((g.length.toLong, g.length.toLong,
        cells.map(_._1).sum, cells.map(_._2).sum))
    }
    assert(got === want, "cells == driver replay; n_ok == n_vecs (every PNG decodes)")
  }

  test("end-to-end media retrieval: PNG/BMP/JPEG corpus -> features -> persisted IVF -> motif neighbors") {
    import org.apache.spark.sql.functions._
    // planted-motif corpus: 3 base patterns x 20 noisy variants each,
    // encoded in a MIX of containers (the retrieval path must be
    // container-blind once decodeToRaw normalizes)
    val (w, h) = (16, 16)
    def motif(kind: Int, variant: Int): Array[Byte] = Array.tabulate[Byte](w * h) { i =>
      val (y, x) = (i / w, i % w)
      val base = kind match {
        case 0 => x * 16 // horizontal gradient
        case 1 => y * 16 // vertical gradient
        case 2 => if ((x / 4 + y / 4) % 2 == 0) 30 else 220 // checker
      }
      val noise = ((i * 31 + variant * 17) % 7) - 3
      math.max(0, math.min(255, base + noise)).toByte
    }
    // all three containers carry the SAME RGB content (gray tripled:
    // BMP is always 24-bit, so RGB everywhere keeps feature dims equal)
    val corpus = (for (kind <- 0 until 3; v <- 0 until 20) yield {
      val id = (kind * 100 + v).toLong
      val body3 = motif(kind, v).flatMap(b => Array(b, b, b))
      val bytes = v % 3 match {
        case 0 => ops.ImageCodec.encodePng(w, h, 3, body3, y => y % 5)
        case 1 => ops.ImageCodec.encodeBmp(w, h, body3)
        case 2 => ops.ImageCodec.encodeJpeg(w, h, 3, body3)
      }
      (id, bytes)
    }).toDS()
    val rows = ops.Multimodal.mediaFeatureRows(corpus)
    assert(rows.count() === 60, "every container decodes")
    ops.IvfIndex.buildIndex(spark, rows, "ivf_media", nlist = 4)
    try {
      // fresh unseen variants of each motif, as jpeg probes
      val probes = (0 until 3).map { kind =>
        (1000L + kind, ops.ImageCodec.encodeJpeg(w, h, 3,
          motif(kind, 99).flatMap(b => Array(b, b, b))))
      }.toDS()
      val pv = ops.Multimodal.mediaFeatureRows(probes)
        .select(col("vec_id").as("p_id"), col("v").as("pv"))
      val got = ops.IvfIndex.probe(spark, pv, "ivf_media", nprobe = 2, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      // every retrieved neighbor of probe 100k must be from motif k
      (0 until 3).foreach { kind =>
        val nbrs = got.filter(_._1 == 1000L + kind).map(_._2)
        assert(nbrs.nonEmpty, s"motif $kind retrieves")
        assert(nbrs.forall(id => id / 100 == kind),
          s"motif $kind neighbors pure: ${nbrs.mkString(",")}")
      }
    } finally io.TableManifest.drop(spark, "ivf_media")
  }

  test("image_meta SQL expression: header parses from SQL, codegen'd, quarantine -> NULL") {
    import org.apache.spark.sql.functions.col
    val body = Array.tabulate[Byte](6 * 4 * 3)(i => (i * 7).toByte)
    val media = Seq(
      (1L, ops.ImageCodec.encodePng(6, 4, 3, body, y => y % 5)),
      (2L, ops.ImageCodec.encodeBmp(6, 4, body)),
      (3L, ops.ImageCodec.encodeJpeg(6, 4, 3, body)),
      (4L, ops.Multimodal.encodeHeader(6, 4, 3, 0, body)),
      (5L, "not an image".getBytes("UTF-8"))).toDF("id", "b")
    media.createOrReplaceTempView("media_sql")
    val got = spark.sql(
      """SELECT id, image_meta(b).width AS w, image_meta(b).height AS h,
        |       image_meta(b).channels AS c, image_meta(b).format AS f
        |FROM media_sql ORDER BY id""".stripMargin)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))))
      .toMap
    assert(got(1L) === Some((6, 4, 3, "png")))
    assert(got(2L) === Some((6, 4, 3, "bmp")))
    assert(got(3L) === Some((6, 4, 3, "jpeg")))
    assert(got(4L) === Some((6, 4, 3, "raw")))
    assert(got(5L) === None, "undecodable bytes -> NULL (quarantine)")
    // the expression rides whole-stage codegen (no interpreted
    // fallback): evaluate over a parquet-backed relation so the
    // optimizer cannot constant-fold a LocalTableScan away, then
    // look for the '*(n)' codegen-stage marker on its project line
    val over = io.Readers.table(spark, "/root/testdata/sf0.001", "documents")
      .selectExpr("image_meta(CAST(text AS BINARY)) AS m")
      .filter(col("m").isNull)
    over.collect()
    val line = over.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("image_meta(")).getOrElse("")
    assert(line.contains("*("), s"image_meta not in a codegen stage: $line")
  }

  test("decoded media flow into the similarity family: nearest neighbor by pixel content") {
    // three images: two near-identical gradients, one inverted —
    // cosine over extracted features must pair the gradients
    val (w, h) = (8, 8)
    def grad(flip: Boolean, noise: Int): Array[Byte] =
      Array.tabulate[Byte](w * h) { i =>
        val v = (i * 255 / (w * h - 1)) min 255
        (((if (flip) 255 - v else v) + noise) min 255 max 0).toByte
      }
    val media = Seq(
      (1L, ops.ImageCodec.encodePng(w, h, 1, grad(flip = false, 0))),
      (2L, ops.ImageCodec.encodePng(w, h, 1, grad(flip = false, 3), y => y % 5)),
      (3L, ops.ImageCodec.encodePng(w, h, 1, grad(flip = true, 0)))).toDS()
    val f = ops.Multimodal.extractFeaturesRaw(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    assert(cos(f(1L), f(2L)) > cos(f(1L), f(3L)),
      "near-duplicate gradient closer than the inverted one")
  }
}

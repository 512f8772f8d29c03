package graft

/** ops.GifCodec — multi-frame GIF/LZW (round 14). The decoder is
  * pinned three independent ways: (1) a HAND-ASSEMBLED container
  * whose variable-width LZW bitstream is hand-traced bit by bit
  * (catches symmetric encoder/decoder bugs), (2) round-trips across
  * palette sizes including a dictionary-reset-forcing frame,
  * (3) compositing semantics (sub-rect frames, transparency keeps
  * canvas, disposal-2 background restore, interlacing) against
  * hand-computed canvases. Hostile containers never throw. The
  * sampled frames flow into the existing pixel-feature family.
  */
class GifCodecSpec extends SparkSpec {

  import spark.implicits._

  private val pal4 = Array[Byte](
    10, 20, 30, // 0
    40, 50, 60, // 1
    70, 80, 90, // 2
    100, 110, 120) // 3

  test("hand-assembled GIF with a hand-traced LZW bitstream decodes to the exact pixels") {
    // 2x2, 4-color global palette, pixels [0,1,2,3].
    // Hand-traced GIF-LZW (minCode 2, clear=4, eoi=5): codes
    // 4,0,1,2 at width 3, then 3,5 at width 4 (the decoder's table
    // hits 8 entries after the third pixel code), packed LSB-first:
    val lzw = Array[Byte](0x44, 0x34, 0x05)
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](2, 0, 2, 0, 0x81.toByte, 0, 0) ++ pal4 ++
      Array[Byte](0x2c, 0, 0, 0, 0, 2, 0, 2, 0, 0, 2, 3) ++ lzw ++
      Array[Byte](0, 0x3b)
    assert(ops.GifCodec.isGif(gif))
    assert(ops.GifCodec.gifMeta(gif) === Some((2, 2, 1)))
    val Some((w, h, frames)) = ops.GifCodec.decodeGif(gif)
    assert((w, h, frames.size) === ((2, 2, 1)))
    assert(frames.head.toSeq === pal4.toSeq, "pixel i = palette color i")
  }

  test("round-trip: palette sizes 4/16/256, long frames force width growth and a dictionary reset") {
    val rnd = new scala.util.Random(42)
    for ((nCol, w, h) <- Seq((4, 7, 5), (16, 16, 16), (256, 32, 32),
      (256, 128, 64))) { // 8192 random px on 256 colors → LZW reset
      val pal = Array.fill[Byte](nCol * 3)(rnd.nextInt(256).toByte)
      val idx = Array.fill[Byte](w * h)(rnd.nextInt(nCol).toByte)
      val gif = ops.GifCodec.encodeGif(w, h, pal, 0,
        Seq(ops.GifCodec.FrameSpec(0, 0, w, h, idx)))
      val got = ops.GifCodec.decodeGif(gif)
      assert(got.isDefined, s"nCol=$nCol $w x $h")
      val (gw, gh, fs) = got.get
      assert((gw, gh, fs.size) === ((w, h, 1)))
      val want = idx.flatMap(i =>
        Seq(pal((i & 0xff) * 3), pal((i & 0xff) * 3 + 1), pal((i & 0xff) * 3 + 2)))
      assert(fs.head.toSeq === want.toSeq, s"nCol=$nCol $w x $h")
    }
    // highly repetitive content exercises deep dictionary strings
    val pal = Array.fill[Byte](12)(77)
    val rep = Array.tabulate[Byte](60 * 60)(i => ((i / 7) % 4).toByte)
    val gif = ops.GifCodec.encodeGif(60, 60, pal4 ++ pal.drop(12), 0,
      Seq(ops.GifCodec.FrameSpec(0, 0, 60, 60, rep)))
    val dec = ops.GifCodec.decodeGif(gif).get._3.head
    val want = rep.flatMap(i => Seq(pal4(i * 3), pal4(i * 3 + 1), pal4(i * 3 + 2)))
    assert(dec.toSeq === want.toSeq)
  }

  test("multi-frame compositing: sub-rects draw over, transparency keeps canvas, disposal 2 restores background") {
    // canvas 3x2, bg index 0; frame1 fills with color 1; frame2 is a
    // 1x1 rect at (2,1) color 2 with disposal 2; frame3 is full-size
    // color 3 with index 0 TRANSPARENT everywhere except one pixel
    val f1 = ops.GifCodec.FrameSpec(0, 0, 3, 2, Array.fill[Byte](6)(1))
    val f2 = ops.GifCodec.FrameSpec(2, 1, 1, 1, Array[Byte](2), disposal = 2)
    val f3 = ops.GifCodec.FrameSpec(0, 0, 3, 2,
      Array[Byte](0, 0, 0, 0, 0, 3), transparent = 0)
    val gif = ops.GifCodec.encodeGif(3, 2, pal4, 0, Seq(f1, f2, f3))
    assert(ops.GifCodec.gifMeta(gif) === Some((3, 2, 3)))
    val Some((_, _, fs)) = ops.GifCodec.decodeGif(gif)
    def px(frame: Array[Byte], x: Int, y: Int): Seq[Byte] =
      frame.slice((y * 3 + x) * 3, (y * 3 + x) * 3 + 3).toSeq
    def col(i: Int): Seq[Byte] = pal4.slice(i * 3, i * 3 + 3).toSeq
    // frame 1: all color 1
    assert((0 until 3).forall(x => (0 until 2).forall(y =>
      px(fs(0), x, y) == col(1))))
    // frame 2 snapshot: canvas still color 1 except the (2,1) rect
    assert(px(fs(1), 2, 1) === col(2))
    assert(px(fs(1), 0, 0) === col(1))
    // frame 3: disposal 2 restored (2,1) to BACKGROUND color 0 before
    // drawing; transparent index 0 keeps the canvas, so only the last
    // pixel (2,1) — index 3 — draws... and it lands ON the restored
    // background rect
    assert(px(fs(2), 2, 1) === col(3), "opaque pixel draws")
    assert(px(fs(2), 0, 0) === col(1), "transparent pixels keep canvas")
    assert(px(fs(2), 1, 1) === col(1), "transparent over old frame-1 paint")
    // maxFrames stops early
    assert(ops.GifCodec.decodeGif(gif, maxFrames = 2).get._3.size === 2)
  }

  test("disposal 3 (restore-previous): the frame region reverts to its pre-frame pixels after the snapshot") {
    // f1 fills 3x2 with color 1; f2 draws a 1x2 column at x=1 in
    // color 2 WITH disposal 3; f3 is transparent except (0,0)=color 3
    val f1 = ops.GifCodec.FrameSpec(0, 0, 3, 2, Array.fill[Byte](6)(1))
    val f2 = ops.GifCodec.FrameSpec(1, 0, 1, 2, Array[Byte](2, 2), disposal = 3)
    val f3 = ops.GifCodec.FrameSpec(0, 0, 3, 2,
      Array[Byte](3, 0, 0, 0, 0, 0), transparent = 0)
    val gif = ops.GifCodec.encodeGif(3, 2, pal4, 0, Seq(f1, f2, f3))
    val Some((_, _, fs)) = ops.GifCodec.decodeGif(gif)
    def px(frame: Array[Byte], x: Int, y: Int): Seq[Byte] =
      frame.slice((y * 3 + x) * 3, (y * 3 + x) * 3 + 3).toSeq
    def col(i: Int): Seq[Byte] = pal4.slice(i * 3, i * 3 + 3).toSeq
    assert(px(fs(1), 1, 0) === col(2) && px(fs(1), 1, 1) === col(2),
      "frame-2 snapshot shows its own paint")
    assert(px(fs(2), 1, 0) === col(1) && px(fs(2), 1, 1) === col(1),
      "disposal 3 restored the pre-frame pixels (color 1), not background")
    assert(px(fs(2), 0, 0) === col(3), "frame-3 opaque pixel draws")
    assert(px(fs(2), 2, 1) === col(1), "untouched canvas keeps frame-1 paint")
  }

  test("interlaced frames decode to the same pixels as sequential") {
    val rnd = new scala.util.Random(7)
    val (w, h) = (9, 13) // odd dims exercise all four interlace passes
    val idx = Array.fill[Byte](w * h)(rnd.nextInt(4).toByte)
    val seqG = ops.GifCodec.encodeGif(w, h, pal4, 0,
      Seq(ops.GifCodec.FrameSpec(0, 0, w, h, idx)))
    val intG = ops.GifCodec.encodeGif(w, h, pal4, 0,
      Seq(ops.GifCodec.FrameSpec(0, 0, w, h, idx, interlaced = true)))
    val a = ops.GifCodec.decodeGif(seqG).get._3.head
    val b = ops.GifCodec.decodeGif(intG).get._3.head
    assert(a.toSeq === b.toSeq)
  }

  test("hostile containers quarantine (None), never throw") {
    val good = ops.GifCodec.encodeGif(3, 2, pal4, 0,
      Seq(ops.GifCodec.FrameSpec(0, 0, 3, 2, Array.fill[Byte](6)(1))))
    assert(ops.GifCodec.decodeGif(good).isDefined)
    // truncations at every prefix length must not throw
    (0 until good.length by 3).foreach { n =>
      ops.GifCodec.decodeGif(good.take(n)) // must not throw
      ()
    }
    assert(ops.GifCodec.decodeGif(good.dropRight(1)).isEmpty, "no trailer")
    // bomb dims: 65535 x 65535 claim in a 40-byte file
    val bomb = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](-1, -1, -1, -1, 0, 0, 0, 0x3b)
    assert(ops.GifCodec.decodeGif(bomb).isEmpty)
    // frame rect outside the canvas
    val oob = ops.GifCodec.encodeGif(3, 2, pal4, 0,
      Seq(ops.GifCodec.FrameSpec(2, 1, 2, 1, Array[Byte](1, 1))))
    assert(ops.GifCodec.decodeGif(oob).isEmpty, "frame exceeds canvas")
    // pixel index beyond the palette: 2-color table, index 3 used
    val smallPal = Array[Byte](0, 0, 0, 9, 9, 9)
    val badIdx = ops.GifCodec.encodeGif(2, 1, smallPal, 0,
      Seq(ops.GifCodec.FrameSpec(0, 0, 2, 1, Array[Byte](1, 3))))
    assert(ops.GifCodec.decodeGif(badIdx).isEmpty, "index beyond palette")
    // truncated GCE (extension header cut mid-block)
    val gceCut = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](2, 0, 1, 0, 0x81.toByte, 0, 0) ++ pal4 ++
      Array[Byte](0x21, 0xf9.toByte, 4, 0)
    assert(ops.GifCodec.decodeGif(gceCut).isEmpty, "chopped GCE")
    // LZW garbage inside a valid container shell
    val shell = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](2, 0, 1, 0, 0x81.toByte, 0, 0) ++ pal4 ++
      Array[Byte](0x2c, 0, 0, 0, 0, 2, 0, 1, 0, 0, 2, 4,
        0x7f, 0x7f, 0x7f, 0x7f, 0, 0x3b)
    assert(ops.GifCodec.decodeGif(shell).isEmpty, "garbage LZW")
    assert(ops.GifCodec.decodeGif(null).isEmpty)
    assert(ops.GifCodec.decodeGif("NOTAGIF".getBytes).isEmpty)
  }

  test("frame-count bomb: cumulative retained bytes are gated, not just the single canvas (r14 ADVICE)") {
    // A 4096x4096 canvas passes the single-canvas gate (~50 MB < 1 GiB)
    // and each 1x1 frame rect is trivially under the rect gate — but
    // the per-frame snapshot CLONES the canvas, so a few-KB file with
    // enough frames would allocate unbounded memory. 22 frames cross
    // the 1 GiB cumulative budget at frame 21 -> the whole GIF
    // quarantines (None), like every other hostile shape.
    val smallPal = Array[Byte](0, 0, 0, 9, 9, 9)
    val manyTiny = ops.GifCodec.encodeGif(4096, 4096, smallPal, 0,
      Seq.fill(22)(ops.GifCodec.FrameSpec(0, 0, 1, 1, Array[Byte](1))))
    assert(manyTiny.length < 4096, "the bomb is a few-KB file")
    assert(ops.GifCodec.decodeGif(manyTiny).isEmpty, "cumulative gate trips")
    // the same stream under a finite retention cap decodes fine: the
    // gate counts RETAINED snapshots, and maxFrames stops the decode
    assert(ops.GifCodec.decodeGif(manyTiny, maxFrames = 3).get._3.size === 3)
    // and a sampler that keeps every 8th retains only 3 of 22 frames
    assert(ops.GifCodec.decodeGif(manyTiny, keepEvery = 8).get._3.size === 3)
  }

  test("keepEvery composites skipped frames but retains only every k-th (r14 ADVICE)") {
    // 5 full-canvas frames painting colors 0..3,0; retained frame j
    // under keepEvery=2 must equal composited frame 2j of the full
    // decode — including frame 4, whose canvas state depends on the
    // SKIPPED frame 3 having been composited
    val frames5 = (0 until 4).map { k =>
      ops.GifCodec.FrameSpec(0, 0, 2, 2, Array.fill[Byte](4)(k.toByte))
    } :+ ops.GifCodec.FrameSpec(0, 0, 1, 1, Array[Byte](0)) // partial 5th
    val gif = ops.GifCodec.encodeGif(2, 2, pal4, 0, frames5)
    val full = ops.GifCodec.decodeGif(gif).get._3
    assert(full.size === 5)
    val sampled = ops.GifCodec.decodeGif(gif, keepEvery = 2).get._3
    assert(sampled.size === 3)
    Seq(0, 1, 2).foreach { j =>
      assert(sampled(j).toSeq === full(2 * j).toSeq, s"retained $j = composited ${2 * j}")
    }
    val capped = ops.GifCodec.decodeGif(gif, maxFrames = 2, keepEvery = 2).get._3
    assert(capped.size === 2 && capped(1).toSeq === full(2).toSeq,
      "maxFrames bounds RETAINED frames")
  }

  test("zero-frame GIF: gifMeta matches decodeGif's rejection (r14 ADVICE)") {
    // header + trailer, no image block: decodeGif has always returned
    // None; gifMeta used to report Some((w,h,0)) — an ok=true meta row
    // for media the decode path quarantines
    val noFrames = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](2, 0, 2, 0, 0x81.toByte, 0, 0) ++ pal4 ++ Array[Byte](0x3b)
    assert(ops.GifCodec.decodeGif(noFrames).isEmpty)
    assert(ops.GifCodec.gifMeta(noFrames).isEmpty, "meta agrees with decode")
  }

  test("image_meta / decodeToRaw / sampleGifFrames integration: frames flow into the feature family") {
    val rnd = new scala.util.Random(13)
    val frames = (0 until 5).map { k =>
      ops.GifCodec.FrameSpec(0, 0, 8, 8,
        Array.fill[Byte](64)(((k + rnd.nextInt(2)) % 4).toByte))
    }
    val gif = ops.GifCodec.encodeGif(8, 8, pal4, 0, frames)
    // meta surfaces through the shared decodeMeta (and thus image_meta)
    assert(ops.Multimodal.decodeMeta(gif) ===
      Some(ops.Multimodal.MediaMeta(8, 8, 3, "gif")))
    // a still consumer sees frame 1
    val Some((w, h, c, body)) = ops.Multimodal.decodeToRaw(gif)
    assert((w, h, c) === ((8, 8, 3)))
    assert(body.toSeq === ops.GifCodec.decodeGif(gif).get._3.head.toSeq)
    // sample every 2nd frame, cap 2 → frame_idx 0 and 2
    val media = Seq((1L, gif), (2L, "JUNK".getBytes)).toDS()
    val rows = ops.Multimodal.sampleGifFrames(media, every = 2, maxSampled = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(3)))
    assert(rows.filter(_._1 == 1L).map(t => (t._2, t._3)).sorted.toSeq ===
      Seq((0, true), (2, true)))
    assert(rows.filter(_._1 == 2L).toSeq === Seq((2L, -1, false)),
      "corrupt media takes the quarantine row")
    // sampled frames are real stills: the feature kernel consumes them
    val sampled = ops.Multimodal.sampleGifFrames(media, every = 2, maxSampled = 2)
      .filter("ok").select("media_id", "frame")
      .as[(Long, Array[Byte])]
    val feats = ops.Multimodal.extractFeaturesRaw(sampled).collect()
    assert(feats.length === 2 && feats.forall(_.getBoolean(2)))
    // and the WAV meta convention rides the same surface
    val wav = ops.AudioCodec.encodeWav(8000, 2, 16, Array.fill(64)(5))
    assert(ops.Multimodal.decodeMeta(wav) ===
      Some(ops.Multimodal.MediaMeta(32, 1, 2, "wav")))
  }

  test("multimodal_gif_frames: per-label cells replay from a driver-side codec loop; frame roll conserves pixel mass") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val got = ops.Llm2.multimodalGifFrames(spark, dir).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val emb = io.Readers.table(spark, dir, "embeddings")
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val want = emb.groupBy(_._1).map { case (l, g) =>
      val cells = g.map { case (_, e) =>
        val idx = e.map(x =>
          (math.max(0, math.min(3, ((x + 1.0f) * 2.0f).toInt))).toByte)
        val f2 = idx.drop(8) ++ idx.take(8)
        val pal = Array[Byte](0, 0, 0, 85, 85, 85, -86, -86, -86, -1, -1, -1)
        val gif = ops.GifCodec.encodeGif(8, 8, pal, 0, Seq(
          ops.GifCodec.FrameSpec(0, 0, 8, 8, idx),
          ops.GifCodec.FrameSpec(0, 0, 8, 8, f2)))
        val Some((_, _, frames)) = ops.GifCodec.decodeGif(gif)
        // pixel-mass conservation: frame 2 is a row roll of frame 1
        assert(frames(0).foldLeft(0L)((a, b) => a + (b & 0xff)) ===
          frames(1).foldLeft(0L)((a, b) => a + (b & 0xff)))
        (frames.size.toLong,
          frames.map(_.foldLeft(0L)((a, b) => a + (b & 0xff))).sum)
      }
      l -> ((g.length.toLong, g.length.toLong,
        cells.map(_._1).sum, cells.map(_._2).sum))
    }
    assert(got === want, "cells must replay exactly")
    assert(got.values.forall { case (n, ok, _, _) => n === ok },
      "every synthesized GIF must decode")
  }
}

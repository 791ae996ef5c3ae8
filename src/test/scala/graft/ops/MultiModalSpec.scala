package graft.ops

import graft.SparkSpec
import graft.ops.MultiModal._

class MultiModalSpec extends SparkSpec {

  test("media corpus is deterministic and typed") {
    val a = MultiModal.dataset(spark, 100).collect().sortBy(_.media_id)
    val b = MultiModal.dataset(spark, 100).collect().sortBy(_.media_id)
    assert(a.map(_.media_id).sameElements(b.map(_.media_id)))
    a.zip(b).foreach { case (x, y) =>
      assert(java.util.Arrays.equals(x.payload, y.payload))
      assert(x.kind === y.kind && x.meta === y.meta)
    }
    assert(a.map(_.kind).distinct.sorted.sameElements(Array("audio", "image", "video")))
  }

  test("feature extraction is total, batched, and deterministic") {
    import spark.implicits._
    val media = MultiModal.dataset(spark, 200)
    val feats = MultiModal.extractFeatures(media).collect()
    assert(feats.length === 200)
    feats.foreach { f =>
      assert(f.features.length === FakeDecoder.Dim)
      // L1-normalized histogram sums to ~1
      assert(math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-3)
      assert(f.n_bytes >= 256)
    }
    // malformed (null payload) never throws, yields empty features
    val broken = Seq(MediaRow(999L, "image", MediaMeta(1, 1, 0), null)).toDS()
    val out = MultiModal.extractFeatures(broken).collect().head
    assert(out.n_bytes === 0L)
    assert(out.features.forall(_ == 0.0f))
  }

  test("header codec: wrap -> parse round-trips the real container fields") {
    val content = Array.tabulate(300)(i => (i * 7).toByte)
    val bmp = HeaderCodec.parse(HeaderCodec.wrapBmp(640, 480, content))
    assert(bmp === MediaHeader("bmp", 640, 480, 3, 0, 24))
    val png = HeaderCodec.parse(HeaderCodec.wrapPng(123, 457, content))
    assert(png === MediaHeader("png", 123, 457, 3, 0, 8))
    val wav = HeaderCodec.parse(HeaderCodec.wrapWav(44100, 2, 16, content))
    assert(wav === MediaHeader("wav", 0, 0, 2, 44100, 16))
    val jpg = HeaderCodec.parse(HeaderCodec.wrapJpeg(511, 289, content))
    assert(jpg === MediaHeader("jpeg", 511, 289, 3, 0, 8))
    // the content area comes back byte-identical for every format
    Seq(HeaderCodec.wrapBmp(640, 480, content),
        HeaderCodec.wrapPng(123, 457, content),
        HeaderCodec.wrapWav(44100, 2, 16, content),
        HeaderCodec.wrapJpeg(511, 289, content)).foreach { b =>
      val h = HeaderCodec.parse(b)
      assert(java.util.Arrays.equals(HeaderCodec.content(b, h), content))
    }
    // the JPEG parser walks markers generically: an extra APPn segment
    // before the SOF must not shift the parse (real files front-load EXIF)
    val canonical = HeaderCodec.wrapJpeg(88, 44, content)
    val exifish = {
      val app1 = Array[Byte](0xFF.toByte, 0xE1.toByte, 0, 8,
        'E', 'x', 'i', 'f', 0, 0)
      canonical.take(2) ++ app1 ++ canonical.drop(2)
    }
    assert(HeaderCodec.parse(exifish) === MediaHeader("jpeg", 88, 44, 3, 0, 8))
    // a scan-before-frame (no SOF) buffer falls through, no throw
    assert(HeaderCodec.parse(Array[Byte](0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xDA.toByte, 0, 4, 0, 0)) === null)
    // non-containers and truncated buffers fall through to null, no throw
    assert(HeaderCodec.parse(null) === null)
    assert(HeaderCodec.parse(Array[Byte](1, 2, 3)) === null)
    assert(HeaderCodec.parse("RIFFxxxxWAVE".getBytes("US-ASCII")) === null)
  }

  test("png chunks carry genuine CRC-32s (a standard reader would accept them)") {
    val b = HeaderCodec.wrapPng(17, 5, Array.tabulate(64)(_.toByte))
    // verify each chunk's CRC over type+data, independent of the writer
    var o = 8
    var chunks = 0
    while (o + 12 <= b.length) {
      val len = ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
      val crc = new java.util.zip.CRC32()
      crc.update(b, o + 4, 4 + len)
      val stored = ((b(o + 8 + len) & 0xffL) << 24) | ((b(o + 9 + len) & 0xffL) << 16) |
        ((b(o + 10 + len) & 0xffL) << 8) | (b(o + 11 + len) & 0xffL)
      assert((crc.getValue & 0xffffffffL) === stored, s"chunk at $o")
      chunks += 1
      o += 12 + len
    }
    assert(chunks === 3) // IHDR, IDAT, IEND
  }

  test("fixture payloads are real containers; headerStats matches a direct parse") {
    val media = MultiModal.dataset(spark, 300)
    val rows = media.collect()
    rows.foreach { r =>
      val h = HeaderCodec.parse(r.payload)
      r.kind match {
        case "image" =>
          assert(h != null &&
            (h.format == "bmp" || h.format == "png" || h.format == "jpeg"))
          assert(h.width === r.meta.width && h.height === r.meta.height)
        case "audio" =>
          assert(h != null && h.format === "wav")
          assert(h.sample_rate === r.meta.sample_rate && h.bit_depth === 16)
        case _ => assert(h === null) // video: raw blob, fallback path
      }
    }
    val stats = MultiModal.headerStats(media).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = rows.map(r => Option(HeaderCodec.parse(r.payload))
        .map(_.format).getOrElse("raw"))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(stats === direct)
    assert(Set("png", "bmp", "jpeg", "wav", "raw").subsetOf(stats.keySet))
  }

  test("kind stats match a direct computation") {
    val media = MultiModal.dataset(spark, 300)
    val stats = MultiModal.kindStats(MultiModal.extractFeatures(media))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = media.collect().groupBy(_.kind).map { case (k, rs) =>
      k -> (rs.length.toLong, rs.map(_.payload.length.toLong).sum)
    }
    assert(stats === direct)
  }
}

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

package graft.sketch

import scala.util.hashing.MurmurHash3

/** Count-min frequency sketch (Cormode & Muthukrishnan, "An improved data
  * stream summary: the count-min sketch and its applications", J.Algorithms
  * 2005).
  *
  * The streaming generalization of the reference's compiled-in knowledge of
  * which strings recur (/root/reference/mechanisms/watermark_processor.py:79,
  * 104-109 hardcode the patterns; we *learn* them per session).
  *
  * Properties the engine depends on:
  *  - deterministic, seed-stable hashing (MurmurHash3 with fixed per-row
  *    seeds) — byte-identical replay requires it;
  *  - a commutative monoid under [[merge]] — per-salt partial sketches from
  *    a skewed pre-aggregation merge associatively (SURVEY.md §4.2);
  *  - no false negatives: estimate ≥ true count, so a threshold test never
  *    misses a real recurring pattern (mirrors the reference's generous
  *    multi-granularity matching, watermark_processor.py:103-135).
  *
  * Mutable by design: lives inside `flatMapGroupsWithState` state where the
  * buffer is updated per micro-batch, then serialized by the state encoder
  * as a plain `Array[Long]`.
  */
final case class CountMin(depth: Int, width: Int, counts: Array[Long], var total: Long) {

  @inline private def bucket(row: Int, item: String): Int = {
    val h = MurmurHash3.stringHash(item, CountMin.RowSeeds(row))
    // floor-mod to a non-negative bucket
    val m = h % width
    row * width + (if (m < 0) m + width else m)
  }

  def add(item: String, c: Long = 1L): this.type = {
    var r = 0
    while (r < depth) { counts(bucket(r, item)) += c; r += 1 }
    total += c
    this
  }

  /** Point estimate: min over rows; ≥ true count. */
  def estimate(item: String): Long = {
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = counts(bucket(r, item))
      if (v < min) min = v
      r += 1
    }
    if (min == Long.MaxValue) 0L else min
  }

  /** Monoid combine; requires equal (depth, width). */
  def merge(other: CountMin): CountMin = {
    require(other.depth == depth && other.width == width,
      s"sketch shape mismatch: ${depth}x$width vs ${other.depth}x${other.width}")
    val out = new Array[Long](counts.length)
    var i = 0
    while (i < counts.length) { out(i) = counts(i) + other.counts(i); i += 1 }
    CountMin(depth, width, out, total + other.total)
  }

  override def equals(o: Any): Boolean = o match {
    case c: CountMin =>
      c.depth == depth && c.width == width && c.total == total &&
        java.util.Arrays.equals(c.counts, counts)
    case _ => false
  }
  override def hashCode: Int =
    (depth, width, total, java.util.Arrays.hashCode(counts)).hashCode
}

object CountMin {
  /** Fixed per-row hash seeds (any distinct constants; stability is what
    * matters). Supports depth ≤ 8. */
  val RowSeeds: Array[Int] =
    Array(0x9747b28c, 0x41c64e6d, 0x2545f491, 0x6c078965,
          0x1b873593, 0x85ebca6b, 0xc2b2ae35, 0x27d4eb2f)

  /** ε ≈ e/width overestimate bound, δ ≈ e^-depth failure prob.
    * width=2048, depth=4 → overestimate ≤ ~0.13% of stream total whp —
    * plenty for per-session streams of ≤ a few thousand sentences. */
  def empty(depth: Int = 4, width: Int = 2048): CountMin = {
    require(depth >= 1 && depth <= RowSeeds.length)
    CountMin(depth, width, new Array[Long](depth * width), 0L)
  }
}

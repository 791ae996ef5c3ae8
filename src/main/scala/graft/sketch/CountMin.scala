package graft.sketch

import scala.collection.mutable
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
  * Representation: the logical `depth × width` counter matrix is stored as a
  * sparse open-addressing map of touched cells. Per-session sketches touch
  * only O(distinct sentences · depth) of the matrix, and a dense
  * `Array[Long]` per state row was measured to be the memory-bandwidth
  * bottleneck of the whole streaming pipeline (32 KB alloc+zero+scan per
  * state update). Semantics are identical to the dense form.
  */
final class CountMin(val depth: Int, val width: Int,
                     val cells: mutable.LongMap[Long], var total: Long) {

  @inline private def cell(row: Int, item: String): Long = {
    val h = MurmurHash3.stringHash(item, CountMin.RowSeeds(row))
    val m = h % width
    row.toLong * width + (if (m < 0) m + width else m)
  }

  def add(item: String, c: Long = 1L): this.type = {
    var r = 0
    while (r < depth) {
      val k = cell(r, item)
      cells(k) = cells.getOrElse(k, 0L) + c
      r += 1
    }
    total += c
    this
  }

  /** Point estimate: min over rows; ≥ true count. */
  def estimate(item: String): Long = {
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = cells.getOrElse(cell(r, item), 0L)
      if (v < min) min = v
      r += 1
    }
    if (min == Long.MaxValue) 0L else min
  }

  /** Monoid combine; requires equal (depth, width). */
  def merge(other: CountMin): CountMin = {
    require(other.depth == depth && other.width == width,
      s"sketch shape mismatch: ${depth}x$width vs ${other.depth}x${other.width}")
    val out = mutable.LongMap.empty[Long]
    cells.foreachEntry((k, v) => out(k) = v)
    other.cells.foreachEntry((k, v) => out(k) = out.getOrElse(k, 0L) + v)
    new CountMin(depth, width, out, total + other.total)
  }

  override def equals(o: Any): Boolean = o match {
    case c: CountMin =>
      c.depth == depth && c.width == width && c.total == total &&
        c.cells.size == cells.size &&
        cells.forall { case (k, v) => c.cells.getOrElse(k, 0L) == v }
    case _ => false
  }
  override def hashCode: Int =
    (depth, width, total, cells.size).hashCode
}

object CountMin {
  /** Fixed per-row hash seeds (any distinct constants; stability is what
    * matters). Supports depth ≤ 8. */
  val RowSeeds: Array[Int] =
    Array(0x9747b28c, 0x41c64e6d, 0x2545f491, 0x6c078965,
          0x1b873593, 0x85ebca6b, 0xc2b2ae35, 0x27d4eb2f)

  /** ε ≈ e/width overestimate bound, δ ≈ e^-depth failure prob.
    * width=1024, depth=4 keeps P(false-learn) negligible for per-session
    * streams of ≤ a few thousand sentences. */
  def empty(depth: Int = 4, width: Int = 1024): CountMin = {
    require(depth >= 1 && depth <= RowSeeds.length)
    new CountMin(depth, width, mutable.LongMap.empty[Long], 0L)
  }

  /** State-store codec: sorted (cell, value) pairs — O(nnz), deterministic. */
  def toSparse(sk: CountMin): (Array[Long], Array[Long]) = {
    val ks = sk.cells.keys.toArray
    java.util.Arrays.sort(ks)
    val vals = new Array[Long](ks.length)
    var i = 0
    while (i < ks.length) { vals(i) = sk.cells(ks(i)); i += 1 }
    (ks, vals)
  }

  def fromSparse(depth: Int, width: Int, idx: Array[Long], vals: Array[Long],
                 total: Long): CountMin = {
    val cells = mutable.LongMap.empty[Long]
    var i = 0
    while (i < idx.length) { cells(idx(i)) = vals(i); i += 1 }
    new CountMin(depth, width, cells, total)
  }
}

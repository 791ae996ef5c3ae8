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
  *  - deterministic, seed-stable hashing (one 64-bit key hash per item;
  *    per-row cells derived from it by mixing with fixed row seeds) —
  *    byte-identical replay requires it;
  *  - a commutative monoid under [[merge]] — per-salt partial sketches from
  *    a skewed pre-aggregation merge associatively (SURVEY.md §4.2);
  *  - no false negatives: estimate ≥ true count, so a threshold test never
  *    misses a real recurring pattern (mirrors the reference's generous
  *    multi-granularity matching, watermark_processor.py:103-135).
  *
  * Representation — two-tier, because state-store bytes and per-update map
  * operations are the dominant streaming costs:
  *  - while a sketch holds ≤ [[CountMin.MaxTrackedKeys]] distinct keys it
  *    stores EXACT per-key-hash counts (one map op per add instead of
  *    depth+1; one (keyHash,count) pair per key in the state codec instead
  *    of depth cells) and materializes the cell matrix LAZILY — typically
  *    once, at session close, when estimates are read (CMS is linear, so
  *    replaying exact key counts reproduces the identical cells);
  *  - past the cap the key map folds into the cells and is dropped —
  *    bounded at depth × width forever after (the actual count-min
  *    guarantee, for adversarial never-ending sessions).
  * Estimates always read the cell matrix, so query semantics are the
  * count-min min-over-rows in both tiers.
  */
final class CountMin private (val depth: Int, val width: Int,
                              private var _cells: mutable.LongMap[Long],
                              var total: Long,
                              /** exact per-key counts; null once folded */
                              private var _keyCounts: mutable.LongMap[Long],
                              private var cellsDirty: Boolean) {

  def keyCounts: mutable.LongMap[Long] = _keyCounts

  @inline private def cell(row: Int, kh: Long): Long = {
    val m = CountMin.mix64(kh ^ CountMin.RowSeeds(row)) % width
    row.toLong * width + (if (m < 0) m + width else m)
  }

  @inline private def addToCells(into: mutable.LongMap[Long], kh: Long, c: Long): Unit = {
    var r = 0
    while (r < depth) {
      val k = cell(r, kh)
      into(k) = into.getOrElse(k, 0L) + c
      r += 1
    }
  }

  /** Materialized cell matrix (rebuilt from key counts when stale). */
  def cells: mutable.LongMap[Long] = {
    if (cellsDirty) {
      val m = mutable.LongMap.empty[Long]
      _keyCounts.foreachEntry((kh, c) => addToCells(m, kh, c))
      _cells = m
      cellsDirty = false
    }
    _cells
  }

  def add(item: String, c: Long = 1L): this.type =
    addHash(CountMin.keyHash(item), c)

  def addHash(kh: Long, c: Long): this.type = {
    if (_keyCounts != null) {
      _keyCounts(kh) = _keyCounts.getOrElse(kh, 0L) + c
      cellsDirty = true
      if (_keyCounts.size > CountMin.MaxTrackedKeys) {
        val m = cells // materialize from the full key map
        _keyCounts = null
        _cells = m
      }
    } else addToCells(_cells, kh, c)
    total += c
    this
  }

  /** Add one occurrence and return the key's post-add count estimate in
    * O(depth) — WITHOUT materializing the cell matrix (an estimate() call
    * in sparse mode rebuilds every cell, which would be O(keys) per add).
    * In sparse mode the returned value is the key's EXACT count; once
    * folded it is the usual CMS overestimate. This powers incremental
    * threshold-crossing detection in the streaming hot path (the learned
    * set accretes at add time instead of re-deriving sentences at session
    * close). */
  def addAndCount(item: String, c: Long = 1L): Long = {
    val kh = CountMin.keyHash(item)
    if (_keyCounts != null) {
      addHash(kh, c) // may fold; count stays exact either way at this point
      if (_keyCounts != null) _keyCounts(kh)
      else estimateHash(kh)
    } else {
      addHash(kh, c) // folded: cells updated in place, cellsDirty stays false
      estimateHash(kh)
    }
  }

  /** Point estimate: min over rows of the cell matrix; ≥ true count. */
  def estimate(item: String): Long = estimateHash(CountMin.keyHash(item))

  def estimateHash(kh: Long): Long = {
    val cs = cells
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = cs.getOrElse(cell(r, kh), 0L)
      if (v < min) min = v
      r += 1
    }
    min
  }

  /** Monoid combine; requires equal (depth, width). */
  def merge(other: CountMin): CountMin = {
    require(other.depth == depth && other.width == width,
      s"sketch shape mismatch: ${depth}x$width vs ${other.depth}x${other.width}")
    if (_keyCounts != null && other._keyCounts != null) {
      val m = mutable.LongMap.empty[Long]
      _keyCounts.foreachEntry((k, v) => m(k) = v)
      other._keyCounts.foreachEntry((k, v) => m(k) = m.getOrElse(k, 0L) + v)
      val out = new CountMin(depth, width, mutable.LongMap.empty[Long],
        total + other.total, m, true)
      if (m.size > CountMin.MaxTrackedKeys) {
        val cs = out.cells
        out._keyCounts = null
        out._cells = cs
      }
      out
    } else {
      val m = mutable.LongMap.empty[Long]
      cells.foreachEntry((k, v) => m(k) = v)
      other.cells.foreachEntry((k, v) => m(k) = m.getOrElse(k, 0L) + v)
      new CountMin(depth, width, m, total + other.total, null, false)
    }
  }

  override def equals(o: Any): Boolean = o match {
    case c: CountMin =>
      c.depth == depth && c.width == width && c.total == total && {
        val a = cells; val b = c.cells
        a.size == b.size && a.forall { case (k, v) => b.getOrElse(k, 0L) == v }
      }
    case _ => false
  }
  override def hashCode: Int = (depth, width, total).hashCode
}

object CountMin {
  /** Fixed per-row mixing seeds (any distinct constants; stability is what
    * matters). Supports depth ≤ 8. */
  val RowSeeds: Array[Long] =
    Array(0x9747b28c17ce4e6dL, 0x41c64e6d2545f491L, 0x2545f4916c078965L,
      0x6c0789651b873593L, 0x1b87359385ebca6bL, 0x85ebca6bc2b2ae35L,
      0xc2b2ae3527d4eb2fL, 0x27d4eb2f9747b28cL)

  /** splitmix64 finalizer (same mixing family as graft.gen.Mix). */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** 64-bit seed-stable key hash: two independent 32-bit murmur hashes. */
  def keyHash(item: String): Long = {
    val h1 = MurmurHash3.stringHash(item, 0x9747b28c)
    val h2 = MurmurHash3.stringHash(item, 0x41c64e6d)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  /** Key-count tracking cap: past this many distinct keys a sketch folds to
    * its (bounded) cell form. */
  val MaxTrackedKeys = 8192

  /** Serialized-state discriminators (ConvState.skKind). */
  val KindKeys = 1
  val KindCells = 0

  /** ε ≈ e/width overestimate bound, δ ≈ e^-depth failure prob.
    * width=8192, depth=4 keeps P(false-learn) negligible for per-session
    * streams of ≤ a few thousand sentence/shingle keys. */
  def empty(depth: Int = 4, width: Int = 8192): CountMin = {
    require(depth >= 1 && depth <= RowSeeds.length)
    new CountMin(depth, width, mutable.LongMap.empty[Long], 0L,
      mutable.LongMap.empty[Long], false)
  }

  /** State-store codec: sorted (key, value) pairs — (keyHash, exact count)
    * while tracked (1/depth the entries), else (cell, value). O(nnz),
    * deterministic. Returns (idx, vals, kind). */
  def toSparse(sk: CountMin): (Array[Long], Array[Long], Int) = {
    val (src, kind) =
      if (sk.keyCounts != null) (sk.keyCounts, KindKeys) else (sk.cells, KindCells)
    val ks = src.keys.toArray
    java.util.Arrays.sort(ks)
    val vals = new Array[Long](ks.length)
    var i = 0
    while (i < ks.length) { vals(i) = src(ks(i)); i += 1 }
    (ks, vals, kind)
  }

  /** Self-describing byte codec (shape + kind + sparse entries) — the
    * aggregation-buffer / BinaryType form of the state-store codec above.
    * Deterministic: entries are sorted by [[toSparse]]. */
  def toBytes(sk: CountMin): Array[Byte] = {
    val (idx, vals, kind) = toSparse(sk)
    val bb = java.nio.ByteBuffer.allocate(4 * 4 + 8 + idx.length * 16)
    bb.putInt(sk.depth).putInt(sk.width).putInt(kind).putInt(idx.length)
    bb.putLong(sk.total)
    var i = 0
    while (i < idx.length) { bb.putLong(idx(i)); i += 1 }
    i = 0
    while (i < vals.length) { bb.putLong(vals(i)); i += 1 }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): CountMin = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val depth = bb.getInt; val width = bb.getInt
    val kind = bb.getInt; val n = bb.getInt
    val total = bb.getLong
    val idx = new Array[Long](n)
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) { idx(i) = bb.getLong; i += 1 }
    i = 0
    while (i < n) { vals(i) = bb.getLong; i += 1 }
    fromSparse(depth, width, idx, vals, total, kind)
  }

  def fromSparse(depth: Int, width: Int, idx: Array[Long], vals: Array[Long],
                 total: Long, kind: Int): CountMin = {
    if (kind == KindKeys) {
      val keys = mutable.LongMap.empty[Long]
      var i = 0
      while (i < idx.length) { keys(idx(i)) = vals(i); i += 1 }
      new CountMin(depth, width, mutable.LongMap.empty[Long], total, keys, true)
    } else {
      val cells = mutable.LongMap.empty[Long]
      var i = 0
      while (i < idx.length) { cells(idx(i)) = vals(i); i += 1 }
      new CountMin(depth, width, cells, total, null, false)
    }
  }
}

package graft.bench

/** Box characterization microbenchmark — no Spark involved. Measures how
  * raw work scales from 1 to N `taskset`-pinned cores on THIS machine:
  *
  *  - `mem`: a per-thread 2×256 MB array copy loop (every thread owns its
  *    arrays — zero sharing, zero locks; the only shared resource is the
  *    LLC/DRAM system). This is the upper bound for any workload whose
  *    inner loop moves strings/rows through memory.
  *  - `cpu`: a per-thread splitmix64 chain (register-only, no memory
  *    traffic) — the control proving the CORES themselves scale.
  *
  * Rationale: the pinned 1→4 scaling protocol (ScalingBench) measures the
  * ENGINE at ~0.73 efficiency on this box across three successive builds
  * whose absolute throughput differs by 2.2× — an engine serial stage
  * would move that ratio, a machine bound would not. This probe pins the
  * bound to the machine: if embarrassingly-parallel memcpy scales at the
  * same ~0.7x here, the engine adds no contention of its own, and on a
  * real cluster (where 4N executors bring 4× the memory systems — the
  * regime the ≥0.8 rule describes) the limit does not exist.
  *
  * Run (after `sbt compile`):
  * {{{
  *   taskset -c 0   java -cp target/scala-2.13/classes:/opt/spark/jars/\* graft.bench.MemProbe 1 mem
  *   taskset -c 0-3 java -cp target/scala-2.13/classes:/opt/spark/jars/\* graft.bench.MemProbe 4 mem
  * }}}
  */
object MemProbe {
  private def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val mode = if (args.length > 1) args(1) else "mem"
    val secs = if (args.length > 2) args(2).toInt else 6
    val counters = new Array[Long](threads)
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val ths = (0 until threads).map { t =>
      val th = new Thread(() => {
        val deadline = System.nanoTime() + secs * 1000000000L
        if (mode == "mem") {
          val n = (256 << 20) / 8 // 256 MB of longs
          val a = new Array[Long](n)
          val b = new Array[Long](n)
          java.util.Arrays.fill(a, t.toLong) // touch pages
          var iters = 0L
          while (System.nanoTime() < deadline) {
            System.arraycopy(a, 0, b, 0, n)
            iters += 1
          }
          counters(t) = iters * n * 16L // bytes read + written
          sink.addAndGet(b(n - 1))
        } else if (mode == "alloc") {
          // allocation churn in the SHARED heap: short-lived strings +
          // arrays at engine-like sizes — measures how the one-JVM
          // allocator/GC complex scales across threads (a real cluster
          // gives every executor its own heap)
          var x = t + 1L
          var iters = 0L
          while (System.nanoTime() < deadline) {
            var i = 0
            var acc = 0
            while (i < 1000) {
              x = mix64(x)
              val s = java.lang.Long.toHexString(x) + " pipeline stream data model " + i
              val parts = s.split(' ')
              val sb = new java.lang.StringBuilder(64)
              var j = 0
              while (j < parts.length) { sb.append(parts(j)).append(':'); j += 1 }
              acc += sb.toString.hashCode
              i += 1
            }
            sink.addAndGet(acc & 1L)
            iters += 1
          }
          counters(t) = iters * 1000L
        } else {
          var x = t + 1L
          var iters = 0L
          while (System.nanoTime() < deadline) {
            var i = 0
            while (i < 1000000) { x = mix64(x); i += 1 }
            iters += 1
          }
          counters(t) = iters * 1000000L
          sink.addAndGet(x)
        }
      })
      th.start()
      th
    }
    ths.foreach(_.join())
    val total = counters.sum
    val perSec = total.toDouble / secs
    val unit = if (mode == "mem") "bytes/s" else "ops/s"
    println(f"PROBE mode=$mode threads=$threads perSec=$perSec%.3e unit=$unit sink=${sink.get() & 1}")
  }
}

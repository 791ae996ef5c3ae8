package graft.sketch

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.PropHelpers

class CountMinSpec extends AnyFunSuite with PropHelpers {
  val items: Gen[List[String]] =
    Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "ee", "ff", "longer sentence one",
      "longer sentence two", "x y z"))

  test("no false negatives: estimate >= true count") {
    forAllSeeded(items, 100) { xs =>
      val sk = CountMin.empty(4, 64) // small width to force collisions
      xs.foreach(sk.add(_))
      xs.distinct.foreach { x =>
        val truth = xs.count(_ == x)
        assert(sk.estimate(x) >= truth, s"underestimate for $x")
      }
    }
  }

  test("exact at test scale with default width") {
    forAllSeeded(items, 100) { xs =>
      val sk = CountMin.empty()
      xs.foreach(sk.add(_))
      xs.distinct.foreach { x =>
        assert(sk.estimate(x) === xs.count(_ == x))
      }
    }
  }

  test("merge is a commutative monoid (partial sketches == single sketch)") {
    forAllSeeded2(items, items, 100) { (xs, ys) =>
      val a = CountMin.empty(4, 64); xs.foreach(a.add(_))
      val b = CountMin.empty(4, 64); ys.foreach(b.add(_))
      val whole = CountMin.empty(4, 64); (xs ++ ys).foreach(whole.add(_))
      assert(a.merge(b) === whole)
      assert(a.merge(b) === b.merge(a))
      val zero = CountMin.empty(4, 64)
      assert(a.merge(zero) === a)
    }
  }

  test("deterministic across instances (seed-stable hashing)") {
    val a = CountMin.empty(); val b = CountMin.empty()
    Seq("s1", "s2", "s1").foreach { x => a.add(x); b.add(x) }
    assert(a === b)
    assert(a.estimate("s1") === 2L)
    assert(a.estimate("absent") <= 0L + a.total) // defined, no throw
  }

  test("sparse codec round-trips in key form and in folded cell form") {
    forAllSeeded(items, 100) { xs =>
      val sk = CountMin.empty(4, 64)
      xs.foreach(sk.add(_))
      assert(sk.keyCounts != null, "few keys -> key-count form")
      val (idx, vals, kind) = CountMin.toSparse(sk)
      assert(kind === CountMin.KindKeys)
      assert(idx.length <= xs.distinct.size) // 1/depth of the cell form
      val back = CountMin.fromSparse(4, 64, idx, vals, sk.total, kind)
      assert(back === sk)
      xs.distinct.foreach(x => assert(back.estimate(x) === sk.estimate(x)))
    }
    // force the fold: more distinct keys than the tracking cap
    val big = CountMin.empty(4, 1024)
    (0 until CountMin.MaxTrackedKeys + 10).foreach(i => big.add(s"key-$i"))
    assert(big.keyCounts === null, "past the cap -> folded")
    val (idx, vals, kind) = CountMin.toSparse(big)
    assert(kind === CountMin.KindCells)
    assert(idx.length <= 4 * 1024, "cell form is bounded by depth x width")
    val back = CountMin.fromSparse(4, 1024, idx, vals, big.total, kind)
    assert(back === big)
    assert(back.estimate("key-7") >= 1L)
  }

  test("shape mismatch rejected") {
    intercept[IllegalArgumentException] {
      CountMin.empty(4, 64).merge(CountMin.empty(4, 128))
    }
  }
}

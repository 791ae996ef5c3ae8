package graft.ops

import graft.SparkSpec
import graft.gen.{DocGen, EmbGen}

class DedupSpec extends SparkSpec {
  lazy val docs = DocGen.dataset(spark, nDocs = 300).cache()
  lazy val embs = EmbGen.dataset(spark, nVecs = 300).cache()

  def pairSet(df: org.apache.spark.sql.DataFrame, a: String, b: String): Set[(Long, Long)] =
    df.select(a, b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exactJaccard = pairSet(Dedup.ngramJaccardPairs(docs), "doc_a", "doc_b")

  test("planted near-dups and exact dups are found by n-gram Jaccard") {
    // every exact dup (13k+5 -> anchor) must be a pair at J=1.0
    val exactDupPairs = (0L until 300L)
      .filter(i => i % 13 == 5 && i - i % 13 != i)
      .map(i => (i - i % 13, i)).toSet
    assert(exactDupPairs.subsetOf(exactJaccard),
      s"missing exact dups: ${exactDupPairs -- exactJaccard}")
    // near-dups (7k+3, 2 token substitutions) should essentially all be found
    val nearDupPairs = (0L until 300L)
      .filter(i => i % 7 == 3 && i - i % 7 != i)
      .map(i => (i - i % 7, i)).toSet
    val found = nearDupPairs.intersect(exactJaccard)
    assert(found.size >= (nearDupPairs.size * 9) / 10,
      s"jaccard recall too low: ${found.size}/${nearDupPairs.size}")
  }

  test("MinHash+LSH pairs == exact Jaccard pairs (verified candidates)") {
    val lsh = pairSet(Dedup.minhashLshPairs(docs), "doc_a", "doc_b")
    assert(lsh === exactJaccard)
  }

  test("md5Hash60 equals the top-60-bit hex-prefix form the oracle computes") {
    // DuckDB: CAST('0x' || substr(md5('hello world'),1,15) AS BIGINT)
    assert(Dedup.md5Hash60("hello world") ===
      java.lang.Long.parseLong("5eb63bbbe01eeed", 16))
    val probe = Seq("", "a", "the quick pipeline", "stream data model")
    probe.foreach { s =>
      val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(s).substring(0, 15)
      assert(Dedup.md5Hash60(s) === java.lang.Long.parseLong(hex, 16), s"for '$s'")
    }
  }

  test("hot-shingle cap changes the candidate join, never the output") {
    import spark.implicits._
    // 40 docs all sharing one ubiquitous boilerplate 5-gram; docs 2k/2k+1
    // are near-dups of each other via rare content shingles
    val boiler = "this content is provided for information only"
    val rows = (0 until 40).map { i =>
      val pairBase = i / 2
      val tail = if (i % 2 == 0) s"alpha$pairBase" else s"omega$pairBase"
      // 60 shared body tokens -> one differing tail token keeps J ≈ 0.86
      val body = (0 until 60).map(j => s"tok${pairBase}x$j").mkString(" ")
      (i.toLong, s"$boiler $body $tail")
    }
    val df = rows.toDF("doc_id", "text")
    val uncapped = pairSet(
      Dedup.ngramJaccardPairs(df, maxShingleDf = Int.MaxValue), "doc_a", "doc_b")
    val capped = pairSet(Dedup.ngramJaccardPairs(df, maxShingleDf = 8), "doc_a", "doc_b")
    assert(uncapped.nonEmpty, "fixture should contain near-dup pairs")
    assert(capped === uncapped)
  }

  test("all-hot pairs survive the df cap: a >cap duplicate cluster where " +
    "EVERY shared shingle is hot (round-2 ADVICE)") {
    import spark.implicits._
    // 24 identical copies of a boilerplate doc with cap=8: every one of its
    // shingles has df=24 > 8, so the rare path has NO candidate row for any
    // of the 276 true J=1.0 pairs — the exact failure mode the ADVICE named.
    // Plus near-dups inside the cluster (one tail token differs, J≈0.87) and
    // 30 unrelated docs to keep the dom-doc restriction honest.
    val boiler = (0 until 15).map(j => s"legal boilerplate tok$j").mkString(" ")
    val cluster = (0 until 24).map { i =>
      val tail = if (i % 2 == 0) "alpha" else "omega" // two sub-variants
      (i.toLong, s"$boiler $tail")
    }
    val others = (0 until 30).map { i =>
      (100L + i, (0 until 40).map(j => s"unique${i}w$j").mkString(" "))
    }
    val df = (cluster ++ others).toDF("doc_id", "text")
    val uncapped = pairSet(
      Dedup.ngramJaccardPairs(df, maxShingleDf = Int.MaxValue), "doc_a", "doc_b")
    val capped = pairSet(Dedup.ngramJaccardPairs(df, maxShingleDf = 8), "doc_a", "doc_b")
    // the 12-doc alpha clique alone is 66 pairs; all must survive the cap
    assert(uncapped.size >= 132, s"fixture broken: ${uncapped.size} pairs")
    assert(capped === uncapped)
  }

  test("SimHash finds exact dups with hamming 0 and no random-pair flood") {
    val sh = Dedup.simhashPairs(docs, maxHam = 3)
    val pairs = sh.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val exactDupPairs = (0L until 300L)
      .filter(i => i % 13 == 5 && i - i % 13 != i)
      .map(i => (i - i % 13, i))
    exactDupPairs.foreach { p =>
      assert(pairs.get(p).contains(0L), s"exact dup $p not at hamming 0")
    }
    // unrelated docs shouldn't collapse: pair count stays near dup count
    assert(pairs.size < 120, s"simhash produced ${pairs.size} pairs — flood")
  }

  test("embedding near-dup: LSH path == exact all-pairs path, dups planted") {
    val exact = pairSet(Similarity.embedDupPairs(embs), "vec_a", "vec_b")
    val planted = (0L until 300L)
      .filter(i => i % 7 == 3 && i - i % 7 != i)
      .map(i => (i - i % 7, i)).toSet
    assert(planted.subsetOf(exact), s"missing planted: ${planted -- exact}")
    val lsh = pairSet(Similarity.embedDupLsh(embs), "vec_a", "vec_b")
    assert(lsh === exact)
  }

  test("ANN top-k: self excluded, k rows per query, planted near-dup is rank 1") {
    val ann = Similarity.annTopK(embs, "vec_id", "vec", nQueries = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    assert(ann.count(_._1 == 0L) === 5)
    assert(!ann.exists(t => t._1 == t._2), "self in neighbors")
    // vec 3 is a near-dup of vec 0 → must be each other's top neighbor
    assert(ann.filter(_._1 == 3L).minBy(_._3)._2 === 0L)
    assert(ann.filter(_._1 == 0L).minBy(_._3)._2 === 3L)
  }
}

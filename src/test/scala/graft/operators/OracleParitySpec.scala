package graft.operators

import graft.SparkSpec
import graft.core.RedactionParams
import graft.gen.{GenSpec, TranscriptGen}
import graft.text.Oracle

/** Golden end-to-end parity: distributed batch operators vs the
  * single-threaded oracle (SURVEY.md §5.2.2). */
class OracleParitySpec extends SparkSpec {
  val spec: GenSpec = GenSpec(nConvs = 60)
  val p: RedactionParams = RedactionParams()

  lazy val turns = (0L until spec.nConvs.toLong).flatMap(TranscriptGen.turnsFor(_, spec))
  lazy val df = {
    import spark.implicits._
    spark.createDataset(turns).toDF()
  }

  test("fixture sanity: watermark families all present") {
    val texts = turns.map(_.text)
    assert(texts.exists(_.contains("Jean Dupont")), "W1 missing")
    assert(texts.exists(_.contains("DOCUMENT NON APPLICABLE")), "W2 missing")
    assert(texts.exists(_.contains("Document non tenu")), "W3 missing")
    assert(texts.exists(_.contains("TRACE:")), "W5 missing")
    assert(texts.exists(_.exists(_ < ' ')), "W6 control chars missing")
    assert(turns.count(t => t.role == "tool") > 0)
  }

  test("full redaction (R1-R5 incl. learned) matches the oracle row-for-row") {
    val golden = Oracle.redactAll(turns, p)
      .map(r => (r.conv_id, r.turn_idx) -> (r.session_id, r.text_redacted)).toMap

    val actual = TranscriptOps.redactFull(df, p)
      .select("conv_id", "turn_idx", "session_id", "text_redacted")
      .collect()

    assert(actual.length === golden.size)
    actual.foreach { row =>
      val key = (row.getString(0), row.getInt(1))
      val (gSid, gText) = golden(key)
      assert(row.getLong(2) === gSid, s"session_id mismatch at $key")
      assert(row.getString(3) === gText, s"text mismatch at $key")
    }
  }

  test("learned sets: something was actually learned (W4 planted)") {
    val learnedRows = TranscriptOps.detectRecurring(df, p).collect()
    assert(learnedRows.length > 0, "no recurring sentences detected")
    assert(learnedRows.exists(_.getString(2).contains("ce service est fourni")),
      "planted W4 boilerplate not learned")
    // decoy convs (single occurrence) must NOT be learned:
    // every detected sentence must occur >= threshold
    assert(learnedRows.forall(_.getLong(3) >= p.threshold))
  }

  test("lateArrivals == sequential micro-batch watermark replay") {
    import spark.implicits._
    val delaySec = 120L
    val batchRows = 100L
    // arrival order = event-time order, except planted rows arrive ~9
    // batches late (far past the delay)
    val arr = turns.sortBy(t => (t.ts.getTime, t.conv_id, t.turn_idx))
      .zipWithIndex.map { case (t, i) =>
        val planted = math.floorMod(t.conv_id.hashCode + 31 * t.turn_idx, 29) == 0
        (t.conv_id, t.turn_idx, t.ts, if (planted) i + 1L + 900L else i + 1L)
      }
    val df = arr.toDF("conv_id", "turn_idx", "ts", "arrival_seq")
    val got = TranscriptOps.lateArrivals(df, batchRows, delaySec).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap

    // sequential replay: per batch in arrival order, judge rows against the
    // watermark from strictly earlier batches, then advance it
    val expected = scala.collection.mutable.Map[(String, Int), Long]()
    var maxPrevUs = Long.MinValue
    arr.groupBy(_._4 / batchRows).toSeq.sortBy(_._1).foreach { case (_, rows) =>
      if (maxPrevUs != Long.MinValue) {
        val wmUs = maxPrevUs - delaySec * 1000000L
        rows.foreach { case (c, i, ts, _) =>
          val tsUs = ts.getTime * 1000L
          if (tsUs < wmUs) expected((c, i)) = wmUs - tsUs
        }
      }
      maxPrevUs = math.max(maxPrevUs, rows.map(_._3.getTime * 1000L).max)
    }
    assert(expected.nonEmpty, "fixture must contain late rows")
    assert(got === expected.toMap)
    // in-order rows are never late: every late row is a planted one
    got.keys.foreach { case (c, i) =>
      assert(math.floorMod(c.hashCode + 31 * i, 29) == 0, s"non-planted late: $c/$i")
    }
  }

  test("skew: salted two-phase equals plain aggregation") {
    import spark.implicits._
    val skewTurns = (0L until 40L).flatMap(
      TranscriptGen.turnsFor(_, GenSpec(nConvs = 40, skewed = true)))
    val sdf = spark.createDataset(skewTurns).toDF()
    val salted = TranscriptOps.skewAgg(sdf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val plain = sdf.groupBy($"conv_id")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.length($"text")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted === plain)
    // and the hot key really is hot
    val total = skewTurns.size.toDouble
    assert(skewTurns.count(_.conv_id == "conv-000000") / total > 0.4)
  }
}

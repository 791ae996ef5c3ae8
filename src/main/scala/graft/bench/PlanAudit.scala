package graft.bench

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.SparkEntry

/** Physical-plan audit: for each gate query, capture the formatted plan and
  * check the plan properties that matter at 100 TB — filter pushdown into
  * the parquet scan, column pruning (ReadSchema), explicit broadcasts where
  * a small side exists, whole-stage codegen coverage, no cartesian products
  * outside the intentionally-all-pairs baselines. Writes PLANS.md.
  */
object PlanAudit {

  final case class Check(name: String, ok: Boolean, detail: String)

  def audit(name: String, df: DataFrame): (String, Seq[Check]) = {
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val checks = Seq.newBuilder[Check]
    def has(s: String) = plan.contains(s)

    name match {
      case "q1_redact" =>
        checks += Check("no shuffle (narrow per-turn map)", !has("Exchange"),
          "redaction is a projection; any Exchange would be a bug")
        checks += Check("whole-stage codegen", has("codegen id"), "")
        checks += Check("column pruning", !has("ReadSchema: struct<conv_id:string,turn_idx:int,role:string,text:string,tool:string,ts:timestamp"),
          "ts/tool must be pruned from the scan")
      case "q18_point_lookup" =>
        checks += Check("conv_id pushed to scan", has("PushedFilters: [IsNotNull(conv_id), EqualTo(conv_id,conv-000042)]")
          || has("EqualTo(conv_id,conv-000042)"), "point predicate must reach parquet")
      case "q4_join_pairs" =>
        checks += Check("equi-join (no cartesian)", !has("CartesianProduct"),
          "conv_id+tool equi keys must drive the join")
      case "q33_changes" =>
        checks += Check("CDC reconcile is a key equi-join (no cartesian)",
          !has("CartesianProduct") && !has("BroadcastNestedLoopJoin"),
          "pre/post views must pair on (conv_id, turn_idx)")
        checks += Check("full-outer merge join over the changed files only",
          has("SortMergeJoin FullOuter"),
          "the manifest diff feeds two pruned scans into one key join — " +
            "shuffle volume is the churn, never the corpus")
      case "q11_jaccard_pairs" =>
        // round-5 VERDICT #1: the verification side must NOT force a
        // corpus-sized broadcast of the per-doc stats table — stats attach
        // via plain equi-joins (AQE may still choose a broadcast at runtime
        // from the ACTUAL shuffle size, which is the size-aware behavior we
        // want; a compile-time hint is not). The ONE allowed hint is the
        // hot-shingle set, bounded by total-instances/df-cap at any scale;
        // its subtree is recognizable by the df-cap filter over the
        // shingle-frequency aggregate.
        val badHints = df.queryExecution.analyzed.collect {
          case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
              if !h.child.toString.contains("df#") => h
        }.size
        checks += Check("no forced corpus-sized broadcast on the verify join",
          badHints == 0,
          s"$badHints broadcast hint(s) beyond the bounded hot-shingle " +
            "set — per-doc stats must attach via plain equi-joins")
        checks += Check("candidate join is equi on (df-capped) shingle", !has("CartesianProduct"), "")
      case "q15_ann_topk" =>
        checks += Check("no BroadcastNestedLoopJoin over the corpus",
          !has("BroadcastNestedLoopJoin") && !has("CartesianProduct"),
          "scoring is a UDF projection against the broadcast query params — no join node")
        checks += Check("partial top-k pushdown (WindowGroupLimit)",
          has("WindowGroupLimit"),
          "rank<=k runs Partial before the exchange: shuffle = partitions x queries x k rows, not the scored corpus")
      case "q12_minhash_pairs" =>
        checks += Check("candidate join is equi on (band, bandHash)",
          !has("CartesianProduct") && !has("BroadcastNestedLoopJoin"), "")
      case "q13_simhash_pairs" =>
        checks += Check("candidate join is equi on (segment, bits)",
          !has("CartesianProduct") && !has("BroadcastNestedLoopJoin"), "")
      case "q14_embed_dup" =>
        checks += Check("collect-free LSH candidates (equi-join, no all-pairs)",
          !has("CartesianProduct") && !has("BroadcastNestedLoopJoin"),
          "hyperplane-sketch bucket equi-join generates candidates; exact verify only on candidates")
      case "q6_skew_agg" =>
        checks += Check("two aggregation phases",
          "HashAggregate".r.findAllIn(plan).size >= 3,
          "salted partial + final (each with its own partial/merge pair)")
      case "q21_dead_letter" =>
        checks += Check("validation predicate is a filter over the scan (no shuffle before it)",
          has("Filter"), "invalid-row split must not shuffle the table")
      case "q22_shingle_detect" =>
        checks += Check("two-phase distinct-turn counting",
          "HashAggregate".r.findAllIn(plan).size >= 3,
          "dedupe-by-turn partial phase before the per-shingle count — hot convs never pin one reducer")
      case "q23_late_data" =>
        checks += Check("no cartesian product (batch-watermark join is equi on arrival_batch)",
          !has("CartesianProduct") && !has("BroadcastNestedLoopJoin"), "")
      case "q36_change_feed" =>
        checks += Check("recorded feed serves as pure file scans (no join, no shuffle)",
          !has("Exchange") && !has("Join") && !has("CartesianProduct"),
          "q33 reconstructs the diff with a full-outer key join at READ " +
            "time; the recorded feed paid O(churn) at COMMIT time instead, " +
            "so reading it is a scan union with constant-vector metadata " +
            "columns — the 10^12-row shape for a continuously-tailing consumer")
      case "q37_restore" =>
        checks += Check("live view + restore feed are pure scans (no join, no shuffle)",
          !has("Exchange") && !has("Join") && !has("CartesianProduct"),
          "the restore is metadata-only and its CDC record was " +
            "materialized at commit time: reading both the rolled-back " +
            "table and the change it recorded is a scan union — no " +
            "reconstruction work at read time")
      case "q38_wap" =>
        checks += Check("WAP views + .staged audit are pure scans (no join, no shuffle)",
          !has("Exchange") && !has("Join") && !has("CartesianProduct"),
          "publish/discard are metadata-only (one atomic manifest write) and " +
            "the .staged audit surface scans only the staged manifests' own " +
            "files with constant-vector identity columns — auditing a stage " +
            "on a 10^12-row table reads the staged files, never the table")
      case "q41_scan_prune" =>
        checks += Check("global COUNT/MIN/MAX served by the metadata agg scan",
          has("IcebergLiteMetadataAggScan"),
          "the manifests ARE the answer: one result row from the driver, " +
            "no data IO, no aggregate node over table rows — at 10^12 rows " +
            "the old shape iterated one empty row per table row")
        checks += Check("conv IN-list reaches the pruned scan",
          has("conv-000042"),
          "bucket routing + per-file conv bounds at the manifest, the same " +
            "IN-list again at parquet's row-group filter")
        checks += Check("enrich join is equi (no cartesian)",
          !has("CartesianProduct") && !has("BroadcastNestedLoopJoin"),
          "the dim side is broadcastable and runtime file pruning applies")
      case "q24_sketch_build" =>
        checks += Check("CMS aggregate runs partial+final (ObjectHashAggregate)",
          has("ObjectHashAggregate") && has("graft_cms_sketch"),
          "TypedImperativeAggregate: per-partition partial sketches, groups x sketchBytes through the shuffle")
      case "q24_cms_profile" =>
        checks += Check("estimate read path is join-free",
          !has("BroadcastHashJoin") && !has("SortMergeJoin") &&
            !has("ShuffledHashJoin") && !has("CartesianProduct"),
          "round-4 estimateAll: sketches decoded once on the driver and " +
            "broadcast as objects — no join node, no per-row sketch parse " +
            "(the round-3 plan broadcast the sketch BYTES into a join and " +
            "re-parsed them per row)")
      case _ => ()
    }
    (plan, checks.result())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val audited = Seq("q1_redact", "q18_point_lookup", "q4_join_pairs",
      "q11_jaccard_pairs", "q12_minhash_pairs", "q13_simhash_pairs",
      "q14_embed_dup", "q15_ann_topk", "q6_skew_agg", "q2_detect",
      "q3_window_stats", "q19_sliding_stats", "q20_session_bounds",
      "q21_dead_letter", "q22_shingle_detect", "q23_late_data",
      "q24_cms_profile", "q24_sketch_build", "q33_changes", "q36_change_feed",
      "q37_restore", "q38_wap", "q41_scan_prune")
    val out = new StringBuilder
    out ++= "# PLANS — physical-plan audit of the gate queries\n\n"
    out ++= "Checks target the properties that matter at 100 TB: pushdown,\n"
    out ++= "pruning, broadcastability, codegen coverage, no accidental\n"
    out ++= "cartesian products. Regenerate: `sbt \"runMain graft.bench.PlanAudit\"`.\n"
    val notes = Map(
      "q15_ann_topk" ->
        ("""Why exact two-phase top-k and NOT hyperplane-LSH candidate pruning:
          |for exact top-k over a near-orthogonal corpus (random embeddings,
          |10th-best cosine ≈ 0.4 ⇒ per-hyperplane agreement p = 1−θ/π ≈ 0.62),
          |bucket recall per table is p^bits (≈ 0.004 at 12 bits) and driving
          |the miss probability of 100 needed (query, neighbor) pairs below
          |1e-6 forces bits→1 / tables→16+, at which point P(candidate) for a
          |RANDOM pair is ≈ 1 − 0.5^16 ≈ 0.99998 — the candidate set is the
          |corpus and the "pruning" is fiction. LSH prunes in high-similarity
          |regimes (cos ≥ 0.9), where `embedDupLsh` (q14) uses it. The scale
          |shape here is instead: UDF-scored projection (no join), then
          |Spark's two-phase WindowGroupLimit so the shuffle carries only
          |partitions × queries × k rows.""".stripMargin))
    var failures = 0
    audited.foreach { q =>
      // the sketch-build side of q24 is collected eagerly inside the
      // profile query (groups rows on the driver), so its two-phase
      // aggregate plan is audited as its own section
      val df =
        if (q == "q24_sketch_build")
          graft.operators.TranscriptOps.cmsRoleSketches(
            graft.gen.Fixtures.transcripts(spark, sfDir))
        else SparkEntry.queries(q)(spark, sfDir)
      val (plan, checks) = audit(q, df)
      out ++= s"\n## $q\n\n"
      notes.get(q).foreach(n => out ++= n + "\n\n")
      checks.foreach { c =>
        if (!c.ok) failures += 1
        out ++= s"- ${if (c.ok) "PASS" else "FAIL"}: ${c.name}" +
          (if (c.detail.nonEmpty) s" — ${c.detail}" else "") + "\n"
        println(s"[plan] $q ${if (c.ok) "PASS" else "FAIL"} ${c.name}")
      }
      val excerpt = plan.linesIterator.take(40).mkString("\n")
      out ++= s"\n```\n$excerpt\n```\n"
    }
    Files.write(Paths.get("/root/repo/PLANS.md"), out.toString.getBytes("UTF-8"))
    println(s"[plan] total failures: $failures")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}

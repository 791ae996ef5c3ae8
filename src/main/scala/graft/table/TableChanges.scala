package graft.table

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** CDC / changelog reads: the row-level difference between two committed
  * states of an IcebergLite table, classified Delta-style as
  * `insert` / `delete` / `update_preimage` / `update_postimage` in a
  * `_change_type` column appended to the table schema.
  *
  * Versioning — the part that is NOT an epoch id: the engine's appends
  * (epochs) and its row-level mutations/compactions (rewrite GENS) advance
  * on two independent counters with no recorded wall-clock between them
  * (replay determinism forbids one), so an epoch id alone does not pin a
  * table state. A CDC anchor is a [[TableVersion]] `(epoch, gen)`:
  *  - capture "now" with [[IcebergLite.currentVersion]] and diff later;
  *  - or pass an epoch id — it resolves via the snapshot's `maxGen` stamp
  *    ([[IcebergLite.versionAtEpoch]]) to "the state when that epoch was
  *    freshly committed", which is what a consumer that stopped reading at
  *    epoch `e` actually saw. Mutations committed after epoch `e` then
  *    surface as changes, exactly as that consumer needs.
  *
  * Semantics: `since(spark, root, from)` diffs the view pinned at `from`
  * ([[IcebergLite.effectiveFileSetsAt]]) against the current effective view
  * (or a pinned `to`). Appends surface as `insert`; copy-on-write DELETEs
  * as `delete`; UPDATE/MERGE rewrites as `update_preimage`/`update_postimage`
  * pairs; MERGE insert epochs as `insert`. Views whose files gc reclaimed
  * fail loudly (the same reproducibility contract as time travel).
  *
  * Scale shape (the point): the diff is computed MANIFEST-FIRST. Files
  * present in both views — by path, and every untouched file keeps its path
  * across epochs, deletes, updates and merges — contribute nothing and are
  * never opened; only the churn (dropped originals + rewrites + new epochs)
  * is scanned, and the reconciling full-outer join on the natural key
  * `(conv_id, turn_idx)` shuffles only those rows. A conv-scoped DELETE on
  * a 10^12-turn table diffs one bucket's rewritten files, not the corpus.
  * The one full-rescan case is a diff ACROSS a compaction boundary (every
  * path changes; the join then proves the contents equal) — take changes
  * before compacting, or anchor at [[IcebergLite.currentVersion]] after.
  *
  * Key contract: classification assumes the table's natural-key uniqueness
  * contract (the same one MERGE validates). Plain appends never enforce it;
  * a duplicate key appended since `from` still reports as `insert`
  * (accurate), but a duplicate key landing while the SAME key's row is
  * rewritten would pair arbitrarily and report as an update — keep appends
  * key-unique if the pre/post pairing matters. Tables WITHOUT
  * `(conv_id, turn_idx)` fall back to multiset semantics:
  * `insert`/`delete` only (`exceptAll` both ways), no update pairing. */
object TableChanges {
  val ChangeTypeCol = "_change_type"

  /** Epoch-id convenience: anchors at the state each epoch was freshly
    * committed in (`maxGen` stamp); `toEpoch = None` means the current
    * view. */
  def since(spark: SparkSession, root: String, fromEpoch: Long,
            toEpoch: Option[Long] = None): DataFrame = {
    val t = new IcebergLite(root)
    between(spark, root, t.versionAtEpoch(fromEpoch),
      toEpoch.map(t.versionAtEpoch))
  }

  /** Change rows between two pinned states (see [[TableVersion]]);
    * `to = None` means the current effective view. Schema: the later
    * view's schema + `_change_type` string. */
  def between(spark: SparkSession, root: String, from: TableVersion,
              to: Option[TableVersion] = None): DataFrame = {
    val t = new IcebergLite(root)
    val toV = to.getOrElse(t.currentVersion)
    require(toV.epoch >= from.epoch && toV.gen >= from.gen,
      s"changes range is reversed: from $from to $toV")
    // the LATER view's schema: pre-evolution files null-fill the evolved
    // columns, exactly like a normal read of the evolved table
    val schema =
      if (toV.epoch < 0) t.fullReadSchema
      else t.fullReadSchemaAt(t.schemaVersionAt(toV.epoch))

    val (onlyPre, onlyPost) = changedFiles(t, from, toV)

    def readFiles(entries: Seq[DataFileMeta]): DataFrame =
      if (entries.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else t.readEntries(spark, schema, entries)

    val preDf = readFiles(onlyPre)
    val postDf = readFiles(onlyPost)
    val cols = schema.fieldNames.toSeq

    if (!(cols.contains("conv_id") && cols.contains("turn_idx"))) {
      // no natural key: multiset difference, inserts/deletes only
      return postDf.exceptAll(preDf).withColumn(ChangeTypeCol, lit("insert"))
        .unionAll(
          preDf.exceptAll(postDf).withColumn(ChangeTypeCol, lit("delete")))
    }

    val key = Seq("conv_id", "turn_idx")
    val p = preDf.select(col("conv_id"), col("turn_idx"),
      struct(cols.map(col): _*).as("_pre"))
    val q = postDf.select(col("conv_id"), col("turn_idx"),
      struct(cols.map(col): _*).as("_post"))
    // full-outer on the key: unchanged rows of rewritten files (the
    // surviving copies a delete/update rewrite carries over, and entire
    // files re-cut by compaction) pair up null-safe-equal and drop here —
    // lineage columns are preserved by every rewrite, so the comparison is
    // over the complete row
    val changed = p.join(q, key, "full_outer")
      .filter(!(col("_pre") <=> col("_post")))
    val exploded = changed.select(explode(
      when(col("_post").isNull,
        array(struct(col("_pre").as("row"), lit("delete").as("kind"))))
      .when(col("_pre").isNull,
        array(struct(col("_post").as("row"), lit("insert").as("kind"))))
      .otherwise(array(
        struct(col("_pre").as("row"), lit("update_preimage").as("kind")),
        struct(col("_post").as("row"), lit("update_postimage").as("kind"))))
    ).as("_c"))
    exploded.select(
      cols.map(c => col(s"_c.row.$c")) :+ col("_c.kind").as(ChangeTypeCol): _*)
  }

  /** The manifest-level file diff [[between]] scans — exposed so tests (and
    * operators sizing a CDC job) can verify the churn bound without running
    * the join: paths present in both views are excluded, so the scan cost
    * is proportional to what changed, never to the corpus. Returned as
    * absolute (pre-only, post-only) path lists. */
  private[table] def changedFiles(t: IcebergLite, from: TableVersion,
                                  to: TableVersion)
      : (Seq[DataFileMeta], Seq[DataFileMeta]) = {
    val pre = t.effectiveFileSetsAt(from).flatMap(_.files)
    val post = t.effectiveFileSetsAt(to).flatMap(_.files)
    // identity is (path, deletion vector), NOT path alone: a MOR delete
    // keeps the file's path and only swaps its vector — path identity
    // would treat the entry as untouched and the diff would silently miss
    // the deleted rows. A changed vector reads the entry on BOTH sides
    // (each under its own vector); the full-outer key join then surfaces
    // exactly the newly-deleted rows.
    val preKeys = pre.map(f => (f.path, f.dvPath)).toSet
    val postKeys = post.map(f => (f.path, f.dvPath)).toSet
    (pre.filterNot(f => postKeys((f.path, f.dvPath))),
      post.filterNot(f => preKeys((f.path, f.dvPath))))
  }

  /** Bounded summary of [[since]] — counts per change type, for the SQL
    * `CALL graft.system.changes('db.t', from[, to])` inspection surface. */
  def summary(spark: SparkSession, root: String, fromEpoch: Long,
              toEpoch: Option[Long] = None): Seq[(String, Long)] =
    since(spark, root, fromEpoch, toEpoch)
      .groupBy(ChangeTypeCol).count()
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).toSeq
}

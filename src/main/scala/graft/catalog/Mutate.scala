package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write mutation for partitioned parquet tables: keyed upsert
  * (CDC merge) and keyed delete (GDPR-style erasure). The reference
  * pipeline is append-only (`/root/reference/serialize.py` only ever
  * writes fresh datasets), but any engine curating a living 100 TB corpus
  * needs targeted mutation — re-ingesting the world to change 0.01% of
  * rows is the operation that cannot ship.
  *
  * The 100 TB shape: a mutation batch carries the partition value of
  * every row it touches, so the rewrite
  *   1. reads ONLY the affected partitions (partition-pruned scan —
  *      `MutateSpec` proves via `inputFiles` that untouched partitions
  *      are never opened),
  *   2. anti-joins the (broadcast) batch keys against those partitions,
  *   3. writes the merged partitions to a staging dir,
  *   4. swaps each affected partition directory in with two renames.
  * Untouched partition directories are not read, not rewritten, and keep
  * their exact files. Work scales with the touched fraction, not the
  * table.
  *
  * Contracts (all `require`d or documented):
  *  - the batch is small relative to the table (its keys are broadcast
  *    to the anti-join; a batch touching most of the table should be a
  *    plain rewrite instead);
  *  - a row's partition value is stable under upsert — an update row
  *    lands in the partition named by its own `partitionCol` and only
  *    that partition's copy of the key is replaced (a key that "moves"
  *    partitions must be expressed as delete + insert);
  *  - partition values are non-null and filesystem-plain
  *    (`[A-Za-z0-9._-]+`) so directory names round-trip without
  *    hive-escaping;
  *  - no concurrent readers/writers during the swap (same constraint as
  *    [[Tables.compact]]); a crash mid-swap strands the old partition at
  *    `<dir>.mutate.old/<part>` and the next mutation on the table
  *    restores it before proceeding ([[recoverStranded]]).
  *
  * Idempotence: re-running the same batch converges — the anti-join
  * removes the batch keys again and the batch re-inserts them — so a
  * failed mutation is retried by re-submitting it (after the stranded-
  * partition probe has restored any half-swapped partition).
  */
object Mutate {

  /** Outcome summary: partition values rewritten (existed before) and
    * created (new from inserts). Deleted-empty partitions appear in
    * `rewritten`. */
  final case class MutateResult(rewritten: Seq[String], created: Seq[String])

  private val PlainPartition = "^[A-Za-z0-9._-]+$".r

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def partDirName(partitionCol: String, value: String) =
    s"$partitionCol=$value"

  /** Restore any partition stranded at `<dir>.mutate.old` by a crash
    * between the two swap renames (live dir missing, old copy present).
    * Leftover old copies whose live dir exists are completed swaps whose
    * cleanup died — dropped. Called by upsert/delete before working;
    * callable directly for manual recovery. */
  def recoverStranded(spark: SparkSession, dir: String): Unit = {
    val fs = fsOf(spark, dir)
    val oldRoot = new Path(dir + ".mutate.old")
    if (fs.exists(oldRoot)) {
      fs.listStatus(oldRoot).foreach { st =>
        val live = new Path(dir, st.getPath.getName)
        if (!fs.exists(live)) {
          if (!fs.rename(st.getPath, live))
            throw new java.io.IOException(s"mutate: cannot restore stranded ${st.getPath}")
        }
      }
      fs.delete(oldRoot, true)
    }
    fs.delete(new Path(dir + ".mutate.tmp"), true)
  }

  /** The partition-pruned view of the table restricted to `values` of
    * `partitionCol` — the ONLY base-table scan a mutation performs.
    * Package-visible so MutateSpec can prove the pruning via
    * `inputFiles`. */
  private[graft] def prunedBase(spark: SparkSession, dir: String,
                                partitionCol: String, values: Seq[String]): DataFrame = {
    val base = spark.read.parquet(dir)
    base.filter(col(partitionCol).cast("string").isin(values: _*))
  }

  private def affectedValues(batch: DataFrame, partitionCol: String): Seq[String] = {
    val vals = batch.select(col(partitionCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    require(vals.nonEmpty, "mutate: empty batch")
    vals.foreach { v =>
      require(v != null && PlainPartition.pattern.matcher(v).matches(),
        s"mutate: partition value '$v' is null or needs hive-escaping; " +
          "restrict partition values to [A-Za-z0-9._-]+")
    }
    vals
  }

  /** Rewrite the affected partitions of `dir` as `merged`, swapping each
    * partition directory in via rename(live→old); rename(staged→live).
    * A partition absent from `merged` (fully deleted) ends with no live
    * directory. */
  private def rewritePartitions(spark: SparkSession, dir: String, merged: DataFrame,
                                partitionCol: String, affected: Seq[String]): MutateResult = {
    val fs = fsOf(spark, dir)
    val tmp = new Path(dir + ".mutate.tmp")
    val oldRoot = new Path(dir + ".mutate.old")
    // cluster by the partition column before the partitioned write: the
    // merged frame arrives as scan-tasks × |affected| fragments, and an
    // unclustered write opens a parquet writer per (task, partition) —
    // measured ~80 ms of per-task overhead writing confetti files that
    // every later read of the partition then pays to open again. One
    // shuffle of only the affected partitions' rows yields one file per
    // partition (the q139 staging-write pattern; at cluster scale add
    // more distribution keys alongside partitionCol for write
    // parallelism within huge partitions).
    merged.repartition(col(partitionCol))
      .write.mode("overwrite").partitionBy(partitionCol).parquet(tmp.toString)
    fs.mkdirs(oldRoot)
    val (rewritten, created) = affected.partition { v =>
      fs.exists(new Path(dir, partDirName(partitionCol, v)))
    }
    affected.foreach { v =>
      val sub = partDirName(partitionCol, v)
      val live = new Path(dir, sub)
      val staged = new Path(tmp, sub)
      if (fs.exists(live) && !fs.rename(live, new Path(oldRoot, sub)))
        throw new java.io.IOException(s"mutate: cannot stage out $live")
      if (fs.exists(staged) && !fs.rename(staged, live))
        throw new java.io.IOException(s"mutate: cannot swap in $staged")
    }
    fs.delete(oldRoot, true)
    fs.delete(tmp, true)
    MutateResult(rewritten, created)
  }

  /** Keyed upsert: rows of `updates` replace same-key rows in their own
    * partition; keys not present insert. `updates` must carry the full
    * table schema (column order free) including `partitionCol`. */
  def upsert(spark: SparkSession, dir: String, updates: DataFrame,
             keyCols: Seq[String], partitionCol: String): MutateResult = {
    require(keyCols.nonEmpty, "mutate: keyCols must be non-empty")
    recoverStranded(spark, dir)
    val affected = affectedValues(updates, partitionCol)
    val base = prunedBase(spark, dir, partitionCol, affected)
    require(base.columns.toSet == updates.columns.toSet,
      s"mutate: updates schema ${updates.columns.sorted.mkString(",")} != " +
        s"table schema ${base.columns.sorted.mkString(",")}")
    val keep = base.join(broadcast(updates.select(keyCols.map(col): _*)),
      keyCols, "left_anti")
    val merged = keep.unionByName(updates.select(base.columns.map(col): _*))
    rewritePartitions(spark, dir, merged, partitionCol, affected)
  }

  /** Keyed delete: rows matching `deleteKeys` on `keyCols` are removed.
    * `deleteKeys` must carry `partitionCol` (the erasure request names
    * the partition the row lives in — that is what keeps a 100 TB delete
    * from scanning the table). A partition left empty is removed. */
  def delete(spark: SparkSession, dir: String, deleteKeys: DataFrame,
             keyCols: Seq[String], partitionCol: String): MutateResult = {
    require(keyCols.nonEmpty, "mutate: keyCols must be non-empty")
    require(deleteKeys.columns.contains(partitionCol),
      s"mutate: deleteKeys must carry $partitionCol")
    recoverStranded(spark, dir)
    val affected = affectedValues(deleteKeys, partitionCol)
    val base = prunedBase(spark, dir, partitionCol, affected)
    val keep = base.join(broadcast(deleteKeys.select(keyCols.map(col): _*)),
      keyCols, "left_anti")
    rewritePartitions(spark, dir, keep, partitionCol, affected)
  }
}

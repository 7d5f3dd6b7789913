package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized transforms — the GENERIC
  * primitive behind the maintained search index
  * ([[graft.operators.InvertedIndex.reconcile]]) and inverted file
  * ([[graft.operators.Ivf.maintainCorpus]]): any deterministic per-row
  * (map-only, 1→N) derivation of a versioned corpus can follow corpus
  * mutations by keyed delete + upsert of just the CHANGED rows' derived
  * output, at cost ∝ churn, never a re-derivation of the corpus.
  *
  * Transform contract (the caller's obligations — all three are what
  * make incremental == from-scratch):
  *  1. per-row: `transform(A ∪ B) == transform(A) ∪ transform(B)` —
  *     no aggregation, no joins against the corpus itself;
  *  2. keyed: the output is uniquely keyed by `keyCols` across the whole
  *     corpus, and a source row's derived keys are recomputable from that
  *     row alone (that is what lets a deletion NAME its derived rows);
  *  3. partitioned: the output carries `partCol` (filesystem-plain
  *     values), the derived table's mutation-pruning key.
  *
  * Crash safety: the `_reflects` marker (which corpus version the derived
  * table mirrors) advances by atomic rename AFTER maintenance; a crash
  * between maintenance and marker re-applies the same feed next time and
  * converges by keyed idempotence. Corpus vacuum retention must keep the
  * reflected version until the next reconcile (diff needs both
  * manifests; it fails loudly, never silently skips).
  */
object Materialized {

  private def markerPath(dir: String) = java.nio.file.Paths.get(dir, "_reflects")

  /** The corpus version the derived table currently reflects. */
  def reflects(derivedDir: String): Int =
    new String(java.nio.file.Files.readAllBytes(markerPath(derivedDir)), "UTF-8").trim.toInt

  private def writeMarker(dir: String, v: Int): Unit = {
    val tmp = java.nio.file.Paths.get(dir, "._reflects.tmp")
    java.nio.file.Files.write(tmp, v.toString.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, markerPath(dir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Materialize `transform` of the corpus' CURRENT version as a
    * versioned table at `derivedDir`, stamped with the corpus version it
    * reflects. */
  def init(spark: SparkSession, corpusDir: String, derivedDir: String,
           partCol: String)(transform: DataFrame => DataFrame): Int = {
    val v = Snapshots.currentVersion(spark, corpusDir)
    val r = Snapshots.init(spark, derivedDir,
      transform(Snapshots.read(spark, corpusDir)), Some(partCol))
    writeMarker(derivedDir, v)
    r
  }

  /** Catch the derived table up to the corpus' current version: deleted
    * corpus rows' derived rows are keyed-deleted, inserted rows' derived
    * rows upserted (an update nets to its new derivation), marker
    * advanced after. Returns (from, to) or None when current. */
  def reconcile(spark: SparkSession, corpusDir: String, derivedDir: String,
                partCol: String, keyCols: Seq[String])
               (transform: DataFrame => DataFrame): Option[(Int, Int)] = {
    val cur = Snapshots.currentVersion(spark, corpusDir)
    val from = reflects(derivedDir)
    if (from >= cur) return None
    val feed = Snapshots.diff(spark, corpusDir, from, cur)
    val del = transform(feed.filter(col("_change") === "delete").drop("_change"))
      .select((keyCols :+ partCol).map(col): _*)
    if (!del.isEmpty)
      Snapshots.delete(spark, derivedDir, del, keyCols)
    val ins = transform(feed.filter(col("_change") === "insert").drop("_change"))
    if (!ins.isEmpty)
      Snapshots.upsert(spark, derivedDir, ins, keyCols)
    writeMarker(derivedDir, cur)
    Some((from, cur))
  }

  /** Materialize a partition-aligned AGGREGATE of the corpus' current
    * version (incremental view maintenance for `GROUP BY` tables — the
    * aggregate complement of [[init]]'s per-row transforms).
    *
    * Contract: `aggregate` must be partition-local — its grouping
    * includes the corpus' partition column, carried through as `partCol`
    * on the output — so a corpus mutation can only change the aggregate
    * rows of the partitions it touched. */
  def initAgg(spark: SparkSession, corpusDir: String, derivedDir: String,
              partCol: String)(aggregate: DataFrame => DataFrame): Int =
    init(spark, corpusDir, derivedDir, partCol)(aggregate)

  /** Catch a maintained aggregate up to the corpus' current version.
    *
    * Maintenance is a partition-scoped RECOMPUTE, not delta arithmetic:
    * the change feed only names which partitions were touched; their new
    * aggregate state is derived from the corpus alone and published with
    * one copy-on-write [[Snapshots.replacePartitions]] (untouched
    * partitions re-referenced by path, vanished ones dropped). The trade
    * is deliberate — cost ∝ touched partitions instead of ∝ churn, and in
    * exchange a crash-replayed reconcile CONVERGES (delta-adding is not
    * idempotent; restating touched partitions from the source is). */
  def reconcileAgg(spark: SparkSession, corpusDir: String, derivedDir: String,
                   partCol: String)(aggregate: DataFrame => DataFrame)
      : Option[(Int, Int)] = {
    val cur = Snapshots.currentVersion(spark, corpusDir)
    val from = reflects(derivedDir)
    if (from >= cur) return None
    val touched = Snapshots.diff(spark, corpusDir, from, cur)
      .select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    if (touched.nonEmpty) {
      val newAgg = aggregate(Snapshots.readPartitions(spark, corpusDir, touched))
      Snapshots.replacePartitions(spark, derivedDir, newAgg, dropValues = touched)
    }
    writeMarker(derivedDir, cur)
    Some((from, cur))
  }
}

package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Named-table catalog over Parquet directories.
  *
  * Spark-native successor of the reference's LMDB environment of named
  * sub-DBs (`/root/reference/serialize.py:449-471`): each logical stream
  * is a named columnar table; alignment across streams is an explicit
  * `key` column instead of physical co-location (SURVEY §1.4).
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Physical-layout policy for the fact tables: bucket+sort keys for
    * co-located joins. lineitem⋈orders is the one fact-fact join in the
    * workload; bucketing both on orderkey with the same bucket count makes
    * it exchange-free. customer is bucketed on custkey for the (rare)
    * non-broadcast customer join. At 100 TB this layout is the storage
    * story: the big join moves nothing instead of shuffling both inputs
    * per query. */
  val bucketSpecs: Map[String, String] = Map(
    "lineitem" -> "l_orderkey",
    "orders"   -> "o_orderkey",
    "customer" -> "c_custkey")

  /** (dir, name) → registered bucketed catalog table. Populated by
    * [[ensureBucketed]]; consulted transparently by [[load]] so every
    * declared query benefits without changing its text. */
  private val bucketedFor =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  private def bucketTableName(dir: String, name: String): String =
    "graft_bkt_" + dir.replaceAll("[^A-Za-z0-9]", "_").dropWhile(_ == '_') + "_" + name

  /** One-time bucketed ingest of the fact tables for `dir` (idempotent
    * ACROSS JVMs). The in-memory catalog forgets tables on restart but the
    * bucketed files survive in the warehouse; a complete layout (_SUCCESS
    * marker) is RE-REGISTERED as an external bucketed table — never
    * rewritten. This is the 100 TB semantics: the bucketed layout is the
    * table's storage format, written once at ingest; sessions re-attach to
    * it. A partial layout (no _SUCCESS) is cleaned and rebuilt.
    *
    * Repartitioning by the bucket key into exactly `buckets` partitions at
    * write time yields ONE file per bucket, which is what lets Spark trust
    * the per-bucket sort order and skip both the exchange AND the sort in
    * downstream sort-merge joins. */
  def ensureBucketed(spark: SparkSession, dir: String, buckets: Int = 32): Unit =
    bucketSpecs.foreach { case (name, key) =>
      val tbl = bucketTableName(dir, name)
      if (!spark.catalog.tableExists(tbl)) {
        val loc = java.nio.file.Paths.get("spark-warehouse", tbl).toAbsolutePath
        if (java.nio.file.Files.exists(loc.resolve("_SUCCESS"))) {
          val schema = spark.read.parquet(loc.toString).schema.toDDL
          spark.sql(
            s"""CREATE TABLE $tbl ($schema) USING parquet
               |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
               |LOCATION '$loc'""".stripMargin)
        } else {
          if (java.nio.file.Files.exists(loc)) {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
              .foreach(java.nio.file.Files.deleteIfExists(_))
          }
          val df = loadPlain(spark, dir, name)
          saveBucketed(df.repartition(buckets, expr(key)), tbl, buckets, key)
        }
      }
      bucketedFor((dir, name)) = tbl
    }

  /** Forget bucketed registrations (queries fall back to raw parquet). */
  def clearBucketed(): Unit = bucketedFor.clear()

  /** Load one table — from the bucketed catalog layout when
    * [[ensureBucketed]] has been run for this dir, else from
    * `<dir>/<name>.parquet`. Filters/projections applied downstream are
    * pushed into either scan by Catalyst. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    bucketedFor.get((dir, name)) match {
      case Some(tbl) if spark.catalog.tableExists(tbl) => spark.table(tbl)
      case _ => loadPlain(spark, dir, name)
    }

  /** Raw parquet scan.
    *
    * `events.ts` is TIMESTAMP(NANOS) in the parquet footer, which Spark
    * rejects by default; we read it as a nanos Long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a µs
    * timestamp with integer division (`div`, not `/`: ns-since-epoch
    * ≈ 1.7e18 exceeds a double's 2^53 mantissa, so float division would
    * corrupt low bits). */
  def loadPlain(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Interchange sinks (CSV with header / JSON lines). Parquet is the
    * engine-native format; these exist for export interoperability. */
  def saveCsv(df: DataFrame, dir: String, name: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).option("header", "true").csv(s"$dir/$name.csv")

  def saveJson(df: DataFrame, dir: String, name: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(s"$dir/$name.json")

  /** Register every table as a temp view (for the SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Sink: bucketed managed table for co-located joins. Two tables
    * bucketed+sorted by the same key with the same bucket count join with
    * NO shuffle exchange on either side — at 100 TB this is the difference
    * between a join that moves nothing and one that moves both inputs.
    * (Bucketed writes require the session catalog, hence saveAsTable.) */
  def saveBucketed(df: DataFrame, tableName: String, buckets: Int,
                   key: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)

  /** Sink: persist a DataFrame as a named Parquet table (successor of the
    * reference's per-stream LMDB write, `/root/reference/serialize.py:
    * 342-387`). `partitionBy` gives partition pruning on read; pick
    * low-cardinality columns (date, source) — at 100 TB a high-cardinality
    * partition column means millions of tiny files. */
  def save(df: DataFrame, dir: String, name: String,
           partitionBy: Seq[String] = Nil, mode: String = "overwrite"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(s"$dir/$name.parquet")
  }
}

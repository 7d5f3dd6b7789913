package graft

import graft.catalog.Tables

/** The `spark.sql(...)` surface over the registered named-table catalog. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("registerAll exposes every table as a view; SQL matches DataFrame results") {
    val dir = "/root/testdata/sf0.001"
    Tables.registerAll(spark, dir)
    Tables.names.foreach { n =>
      assert(spark.catalog.tableExists(n), s"view $n missing")
    }
    val viaSql = spark.sql(
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer
         JOIN orders ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""")
      .as[(String, Long)].collect().toSeq
    val viaDf = {
      import org.apache.spark.sql.functions._
      Tables.load(spark, dir, "customer")
        .join(Tables.load(spark, dir, "orders"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment").as[(String, Long)].collect().toSeq
    }
    assert(viaSql == viaDf && viaSql.nonEmpty)
  }

  test("GraftExtensions injects the full SQL function surface") {
    // build the exact extensions object production passes via
    // spark.sql.extensions, and apply its injected functions to the live
    // session's registry (the config path only acts at session creation)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    org.apache.spark.sql.GraftBridge.registerInjectedFunctions(ext, spark)
    val row = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                graft_minhash_sig(graft_md5_prefix28(array('x y'))) AS sig,
                graft_simhash60(graft_md5_prefix(array('a b'))) AS fp""")
      .as[(Double, Seq[Long], Long)].collect().head
    assert(row._1 == 11.0 && row._2.length == 32)
    // injected builders produce the same values as the Column API
    val viaCol = Seq(Tuple1(Seq("x y"))).toDF("g")
      .select(graft.expressions.Sketches.minhashSig(
        graft.expressions.Sketches.md5PrefixArray(
          org.apache.spark.sql.functions.col("g"), 7), 32))
      .as[Seq[Long]].collect().head
    assert(row._2 == viaCol)
  }

  test("wrong arity raises AnalysisException with the expected count, not IndexOutOfBounds") {
    graft.expressions.Sketches.registerSql(spark)
    // one arg short (graft_dot needs 2) and one arg extra (graft_simhash60
    // takes 1) — both cluster-wide SQL entry points must answer with the
    // standard WRONG_NUM_ARGS analysis error
    val short = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_dot(array(1.0D))").collect())
    assert(short.getMessage.contains("2") && short.getMessage.contains("graft_dot"))
    val extra = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_simhash60(array(1L), array(2L))").collect())
    assert(extra.getMessage.contains("graft_simhash60"))
  }

  test("graft_heavy_hitters aggregates from SQL; non-literal k is an analysis error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    org.apache.spark.sql.GraftBridge.registerInjectedFunctions(ext, spark)
    // NFC from pure SQL: decomposed e+U+0301 composes to U+00E9. (The
    // input arrives via a view — Spark's chr() is ASCII-mod-256, so it
    // cannot build the combining mark inline the way DuckDB's chr can.)
    Seq("é").toDF("s").createOrReplaceTempView("nfc_in")
    val nfc = spark.sql("SELECT graft_nfc(s) AS n FROM nfc_in")
      .as[String].collect().head
    assert(nfc == "é" && nfc.length == 1)
    Seq("a", "a", "b").toDF("t").createOrReplaceTempView("hh_in")
    val got = spark.sql(
      "SELECT explode(graft_heavy_hitters(t, 8)) AS e FROM hh_in")
      .selectExpr("e.term", "e.count").as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
    val bad = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_heavy_hitters(t, length(t)) FROM hh_in").collect())
    assert(bad.getMessage.contains("graft_heavy_hitters"))
  }

  test("custom sketch expressions are callable from SQL") {
    graft.expressions.Sketches.registerSql(spark)
    val fp = spark.sql(
      """SELECT graft_simhash60(graft_md5_prefix(array('a b', 'b c'))) AS fp,
                graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d""")
      .as[(Long, Double)].collect().head
    assert(fp._2 == 11.0)
    // same value as the Column API
    val viaCol = Seq(Tuple1(Seq("a b", "b c"))).toDF("g")
      .select(graft.expressions.Sketches.simhash60(
        graft.expressions.Sketches.md5PrefixArray(
          org.apache.spark.sql.functions.col("g"), 15)))
      .as[Long].collect().head
    assert(fp._1 == viaCol)
  }

  test("sketch expression edge semantics: mismatch/empty/wrong type") {
    graft.expressions.Sketches.registerSql(spark)
    // length-mismatched embeddings: NULL (the zip_with semantics), never
    // a silently truncated similarity
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(1.0D, 1.0D)) AS d,
                graft_simhash60(CAST(array() AS ARRAY<BIGINT>)) AS fp""")
      .collect().head
    assert(r.isNullAt(0), "length mismatch must be NULL")
    assert(r.isNullAt(1), "empty simhash input must be NULL, not all-ones")
    // array<int> arguments implicit-cast to array<bigint> instead of
    // reading 8-byte slots from 4-byte data (silent garbage pre-fix)
    val viaInt = spark.sql("SELECT graft_simhash60(array(7, 9)) AS fp")
      .as[java.lang.Long].collect().head
    val viaLong = spark.sql("SELECT graft_simhash60(array(7L, 9L)) AS fp")
      .as[java.lang.Long].collect().head
    assert(viaInt == viaLong)
    // a non-castable argument is an ANALYSIS error, not executor garbage
    // (scalar 42 implicit-casts to '42', the built-in string-fn behavior)
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_nfc(array(1, 2))").collect())
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT graft_dot(array('x'), array('y'))").collect())
  }

  test("text-cleaning functions from SQL match the Column API") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    org.apache.spark.sql.GraftBridge.registerInjectedFunctions(ext, spark)
    val html = "<p class=\"x\">hi <b>there</b></p><script>var a=1;</script>&amp; ok"
    val pii = "mail me at a.b@example.com or 192.168.0.1 now"
    val (cleaned, redacted) = spark.sql(
      s"""SELECT graft_strip_markup('${html.replace("'", "''")}') AS c,
                 graft_redact_pii('$pii') AS r""")
      .as[(String, String)].collect().head
    assert(cleaned == "hi there & ok")
    assert(redacted == "mail me at <EMAIL> or <IP> now")
    // identical to the Column-API chains (one shared pattern table)
    import org.apache.spark.sql.functions.col
    val viaCol = Seq((html, pii)).toDF("h", "p")
      .select(graft.functions.TextAnalysis.stripMarkup(col("h")),
        graft.functions.TextAnalysis.redactPii(col("p")))
      .as[(String, String)].collect().head
    assert(viaCol == ((cleaned, redacted)))
  }
}

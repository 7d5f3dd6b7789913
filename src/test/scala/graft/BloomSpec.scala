package graft

import org.apache.spark.sql.functions._
import graft.expressions.Bloom
import graft.operators.Prune

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key tests positive") {
    val keys = (1L to 5000L).map(_ * 7919L)
    val bloom = keys.toDF("k").agg(Bloom.bloomAgg(col("k"), numBits = 1 << 16))
      .head().getAs[Array[Byte]](0)
    assert(keys.forall(Bloom.testBits(bloom, _)))
  }

  test("false-positive rate is near the design point, never 100%") {
    // 5k keys in 2^16 bits at k=5 -> ~13 bits/key, design FP well under 5%
    val keys = (1L to 5000L).map(_ * 7919L)
    val bloom = keys.toDF("k").agg(Bloom.bloomAgg(col("k"), numBits = 1 << 16))
      .head().getAs[Array[Byte]](0)
    val probes = (1L to 10000L).map(_ * 104729L + 3L)
    val fp = probes.count(Bloom.testBits(bloom, _))
    assert(fp < 500, s"false-positive count $fp out of 10000 probes")
  }

  test("partial merge ORs to the same bitmap as a single partition") {
    val df = (1L to 2000L).toDF("k")
    val one = df.coalesce(1).agg(Bloom.bloomAgg(col("k"), numBits = 1 << 14))
      .head().getAs[Array[Byte]](0)
    val many = df.repartition(13).agg(Bloom.bloomAgg(col("k"), numBits = 1 << 14))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(one, many))
  }

  test("null keys are skipped, not inserted") {
    val bloom = Seq(Some(42L), None, Some(43L)).toDF("k")
      .agg(Bloom.bloomAgg(col("k"), numBits = 1 << 10))
      .head().getAs[Array[Byte]](0)
    assert(Bloom.testBits(bloom, 42L) && Bloom.testBits(bloom, 43L))
  }

  test("the bitmap constant is redacted from plan strings, not hex-dumped") {
    // the whole point of BinaryBlob over lit(bytes): a Literal renders
    // BinaryType as 0x<hex> — 2 chars/byte, megabyte-scale lines in every
    // explain dump and plan-assertion failure message for MiB bitmaps.
    // Pin redaction in BOTH the expression and a full filter plan, and
    // pin that evaluation still returns the exact payload.
    val bytes = Array.tabulate(4096)(i => (i % 251).toByte)
    val blob = graft.expressions.BinaryBlob(bytes, "bloom_bitmap")
    assert(blob.toString == "binary_blob(bloom_bitmap, 4096B)")
    assert(blob.sql == blob.toString)
    assert(blob.eval(null).asInstanceOf[Array[Byte]] sameElements bytes)
    // spark.range, not a local Seq: ConvertToLocalRelation would evaluate
    // the deterministic filter at optimize time and leave a bare
    // LocalTableScan with no filter (and no blob) in the plan at all
    val fact = spark.range(100).selectExpr("id % 10 AS fk", "id AS payload")
    val dim = Seq(0L, 30L).toDF("dk")
    val pruned = Prune.bloomSemiFilter(fact, col("fk"), dim, col("dk"),
      numBits = 1 << 15)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("binary_blob(bloom_bitmap"),
      s"redacted blob missing from plan:\n$plan")
    assert(!plan.contains("0x00010203"),
      "bitmap hex payload leaked into the plan string")
    // the redacted plan stays small even with a real-sized bitmap in it
    assert(plan.length < 100000, s"plan unexpectedly large: ${plan.length}")
  }

  test("bloomSemiFilter keeps every joining row (join result unchanged)") {
    val fact = (1L to 10000L).map(k => (k % 500, k)).toDF("fk", "payload")
    val dim = (0L to 49L).map(k => (k * 10, s"d$k")).toDF("dk", "name")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "name").collect().toSet
    val pruned = Prune.bloomSemiFilter(fact, col("fk"), dim, col("dk"),
        numBits = 1 << 12)
      .join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "name").collect().toSet
    assert(pruned == plain)
    // and the prefilter really prunes: non-joining fk values mostly drop
    val kept = Prune.bloomSemiFilter(fact, col("fk"), dim, col("dk"),
      numBits = 1 << 12).count()
    assert(kept < 4000, s"prefilter kept $kept of 10000 rows")
  }
}

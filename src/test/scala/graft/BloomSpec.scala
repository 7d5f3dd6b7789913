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

package graft

import org.apache.spark.sql.functions._
import graft.operators.Fuzzy

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("deletion variants: the word plus each 1-char deletion") {
    val got = Seq("abc").toDF("w")
      .select(Fuzzy.deletionVariants(col("w")).as("v"))
      .as[Seq[String]].head().toSet
    assert(got == Set("abc", "bc", "ac", "ab"))
  }

  test("hand-computed ED-1 pairs: substitution, insertion, deletion; no ED-2") {
    val words = Seq((1L, "cat"), (2L, "bat"), (3L, "cart"), (4L, "ca"), (5L, "dog"))
    val pairs = Fuzzy.selfJoinEd1(words.toDF("id", "w"), "id", "w")
      .select("s_a", "s_b").as[(String, String)].collect()
      .map { case (a, b) => Set(a, b) }.toSet
    assert(pairs == Set(
      Set("cat", "bat"),   // substitution
      Set("cat", "cart"),  // insertion
      Set("cat", "ca")))   // deletion; dog isolated, all ED-2 pairs excluded
  }

  test("blocked join equals the brute-force cross join on a mixed corpus") {
    val words = (0 until 80).map { i =>
      (i.toLong, f"item${i % 40}%03d${"abcde".charAt(i % 5)}")
    } ++ Seq((100L, "xyz"), (101L, "xy"), (102L, "zyx"))
    val df = words.toDF("id", "w")
    val blocked = Fuzzy.selfJoinEd1(df, "id", "w")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val a = df.select(col("id").as("ia"), col("w").as("wa"))
    val b = df.select(col("id").as("ib"), col("w").as("wb"))
    val brute = a.join(b, col("ia") < col("ib") &&
        levenshtein(col("wa"), col("wb")) === 1)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    assert(blocked == brute, "deletion-neighborhood blocking missed or invented pairs")
    assert(brute.nonEmpty, "degenerate fixture: no ED-1 pairs to compare")
  }

  test("duplicate strings under distinct ids are NOT distance-1 pairs") {
    val df = Seq((1L, "same"), (2L, "same"), (3L, "sama")).toDF("id", "w")
    val pairs = Fuzzy.selfJoinEd1(df, "id", "w")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 3L), (2L, 3L)))
  }
}

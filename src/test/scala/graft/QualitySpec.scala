package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality
import graft.functions.TextAnalysis

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "spam spam spam spam spam"),                       // one word dominates
    (1L, "go go go go stop stop stop stop go go stop stop"), // heavy 2-gram reuse
    (2L, "the quick brown fox jumps over the lazy dog"),     // clean prose
    (3L, "a"),                                               // 1 token, no 2-grams
    (4L, ""))                                                // empty
    .toDF("doc_id", "text")

  test("repetitionStats counts words and 2-grams exactly") {
    val rows = Quality.repetitionStats(docs, "doc_id", "text")
      .orderBy("id").collect()

    // doc 0: 5 words, 1 distinct, top=5; 4 bigrams all "spam spam"
    val d0 = rows(0)
    assert(d0.getLong(1) == 5 && d0.getLong(2) == 1 && d0.getLong(3) == 5)
    assert(d0.getLong(5) == 4 && d0.getLong(6) == 1 && d0.getLong(7) == 4)
    assert(d0.getLong(8) == 4) // every 2-gram occurs >1

    // doc 2: 9 words, "the" twice → 8 distinct; 8 bigrams all unique
    val d2 = rows(2)
    assert(d2.getLong(1) == 9 && d2.getLong(2) == 8 && d2.getLong(3) == 2)
    assert(d2.getLong(5) == 8 && d2.getLong(8) == 0)
    assert(math.abs(d2.getDouble(4) - 1.0 / 9.0) < 1e-15)

    // doc 3: single token → zero 2-grams (greatest(size-1,0) guard)
    val d3 = rows(3)
    assert(d3.getLong(1) == 1 && d3.getLong(5) == 0 && d3.getLong(8) == 0)
  }

  test("empty document drops out of the profile (no tokens to join on)") {
    val ids = Quality.repetitionStats(docs, "doc_id", "text")
      .select("id").as[Long].collect().toSet
    assert(ids == Set(0L, 1L, 2L, 3L)) // doc 4 has no rows after explode
  }

  test("repetitionFilter drops repetition-dominated docs, keeps prose") {
    // 25% top-word threshold: short test prose ("the" is 2/9 = 22%) stays.
    val kept = Quality
      .repetitionFilter(Quality.repetitionStats(docs, "doc_id", "text"),
        maxTopWordFracPct = 25)
      .filter(col("keep")).select("id").as[Long].collect().toSet
    assert(!kept.contains(0L)) // top word 100% > 25%
    assert(!kept.contains(1L)) // dup 2-gram words 100% > 60%
    assert(kept.contains(2L))
    assert(!kept.contains(3L)) // 1-word doc: top word is 100% of words
  }

  test("redactPii replaces every pattern class and leaves clean text alone") {
    val out = Seq(
      "mail a.b+c@ex-ample.co.uk from 10.0.255.3 ssn 123-45-6789 ph 555-867-5309",
      "no pii here, just 12345 and a-b-c")
      .toDF("text")
      .select(TextAnalysis.redactPii(col("text")).as("red"))
      .as[String].collect()
    assert(out(0) == "mail <EMAIL> from <IP> ssn <SSN> ph <PHONE>")
    assert(out(1) == "no pii here, just 12345 and a-b-c")
  }

  test("piiCount counts matches before redaction") {
    val n = Seq("x@y.io and z@w.ai wrote").toDF("text")
      .select(TextAnalysis.piiCount(col("text"), TextAnalysis.PiiPatterns.head._1))
      .as[Long].collect().head
    assert(n == 2L)
  }
}

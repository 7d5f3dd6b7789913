package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.catalog.Tables
import graft.ingest.{BatchExport, Ingest}

/** The reference's full lifecycle end to end (SURVEY §3 EP1→EP3):
  * serialize (read → key → split streams → persist named tables) then
  * deserialize (open, shapes, aligned batches, remainder dropped). */
class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("EP1→EP3: csv corpus to aligned float32 batches via the catalog") {
    val work = Files.createTempDirectory("lifecycle").toString
    // EP1: source data — 23 rows, 3 features, 1 label
    val csv = (1 to 23).map(i => s"$i,${i * 0.5},${i * 2},${i % 3}").mkString("\n")
    Files.writeString(Paths.get(work, "data.csv"), "f1,f2,f3,label\n" + csv)

    // serialize: read → dense key → pop label → float32 vector → catalog
    val keyed = Ingest.withDenseKey(Ingest.readCsv(spark, s"$work/data.csv"), Seq(col("f1")))
    val (inputs, labels) = Ingest.popLabel(keyed, "label")
    Tables.save(Ingest.toFeatureVector(inputs, Seq("f1", "f2", "f3"))
      .select("key", "features"), work, "datumdb0")
    Tables.save(labels, work, "labeldb0")

    // deserialize: open from storage, align by key, batch
    val in = Tables.load(spark, work, "datumdb0")
    val out = Tables.load(spark, work, "labeldb0")
    val wide = in.join(out, "key")
    val be = BatchExport(wide, "key", Seq("features"), Seq("label"), batchSize = 5)
    assert(be.nSamples == 23 && be.nBatches == 4)
    assert(be.shapes("features") == Seq(4).map(_ => 3) || be.shapes("features") == Seq(3))

    val batches = be.epoch().toSeq
    assert(batches.size == 4) // remainder (3 rows) dropped, reference semantics
    val first = batches.head
    // alignment: first batch is keys 1..5 in numeric order; features carry
    // float32 of the source row; labels match the popped column
    val feats = first._1("features").map(_.asInstanceOf[scala.collection.Seq[Float]])
    assert(feats.head.head == 1.0f && feats.last.head == 5.0f)
    assert(first._2("label").size == 5)
  }
}

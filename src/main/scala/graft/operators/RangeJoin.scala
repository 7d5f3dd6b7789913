package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: pair left and right rows with the same key whose
  * timestamps are within `[0, windowSec]` of each other (right.time in
  * [left.time, left.time + windowSec]).
  *
  * A naive inequality join degenerates to a per-key cross product that
  * Catalyst can only plan as BroadcastNestedLoopJoin. Instead both sides
  * are bucketed into windowSec-wide time bins; a candidate pair must lie
  * in the same or adjacent bin, so the equi-join on (key, bin) — left
  * rows duplicated into bin and bin+1 — finds every candidate, and the
  * exact predicate filters the rest. Join fan-out is bounded by bin
  * occupancy, not by per-key row counts; at 100 TB the bin width is the
  * knob that trades duplication (2x left) against candidate volume.
  */
object RangeJoin {

  def within(left: DataFrame, lKey: String, lTime: String,
             right: DataFrame, rKey: String, rTime: String,
             windowSec: Long): DataFrame = {
    // exact integer microseconds end to end: a [t, t+W] interval of width
    // W spans at most two W-wide bins, so left rows go to (bin, bin+1).
    val wUs = windowSec * 1000000L
    // cast: parquet NTZ timestamps -> session-TZ (UTC) instants; zero
    // offset under the engine's fixed UTC session timezone.
    val lp = left
      .withColumn("_lus", unix_micros(col(lTime).cast("timestamp")))
      .withColumn("_bin", explode(array(
        expr(s"_lus div $wUs"), expr(s"_lus div $wUs") + 1)))
      .withColumn("_k", col(lKey))
    val rp = right
      .withColumn("_rus", unix_micros(col(rTime).cast("timestamp")))
      .withColumn("_bin", expr(s"_rus div $wUs"))
      .withColumn("_k", col(rKey))
      .drop(rKey)
    lp.join(rp, Seq("_k", "_bin"))
      .filter(col("_rus") >= col("_lus") && col("_rus") <= col("_lus") + wUs)
      .drop("_k", "_bin", "_lus", "_rus")
  }
}

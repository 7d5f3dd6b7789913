package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for each left row, attach the LATEST right
  * row with the same key and rightTime <= leftTime — the standard
  * time-series enrichment Spark has no native operator for.
  *
  * Built by composition (preference tier (a), SURVEY §4): tag and union
  * both inputs, sort per key by (time, side) — right rows first at equal
  * timestamps, giving inclusive `<=` — and carry the right payload
  * forward with `last(_, ignoreNulls)` over a running frame. ONE shuffle
  * on the key, no range cross-product: at 100 TB this beats any
  * range-condition join, which would explode to |left|x|right| per key
  * before filtering. Matches DuckDB's native ASOF JOIN semantics
  * (oracle-checked as q49, including no-match nulls).
  *
  * Requirement: right rows are unique per (key, time) — pre-aggregate
  * ties away (the caller chooses the tie-break; q49 keeps max id).
  */
object AsOfJoin {

  def asOf(left: DataFrame, lKey: String, lTime: String,
           right: DataFrame, rKey: String, rTime: String,
           carry: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns.toSeq
    // The right payload travels as ONE struct: the struct itself is
    // non-null for every right row, so `last(ignoreNulls)` skips only the
    // left-row padding — a legitimately NULL carry FIELD survives, and
    // all carried fields always come from the same right row.
    val carryType = StructType(carry.map(c => right.schema(c)))
    val lp = left
      .withColumn("_k", col(lKey)).withColumn("_t", col(lTime))
      .withColumn("_side", lit(1))
      .select(Seq(col("_k"), col("_t"), col("_side")) ++
        leftCols.map(col) :+
        lit(null).cast(carryType).as("_c"): _*)
    val rp = right
      .select(Seq(col(rKey).as("_k"), col(rTime).as("_t"), lit(0).as("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(carry.map(col): _*).as("_c"): _*)
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lp.unionByName(rp)
      .withColumn("_c", last(col("_c"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++ carry.map(c => col(s"_c.$c").as(c)): _*)
  }

  /** Forward as-of: for each left row, the EARLIEST right row with the
    * same key and rightTime >= leftTime (next-quote / next-restock
    * enrichment — DuckDB's `ASOF JOIN ... ON l.t <= r.t`). Mirror of
    * [[asOf]]: left rows sort BEFORE right rows at equal timestamps
    * (inclusive `>=`), and the right payload is pulled backward with
    * `first(_, ignoreNulls)` over the following frame. Same single
    * key shuffle, same no-cross-product property, same right-side
    * uniqueness requirement. */
  def asOfForward(left: DataFrame, lKey: String, lTime: String,
                  right: DataFrame, rKey: String, rTime: String,
                  carry: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns.toSeq
    val carryType = StructType(carry.map(c => right.schema(c)))
    val lp = left
      .withColumn("_k", col(lKey)).withColumn("_t", col(lTime))
      .withColumn("_side", lit(0))
      .select(Seq(col("_k"), col("_t"), col("_side")) ++
        leftCols.map(col) :+
        lit(null).cast(carryType).as("_c"): _*)
    val rp = right
      .select(Seq(col(rKey).as("_k"), col(rTime).as("_t"), lit(1).as("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(carry.map(col): _*).as("_c"): _*)
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    lp.unionByName(rp)
      .withColumn("_c", first(col("_c"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select(leftCols.map(col) ++ carry.map(c => col(s"_c.$c").as(c)): _*)
  }
}

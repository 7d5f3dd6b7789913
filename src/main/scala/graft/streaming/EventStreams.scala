package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface over the `events` stream (SURVEY §2.2
  * streaming row). The reference's only streaming notion is a hand-rolled
  * producer/consumer queue pipeline (`/root/reference/serialize.py:404-405,
  * 622-634`) with no event time; these operators add the event-time
  * semantics a training-data pipeline needs: watermarked tumbling windows,
  * session windows, and late-data tolerance.
  *
  * Every transform takes a DataFrame and works identically on a batch
  * frame or a `readStream` frame — the batch twins are oracle-checked as
  * q17 (hourly) and q18 (sessionize); the streaming path is spec-tested
  * with a MemoryStream source.
  *
  * Scale notes: state store size is bounded by the watermark horizon ×
  * key cardinality; keys here are (window, event_type) and (user_id,
  * session) — both small relative to input volume. Aggregations are
  * partial-final (map-side combine) automatically.
  */
/** Running per-user aggregate state for [[EventStreams.userRunningTotals]]. */
case class UserTotals(user_id: Long, n_events: Long, n_purchases: Long, total_value: Double)

object EventStreams {

  /** Tumbling 1-hour event-time windows per event_type, tolerating 2 h of
    * lateness. Works on stream or batch input. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Hopping 1-hour windows sliding every 15 minutes — the streaming twin
    * of q98. Each event lands in hour/slide = 4 open windows (Spark plans
    * the replication as an Expand below the stateful aggregate); state
    * holds 4× the window keys of the tumbling case and evicts on the same
    * watermark. The smoothed-rate view: a spike shows up within 15 min
    * instead of at the top of the hour. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Session windows with a 30-minute inactivity gap per user — the
    * streaming twin of q18's lag/gap sessionization. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("sess"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("user_id"), col("sess.start").as("session_start"),
        col("sess.end").as("session_end"), col("n_events"), col("session_value"))

  /** Streaming exact dedup: drop events whose `event_id` was already seen
    * within the watermark horizon. Uses dropDuplicatesWithinWatermark so
    * per-id state is actually EVICTED once the watermark passes — plain
    * dropDuplicates(id) would keep every id ever seen (unbounded state,
    * the key column doesn't include event time). */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user running state via flatMapGroupsWithState — the custom-state
    * escape hatch for semantics window functions can't express. Emits an
    * updated (user_id, n_events, n_purchases, total_value) row per batch
    * per active user; state is dropped after 1 h of processing-time
    * inactivity so the store cannot grow beyond the active-user set. */
  def userRunningTotals(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                        timeout: org.apache.spark.sql.streaming.GroupStateTimeout =
                          org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout)
      : org.apache.spark.sql.Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val useTimeout = timeout != GroupStateTimeout.NoTimeout
    events
      // NULL-tolerant like the windowed aggregates (sum() skips NULLs): a
      // single NULL value/user_id would otherwise kill the query at the
      // non-nullable tuple encoder ("Null value appeared in non-nullable
      // field"), not just drop the row
      .selectExpr("user_id", "event_type", "coalesce(value, 0.0d) AS value")
      .filter(col("user_id").isNotNull)
      .as[(Long, String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, timeout)(
        (user: Long, rows: Iterator[(Long, String, Double)], state: GroupState[UserTotals]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserTotals(user, 0L, 0L, 0.0))
            val next = rows.foldLeft(prev) { case (acc, (_, typ, v)) =>
              UserTotals(user, acc.n_events + 1,
                acc.n_purchases + (if (typ == "purchase") 1 else 0),
                acc.total_value + v)
            }
            state.update(next)
            if (useTimeout) state.setTimeoutDuration("1 hour")
            Iterator.single(next)
          }
        })
  }

  /** Click→purchase attribution: each purchase joined to the same user's
    * clicks in the preceding hour — the stream-stream INTERVAL join
    * (Spark's within-watermark join, SPARK-24730 semantics). On streams,
    * both sides carry a 2 h watermark and the time-bound condition lets
    * the state store evict clicks older than purchase-watermark − 1 h;
    * without the interval bound the join would buffer both streams
    * forever. On batch frames the same plan is q70's oracle-checked
    * interval join.
    *
    * Scale: state is bounded by (watermark + interval) × click rate;
    * the join keys on user_id so the exchange is the usual hash
    * partition, skew-safe because per-user event rates are bounded. */
  /** `joinType = "left_outer"` additionally emits UNATTRIBUTED purchases
    * (null click columns) — but only once the watermark passes the end of
    * each purchase's join window, because until then a matching click may
    * still arrive. Inner rows emit immediately; outer rows are
    * watermark-gated. That asymmetry is the stream-stream outer-join
    * contract (not a bug), and the spec pins it. */
  def attributedPurchases(events: DataFrame,
                          joinType: String = "inner"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.join(clicks,
      col("c_user") === col("user_id") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") <= col("purchase_ts"),
      joinType)
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"), col("value"))
  }

  /** File-source streaming ingest of events parquet into hourly counts —
    * the Structured-Streaming replacement of the reference's queue-driven
    * ingest (EP1). Caller starts/stops the returned query. */
  def fileStreamHourly(spark: org.apache.spark.sql.SparkSession, inDir: String,
                       schema: org.apache.spark.sql.types.StructType): DataFrame =
    hourlyCounts(spark.readStream.schema(schema).parquet(inDir))

  /** Keep a [[graft.catalog.Rollup]] current from the event stream:
    * exactly-once aggregate maintenance with NO stateful operator.
    *
    * Each micro-batch appends its per-group partials as the rollup
    * partition `batch_id=epoch<id>`. Structured Streaming's contract is
    * that a replayed epoch (restart after a crash between sink write and
    * checkpoint commit) re-delivers the SAME batch under the SAME id —
    * and `Rollup.appendBatch` dynamic-overwrites that id's partition, so
    * the replay lands on top of itself instead of double-counting. That
    * turns foreachBatch's at-least-once into exactly-once, the same
    * construction as [[DocStreams.appendBatchSketch]] — but here the
    * idempotence carries AGGREGATED values, which is only sound because
    * each partition holds exactly one batch's partials (re-aggregation is
    * confined to the replayed partition; RollupStreamSpec gates replay).
    *
    * Scale: per-batch work is one map-side partial aggregate of the batch
    * plus a |groups|-row parquet write; no global state, no watermark, no
    * state store. Unbounded batch counts fold away via `Rollup.compact` —
    * but ONLY compact while this stream's last epoch is known-committed
    * (query stopped cleanly, or the checkpoint's commits dir inspected):
    * compacting an epoch written-but-not-yet-committed makes its replay
    * hit `appendBatch`'s folded-id guard and the restarted query fails
    * permanently (loud, never double-counts). Recovery: confirm the base
    * already folded that epoch's rows, then delete its id from the
    * rollup's `_graft_folded` ledger. */
  def maintainRollup(events: DataFrame, path: String, checkpointDir: String,
                     groupCols: Seq[String],
                     counters: Seq[(String, org.apache.spark.sql.Column)])
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.catalog.Rollup.appendBatch(
          batch.sparkSession, batch.toDF(), path, s"epoch$batchId", groupCols, counters)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Stream-static AS-OF enrichment: every streamed event picks up the
    * LATEST dim attributes at-or-before its event time — the streaming
    * feature-lookup that makes training data point-in-time correct
    * (q240/q220's leakage rule, applied live). Structured Streaming has
    * no native as-of join, so each micro-batch runs the single-shuffle
    * [[graft.operators.AsOfJoin.asOf]] against the static (SCD2-style)
    * dim inside foreachBatch; output lands in `batch_id=epoch<id>`
    * partitions with dynamic overwrite, so a crash-replayed epoch lands
    * on top of itself — the [[maintainRollup]] exactly-once construction.
    * Scale: per batch, one keyed shuffle of batch ∪ dim; the dim is a
    * DataFrame, so a 100 TB deployment points it at a snapshot/broadcast
    * table without touching this code. */
  def enrichAsOf(events: DataFrame, eventKey: String, eventTime: String,
                 dim: DataFrame, dimKey: String, dimTime: String,
                 carry: Seq[String], path: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.AsOfJoin
          .asOf(batch.toDF(), eventKey, eventTime, dim, dimKey, dimTime, carry)
          .withColumn("batch_id",
            org.apache.spark.sql.functions.lit(s"epoch$batchId"))
          .write.option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").partitionBy("batch_id").parquet(path)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}

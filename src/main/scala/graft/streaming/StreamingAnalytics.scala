package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event of the `events` stream table, typed for stateful ops. */
final case class StreamEvent(user_id: Long, event_id: Long, ts: Timestamp)

/** Open-session accumulator kept in the state store per user. */
final case class SessionState(startMs: Long, endMs: Long, nEvents: Long)

/** A closed user session (gap or watermark timeout ended it). */
final case class UserSession(user_id: Long, session_start: Timestamp,
                             session_end: Timestamp, n_events: Long)

/**
 * Streaming analytics over the event stream: watermarked windowed
 * aggregation (the standard tumbling-window shape) and gap-based
 * sessionization via `flatMapGroupsWithState` (the custom-state shape).
 * State size is bounded by the watermark in both — required for unbounded
 * streams.
 */
object StreamingAnalytics {

  /** Stream-static enrichment: join the stream against a (small) static
   * dimension — the dimension broadcasts per micro-batch, the stream
   * never shuffles. The streaming twin of the reference's domain joins. */
  def enrich(stream: DataFrame, dim: DataFrame, streamKey: String,
             dimKey: String): DataFrame =
    stream.join(broadcast(dim), stream(streamKey) === dim(dimKey), "left")

  /**
   * Watermarked stream-stream interval join — the two-live-streams
   * correlation step (impressions × clicks, request × response): rows
   * with equal `keyCol` join when the right event time lies within
   * `[left time, left time + toleranceSec]`. Both sides carry
   * watermarks and the range predicate is what BOUNDS THE STATE: each
   * side buffers only until the other side's watermark passes its join
   * window, the documented requirement for unbounded stream-stream
   * joins (without the time bound Spark would have to buffer both
   * streams forever). Inner join: unmatched rows drop. The same plan
   * runs on batch frames (the watermark is a no-op there), which the
   * spec uses as the oracle. Column names other than `keyCol` must be
   * distinct across the two sides; the right key column is dropped.
   */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTs: String, rightTs: String, toleranceSec: Long,
                   watermark: String = "30 seconds"): DataFrame = {
    require(toleranceSec >= 0, "toleranceSec must be >= 0")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
        l(keyCol) === r(keyCol) &&
          r(rightTs) >= l(leftTs) &&
          r(rightTs) <= l(leftTs) + expr(s"INTERVAL $toleranceSec seconds"))
      .drop(r(keyCol))
  }

  /** Tumbling-window event counts with a watermark bounding late data and
   * state. Works identically on a batch DataFrame (Spark runs the same
   * plan with a no-op watermark), which the spec uses as the oracle. */
  def windowedEventCounts(events: DataFrame, windowLen: String,
                          watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"))

  /**
   * Streaming exact dedup by content fingerprint — the ingest-time twin of
   * `Dedup.exact` for a document stream: each fingerprint's FIRST arrival
   * passes, replays within the watermark horizon drop, and the dedup state
   * EVICTS once the watermark passes (plain `dropDuplicates` on a
   * non-event-time key would hold one state entry per distinct document
   * forever — unbounded on an unbounded stream). Batch frames keep the
   * earliest-`tsCol` row per fingerprint (a window argmin — plain
   * dropDuplicates keeps a partition-layout-dependent row, which would
   * break first-arrival parity with the stream); rows tied on the
   * timestamp are one arbitrary pick on both paths.
   */
  def dedupByContent(docs: DataFrame, textCol: String, tsCol: String,
                     watermark: String = "1 hour"): DataFrame = {
    val fp = docs
      .withColumn("__fp", graft.operators.TextAnalysis.fingerprintMd5(col(textCol)))
    (if (docs.isStreaming)
       fp.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark("__fp")
     else {
       val w = org.apache.spark.sql.expressions.Window
         .partitionBy(col("__fp")).orderBy(col(tsCol).asc)
       fp.withColumn("__rn", row_number().over(w))
         .filter(col("__rn") === 1).drop("__rn")
     }).drop("__fp")
  }

  /**
   * Gap-based sessionization: events of a user belong to one session while
   * consecutive event times are within `gapMs`; a session closes when the
   * watermark passes its end + gap (event-time timeout), emitting one
   * summary row. Per-key state is one [[SessionState]] — O(users) state,
   * independent of event volume.
   */
  def sessionize(events: Dataset[StreamEvent], gapMs: Long,
                 watermark: String = "10 seconds"): Dataset[UserSession] = {
    val enc = Encoders.product[UserSession]
    implicit val stateEnc = Encoders.product[SessionState]
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, evs: Iterator[StreamEvent], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(UserSession(userId, new Timestamp(s.startMs),
              new Timestamp(s.endMs), s.nEvents))
          } else {
            // coalesce the open session and this batch's events as time
            // INTERVALS sorted by start: late (out-of-order) events merge
            // into whatever interval they are within the gap of — possibly
            // extending the open session's START — or close as their own
            // past session; they never smear onto an interval a full gap
            // away. (An event later than an already-emitted session cannot
            // reopen it — inherent to emit-on-close streaming.)
            val items = (state.getOption.map(s => (s.startMs, s.endMs, s.nEvents))
              ++ evs.map(e => (e.ts.getTime, e.ts.getTime, 1L)))
              .toArray.sortBy(i => (i._1, i._2))
            val closed = Seq.newBuilder[UserSession]
            var cur = items.head
            items.tail.foreach { case (s0, e0, n0) =>
              if (s0 - cur._2 <= gapMs)
                cur = (cur._1, math.max(cur._2, e0), cur._3 + n0)
              else {
                closed += UserSession(userId, new Timestamp(cur._1),
                  new Timestamp(cur._2), cur._3)
                cur = (s0, e0, n0)
              }
            }
            state.update(SessionState(cur._1, cur._2, cur._3))
            // a timeout in the past (all events late) is illegal — clamp
            // just past the watermark so the session closes next trigger
            state.setTimeoutTimestamp(
              math.max(cur._2 + gapMs, state.getCurrentWatermarkMs() + 1))
            closed.result().iterator
          }
        })(stateEnc, enc)
  }

  /**
   * Streaming incremental view maintenance: each micro-batch of an
   * I/U/D changelog (the [[graft.operators.Scd.snapshotDiff]] contract —
   * key columns, a `change` column, the NEW side of every tracked
   * column, at most one row per key per batch) folds into BOTH the
   * maintained snapshot table and a downstream count/sum aggregate, via
   * [[graft.operators.Ivm.applyCountSumDelta]]. The streaming twin of
   * q46: a CDC feed keeps a dashboard aggregate current without ever
   * rescanning the fact table — per trigger the work is changelog-sized
   * plus one group-cardinality merge.
   *
   * Both tables must be pre-seeded in the store (the snapshot with its
   * initial state, the aggregate with [[graft.operators.Ivm.countSumAgg]]
   * over it). The versioned [[graft.catalog.SnapshotStore]] makes the
   * read-then-overwrite inside one batch safe: reads pin the current
   * version directory while the write lands the next one.
   */
  def maintainCountSum(changes: DataFrame, store: graft.catalog.SnapshotStore,
                       db: String, snapTable: String, aggTable: String,
                       keys: Seq[String], group: Column, value: Column,
                       checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (chg: DataFrame, _: Long) =>
        if (!chg.isEmpty) {
          val old = store.read(db, snapTable)
          val agg = store.read(db, aggTable)
          val newAgg = graft.operators.Ivm.applyCountSumDelta(
            agg, old, chg, keys, group, value)
          // snapshot fold: U/D keys leave, I/U new images arrive
          val gone = chg.filter(col("change").isin("U", "D"))
            .select(keys.map(col): _*)
          val arrived = chg.filter(col("change").isin("I", "U")).drop("change")
          val newSnap = old.join(gone, keys, "left_anti")
            .unionByName(arrived.select(old.columns.map(col).toIndexedSeq: _*))
          store.overwrite(db, aggTable, newAgg)
          store.overwrite(db, snapTable, newSnap)
        }
      }
      .start()
}

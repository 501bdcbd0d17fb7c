package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the unbounded form of
  * [[graft.operators.Dedup.minhashNearDupsFast]]: each arriving document
  * is shingled and minhashed (xxhash64, typed single pass); every LSH
  * band key is "claimed" by the first document that carries it, and any
  * later document hitting a claimed band within the event-time horizon is
  * flagged as a near-dup candidate of the claimant.
  *
  * Scale shape: state = ONE small entry per distinct band key seen within
  * `horizonMs`, GC'd by event-time timeout — bounded by the (deduped)
  * document arrival rate times bands, NOT by stream length. One shuffle
  * on the band key (hash-valued — uniform).
  *
  * Semantics: candidates, exactly like the batch LSH pass — a production
  * pipeline either trusts the LSH probability bound (bands of >= 2 rows)
  * or verifies candidates downstream against the claimant's text.
  * The watermark is applied INSIDE the operator (`wmDelay` on the doc
  * event time) — a caller-side watermark would not survive the typed
  * banding flatMap.
  */
object StreamDedup {

  /** One flagged candidate: `dupId` collided with `firstId`'s band `band`. */
  case class NearDupHit(dupId: Long, firstId: Long, band: Int)

  /** Band-key claim state (public: product-encoded in the state store).
    * `fireAtMs` is the GC horizon — kept in state so a LATE row in a
    * subsequent batch cannot move the timeout backwards past an extension
    * a newer event already granted.
    */
  case class Claim(firstId: Long, fireAtMs: Long)

  /** Streaming incremental exact dedup against a STATIC corpus: incoming
    * rows whose text digest already exists in the corpus are dropped — the
    * streaming form of [[graft.operators.Dedup.incrementalDedupReport]]'s
    * exact tier. A stream-static join, so every micro-batch probes the
    * corpus digest set with the planner's choice of broadcast/shuffle
    * join keyed by md5 (uniform); no streaming state at all. At 100 TB
    * the corpus side should be a digest-only table (projected + distinct
    * here), ideally bucketed by digest on disk.
    */
  def againstCorpusExact(stream: org.apache.spark.sql.DataFrame,
      textCol: String, corpus: org.apache.spark.sql.DataFrame,
      corpusTextCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, md5}
    val digests = corpus.select(md5(col(corpusTextCol)).as("__d")).distinct()
    stream.withColumn("__d", md5(col(textCol)))
      .join(digests, Seq("__d"), "left_anti").drop("__d")
  }

  def nearDupCandidates[E](docs: Dataset[E])(idOf: E => Long,
      textOf: E => String, tsOf: E => Timestamp,
      shingleN: Int = 3, k: Int = 16, bands: Int = 8,
      horizonMs: Long = 24L * 3600 * 1000,
      wmDelay: String = "0 seconds"): Dataset[NearDupHit] = {
    graft.functions.XxMinhashImpl.requireBanding(k, bands)
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val ce: Encoder[Claim] = Encoders.product[Claim]
    // doc -> (bandKey, band, docId, eventTime); docs with no shingles
    // cannot collide and emit nothing (shared banding pipeline —
    // batch-parity with minhashCandidatesFast by construction)
    val banded = docs.flatMap { e =>
      graft.functions.XxMinhashImpl.bandRows(textOf(e), shingleN, k, bands)
        .map { case (b, bk) => (bk, b, idOf(e), tsOf(e)) }
    }.toDF("bkey", "band", "id", "ts")
      .withWatermark("ts", wmDelay)
      .as[(Long, Int, Long, Timestamp)]
    banded.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, Int), it: Iterator[(Long, Int, Long, Timestamp)],
            state: GroupState[Claim]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = List.newBuilder[NearDupHit]
            var claim = state.getOption
            var maxTs = Long.MinValue
            // deterministic in-batch order: by (ts, id)
            it.toSeq.sortBy(r => (r._4.getTime, r._3)).foreach { case (_, b, id, ts) =>
              maxTs = math.max(maxTs, ts.getTime)
              claim match {
                case None => claim = Some(Claim(id, 0L))
                case Some(c) if c.firstId != id => out += NearDupHit(id, c.firstId, b)
                case _ => ()
              }
            }
            // GC the claim once the watermark passes the horizon of the
            // LATEST activity ever seen — max with the stored horizon so a
            // late row cannot shrink an extension a newer event granted;
            // a claim already past its horizon is dropped on the spot
            // (setTimeoutTimestamp must exceed the watermark)
            val fireAt = claim.map(c => math.max(c.fireAtMs, maxTs + horizonMs))
              .getOrElse(maxTs + horizonMs)
            claim.foreach(c => state.update(c.copy(fireAtMs = fireAt)))
            if (fireAt > state.getCurrentWatermarkMs())
              state.setTimeoutTimestamp(fireAt)
            else state.remove()
            out.result().iterator
          }
      }
  }
}

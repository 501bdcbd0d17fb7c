package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming-throughput benchmark (rows/s) for the stateful streaming
  * surface — the reference's defining semantics (§2.4/2.5/2.9/2.10) that
  * the batch gate cannot time:
  *
  *   - `running_agg`  — update-mode keyed running aggregate
  *     ([[streaming.StreamOps.runningAggregateWithTtl]]; reference
  *     java/.../transformation/SumDemo.java:37 keyed streaming sum)
  *   - `cep_nfa`      — streaming CEP, 3-consecutive-error pattern
  *     ([[streaming.Cep.detectStream]]; reference
  *     scala/.../demo/loginfail/LoginFailWithCep.scala:38-54)
  *   - `count_window` — keyed tumbling count windows
  *     ([[streaming.CountWindows.tumblingStream]]; reference
  *     java/.../window/CountWindowDemo.java:32)
  *   - `interval_join`— stream-stream interval join
  *     ([[streaming.StreamJoins.intervalJoin]]; reference
  *     java/.../transformation/IntervalJoinDemo.java:58-68)
  *   - `stream_dedup` — streaming LSH near-dup candidates
  *     ([[streaming.StreamDedup.nearDupCandidates]]) over a corpus
  *     replicated to >= 50k docs: the round-8 "353 rows/s" was a
  *     tiny-input artifact — the workload's cost is ~fixed PER
  *     MICRO-BATCH (state-store commit + incremental re-plan), so
  *     throughput is meaningless below ~1k docs/batch (measured:
  *     5k docs → 321 rows/s, 100k docs → 5.5k rows/s, same query)
  *   - `windowed_agg` — watermarked tumbling-window count/sum, append
  *     mode ([[streaming.StreamOps.windowedAgg]]; reference
  *     java/.../window/EvenTimeTumblingWindowDemo.java:36-43)
  *   - `tx_match`     — dual-stream reconciliation with per-side
  *     timeouts ([[apps.StreamingApps.txMatchStream]]; reference
  *     scala/.../demo/orderpaydetect/TxMatch.scala:43-113)
  *   - `network_flow` — late-update top-N URLs with close-once/amend
  *     state ([[apps.StreamingApps.networkFlowStream]]; reference
  *     scala/.../demo/networkflow/NetworkFlow.scala:50-146)
  *   - `url_dedup`    — canonical-URL streaming keep-first dedup
  *     ([[operators.Urls.dedupStream]]; three spellings per page,
  *     dropDuplicatesWithinWatermark state bounded by the 1h horizon)
  *
  * Methodology (BASELINE.md solo contract): events replay time-ordered
  * through a MemoryStream in `SPARK_GRAFT_STREAM_BATCHES` micro-batches
  * (default 20 — micro-batch scheduling overhead is part of the price),
  * memory sink, wall clock from first `addData` to the final
  * `processAllAvailable`. rows/s = input rows / seconds. Solo box, no
  * concurrent compile. Every workload runs under BOTH state-store
  * providers — the in-memory default and RocksDB (the 100 TB state
  * backend) — so the state-backend tax is a recorded number, not a
  * guess.
  *
  * STATE-GROWTH EVIDENCE: after every micro-batch the state operators'
  * `numRowsTotal` is sampled from the query progress; the report carries
  * final and peak state rows per workload. A horizon/watermark-bounded
  * operator plateaus (final ≈ peak, both far below rows-ever-keyed);
  * unbounded state would show final == peak == monotone growth with the
  * stream. Results → one stdout JSON line + STREAMBENCH.md.
  */
object StreamBench {

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class Res(name: String, rows: Long, sec: Double,
      stateFinal: Long, statePeak: Long)

  /** Per-batch state-rows sampler (sum over the query's state operators). */
  private final class StateTrace(q: StreamingQuery) {
    private val samples = scala.collection.mutable.ArrayBuffer.empty[Long]
    def sample(): Unit = {
      val p = q.lastProgress
      if (p != null) samples += p.stateOperators.map(_.numRowsTotal).sum
    }
    def finalRows: Long = if (samples.isEmpty) -1L else samples.last
    def peakRows: Long = if (samples.isEmpty) -1L else samples.max
  }

  /** Feed `chunks` through the MemoryStream, draining after each — one
    * micro-batch per chunk, sampling state rows after every drain.
    * Returns wall seconds (sampling reads the already-published progress
    * object; it is not part of the measured work but inside the clock —
    * nanoseconds against batches of hundreds of ms).
    */
  private def drive[A](ms: MemoryStream[A], chunks: Seq[Seq[A]],
      q: StreamingQuery, trace: StateTrace): Double = {
    val t0 = System.nanoTime()
    chunks.foreach { c =>
      ms.addData(c)
      q.processAllAvailable()
      trace.sample()
    }
    (System.nanoTime() - t0) / 1e9
  }

  private def chunksOf[A](xs: Seq[A], n: Int): Seq[Seq[A]] = {
    val size = math.max(1, math.ceil(xs.size.toDouble / n).toInt)
    xs.grouped(size).toSeq
  }

  /** All workloads under one session (= one state-store provider).
    * `tag` keeps memory-sink query names unique across provider runs.
    */
  private def runAll(spark: SparkSession, tag: String, events: Seq[Ev],
      docs: Seq[(Long, String)], nBatches: Int): Seq[Res] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val results = scala.collection.mutable.ArrayBuffer.empty[Res]

    def bench(name: String)(rows: Long)(run: () => (Double, StateTrace)): Unit = {
      spark.catalog.clearCache()
      System.gc()
      try {
        val (sec, trace) = run()
        results += Res(name, rows, sec, trace.finalRows, trace.peakRows)
        System.err.println(
          f"[streambench] $tag/$name: $rows rows in $sec%.2f s = ${rows / sec}%.0f rows/s, state final=${trace.finalRows} peak=${trace.peakRows}")
      } catch { case e: Throwable =>
        results += Res(name, rows, -1.0, -1L, -1L)
        System.err.println(
          s"[streambench] $tag/$name FAILED: ${e.getClass.getName}: ${e.getMessage}")
      }
    }

    // 1. update-mode keyed running aggregate (sum of value per user)
    bench("running_agg")(events.size.toLong) { () =>
      val ms = MemoryStream[Ev]
      val out = streaming.StreamOps.runningAggregateWithTtl(ms.toDS())(
        e => e.user_id.toString, 0.0, (acc: Double, e: Ev) => acc + e.value,
        ttlMs = 0L)
        .map(kv => (kv.key, kv.value))
      val q = out.writeStream.format("memory").queryName(s"sb_${tag}_agg")
        .outputMode("update").start()
      val trace = new StateTrace(q)
      try (drive(ms, chunksOf(events, nBatches), q, trace), trace)
      finally q.stop()
    }

    // 2. streaming CEP: 3 consecutive errors within 2 days, per user
    bench("cep_nfa")(events.size.toLong) { () =>
      val pat = streaming.Cep.Pattern.begin[Ev]("e")(_.event_type == "error")
        .times(3).within(2L * 24 * 3600 * 1000)
      val ms = MemoryStream[Ev]
      val withWm = ms.toDS().withWatermark("ts", "0 seconds").as[Ev]
      val out = streaming.Cep.detectStream(withWm)(
          _.user_id.toString, _.ts.getTime, pat)
        .map(r => (r.key, r.events.size))
      val q = out.writeStream.format("memory").queryName(s"sb_${tag}_cep")
        .outputMode("append").start()
      val trace = new StateTrace(q)
      try (drive(ms, chunksOf(events, nBatches), q, trace), trace)
      finally q.stop()
    }

    // 2b. streaming conversion funnel (the round-13 analytics twin): the
    // reference's OrderTimeoutWithCEP followedBy-within shape over
    // view→click→purchase per user with timeout extraction ON — unlike
    // cep_nfa's consecutive-error pattern this carries MULTI-STEP
    // partials across micro-batches and emits watermark flushes, so it
    // measures the NFA's relaxed-continuity state path.
    bench("funnel_cep")(events.size.toLong) { () =>
      val ms = MemoryStream[Ev]
      val src = ms.toDS()
        .map(e => apps.FunnelEvent(e.user_id, e.event_type, e.ts))
        .withWatermark("ts", "0 seconds")
      val out = apps.StreamingApps.funnelStream(src,
          withinMs = 3L * 86400000L)
        .map(o => (o.userId, o.kind, o.stepsMatched))
      val q = out.writeStream.format("memory").queryName(s"sb_${tag}_fn")
        .outputMode("append").start()
      val trace = new StateTrace(q)
      try (drive(ms, chunksOf(events, nBatches), q, trace), trace)
      finally q.stop()
    }

    // 3. keyed tumbling count windows of 10 (the reference demo's size)
    bench("count_window")(events.size.toLong) { () =>
      val ms = MemoryStream[Ev]
      val out = streaming.CountWindows.tumblingStream(ms.toDS())(
          _.user_id.toString, _.ts.getTime, size = 10)
        .map(w => (w.key, w.windowSeq, w.events.map(_.value).sum))
      val q = out.writeStream.format("memory").queryName(s"sb_${tag}_cw")
        .outputMode("append").start()
      val trace = new StateTrace(q)
      try (drive(ms, chunksOf(events, nBatches), q, trace), trace)
      finally q.stop()
    }

    // 4. stream-stream interval join: each event joined to events of the
    // same user within [-5m, +5m) — both sides the full event stream
    bench("interval_join")(2L * events.size) { () =>
      val msL = MemoryStream[Ev]
      val msR = MemoryStream[Ev]
      val l = msL.toDF().select($"event_id".as("l_id"), $"ts".as("l_ts"),
        $"user_id".as("l_uid"))
      val r = msR.toDF().select($"event_id".as("r_id"), $"ts".as("r_ts"),
        $"user_id".as("r_uid"))
      val joined = streaming.StreamJoins.intervalJoin(l, r,
        "l_ts", "r_ts", "l_uid", "r_uid",
        "INTERVAL 5 MINUTES", "INTERVAL 5 MINUTES", "10 seconds")
      val q = joined.select($"l_id", $"r_id").writeStream.format("memory")
        .queryName(s"sb_${tag}_ij").outputMode("append").start()
      val trace = new StateTrace(q)
      try {
        val lChunks = chunksOf(events, nBatches)
        val rChunks = chunksOf(events, nBatches)
        val t0 = System.nanoTime()
        lChunks.zip(rChunks).foreach { case (lc, rc) =>
          msL.addData(lc); msR.addData(rc)
          q.processAllAvailable()
          trace.sample()
        }
        ((System.nanoTime() - t0) / 1e9, trace)
      } finally q.stop()
    }

    // 5. streaming LSH near-dup candidates over the documents corpus.
    // Event time advances 1s per doc against a 1h horizon, so claims
    // expire mid-run and the state plateau is visible in the trace.
    bench("stream_dedup")(docs.size.toLong) { () =>
      val ms = MemoryStream[(Long, String, Timestamp)]
      val withTs = docs.zipWithIndex.map { case ((id, text), i) =>
        (id, text, new Timestamp(i * 1000L))
      }
      val out = streaming.StreamDedup.nearDupCandidates(ms.toDS())(
        _._1, _._2, _._3, horizonMs = 3600L * 1000)
      val q = out.writeStream.format("memory").queryName(s"sb_${tag}_dedup")
        .outputMode("append").start()
      val trace = new StateTrace(q)
      try (drive(ms, chunksOf(withTs, nBatches), q, trace), trace)
      finally q.stop()
    }

    // 5b. the signals tier as a STATELESS streaming map: Gopher
    // repetition filter + fixed-weight classifier scoring applied to a
    // document stream exactly as written for batch — zero state
    // operators (state columns read -1/n-a), zero shuffles, per-row
    // column expressions only. The evidence that the per-document
    // curation signals drop into a streaming ingest path unchanged.
    bench("signals_map")(docs.size.toLong) { () =>
      val ms = MemoryStream[(Long, String)]
      val w = Array.tabulate(64)(b => ((b * 37) % 101 - 50).toLong)
      val filtered = operators.Repetition.filterByRepetition(
        ms.toDS().toDF("doc_id", "text"), "doc_id", "text")
      val out = operators.Classifier.scoreMicro(filtered, "doc_id", "text", w)
      val q = out.writeStream.format("memory").queryName(s"sb_${tag}_sig")
        .outputMode("append").start()
      val trace = new StateTrace(q)
      try (drive(ms, chunksOf(docs, nBatches), q, trace), trace)
      finally q.stop()
    }

    // 6. watermarked tumbling-window aggregation, append mode — the
    // engine-native windowed agg (state in the streaming agg operator)
    bench("windowed_agg")(events.size.toLong) { () =>
      val ms = MemoryStream[Ev]
      val out = streaming.StreamOps.windowedAgg(ms.toDF(), "ts",
        "10 seconds", "1 hour", None, Seq(col("event_type")),
        Seq(count(lit(1)).as("n"), sum(col("value")).as("total")))
      val q = out.writeStream.format("memory").queryName(s"sb_${tag}_wagg")
        .outputMode("append").start()
      val trace = new StateTrace(q)
      try (drive(ms, chunksOf(events, nBatches), q, trace), trace)
      finally q.stop()
    }

    // 7. streaming Top-N per closed window — the reference's flagship
    // HotItems case study (windowed count + per-batch rank in
    // foreachBatch); sink counts rows to keep the batch materialized
    bench("topn_hotitems")(events.size.toLong) { () =>
      val ms = MemoryStream[Ev]
      val q = streaming.StreamOps.streamingTopN(ms.toDF(), "ts",
        "10 seconds", "1 hour", "event_type", 3,
        (b, _) => { b.count(); () }).start()
      val trace = new StateTrace(q)
      try (drive(ms, chunksOf(events, nBatches), q, trace), trace)
      finally q.stop()
    }

    // 8. TxMatch: dual-stream reconciliation keyed by txId with per-side
    // timeouts (the reference's hardest streaming semantics). One pay per
    // event; 4 of 5 get a receipt +1s later (matched, state cleared on
    // the spot), 1 of 5 never does (expires via the event-time timeout).
    // Receipts are staggered ONE CHUNK behind their pays: with aligned
    // chunks each receipt lands in the same micro-batch as its pay and
    // unmatched pays expire within the batch's watermark advance, so
    // end-of-batch sampling sees empty state and the trace demonstrates
    // nothing — the stagger makes pending pays observable at every
    // batch boundary (peak > 0), while the final drain still clears
    // them (enter AND leave). The stagger REQUIRES a watermark delay
    // covering one chunk's event-time span (30 days / 20 chunks = 1.5
    // days): txMatchStream watermarks the pay∪receipt union, so at 0s
    // delay the lagged receipts would arrive below the watermark and be
    // dropped as late rows — every pay would expire unmatched and the
    // trace would silently measure the timeout path only.
    // StreamingAppsSpec pins the same staggered-input peak/final
    // contract.
    bench("tx_match")(2L * events.size) { () =>
      val msP = MemoryStream[apps.OrderEvent]
      val msR = MemoryStream[apps.ReceiptEvent]
      val pays = events.map(e =>
        apps.OrderEvent(e.event_id, "pay", s"tx${e.event_id}", e.ts))
      val receipts = events.filter(_.event_id % 5 != 0).map(e =>
        apps.ReceiptEvent(s"tx${e.event_id}", s"chan${e.event_id % 3}",
          new Timestamp(e.ts.getTime + 1000L)))
      val out = apps.StreamingApps.txMatchStream(msP.toDS(), msR.toDS(),
        payWaitMs = 5000L, receiptWaitMs = 3000L, wmDelay = "2 days")
      val q = out.writeStream.format("memory").queryName(s"sb_${tag}_tx")
        .outputMode("append").start()
      val trace = new StateTrace(q)
      try {
        val pChunks = chunksOf(pays, nBatches)
        val rChunks = Seq.empty[apps.ReceiptEvent] +: chunksOf(receipts, nBatches)
        val t0 = System.nanoTime()
        pChunks.zipAll(rChunks, Seq.empty[apps.OrderEvent],
            Seq.empty[apps.ReceiptEvent]).foreach { case (pc, rc) =>
          if (pc.nonEmpty) msP.addData(pc)
          if (rc.nonEmpty) msR.addData(rc)
          q.processAllAvailable()
          trace.sample()
        }
        // watermark flush: one far-future event per side expires every
        // real pending entry (the stagger leaves tail pays un-expired —
        // no later input would otherwise advance the watermark past
        // their timeout); only the 2 flush rows themselves may remain
        val tmax = events.map(_.ts.getTime).max
        msP.addData(Seq(apps.OrderEvent(-1L, "pay", "txflushP",
          new Timestamp(tmax + 30L * 86400000L))))
        msR.addData(Seq(apps.ReceiptEvent("txflushR", "chan0",
          new Timestamp(tmax + 30L * 86400000L))))
        q.processAllAvailable()
        trace.sample()
        ((System.nanoTime() - t0) / 1e9, trace)
      } finally q.stop()
    }

    // 9. NetworkFlow late-update top-N: per-window URL-count state with
    // close-once/amend semantics and lateness GC — the replication-heavy
    // custom state operator (each event expands to size/slide windows).
    // 60s tumbling windows (size == slide: 1 covering window per event,
    // the state cost is the URL map + timers, not the expansion).
    bench("network_flow")(events.size.toLong) { () =>
      val ms = MemoryStream[apps.ApacheLogEvent]
      val logs = events.map(e => apps.ApacheLogEvent(
        s"ip${e.user_id}", e.user_id.toString, e.ts, "GET",
        s"/page/${e.event_type}"))
      val out = apps.StreamingApps.networkFlowStream(ms.toDS(), topN = 3,
        sizeMs = 60000L, slideMs = 60000L, latenessMs = 5000L)
      val q = out.writeStream.format("memory").queryName(s"sb_${tag}_nf")
        .outputMode("append").start()
      val trace = new StateTrace(q)
      try (drive(ms, chunksOf(logs, nBatches), q, trace), trace)
      finally q.stop()
    }

    // 10. canonical-URL streaming dedup: three spellings of each page
    // arrive in the same micro-batch; dropDuplicatesWithinWatermark on
    // the canonical form keeps the first. Event time advances 1s per
    // doc against a 1h horizon, so canonical entries expire mid-run and
    // the state plateau (~3600 entries) is visible in the trace.
    bench("url_dedup")(3L * docs.size) { () =>
      val ms = MemoryStream[(Long, Timestamp, String)]
      val rows = docs.zipWithIndex.flatMap { case ((id, _), i) =>
        val ts = new Timestamp(i * 1000L)
        val host = s"src${id % 8}.example.com"
        val path = s"/Docs/Item-$id"
        Seq((id * 3, ts, s"https://WWW.$host$path?utm_source=s&id=$id"),
          (id * 3 + 1, ts, s"https://$host$path?id=$id"),
          (id * 3 + 2, ts, s"HTTPS://$host:443$path/?id=$id"))
      }
      val out = operators.Urls.dedupStream(
        ms.toDF().toDF("id", "ts", "url"), "url", "ts", "1 hour")
      val q = out.select($"id", $"canon").writeStream.format("memory")
        .queryName(s"sb_${tag}_url").outputMode("append").start()
      val trace = new StateTrace(q)
      try (drive(ms, chunksOf(rows, nBatches), q, trace), trace)
      finally q.stop()
    }

    // 11. streaming skip-gram pair counting — the reference's flagship
    // streaming WordCount shape generalized to q149's pair space: a
    // stateless typed flatMap into (center, context) emissions, then an
    // update-mode streaming count. State rows = DISTINCT pairs seen so
    // far (vocabulary-bounded, NOT corpus-bounded): the trace's final
    // == peak plateau is the design claim, matching the batch
    // operator's "reduce side stays ~fixed while the map side grows".
    bench("skipgram_count")(docs.size.toLong) { () =>
      val ms = MemoryStream[(Long, String)]
      val out = ms.toDS()
        .flatMap { case (_, t) =>
          operators.Cooccurrence.pairIter(t, 4).map(p => (p._1, p._2))
        }
        .toDF("center", "context")
        .groupBy($"center", $"context").count()
      val q = out.writeStream.format("memory").queryName(s"sb_${tag}_sg")
        .outputMode("update").start()
      val trace = new StateTrace(q)
      try (drive(ms, chunksOf(docs, nBatches), q, trace), trace)
      finally q.stop()
    }

    // 12. per-micro-batch exact-substring dedup (q148's documented
    // production form): the accepted corpus reduces ONCE to its digest
    // table (localCheckpoint — the state a real loop maintains and
    // appends to); each micro-batch pays only its own anchors + one
    // membership anti join + rebuild, driven through foreachBatch.
    // Zero state operators by design — the digest table IS the state.
    // split FIRST and count the actual incoming side — docs.size/2 is off
    // by one for odd sizes (incoming = size - size/2), which skewed the
    // throughput denominator.
    val (corpusSeq, incomingSeq) = docs.splitAt(docs.size / 2)
    bench("exactsubstr_batch")(incomingSeq.size.toLong) { () =>
      val corpusH = operators.Dedup.corpusSpanDigests(
        corpusSeq.toDF("doc_id", "text"), "doc_id", "text", 8)
        .localCheckpoint()
      val ms = MemoryStream[(Long, String)]
      val q = ms.toDS().toDF("doc_id", "text").writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          // force every output column (count() would prune the rebuild)
          operators.Dedup.dedupSpansIncrementalWith(
            b, corpusH, "doc_id", "text", 8).queryExecution.toRdd.count()
          ()
        }
        .start()
      val trace = new StateTrace(q)
      try (drive(ms, chunksOf(incomingSeq, nBatches), q, trace), trace)
      finally q.stop()
    }

    // 12b. streaming ROLLUP-cube maintenance — q179/q180's live form:
    // each micro-batch builds its own HLL cube over (event_type, day)
    // and merges register-wise into the parquet cube store under the
    // exactly-once ledger (Sketches.maintainDistinctRollup). Zero state
    // operators by design — the |cells|-row store IS the state; cost
    // per batch is the batch's cube build plus a cells-sized merge,
    // independent of how much history the store summarizes.
    bench("distinct_cube")(events.size.toLong) { () =>
      val cubeDir = java.nio.file.Files
        .createTempDirectory(s"sb_cube_$tag").toString
      val ms = MemoryStream[Ev]
      val src = ms.toDF().select($"event_type",
        datediff(to_date($"ts"), lit("1970-01-01")).cast("long")
          .as("day_num"),
        $"user_id")
      val q = operators.Sketches.maintainDistinctRollup(src,
          Seq("event_type", "day_num"), "user_id",
          s"$cubeDir/store", s"$cubeDir/ledger")
        .option("checkpointLocation", s"$cubeDir/ckpt").start()
      val trace = new StateTrace(q)
      try (drive(ms, chunksOf(events, nBatches), q, trace), trace)
      finally q.stop()
    }

    bench("top_hitters")(events.size.toLong) { () =>
      val mgDir = java.nio.file.Files
        .createTempDirectory(s"sb_mg_$tag").toString
      val ms = MemoryStream[Ev]
      // live "hottest keys so far": user_id stream into a capacity-
      // bounded Misra-Gries store (q190's summary under the ledger)
      val src = ms.toDF().select($"user_id".cast("string").as("item"))
      val q = operators.Freq.maintainTopHitters(src, "item",
          capacity = 256, s"$mgDir/store", s"$mgDir/ledger")
        .option("checkpointLocation", s"$mgDir/ckpt").start()
      val trace = new StateTrace(q)
      try (drive(ms, chunksOf(events, nBatches), q, trace), trace)
      finally q.stop()
    }

    bench("top_hitters_grouped")(events.size.toLong) { () =>
      val mgDir = java.nio.file.Files
        .createTempDirectory(s"sb_mgg_$tag").toString
      val ms = MemoryStream[Ev]
      // live "hottest users PER EVENT TYPE so far": the grouped store
      // holds ≤ |groups|·capacity rows with per-group n_total, so
      // guaranteedHittersByGroup certifies against each group's own
      // bound at any stream length
      val src = ms.toDF().select($"event_type",
        $"user_id".cast("string").as("item"))
      val q = operators.Freq.maintainTopHittersByGroup(src, "event_type",
          "item", capacity = 256, s"$mgDir/store", s"$mgDir/ledger")
        .option("checkpointLocation", s"$mgDir/ckpt").start()
      val trace = new StateTrace(q)
      try (drive(ms, chunksOf(events, nBatches), q, trace), trace)
      finally q.stop()
    }

    bench("scd2_versions")(events.size.toLong) { () =>
      val scdDir = java.nio.file.Files
        .createTempDirectory(s"sb_scd_$tag").toString
      val ms = MemoryStream[Ev]
      // live dimension versioning: each event is a change record keyed
      // by user; affected keys re-derive per micro-batch (q194's
      // applyBatch under the ledger)
      val src = ms.toDF().select($"user_id", $"event_type", $"ts",
        $"event_id")
      val q = operators.Scd.maintainScd2(src, Seq("user_id"), "ts",
          "event_id", s"$scdDir/store", s"$scdDir/ledger")
        .option("checkpointLocation", s"$scdDir/ckpt").start()
      val trace = new StateTrace(q)
      try (drive(ms, chunksOf(events, nBatches), q, trace), trace)
      finally q.stop()
    }

    bench("scd2_bucketed")(events.size.toLong) { () =>
      val scdDir = java.nio.file.Files
        .createTempDirectory(s"sb_scdb_$tag").toString
      val ms = MemoryStream[Ev]
      // scd2_versions on the bucket-partitioned store: per-batch I/O is
      // affected buckets only (dynamic partition overwrite), the 100 TB
      // maintenance path measured live
      val src = ms.toDF().select($"user_id", $"event_type", $"ts",
        $"event_id")
      val q = operators.Scd.maintainScd2Bucketed(src, Seq("user_id"), "ts",
          "event_id", s"$scdDir/store", s"$scdDir/ledger", nBuckets = 64)
        .option("checkpointLocation", s"$scdDir/ckpt").start()
      val trace = new StateTrace(q)
      try (drive(ms, chunksOf(events, nBatches), q, trace), trace)
      finally q.stop()
    }

    bench("hist_quantiles")(events.size.toLong) { () =>
      val histDir = java.nio.file.Files
        .createTempDirectory(s"sb_hist_$tag").toString
      val ms = MemoryStream[Ev]
      // value-distribution monitoring per event type: micro-unit values
      // into a fixed power-of-two grid (the q192/maintainHistograms shape)
      val src = ms.toDF().select($"event_type",
        (col("value") * 1000000L).cast("long").as("v_micro"))
      val q = operators.Sketches.maintainHistograms(src,
          "event_type", "v_micro",
          // values are 0..~500 → micro 0..5·10^8; 32 × 2^24 covers 5.4·10^8
          operators.Sketches.Grid(lo = 0L, width = 1L << 24, nBuckets = 32),
          s"$histDir/store", s"$histDir/ledger")
        .option("checkpointLocation", s"$histDir/ckpt").start()
      val trace = new StateTrace(q)
      try (drive(ms, chunksOf(events, nBatches), q, trace), trace)
      finally q.stop()
    }

    // 13. transformWithState running count — the Spark-4 native state
    // API. Requires the RocksDB provider (transformWithState contract),
    // so it only runs in that pass; the memory column stays "-".
    if (tag == "rocksdb")
      bench("running_count_tws")(events.size.toLong) { () =>
        val ms = MemoryStream[Ev]
        val out = streaming.StateV2.runningCountWithTtl(ms.toDS())(
          _.user_id.toString)
        val q = out.toDF("k", "cnt").writeStream.format("memory")
          .queryName(s"sb_${tag}_tws").outputMode("update").start()
        val trace = new StateTrace(q)
        try (drive(ms, chunksOf(events, nBatches), q, trace), trace)
        finally q.stop()
      }

    results.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nBatches = sys.env.get("SPARK_GRAFT_STREAM_BATCHES")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption).getOrElse(20)
    val minDedupDocs = sys.env.get("SPARK_GRAFT_STREAM_DEDUP_DOCS")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption).getOrElse(50000)
    val base = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus),
      GraftSession.longFuse)
      .getOrCreate()
    base.sparkContext.setLogLevel("WARN")
    import base.implicits._

    // time-ordered replay: the watermark advances monotonically, as a
    // live source's would
    val events: Seq[Ev] = Tables.events(base, sfDir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Ev].collect().sortBy(_.ts.getTime).toSeq
    val baseDocs: Seq[(Long, String)] = Tables.documents(base, sfDir)
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    // stream_dedup at realistic size: replicate the corpus (distinct ids,
    // salted text so replicas are near-dups of nothing) until >= minDocs —
    // per-micro-batch fixed cost dominates below ~1k docs/batch and makes
    // tiny-corpus rows/s meaningless (round-8 lesson)
    val reps = math.max(1,
      math.ceil(minDedupDocs.toDouble / math.max(1, baseDocs.size)).toInt)
    val docs: Seq[(Long, String)] = (0 until reps).flatMap { rep =>
      baseDocs.map { case (id, t) =>
        (rep * 10000000L + id, if (rep == 0) t else s"$t replica marker $rep") }
    }

    val rocks = base.newSession()
    rocks.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // discarded warmup pass: whichever provider runs first would
    // otherwise pay all the one-time JIT/codegen/stream-engine warmup
    // (measured as "RocksDB faster than memory" — an ordering artifact,
    // not a storage result)
    runAll(base, "warmup", events.take(2000), docs.take(200), 2)
    val providers = Seq(
      ("memory", base),
      ("rocksdb", rocks))
    val all: Seq[(String, Seq[Res])] =
      providers.map { case (tag, s) => tag -> runAll(s, tag, events, docs, nBatches) }

    // ---- report ----
    def f(v: Double): String = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    val qs = all.flatMap { case (tag, rs) =>
      rs.map { r =>
        s""""${tag}_${r.name}":${if (r.sec > 0) f(r.rows / r.sec) else "-1"}"""
      }
    }.mkString("{", ",", "}")
    val st = all.flatMap { case (tag, rs) =>
      rs.map(r => s""""${tag}_${r.name}":[${r.stateFinal},${r.statePeak}]""")
    }.mkString("{", ",", "}")
    val errs = all.flatMap { case (tag, rs) =>
      rs.collect { case r if r.sec <= 0 => s""""${tag}_${r.name}"""" }
    }.mkString("[", ",", "]")
    println(s"""{"metric":"stream_rows_per_sec","queries":$qs,"state_rows_final_peak":$st,"errs":$errs,"batches":$nBatches,"sf":"$sfDir"}""")

    val opOf = Map(
      "running_agg" -> "`StreamOps.runningAggregateWithTtl` (update mode)",
      "cep_nfa" -> "`Cep.detectStream` (3×error within 2d)",
      "funnel_cep" -> "`StreamingApps.funnelStream` (view→click→purchase within 3d, timeouts on)",
      "count_window" -> "`CountWindows.tumblingStream` (size 10)",
      "interval_join" -> "`StreamJoins.intervalJoin` (±5 min)",
      "stream_dedup" -> s"`StreamDedup.nearDupCandidates` (LSH bands, ${docs.size} docs)",
      "signals_map" -> "`Repetition.filterByRepetition` + `Classifier.scoreMicro` (stateless map)",
      "windowed_agg" -> "`StreamOps.windowedAgg` (1h tumble, append)",
      "topn_hotitems" -> "`StreamOps.streamingTopN` (HotItems, top-3/1h)",
      "tx_match" -> "`StreamingApps.txMatchStream` (pay↔receipt, 20% unmatched)",
      "network_flow" -> "`StreamingApps.networkFlowStream` (top-3/60s, 5s lateness)",
      "url_dedup" -> "`Urls.dedupStream` (3 spellings/page, canonical keep-first, 1h horizon)",
      "skipgram_count" -> "`Cooccurrence.pairIter` flatMap + update-mode count (streaming WordCount shape)",
      "exactsubstr_batch" -> "`Dedup.dedupSpansIncrementalWith` per micro-batch vs a checkpointed digest table (foreachBatch)",
      "distinct_cube" -> "`Sketches.maintainDistinctRollup` (HLL ROLLUP cube merged into the parquet store per micro-batch, exactly-once ledger)",
      "hist_quantiles" -> "`Sketches.maintainHistograms` (fixed-grid value histograms per event type merged into the parquet store per micro-batch, exactly-once ledger)",
      "scd2_versions" -> "`Scd.maintainScd2` (live user-dimension versioning: affected keys re-derive per micro-batch, exactly-once ledger)",
      "scd2_bucketed" -> "`Scd.maintainScd2Bucketed` (scd2_versions on the bucket-partitioned store: dynamic partition overwrite touches affected buckets only)",
      "top_hitters" -> "`Freq.maintainTopHitters` (capacity-bounded Misra-Gries store merged per micro-batch, exactly-once ledger)",
      "top_hitters_grouped" -> "`Freq.maintainTopHittersByGroup` (per-group MG stores with per-group n_total; certified reads per group's own bound)",
      "running_count_tws" -> "`StateV2.runningCountWithTtl` (transformWithState; RocksDB-only)")
    val md = new StringBuilder
    md.append("# STREAMBENCH\n\n")
    md.append("Streaming throughput (rows/s) for the stateful streaming surface,\n")
    md.append("measured by `graft.StreamBench` under the BASELINE.md solo contract:\n")
    md.append(s"time-ordered MemoryStream replay in $nBatches micro-batches, memory sink,\n")
    md.append(s"wall clock first-addData → last-processAllAvailable, local[$cpus], $sfDir.\n")
    md.append("Each workload runs under the in-memory (default) and RocksDB state\n")
    md.append("store providers — RocksDB is the 100 TB posture; the delta is the\n")
    md.append("state-backend tax at this scale.\n\n")
    md.append("State columns: `numRowsTotal` summed over the query's state\n")
    md.append("operators, sampled after every micro-batch — `final` is the last\n")
    md.append("sample, `peak` the max. final ≈ peak ≪ rows-ever-keyed is the\n")
    md.append("horizon/watermark-bounded signature; monotone growth to the end\n")
    md.append("would mean state tracks stream length (unbounded at 100 TB).\n")
    md.append("Workloads keyed by a BOUNDED key space (user ids here) legitimately\n")
    md.append("plateau at |keys| (running_agg, count_window, tws).\n\n")
    md.append("| workload | operator | input rows | memory s | memory rows/s | rocksdb s | rocksdb rows/s | state final | state peak |\n")
    md.append("|---|---|---|---|---|---|---|---|---|\n")
    // the rocksdb pass is the superset (transformWithState is
    // RocksDB-only), so it drives the table's row order
    val memRowsMap = all.head._2.map(r => r.name -> r).toMap
    all.last._2.foreach { r =>
      def cell(sec: Double) =
        if (sec > 0) (f(sec), f(r.rows / sec)) else ("-", "FAILED")
      val (ms, mr) = memRowsMap.get(r.name).map(m => cell(m.sec))
        .getOrElse(("-", "n/a"))
      val (rs, rr) = cell(r.sec)
      md.append(s"| ${r.name} | ${opOf.getOrElse(r.name, "")} | ${r.rows} | $ms | $mr | $rs | $rr | ${r.stateFinal} | ${r.statePeak} |\n")
    }
    md.append("\ntx_match staggers receipts one chunk behind their pays under\n")
    md.append("a 2-day watermark delay, so pending pay claims are observable\n")
    md.append("at batch boundaries: peak = in-flight claims (state ENTERS),\n")
    md.append("final = 2 (only the watermark-flush rows remain — state\n")
    md.append("LEAVES on match or timeout, nothing accumulates).\n")
    md.append("\nsignals_map is the per-document curation tier (Gopher\n")
    md.append("repetition filter + frozen-weight classifier scoring) applied\n")
    md.append("to the stream VERBATIM from the batch operators: zero state\n")
    md.append("operators (state columns 0/0), no watermark, no shuffle —\n")
    md.append("rows/s here is pure per-doc CPU + micro-batch overhead.\n")
    md.append("\nskipgram_count is the reference's flagship streaming-WordCount\n")
    md.append("shape generalized to q149's pair space: a stateless pairIter\n")
    md.append("flatMap feeding an update-mode count. State rows = DISTINCT\n")
    md.append("pairs seen (final == peak from the first batches on) —\n")
    md.append("vocabulary-bounded, not corpus-bounded, the streaming mirror\n")
    md.append("of the batch operator's fixed reduce side.\n")
    md.append("\nexactsubstr_batch is q148's documented production form: the\n")
    md.append("accepted corpus reduces ONCE to a checkpointed digest table\n")
    md.append("(the loop's real state — append each accepted batch's digests\n")
    md.append("to it); each micro-batch pays its own anchors + one membership\n")
    md.append("anti join + rebuild inside foreachBatch. Zero state operators\n")
    md.append("by design. Per-doc cost is intrinsically higher than the map\n")
    md.append("workloads (anchor explosion + join + full-text rebuild).\n")
    md.append("\nscd2_bucketed is deliberately measured in the bucketed store's\n")
    md.append("WORST-CASE regime: this stream's random user keys touch every\n")
    md.append("bucket every micro-batch, so each batch pays 64 partition-dir\n")
    md.append("rewrites plus bucket discovery for zero pruning benefit — the\n")
    md.append("plain path (scd2_versions) is the right tier for full-spread\n")
    md.append("batches against a SMALL dimension, exactly as Scd.scala's\n")
    md.append("docstrings route it. The bucketed store's regime is trickle\n")
    md.append("batches against a LARGE stored dimension, where affected\n")
    md.append("buckets << nBuckets: ScaleSmoke's scd2_bucketed_io phase\n")
    md.append("measures that proportionality directly (7/64 bucket dirs\n")
    md.append("rewritten for a 1/1000-key batch). The row is here so the\n")
    md.append("crossover is a measured fact, not a claim.\n")
    md.append("\nTables regenerate whole per run; the box drifts 15-40% between\n")
    md.append("regenerations (SCALE.md round-11b documents the windows), so\n")
    md.append("compare rows WITHIN a table, and across rounds only through a\n")
    md.append("sentinel (running_agg here, q104 in BENCH).\n")
    md.append("\nstream_dedup runs over the documents corpus replicated to\n")
    md.append(s"${docs.size} docs (SPARK_GRAFT_STREAM_DEDUP_DOCS, default 50000):\n")
    md.append("its per-micro-batch cost is ~fixed (state-store commit +\n")
    md.append("incremental re-plan), so tiny-corpus rows/s measures batch\n")
    md.append("overhead, not the operator — 5k docs → ~320 rows/s vs 100k docs →\n")
    md.append("~5.5k rows/s for the same query (round-9 profiling).\n\n")
    md.append("Reference analogs: SumDemo.java:37 (keyed streaming sum),\n")
    md.append("LoginFailWithCep.scala:38-54, CountWindowDemo.java:32,\n")
    md.append("IntervalJoinDemo.java:58-68, EvenTimeTumblingWindowDemo.java:36-43,\n")
    md.append("TxMatch.scala:43-113 (dual-stream reconciliation).\n")
    md.append("The reference publishes no throughput numbers (BASELINE.md), so\n")
    md.append("these rows are the round-over-round gate.\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("STREAMBENCH.md"), md.toString)
    base.stop()
  }
}

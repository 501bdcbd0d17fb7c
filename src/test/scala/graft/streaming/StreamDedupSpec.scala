package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class Doc(id: Long, text: String, ts: Timestamp)

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def t(sec: Long) = new Timestamp(sec * 1000L)
  private val base = "the quick brown fox jumps over the lazy dog again and again today"

  test("streaming near-dup flags later copies against the first claimant, state GC'd by horizon") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Doc]
    val hits = StreamDedup.nearDupCandidates(ms.toDS())(_.id, _.text, _.ts,
      horizonMs = 60000L)
    val q = hits.writeStream.format("memory").queryName("sdd_out")
      .outputMode("append").start()
    try {
      ms.addData(Doc(1, base, t(10)), Doc(50, "totally different words entirely unrelated content here now", t(11)))
      q.processAllAvailable()
      assert(spark.table("sdd_out").count() == 0) // two distinct docs, no hits
      ms.addData(Doc(2, base, t(20))) // exact copy of doc 1 -> all bands collide
      q.processAllAvailable()
      val hit = spark.table("sdd_out").as[StreamDedup.NearDupHit].collect()
      assert(hit.nonEmpty && hit.forall(h => h.dupId == 2L && h.firstId == 1L))
      // near-copy (one word changed): most bands still collide
      ms.addData(Doc(3, base.replace("lazy", "sleepy"), t(25)))
      q.processAllAvailable()
      val h3 = spark.table("sdd_out").as[StreamDedup.NearDupHit].collect()
        .filter(_.dupId == 3L)
      assert(h3.nonEmpty && h3.forall(_.firstId == 1L))
      // jump the watermark past the horizon: claims are GC'd, so a fresh
      // copy becomes the NEW claimant instead of being flagged
      ms.addData(Doc(90, "advance the watermark far beyond every horizon boundary", t(200)))
      q.processAllAvailable()
      ms.addData(Doc(4, base, t(210)))
      q.processAllAvailable()
      assert(!spark.table("sdd_out").as[StreamDedup.NearDupHit].collect()
        .exists(_.dupId == 4L), "expired claim still flagged doc 4")
      // and the state is bounded: only recent claims remain
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 3 * 8 + 8, s"claims not GC'd: $stateRows state rows")
    } finally q.stop()
  }

  test("state plateaus once the watermark passes the horizon — bounded by horizon, not stream length") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Doc]
    val hits = StreamDedup.nearDupCandidates(ms.toDS())(_.id, _.text, _.ts,
      horizonMs = 30000L)
    val q = hits.writeStream.format("memory").queryName("sdd_plateau")
      .outputMode("append").start()
    try {
      // 10 batches x 20 distinct docs, event time advancing 15s per batch:
      // a batch's claims outlive ~3 later batches (wm lags one batch, then
      // 15s x 3 > 30s horizon), so steady state holds ~3-4 batches' claims
      val traj = scala.collection.mutable.ArrayBuffer[Long]()
      for (b <- 0 until 10) {
        ms.addData((0 until 20).map { i =>
          Doc(b * 100L + i,
            s"distinct document number ${b * 100 + i} with its own shingle words batch $b item $i",
            t(b * 15L))
        }: _*)
        q.processAllAvailable()
        traj += q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      }
      val claimsEver = 10L * 20 * 8 // every doc claims its 8 bands
      assert(traj.last < claimsEver / 2,
        s"state tracks stream length, not horizon: $traj")
      // plateau: once GC kicks in, adds ≈ removes — the tail must not grow
      assert(traj.last <= traj(6) + 80,
        s"no plateau after the horizon: $traj")
    } finally q.stop()
  }

  test("streaming candidates agree with the batch fast path on the same corpus") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      Doc(1, base, t(10)),
      Doc(2, base + " extra", t(20)),
      Doc(7, "some other totally distinct document about spark physical plans", t(30)),
      Doc(9, base, t(40)))
    val ms = MemoryStream[Doc]
    val hits = StreamDedup.nearDupCandidates(ms.toDS())(_.id, _.text, _.ts)
    val q = hits.writeStream.format("memory").queryName("sdd_par")
      .outputMode("append").start()
    try {
      docs.foreach { d => ms.addData(d); q.processAllAvailable() }
      // the streaming op flags AGAINST THE FIRST CLAIMANT (dedup
      // semantics), so compare the flagged-doc set: every doc that batch
      // LSH pairs with an earlier doc must be flagged, and nothing else
      // (arrival order == id order here)
      val streamDups = spark.table("sdd_par").as[StreamDedup.NearDupHit]
        .collect().map(_.dupId).toSet
      val batchDups = graft.operators.Dedup.minhashCandidatesFast(
          docs.toDF(), "id", "text")
        .as[(Long, Long)].collect().map(p => math.max(p._1, p._2)).toSet
      assert(streamDups == batchDups,
        s"stream $streamDups != batch $batchDups")
    } finally q.stop()
  }

  test("againstCorpusExact drops streamed rows whose digest exists in the static corpus") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq((100L, base), (101L, "existing corpus item two"))
      .toDF("doc_id", "text")
    val ms = MemoryStream[Doc]
    val out = StreamDedup.againstCorpusExact(ms.toDS().toDF(), "text",
      corpus, "text")
    val q = out.writeStream.format("memory").queryName("sdd_corp")
      .outputMode("append").start()
    try {
      ms.addData(Doc(1, base, t(1)), // dup of corpus 100 -> dropped
        Doc(2, "fresh new content", t(2)),
        Doc(3, "existing corpus item two", t(3))) // dup of 101 -> dropped
      q.processAllAvailable()
      ms.addData(Doc(4, base, t(4))) // corpus dup in a later batch too
      q.processAllAvailable()
      val ids = spark.table("sdd_corp").select("id").as[Long].collect().toSet
      assert(ids == Set(2L))
    } finally q.stop()
  }
}

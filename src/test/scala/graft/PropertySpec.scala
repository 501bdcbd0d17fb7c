package graft

import graft.streaming.{Cep, CountWindows}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.sql.Timestamp

case class Ev(k: String, kind: String, ts: Timestamp)

/** Property tests (SURVEY §5.2): operator semantics vs brute-force
  * reference implementations on random inputs.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sampling (scalatestplus bridge not available in the
    * offline dep set): fixed seeds, N samples per property.
    */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val evGen: Gen[List[Ev]] = for {
    n <- Gen.choose(0, 30)
    evs <- Gen.listOfN(n, for {
      k <- Gen.oneOf("a", "b")
      kind <- Gen.frequency(3 -> "fail", 2 -> "ok")
      t <- Gen.choose(0L, 40L)
    } yield Ev(k, kind, new Timestamp(t * 1000)))
  } yield evs

  /** Brute-force spec of "3 consecutive fails within W": scan the per-key
    * time-ordered sequence; count adjacent fail triples in-window.
    */
  private def bruteMatches(evs: List[Ev], withinMs: Long): Int =
    evs.groupBy(_.k).toList.map { case (_, kevs) =>
      val sorted = kevs.sortBy(e => (e.ts.getTime, e.kind))
      sorted.sliding(3).count { w =>
        w.length == 3 && w.forall(_.kind == "fail") &&
          w.last.ts.getTime - w.head.ts.getTime <= withinMs
      }
    }.sum

  test("CEP 3-consecutive-fails == brute-force sliding scan") {
    val pat = Cep.Pattern.begin[Ev]("f")(_.kind == "fail").times(3).within(10000L)
    samples(evGen, 8).foreach { evs =>
      // one event per (key, ts): both sides then share a total order
      val distinctEvs = evs.groupBy(e => (e.k, e.ts.getTime))
        .map(_._2.head).toList
      val got = Cep.detectBatch(distinctEvs.toDS())(
          _.k, _.ts.getTime, pat).collect().count(_.kind == "match")
      val exp = bruteMatches(distinctEvs, 10000L)
      assert(got == exp, s"events=$distinctEvs")
    }
  }

  test("count windows partition each key's sequence exactly") {
    samples(Gen.zip(Gen.choose(1, 50), Gen.choose(1, 7)), 8).foreach { case (n, size) =>
      val evs = (0 until n).map(i => Ev(s"k${i % 3}", "x", new Timestamp(i * 1000L)))
      val wins = CountWindows.tumblingBatch(evs.toDS())(
        _.k, _.ts.getTime, size, emitPartial = true).collect()
      // every event in exactly one window; windows ordered and bounded
      assert(wins.map(_.events.size).sum == n)
      assert(wins.forall(_.events.size <= size))
      val full = wins.filter(_.events.size == size)
      val partial = wins.filter(_.events.size < size)
      assert(partial.groupBy(_.key).forall(_._2.length <= 1))
      assert(full.size + partial.size == wins.length)
    }
  }

  test("stream-stream interval join == batch theta join (parity property)") {
    // SURVEY §5.2 item 3: the streaming interval join on random two-sided
    // inputs must equal the plain theta-join predicate evaluated in batch.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val twoSided = Gen.zip(evGen, evGen)
    samples(twoSided, 3).zipWithIndex.foreach { case ((ls, rs), i) =>
      // dedup (key, ts) per side so row identity is unambiguous
      val l = ls.groupBy(e => (e.k, e.ts.getTime)).map(_._2.head).toList
      val r = rs.groupBy(e => (e.k, e.ts.getTime)).map(_._2.head).toList
      val lDf = l.toDF("lk", "lkind", "lts").drop("lkind")
      val rDf = r.toDF("rk", "rkind", "rts").drop("rkind")
      val batch = lDf.join(rDf, col("lk") === col("rk") &&
          col("rts") >= col("lts") - expr("INTERVAL 5 SECONDS") &&
          col("rts") < col("lts") + expr("INTERVAL 5 SECONDS"))
        .select(col("lk"), col("lts").cast("long"), col("rts").cast("long"))
        .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet

      val lms = MemoryStream[(String, Timestamp)]
      val rms = MemoryStream[(String, Timestamp)]
      val joined = graft.streaming.StreamJoins.intervalJoin(
          lms.toDF().toDF("lk", "lts"), rms.toDF().toDF("rk", "rts"),
          "lts", "rts", "lk", "rk",
          "INTERVAL 5 SECONDS", "INTERVAL 5 SECONDS", "0 seconds")
        .select(col("lk"), col("lts").cast("long"), col("rts").cast("long"))
      val q = joined.writeStream.format("memory").queryName(s"ijprop$i")
        .outputMode("append").start()
      try {
        lms.addData(l.map(e => (e.k, e.ts)): _*)
        rms.addData(r.map(e => (e.k, e.ts)): _*)
        q.processAllAvailable()
        val streamed = spark.table(s"ijprop$i")
          .as[(String, Long, Long)].collect().toSet
        assert(streamed == batch, s"trial $i: streamed=$streamed batch=$batch")
      } finally q.stop()
    }
  }

  test("minhash signature is monotone under shingle-set union") {
    import graft.functions.MinhashImpl
    val strs = Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))
    samples(Gen.zip(strs, strs), 20).foreach { case (a, b) =>
      val sa = MinhashImpl.signature(a.distinct.toArray, 4)
      val sb = MinhashImpl.signature((a ++ b).distinct.toArray, 4)
      // adding shingles can only lower (or keep) each min-hash component
      assert(sa.zip(sb).forall { case (x, y) => y <= x })
    }
  }

  test("asOfJoin == per-row brute force (incl. same-instant ties)") {
    val caseGen: Gen[(List[(Long, Long)], List[(Long, Long, Double)])] = for {
      nl <- Gen.choose(0, 30)
      lefts <- Gen.listOfN(nl, for {
        k <- Gen.choose(0L, 2L); t <- Gen.choose(0L, 20L) // dense → ties
      } yield (k, t))
      nr <- Gen.choose(0, 20)
      rights <- Gen.listOfN(nr, for {
        k <- Gen.choose(0L, 2L); t <- Gen.choose(0L, 20L)
        v <- Gen.choose(0, 999)
      } yield (k, t, v.toDouble))
    } yield (lefts, rights)
    samples(caseGen, 6).foreach { case (lefts, rights) =>
      val l = lefts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lrow", "k", "t")
      // one right row per (k, t) so "latest at-or-before" is unambiguous
      // without a tie-break column
      val rl = rights.groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toList
      val r = rl.toDF("k", "t", "v")
      val got = graft.operators.Relational
        .asOfJoin(l, r, Seq("k"), "t", "t")
        .select($"lrow", $"asof.t", $"asof.v")
        .as[(Long, Option[Long], Option[Double])].collect()
        .map(x => x._1 -> (x._2, x._3)).toMap
      lefts.zipWithIndex.foreach { case ((k, t), i) =>
        val cands = rl.filter(x => x._1 == k && x._2 <= t)
        val exp = if (cands.isEmpty) (None, None)
          else {
            val best = cands.maxBy(_._2) // latest ts (unique per key+ts)
            (Some(best._2), Some(best._3))
          }
        assert(got(i.toLong) == exp,
          s"asOf mismatch for left ($k,$t): got ${got(i.toLong)} exp $exp")
      }
    }
  }

  test("slidingStream == slidingBatch on random inputs and batch splits") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val caseGen: Gen[(List[(String, Long)], Int, Int, Int)] = for {
      n <- Gen.choose(0, 25)
      evs <- Gen.listOfN(n, Gen.oneOf("a", "b"))
      size <- Gen.choose(2, 5)
      slide <- Gen.choose(1, 4)
      cut <- Gen.choose(0, math.max(n, 1))
    } yield (evs.zipWithIndex.map { case (k, i) => (k, i.toLong) }, size, slide, cut)
    samples(caseGen, 5).foreach { case (evs, size, slide, cut) =>
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
      val out = CountWindows.slidingStream(ms.toDS())(_._1, _._2, size, slide)
        .map(w => (w.key, w.windowSeq, w.events.map(_._2).mkString("|")))
      val name = s"prop_scw_${size}_${slide}_${cut}_${evs.length}"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        val (w1, w2) = evs.splitAt(cut)
        if (w1.nonEmpty) { ms.addData(w1: _*); q.processAllAvailable() }
        if (w2.nonEmpty) { ms.addData(w2: _*); q.processAllAvailable() }
        q.processAllAvailable()
        val streamed = spark.table(name).as[(String, Long, String)]
          .collect().toSet
        val batch = CountWindows.slidingBatch(evs.toDS())(_._1, _._2, size, slide)
          .collect().map(w => (w.key, w.windowSeq, w.events.map(_._2).mkString("|")))
          .toSet
        assert(streamed == batch,
          s"slide mismatch (size=$size slide=$slide cut=$cut): $streamed vs $batch")
      } finally q.stop()
    }
  }

  test("bucketed rangeJoin == cross-filter on random intervals (incl. negatives)") {
    val caseGen: Gen[(List[(Long, Long)], List[(Long, Long, Long)], Long)] = for {
      nl <- Gen.choose(0, 40)
      lefts <- Gen.listOfN(nl, for {
        id <- Gen.choose(0L, 1000L); t <- Gen.choose(-200L, 200L)
      } yield (id, t))
      nr <- Gen.choose(0, 15)
      rights <- Gen.listOfN(nr, for {
        id <- Gen.choose(0L, 1000L)
        lo <- Gen.choose(-220L, 180L)
        len <- Gen.choose(0L, 60L)
      } yield (id, lo, lo + len))
      bw <- Gen.oneOf(7L, 20L, 100L)
    } yield (lefts, rights, bw)
    samples(caseGen, 6).foreach { case (lefts, rights, bw) =>
      val l = lefts.zipWithIndex.map { case ((id, t), i) => (i.toLong, id, t) }
        .toDF("lrow", "lid", "t")
      val r = rights.zipWithIndex.map { case ((id, lo, hi), i) => (i.toLong, id, lo, hi) }
        .toDF("rrow", "rid", "lo", "hi")
      val got = graft.operators.Relational.rangeJoin(l, r, "t", "lo", "hi", bw)
        .select($"lrow", $"r.rrow").as[(Long, Long)].collect().toSet
      val naive = l.crossJoin(r).filter($"t" >= $"lo" && $"t" <= $"hi")
        .select($"lrow", $"rrow").as[(Long, Long)].collect().toSet
      assert(got == naive,
        s"rangeJoin(bw=$bw) diverged: got=${got.size} naive=${naive.size}")
    }
  }

  test("contaminationReport == brute-force n-gram overlap on random corpora") {
    val vocab = Vector("a", "b", "c", "d", "e")
    val docGen: Gen[List[String]] = for {
      n <- Gen.choose(0, 12)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(0, 10)
        ws <- Gen.listOfN(len, Gen.oneOf(vocab))
      } yield ws.mkString(" "))
    } yield docs
    def grams(t: String, n: Int): Set[String] =
      graft.functions.MinhashImpl.shingles(t, n).toSet
    samples(docGen, 8).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val (bench, train) = docs.partition(_._1 % 3 == 0)
      if (train.nonEmpty) {
        val benchGrams = bench.flatMap(d => grams(d._2, 2)).toSet
        val want = train.flatMap { case (id, t) =>
          val g = grams(t, 2)
          val shared = g.intersect(benchGrams).size
          if (shared > 0) Some(id -> ((shared.toLong, g.size.toLong))) else None
        }.toMap
        val got = graft.operators.Decontam.contaminationReport(
            train.toDF("doc_id", "text"), bench.toDF("doc_id", "text"),
            "doc_id", "text", n = 2)
          .select($"doc_id", $"n_shared", $"n_shingles")
          .as[(Long, Long, Long)].collect()
          .map { case (id, sh, sz) => id -> ((sh, sz)) }.toMap
        assert(got == want, s"decontam diverged on $texts")
      }
    }
  }

  test("connectedComponents == brute-force union-find on random graphs") {
    val graphGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(1, 35)
      edges <- Gen.listOfN(n, for {
        a <- Gen.choose(0L, 24L); b <- Gen.choose(0L, 24L)
      } yield (a, b))
    } yield edges
    def brute(edges: List[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    samples(graphGen, 6).foreach { edges =>
      val got = graft.operators.Clusters
        .connectedComponents(edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(got == brute(edges), s"CC diverged on $edges")
    }
  }

  test("rrfFuse is invariant under arm order and matches brute-force fusion") {
    val armGen: Gen[List[(Long, Long, Int)]] = for {
      n <- Gen.choose(1, 12)
      rows <- Gen.listOfN(n, for {
        q <- Gen.choose(1L, 3L); d <- Gen.choose(10L, 20L)
        r <- Gen.choose(1, 8)
      } yield (q, d, r))
    } yield rows.distinctBy(t => (t._1, t._2)) // one rank per (q, doc)
    def brute(arms: Seq[Seq[(Long, Long, Int)]], k: Int): Set[(Long, Long, Long)] =
      arms.flatten.groupBy(t => (t._1, t._2)).view
        .mapValues(_.map(t => 1000000000000L / (60L + t._3)).sum).toSeq
        .groupBy(_._1._1).flatMap { case (_, rows) =>
          rows.sortBy { case ((_, d), s) => (-s, d) }.take(k)
            .map { case ((q, d), s) => (q, d, s) }
        }.toSet
    samples(Gen.listOfN(3, armGen), 5).foreach { arms =>
      val dfs = arms.map(_.toDF("query_id", "doc_id", "rk"))
      val a = graft.operators.Retrieval.rrfFuse(dfs, k = 4)
        .select($"query_id", $"doc_id", $"score_u")
        .as[(Long, Long, Long)].collect().toSet
      val b = graft.operators.Retrieval.rrfFuse(dfs.reverse, k = 4)
        .select($"query_id", $"doc_id", $"score_u")
        .as[(Long, Long, Long)].collect().toSet
      assert(a == b, s"arm order changed the fusion on $arms")
      assert(a == brute(arms, 4), s"fusion diverged from brute force on $arms")
    }
  }

  test("hits scores are scale-covariant: doubling the scale ~doubles scores") {
    // scores are ratios normalized to the integer scale, so scale 2S
    // must give ~2x the scale-S score, off only by accumulated floor-div
    // units (a handful over 2 iterations at these degrees)
    val edges = (1L to 60L).map(i => (i, (i * 13) % 60 + 1)) ++
      Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val a = graft.operators.Graphs.hits(edges.toDF("src", "dst"), iters = 2,
      scale = 1000000L).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val b = graft.operators.Graphs.hits(edges.toDF("src", "dst"), iters = 2,
      scale = 2000000L).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, (h, au)) =>
      assert(math.abs(b(id)._1 - 2 * h) <= 64, s"hub($id): ${b(id)._1} vs 2*$h")
      assert(math.abs(b(id)._2 - 2 * au) <= 64, s"auth($id): ${b(id)._2} vs 2*$au")
    }
  }

  test("blendByRankBySketch == blendByRank on random tie-free data over unit grids") {
    // the sketch's min-rank percentile equals the exact rank percentile
    // whenever every value sits alone in its bucket — random DISTINCT
    // signal values on unit-width grids must reproduce the exact form
    // bit for bit, top-k membership and rank order included
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    (1 to 3).foreach { trial =>
      val parts = Seq("en", "fr", "zh")
      val rows = parts.flatMap { p =>
        val n = 3 + rnd.nextInt(40)
        val as = rnd.shuffle((0 until 200).toList).take(n)
        val bs = rnd.shuffle((0 until 200).toList).take(n)
        (0 until n).map(i => (trial * 1000L + as(i) * 7L + bs(i),
          p, as(i).toLong, bs(i).toLong))
      }
      // ids must be unique for deterministic tie-break comparison
      val df = rows.groupBy(_._1).map(_._2.head).toSeq
        .toDF("id", "part", "a", "b")
      val k = 1 + rnd.nextInt(8)
      def cols(d: org.apache.spark.sql.DataFrame) =
        d.select($"id", $"pct_a", $"pct_b", $"blend_u", $"rk".cast("long"))
          .as[(Long, Long, Long, Long, Long)].collect().toSet
      val exact = cols(graft.operators.Selection.blendByRank(
        df, "id", "part", "a", "b", k))
      val sketch = cols(graft.operators.Selection.blendByRankBySketch(
        df, "id", "part", "a", "b", k,
        loA = 0L, widthA = 1L, nHistA = 256,
        loB = 0L, widthB = 1L, nHistB = 256, blendWidth = 64L))
      assert(sketch == exact, s"trial $trial k=$k")
    }
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("consistent sample is stable under appends (membership only shrinks by better hashes)") {
    val half = docs.filter($"doc_id" % 2 === 0)
    val sHalf = Sampling.consistentSamplePerGroup(half, Seq("lang"), "doc_id", 3)
      .select($"lang", $"doc_id").as[(String, Long)].collect().toSet
    val sFull = Sampling.consistentSamplePerGroup(docs, Seq("lang"), "doc_id", 3)
      .select($"lang", $"doc_id").as[(String, Long)].collect().toSet
    // every full-corpus pick present in the half corpus was picked there too
    val fullPicksInHalf = sFull.filter { case (_, id) => id % 2 == 0 }
    // a half-corpus pick can only be evicted by a smaller-hash newcomer;
    // picks that survive are exactly the full picks restricted to half
    assert(fullPicksInHalf.subsetOf(sHalf))
    // and sizes are exact: min(3, group size)
    val sizes = Sampling.consistentSamplePerGroup(docs, Seq("lang"), "doc_id", 3)
      .groupBy($"lang").count().as[(String, Long)].collect()
    assert(sizes.forall(_._2 <= 3) && sizes.nonEmpty)
  }

  test("splitByHash is total, deterministic, and roughly proportional") {
    val out = Sampling.splitByHash(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.filter($"split".isNull).count() == 0)
    val counts = out.groupBy($"split").count().as[(String, Long)]
      .collect().toMap
    val total = counts.values.sum.toDouble
    assert(counts("train") / total > 0.6, s"train share off: $counts")
    assert(counts.keySet == Set("train", "val", "test"))
    // determinism: same assignment on re-computation
    val again = Sampling.splitByHash(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select($"doc_id", $"split").as[(Long, String)].collect().toSet
    val first = out.select($"doc_id", $"split").as[(Long, String)]
      .collect().toSet
    assert(first == again)
  }

  test("replicateByWeight gives floor(w) epochs to all and the extra epoch to a stable hash slice") {
    val w = Map("en" -> 2.5, "zh" -> 1.0, "de" -> 0.5)
    val out = Sampling.replicateByWeight(docs, "lang", "doc_id", w)
    val rows = out.select($"lang", $"doc_id", $"epoch")
      .as[(String, Long, Long)].collect()
    assert(!rows.exists(_._1 == "fr") && !rows.exists(_._1 == "es")) // unlisted dropped
    val perDoc = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sorted.toList)
    // epochs are 1..copies with no gaps
    perDoc.foreach { case ((lang, id), eps) =>
      assert(eps == (1L to eps.length).toList, s"epoch gap for $lang/$id: $eps")
      lang match {
        case "en" => assert(eps.length == 2 || eps.length == 3)
        case "zh" => assert(eps.length == 1)
        case "de" => assert(eps.length == 1) // only the kept slice appears
      }
    }
    // en fractional share ~50%: some docs got 2 epochs, some 3
    val enCounts = perDoc.collect { case ((l, _), eps) if l == "en" => eps.length }.toSeq
    assert(enCounts.contains(2) && enCounts.contains(3))
    // de x0.5 keeps roughly half the docs once
    val deIn = docs.filter($"lang" === "de").count()
    val deOut = perDoc.count { case ((l, _), _) => l == "de" }
    assert(deOut > 0 && deOut < deIn)
    // deterministic: identical output on re-run
    val again = Sampling.replicateByWeight(docs, "lang", "doc_id", w)
      .select($"lang", $"doc_id", $"epoch").as[(String, Long, Long)].collect()
    assert(rows.toSet == again.toSet)
  }

  test("stratifiedSampleByHash applies per-stratum thresholds and drops unlisted strata") {
    val fr = Map("en" -> 1.0, "zh" -> 0.5, "de" -> 0.0)
    val kept = Sampling.stratifiedSampleByHash(docs, "lang", "doc_id", fr)
      .select($"lang", $"doc_id").as[(String, Long)].collect()
    assert(kept.forall { case (l, _) => fr.getOrElse(l, 0.0) > 0 })
    // en keeps everything (threshold = buckets), de nothing
    val all = docs.select($"lang", $"doc_id").as[(String, Long)].collect()
    assert(kept.count(_._1 == "en") == all.count(_._1 == "en"))
    assert(!kept.exists(_._1 == "de") && !kept.exists(_._1 == "fr"))
    // zh membership is exactly the hash-bucket rule
    val zhWant = docs.filter($"lang" === "zh")
      .filter(Sampling.hashBucket($"doc_id", 10000) < 5000)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept.filter(_._1 == "zh").map(_._2).toSet == zhWant)
  }

  test("mixCorpus keeps the binding stratum whole and respects ratios") {
    val weights = Map("en" -> 4, "zh" -> 1)
    val before = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val after = Sampling.mixCorpus(docs, "lang", "doc_id", weights)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(after.keySet.subsetOf(weights.keySet))
    // exactly one stratum binds (keeps 100%)
    val whole = weights.keys.filter(s => after.getOrElse(s, 0L) == before(s))
    assert(whole.nonEmpty, s"no binding stratum: before=$before after=$after")
    // kept mixture cannot OVERSHOOT the target ratio by more than the
    // hash-bucket granularity: n_en/n_zh <= 4 within bucket slack
    val ratio = after("en").toDouble / after("zh").max(1L)
    assert(ratio <= 4.0 * 1.5 && ratio >= 4.0 / 1.5,
      s"mixture ratio $ratio far from 4:1 (after=$after)")
    // determinism
    val again = Sampling.mixCorpus(docs, "lang", "doc_id", weights)
      .select($"doc_id").as[Long].collect().toSet
    val first = Sampling.mixCorpus(docs, "lang", "doc_id", weights)
      .select($"doc_id").as[Long].collect().toSet
    assert(first == again)
  }

  test("mixCorpusByMeasure binds on the measure, not row count") {
    // lang with FEW docs but MANY tokens per doc should bind under a
    // token measure even when doc counts alone would not pick it
    val rows = (0L until 200L).map { i =>
      if (i < 20) ("heavy", i, 1000L) else ("light", i, 1L)
    }
    val df = rows.toDF("lang", "doc_id", "n_tokens")
    val out = Sampling.mixCorpusByMeasure(df, "lang", "doc_id", "n_tokens",
      Map("heavy" -> 1, "light" -> 1))
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    // heavy: n/w = 20000; light: n/w = 180 -> light binds, keeps all 180
    assert(out("light") == 180L, s"binding stratum downsampled: $out")
    // heavy keeps ~180/20000 of buckets = 0.9% -> a handful of docs
    assert(out.getOrElse("heavy", 0L) < 20L, s"heavy not downsampled: $out")
  }

  test("deterministicShuffle: dense per-shard positions, reproducible, seed-sensitive") {
    val ids = (0L until 400L).toDF("doc_id")
    def shuffle(seed: Long) =
      Sampling.deterministicShuffle(ids, "doc_id", shards = 8, seed = seed)
        .select($"doc_id", $"shard", $"pos".cast("long"))
        .as[(Long, Long, Long)].collect()
    val a = shuffle(7)
    // every row lands somewhere; positions are dense 1..n per shard
    assert(a.length == 400)
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // no empty shard at 50 rows/shard expected occupancy
    assert(a.map(_._2).distinct.length == 8)
    // same seed -> identical assignment; different seed -> a different
    // permutation (some id moved shard or position)
    assert(shuffle(7).toSeq == a.toSeq)
    assert(shuffle(8).toSet != a.toSet)
    // order inside a shard is the md5 key order, not id order
    val shard0 = a.filter(_._2 == a.head._2).sortBy(_._3).map(_._1)
    assert(shard0.toSeq != shard0.sorted.toSeq)
  }

  test("splitByHostHash is host-disjoint; hostless rows fall back to the id hash") {
    val docs = (1L to 200L).map { i =>
      val url = if (i % 10 == 0) s"not a url $i"
      else s"https://site${i % 7}.example.com/page/$i"
      (i, url)
    }.toDF("doc_id", "url")
    val split = Sampling.splitByHostHash(docs, "url", "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // every row labeled; a host appears in exactly ONE split
    assert(split.count() == 200L)
    val perHost = split.filter($"host" =!= "")
      .groupBy($"host").agg(countDistinct($"split").as("k"))
      .select($"k").as[Long].collect()
    assert(perHost.nonEmpty && perHost.forall(_ == 1L),
      "a host straddled splits — the leakage this operator exists to prevent")
    // hostless rows don't collapse onto one split key: their buckets
    // come from distinct doc ids, so (with 20 rows) expect >1 label
    val hostless = split.filter($"host" === "")
      .select($"split").distinct().count()
    assert(hostless > 1, "hostless rows collapsed onto a single split")
    // determinism
    val again = Sampling.splitByHostHash(docs, "url", "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val first = split.select($"doc_id", $"split")
      .as[(Long, String)].collect().toMap
    assert(first == again)
  }

  test("subsampleFrequentWords thins head words, keeps rare words whole, exact counts") {
    // 'the' appears 40x (freq ratio 40/44), rare words once each; with
    // thresh=1e-2 the keep prob for 'the' is sqrt(0.01·44/40) ≈ 0.105
    // and rare words are at the LEAST(1e6) always-keep cap
    val docs = Seq(
      (1L, ("the " * 20).trim),
      (2L, ("the " * 20).trim + " alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val got = Sampling.subsampleFrequentWords(docs, "doc_id", "text",
        thresh = 1e-2)
      .select($"doc_id", $"n_tokens", $"n_kept")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 == 20L && got(2L)._1 == 24L)
    // doc 2 keeps all 4 rare words plus a thinned share of its 'the's
    assert(got(2L)._2 >= 4L, "rare words must always survive")
    val theKept = (got(1L)._2 + got(2L)._2) - 4L
    assert(theKept < 20L,
      s"head word should thin to ~10% of 40, kept $theKept")
    // exact replay: per-occurrence md5('doc:pos') bucket vs the
    // floor(sqrt)·1e6 threshold
    val t = 1e-2 * 44.0 / 40.0
    val thr = math.min(1000000L,
      math.floor(math.sqrt(t) * 1e6).toLong)
    def bucket(id: Long, pos: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$pos".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val expect1 = (1 to 20).count(p => bucket(1L, p) < thr).toLong
    assert(got(1L)._2 == expect1, "engine diverged from the md5 replay")
  }

  test("splitByHash weights normalize (2:1:1 == 0.5:0.25:0.25)") {
    val a = Sampling.splitByHash(docs, "doc_id",
      Seq("x" -> 2.0, "y" -> 1.0, "z" -> 1.0))
      .select($"doc_id", $"split").as[(Long, String)].collect().toSet
    val b = Sampling.splitByHash(docs, "doc_id",
      Seq("x" -> 0.5, "y" -> 0.25, "z" -> 0.25))
      .select($"doc_id", $"split").as[(Long, String)].collect().toSet
    assert(a == b)
  }

  test("weightedSampleByHash: deterministic, size-exact, weight-biased") {
    // 100 heavy rows (w=1000) among 400 light (w=1): an unweighted
    // uniform 50-sample would pick ~10 heavy; A-ES must pick nearly all
    // heavy (inclusion odds scale with w)
    val rows = (1L to 500L).map(i => (i, if (i <= 100) 1000.0 else 1.0))
      .toDF("id", "w")
    val s1 = Sampling.weightedSampleByHash(rows, "id", "w", k = 50)
      .select($"id").as[Long].collect().toSet
    assert(s1.size == 50)
    assert(s1.count(_ <= 100L) >= 45,
      s"heavy rows under-sampled: ${s1.count(_ <= 100L)}/50")
    // deterministic: same seed -> same set; new seed -> different set
    val s2 = Sampling.weightedSampleByHash(rows, "id", "w", k = 50)
      .select($"id").as[Long].collect().toSet
    assert(s2 == s1)
    val s3 = Sampling.weightedSampleByHash(rows, "id", "w", k = 50, seed = 9L)
      .select($"id").as[Long].collect().toSet
    assert(s3 != s1)
    // zero/negative weights can never be sampled
    val withZero = (1L to 10L).map(i => (i, if (i <= 5) 0.0 else 1.0))
      .toDF("id", "w")
    val s4 = Sampling.weightedSampleByHash(withZero, "id", "w", k = 10)
      .select($"id").as[Long].collect().toSet
    assert(s4 == (6L to 10L).toSet)
  }

  test("weightedSampleByLogWeight agrees with the linear-space sampler") {
    // moderate weights where exp() is safe: the log-domain Gumbel key
    // must select EXACTLY the same set in the same order as ln(u)/w
    val rows = (1L to 300L).map(i => (i, 1.0 + (i % 7))).toDF("id", "w")
    val linear = Sampling.weightedSampleByHash(rows, "id", "w", k = 40)
      .select($"id").as[Long].collect().toSeq
    val logW = rows.withColumn("lw", log($"w"))
    val logDomain = Sampling.weightedSampleByLogWeight(logW, "id", "lw", k = 40)
      .select($"id").as[Long].collect().toSeq
    assert(logDomain == linear)
  }

  test("weightedSampleByLogWeight survives weights exp() cannot represent") {
    // lw spans [-2000, 2000]: exp under/overflows doubles at both ends,
    // but the log-domain key ranks fine — the largest log-weights must
    // dominate the sample
    val rows = (1L to 400L).map(i => (i, (i.toDouble - 200.0) * 10.0))
      .toDF("id", "lw")
    val top = Sampling.weightedSampleByLogWeight(rows, "id", "lw", k = 20)
      .select($"id").as[Long].collect().toSet
    assert(top.count(_ > 380L) >= 18,
      s"extreme log-weights under-sampled: ${top.count(_ > 380L)}/20")
  }

  test("weightedSampleByLogWeight drops null log-weights instead of sampling them first") {
    // ascending sort is NULLS FIRST: without the guard, the two
    // null-weight rows would deterministically displace real rows
    val rows = (1L to 50L).map(i => (i, Some(i.toDouble))).toDF("id", "lw")
      .union(Seq((98L, None: Option[Double]), (99L, None)).toDF("id", "lw"))
    val top = Sampling.weightedSampleByLogWeight(rows, "id", "lw", k = 10)
      .select($"id").as[Long].collect().toSet
    assert(!top.contains(98L) && !top.contains(99L),
      s"null log-weight rows entered the sample: $top")
    assert(top.size == 10)
  }

  test("temperatureMix drops null strata without NPE") {
    val rows = ((1L to 100L).map(i => (i, Some("en"))) ++
      (201L to 210L).map(i => (i, Some("fr"))) ++
      (301L to 305L).map(i => (i, None: Option[String]))).toDF("id", "lang")
    val kept = Sampling.temperatureMix(rows, "lang", "id", alpha = 1.0)
    assert(kept.filter($"lang".isNull).count() == 0)
    assert(kept.count() == 110L) // alpha=1 keeps every non-null stratum whole
  }

  test("temperatureMix keeps the smallest stratum whole, alpha-flattens the rest") {
    // en:1600, fr:400, de:100 at alpha=0.5 -> weights 40/20/10; binding
    // stratum de (n^(1-a) smallest) kept 100%; fr thresholded to
    // 10000*20*100/(10*400)=5000 buckets (~50%), en to 2500 (~25%)
    val rows = ((1L to 1600L).map(i => (i, "en")) ++
      (2001L to 2400L).map(i => (i, "fr")) ++
      (3001L to 3100L).map(i => (i, "de"))).toDF("id", "lang")
    val kept = Sampling.temperatureMix(rows, "lang", "id", alpha = 0.5)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(kept("de") == 100L)
    assert(math.abs(kept("fr") - 200L) < 40, s"fr kept ${kept("fr")}")
    assert(math.abs(kept("en") - 400L) < 80, s"en kept ${kept("en")}")
    // alpha = 1 must keep everything (natural distribution)
    val all = Sampling.temperatureMix(rows, "lang", "id", alpha = 1.0).count()
    assert(all == 2100L)
  }

  test("weightedSamplePerGroup: k per group, same key function as global") {
    val rows = (1L to 200L).map(i => (i, if (i % 2 == 0) "even" else "odd", 1.0 + i))
      .toDF("id", "g", "w")
    val out = Sampling.weightedSamplePerGroup(rows, Seq("g"), "id", "w", k = 5)
      .select($"g", $"id").as[(String, Long)].collect()
    assert(out.groupBy(_._1).map { case (g, xs) => g -> xs.length } ==
      Map("even" -> 5, "odd" -> 5))
    // the per-group winners are the global ordering restricted to the group
    val global = Sampling.weightedSampleByHash(rows, "id", "w", k = 200)
      .select($"id").as[Long].collect()
    val evenTop5 = global.filter(_ % 2 == 0).take(5).toSet
    assert(out.filter(_._1 == "even").map(_._2).toSet == evenTop5)
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** BoundedIdSet = sorted(distinct).take(cap), checked directly on the
  * Aggregator (reduce/merge orders) and end-to-end through udaf groupBy.
  */
class BoundedIdSetSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(11L + i)))

  private val idsGen: Gen[List[Long]] = for {
    n <- Gen.choose(0, 200)
    ids <- Gen.listOfN(n, Gen.choose(-50L, 50L))
  } yield ids

  test("reduce-then-merge equals sorted-distinct-take for any split point") {
    for (ids <- samples(idsGen, 20); cap <- Seq(2, 3, 16)) {
      val agg = new BoundedIdSet(cap)
      val want = ids.distinct.sorted.take(cap)
      // straight fold
      val folded = ids.foldLeft(agg.zero)(agg.reduce)
      assert(folded.toList == want, s"fold cap=$cap ids=$ids")
      // every split: fold halves independently, then merge
      for (cut <- Seq(0, ids.length / 3, ids.length / 2, ids.length)) {
        val (l, r) = ids.splitAt(cut)
        val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
          r.foldLeft(agg.zero)(agg.reduce))
        assert(merged.toList == want, s"merge cap=$cap cut=$cut ids=$ids")
      }
    }
  }

  test("udaf form caps per group inside a groupBy") {
    val rows = samples(idsGen, 1).head.zipWithIndex
      .map { case (id, i) => (s"g${i % 3}", id) }
    val got = rows.toDF("g", "id")
      .groupBy($"g").agg(BoundedIdSet(4)($"id").as("ids"))
      .as[(String, Array[Long])].collect()
      .map { case (g, ids) => g -> ids.toList }.toMap
    val want = rows.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2).distinct.sorted.take(4)
    }
    assert(got == want)
  }
}

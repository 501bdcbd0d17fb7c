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
}

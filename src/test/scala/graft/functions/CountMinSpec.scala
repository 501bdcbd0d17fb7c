package graft.functions

import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 256

  test("CMS estimates overcount only and stay within the e/width bound; partitioning is irrelevant") {
    // zipf-ish: key k appears 200/k times
    val data = (1L to 40L).flatMap(k => Seq.fill((200 / k).toInt)(k))
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val agg = new CountMinAgg(depth, width)
    val sk1 = data.toDS().select(agg.toColumn).head()
    val bound = math.ceil(math.E / width * data.size).toLong
    truth.foreach { case (k, n) =>
      val est = CountMin.estimate(sk1, k, depth, width)
      assert(est >= n, s"undercount for $k: $est < $n")
      assert(est <= n + bound, s"bound blown for $k: $est > $n + $bound")
    }
    // absent keys estimate at most the collision bound
    assert(CountMin.estimate(sk1, 99999L, depth, width) <= bound)
    // merge across partitions must give the identical sketch
    val sk8 = data.toDS().repartition(8).select(agg.toColumn).head()
    assert(java.util.Arrays.equals(sk1, sk8))
  }

  test("CMS sketch width must be a power of two") {
    intercept[IllegalArgumentException](new CountMinAgg(4, 1000))
  }
}

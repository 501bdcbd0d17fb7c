package graft.operators

import graft.SparkSpec

/** The A/B operator family's row-local math — the streaming-twin and
  * gate coverage live in StreamingAppsSpec and q176/q182; this spec
  * pins the significance inequality against hand-computed z-tests.
  */
class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  private def verdict(rows: Seq[(Long, Long, Long, Long)]) =
    Experiment.significance(
        rows.toDF("variant", "n_users", "n_converted", "conv_micro"))
      .select($"n0", $"c0", $"n1", $"c1", $"rate_diff_micro", $"significant")
      .as[(Long, Long, Long, Long, Long, Option[Boolean])].head()

  test("significance flags a 20% vs 10% split at n=1000 per arm (z ≈ 6.3)") {
    val got = verdict(Seq((0L, 1000L, 200L, 200000L),
      (1L, 1000L, 100L, 100000L)))
    // 625·(200000−100000)²·2000 = 1.25e16 > 2401·10⁶·300·1700 ≈ 1.22e15
    assert(got == ((1000L, 200L, 1000L, 100L, 100000L, Some(true))))
  }

  test("significance stays quiet on 10% vs 9% at n=100 per arm (z ≈ 0.24)") {
    val got = verdict(Seq((0L, 100L, 10L, 100000L),
      (1L, 100L, 9L, 90000L)))
    // 625·(1000−900)²·200 = 1.25e9 < 2401·10⁴·19·181 ≈ 8.26e10
    assert(got == ((100L, 10L, 100L, 9L, 10000L, Some(false))))
  }

  test("significance is NULL when SE is undefined, not 'significant'") {
    // zero conversions anywhere: pooled rate 0
    assert(verdict(Seq((0L, 100L, 0L, 0L), (1L, 100L, 0L, 0L)))._6.isEmpty)
    // everyone converted: pooled rate 1
    assert(verdict(Seq((0L, 10L, 10L, 1000000L),
      (1L, 10L, 10L, 1000000L)))._6.isEmpty)
    // a missing arm: its counts coalesce to 0 and the verdict is null
    val oneArm = verdict(Seq((0L, 100L, 10L, 100000L)))
    assert(oneArm._3 == 0L && oneArm._6.isEmpty)
  }
}

package graft

/** Pins the round-13 ADVICE fix: builder configs are last-write-wins,
  * and tune() used to write the stock broadcast fuse OVER the long fuse
  * the entry points had already set — all four drivers silently ran
  * fail-fast. The fuse is now tune()'s parameter; this spec fails if
  * anyone reverts to a pre-set-then-tune arrangement.
  */
class SessionSpec extends SparkSpec {
  test("graft entry-point sessions carry the long broadcast fuse through tune()") {
    assert(spark.conf.get("spark.sql.broadcastTimeout") ==
      GraftSession.longFuse)
  }

  test("tune() without an explicit fuse keeps the stock fail-fast default") {
    assert(GraftSession.broadcastTimeout == "300" ||
      sys.env.contains("GRAFT_BROADCAST_TIMEOUT"))
  }
}

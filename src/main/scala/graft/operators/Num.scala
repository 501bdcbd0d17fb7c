package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared exact-integer Column arithmetic — the rounding discipline the
  * oracle gates depend on bit for bit, defined once.
  */
object Num {

  /** Exact BIGINT floor division a div b (b > 0): Column `/` is DOUBLE
    * division, and the dividend can exceed 2^53 at corpus group sizes —
    * strip the remainder with pmod FIRST (exact in long), then the
    * double quotient is integer-valued with absolute error << 0.5,
    * which +0.5/floor snaps away.
    */
  def longFloorDiv(a: Column, b: Column): Column =
    floor((a - pmod(a, b)).cast("double") / b.cast("double") + 0.5)
      .cast("long")
}

package graft.functions

/** The engines-agree rounding contract, in ONE place: HALF_UP over the
  * double's shortest decimal representation (`BigDecimal.valueOf`) — the
  * bit-for-bit twin of the `round(col, n)` column function, used wherever
  * build-time Scala math must reproduce plan-time results (the IVF
  * lloydStep, PQ training/assignment/ADC tables). NaN/Infinity pass
  * through exactly like the column function.
  */
object Rounding {
  def sparkRound(d: Double, scale: Int): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
}

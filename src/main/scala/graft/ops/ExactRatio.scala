package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact 4dp publication of an integer ratio — the
  * engine-portability idiom for count shares.
  *
  * `round(num/den, 4)` on the IDENTICAL double splits engines
  * whenever the rational is a true 4dp half-boundary: Spark rounds
  * the shortest decimal representation HALF_UP while DuckDB rounds
  * the binary double, and e.g. 71/4000 = .01775 publishes as .0178
  * vs .0177 (caught live by the off-grid sf0.004 sweep on
  * q_skew_profile). [[r4]] instead computes half-up ON THE RATIONAL
  * in exact integer arithmetic — (num·2e4 + den) div (2·den) — then
  * divides the resulting ≤1e4-scaled integer by 1e4 once, which
  * both engines render identically. Operands widen to
  * DECIMAL(38,0): num·2e4 outgrows BIGINT when num itself is a
  * product of corpus-scale counts (market-basket lift, skew ratios).
  *
  * DuckDB mirror (HUGEINT is the decimal widening):
  * `CAST((CAST(num AS HUGEINT) * 20000 + den) // (2 * den) AS
  * BIGINT) / 10000.0`.
  *
  * Contract: `den > 0` and `num ≥ 0` (floor-vs-truncate integral
  * division diverges on negatives across engines — shift first if a
  * signed ratio ever needs this).
  */
private[graft] object ExactRatio {
  private val dec = "decimal(38,0)"
  def r4(num: Column, den: Column): Column =
    (call_function("div",
      num.cast(dec) * 20000 + den.cast(dec),
      den.cast(dec) * 2)
      .cast("double") / 10000.0)

  /** SIGNED variant of [[r4]] (den > 0, |num/den| < 10⁶): integral
    * division of a negative numerator truncates on one engine and
    * floors on the other, so the rational shifts by +10⁶ FIRST
    * (num + 10⁶·den ≥ 0 under the bound), rounds half-up exactly as
    * [[r4]], and unshifts by subtracting 10¹⁰ from the ≤1e4-scaled
    * INTEGER — never from the divided double, where the ulp at 10⁶
    * magnitude (~2e-10) would leak into the published value (the
    * first cut published .006300000008 for 1/160). The remaining
    * small integer divides by 1e4 once, rendering identically on
    * both engines. Note the published value is the half-up rounding
    * OF THE SHIFTED rational; for a negative true half-boundary
    * (e.g. −0.00005) that lands at −0.0000 → 0.0 rather than
    * HALF-AWAY's −0.0001 — a deterministic, documented convention,
    * not drift.
    *
    * DuckDB mirror: `CAST(((CAST(num AS HUGEINT) + 1000000 * den) *
    * 20000 + den) // (2 * den) - 10000000000 AS BIGINT) / 10000.0`. */
  def r4s(num: Column, den: Column): Column =
    ((call_function("div",
      (num.cast(dec) + den.cast(dec) * 1000000L) * 20000 + den.cast(dec),
      den.cast(dec) * 2) - lit(10000000000L))
      .cast("double") / 10000.0)
}

package graft

import org.apache.spark.sql.DataFrame

/** Per-commit execution-regime smoke (r12): every `SparkEntry.queries`
  * builder runs at sf0.001 under a COMBINED adversarial regime —
  * `shuffle.partitions=1` + ANSI off + legacy `sizeOfNull=true` (the
  * battery's shuffle1 + legacy_size regimes in one session; legacy
  * sizeOfNull is inert under ANSI, so ANSI off is what arms it) — and
  * must produce row-identical results to the stock run.
  *
  * Why in `sbt test` and not only the round-close battery: regime
  * regressions (a `size(null)`-dependent null contract, an
  * accidentally partition-count-sensitive kernel) are introduced by a
  * COMMIT, and the full 10-regime battery runs hours later at round
  * close — this smoke catches the two highest-yield regimes at commit
  * time. Self-consistency (stock == regime) is the assertion, not the
  * DuckDB oracle: the oracle gate already pins stock values; a regime
  * divergence from stock is exactly the bug class this hunts.
  *
  * Scope note: per-dir model/store caches (IVF fits, store builds) are
  * built once by whichever run executes first and shared — the smoke
  * exercises QUERY execution under the regime, not builds; the battery
  * covers builds with fresh JVMs per regime.
  */
class RegimeSmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val regime = Map(
    "spark.sql.shuffle.partitions" -> "1",
    "spark.sql.ansi.enabled" -> "false",
    "spark.sql.legacy.sizeOfNull" -> "true")

  /** Order-free canonical form. Row.toString is deterministic for the
    * output types the oracle gate accepts (primitives, strings,
    * arrays); the sort removes row-order sensitivity, which the
    * driver's hash compare also ignores. */
  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  for (name <- SparkEntry.queries.keys.toSeq.sorted)
    test(s"$name is regime-invariant (partitions=1 + ansi off + legacy sizeOfNull)") {
      val stock = canon(SparkEntry.queries(name)(spark, dir))
      val adversarial =
        withSessionConfs(regime)(canon(SparkEntry.queries(name)(spark, dir)))
      // zipAll, not zip: a row-count regression with an identical
      // common prefix would otherwise report "first diff at -1".
      val firstDiff = stock.zipAll(adversarial, "<absent>", "<absent>")
        .indexWhere { case (a, b) => a != b }
      assert(adversarial == stock,
        s"$name: stock ${stock.size} rows vs regime ${adversarial.size}; " +
          s"first diff at sorted index $firstDiff: " +
          s"${stock.lift(firstDiff)} vs ${adversarial.lift(firstDiff)}")
    }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.index.PqIndex

/** Mechanized guard for the NULLABILITY-LIE class of bug (found in
  * round 10 on the ADC path): an expression that can evaluate to NULL
  * but reports `nullable = false` makes Catalyst PRUNE every downstream
  * `IS NOT NULL` filter — the screen silently stops filtering and (for
  * ASC rankings, where NULLS sort FIRST) null rows starve real ones out
  * of candidate budgets. Spark's own `element_at` over a foldable
  * all-non-null literal array does exactly this when the INDEX is
  * nullable.
  *
  * For every null-capable column builder the engine ranks or screens
  * by, this spec pins the user-visible property end to end: over a
  * frame with a null/mismatched row, the built column evaluates to
  * NULL there, AND `where(col.isNotNull)` actually removes the row
  * after optimization. Adding a builder to the table is the cheap way
  * to keep the next custom expression honest. */
class NullScreenSpec extends SparkSpec {
  import spark.implicits._

  private val pq = PqIndex.Model(IndexedSeq(
    IndexedSeq(IndexedSeq(1.0, 0.0), IndexedSeq(0.0, 1.0)),
    IndexedSeq(IndexedSeq(0.0, 0.0), IndexedSeq(1.0, 1.0))))
  private val hrot = PqIndex.HouseholderRotation(IndexedSeq(0.3, -1.2, 0.7, 2.1))
  private val mrot = PqIndex.MatrixRotation(IndexedSeq(
    IndexedSeq(0.5, -0.5, 0.5, 0.5),
    IndexedSeq(0.5, 0.5, -0.5, 0.5),
    IndexedSeq(0.5, 0.5, 0.5, -0.5),
    IndexedSeq(-0.5, 0.5, 0.5, 0.5)))
  private val q = Seq(1.0, 0.0, 0.0, 0.0)

  // (id, vec): row 0 valid, row 1 null, row 2 dim-mismatched.
  private def frame = Seq(
    (0L, Some(Seq(1.0, 0.0, 0.0, 0.0))),
    (1L, None),
    (2L, Some(Seq(1.0, 0.0)))).toDF("id", "vec")

  /** (name, builder, idsExpectedToSurviveTheScreen, withMismatchRow).
    * Builders where a 2-dim vector is VALID input (norms, sign bits)
    * keep row 2; plain PQ encode RAISES on a dim mismatch by contract
    * (loud ingest-time failure), so its row runs null-only. */
  private val builders: Seq[(String, Column => Column, Set[Long], Boolean)] = Seq(
    ("dotProduct", (v: Column) => VectorFunctions.dotProduct(v, typedlit(q)), Set(0L), true),
    ("cosineSimilarity", (v: Column) => VectorFunctions.cosineSimilarity(v, typedlit(q)), Set(0L), true),
    ("l2Distance", (v: Column) => VectorFunctions.l2Distance(v, typedlit(q)), Set(0L), true),
    ("dotProductSql", (v: Column) => VectorFunctions.dotProductSql(v, typedlit(q)), Set(0L), true),
    ("l2Normalize", (v: Column) => VectorFunctions.l2Normalize(v), Set(0L, 2L), true),
    ("binarySign63", (v: Column) => VectorFunctions.binarySign63(v), Set(0L, 2L), true),
    ("hamming", (v: Column) => VectorFunctions.hammingDistance(
      VectorFunctions.binarySign63(v), lit(3L)), Set(0L, 2L), true),
    ("pqAdc", (v: Column) => pq.adcMicrosCol(pq.encodeCol(v, 4), q, 4), Set(0L), false),
    ("pqAdcHouseholder", (v: Column) =>
      pq.adcMicrosCol(pq.encodeCol(hrot.rotateCol(v), 4), hrot.applyVec(q).toSeq, 4), Set(0L), true),
    ("pqAdcMatrix", (v: Column) =>
      pq.adcMicrosCol(pq.encodeCol(mrot.rotateCol(v), 4), mrot.applyVec(q).toSeq, 4), Set(0L), true),
    ("rotateHouseholder", (v: Column) => hrot.rotateCol(v), Set(0L), true),
    ("rotateMatrix", (v: Column) => mrot.rotateCol(v), Set(0L), true))

  test("every ranked/screened column builder: NULL evaluates as NULL and the IS NOT NULL screen survives optimization") {
    builders.foreach { case (name, build, survivors, withMismatch) =>
      val base = if (withMismatch) frame else frame.where(col("id") =!= 2L)
      val all = if (withMismatch) Set(0L, 1L, 2L) else Set(0L, 1L)
      val df = base.withColumn("x", build(col("vec")))
      // 1) honest evaluation: non-survivor rows are NULL
      val nulls = df.where(col("x").isNull).select("id").as[Long].collect().toSet
      assert(nulls == (all -- survivors),
        s"$name: wrong NULL rows $nulls (expected ${all -- survivors})")
      // 2) the screen itself must not be optimized away: the filtered
      // frame contains exactly the survivors. This is what the
      // nullability lie broke — evaluation was fine, the FILTER wasn't.
      val kept = df.where(col("x").isNotNull).select("id").as[Long].collect().toSet
      assert(kept == survivors,
        s"$name: IS NOT NULL screen kept $kept, expected $survivors — " +
          "the expression is lying about its nullability")
    }
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structured-data privacy stages of a training-data pipeline: k-anonymity
  * risk measurement and suppression (Sweeney, IJUFKS 2002). The free-text
  * counterpart ([[TextOps.maskPii]]) handles surface PII; these operators
  * handle the quasi-identifier combinations that re-identify rows even with
  * direct identifiers removed.
  *
  * Both are one hash shuffle on the quasi-identifier tuple (group count /
  * count-over-window); no driver-side state, no joins back — linear at any
  * corpus size, with the usual hot-group caveat handled by map-side partial
  * aggregation.
  */
object Privacy {

  /** Per-equivalence-class k-anonymity report: one row per distinct
    * quasi-identifier combination with its population `n_rows`, an
    * `at_risk` flag (class smaller than `k`), and the worst-case
    * re-identification probability `reid_risk` = 1/n (one exactly-rounded
    * division — engine-portable).
    */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("at_risk", (col("n_rows") < k).cast("int"))
      .withColumn("reid_risk", lit(1.0) / col("n_rows").cast("double"))

  /** Suppression to k-anonymity: rows whose quasi-identifier class has
    * fewer than `k` members get their quasi columns NULLed (cell
    * suppression — the coarsest generalization step); everything else
    * passes through. Output schema = input schema + `suppressed` flag.
    *
    * One count-over-window on the quasi tuple — no self-join, so the
    * pipeline stays a single shuffle and AQE's skew handling applies to a
    * hot class.
    */
  def suppressBelowK(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    val w = Window.partitionBy(quasiCols.map(col): _*)
    val withN = df.withColumn("__n", count(lit(1)).over(w))
    val suppressed = (col("__n") < k).cast("int")
    val outCols = df.columns.map { c =>
      if (quasiCols.contains(c))
        when(col("__n") < k, lit(null)).otherwise(col(c)).as(c)
      else col(c)
    }
    withN.select(outCols :+ suppressed.as("suppressed"): _*)
  }
}

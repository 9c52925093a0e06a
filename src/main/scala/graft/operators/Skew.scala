package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY §7 scale notes): salt the
  * skewed (fact) side into `saltFactor` sub-keys and replicate the
  * build side across all salts, so one hot key spreads over
  * `saltFactor` tasks instead of one straggler. Results are identical
  * to the unsalted join (the oracle-checked query proves it).
  *
  * AQE's skew-join handling covers sort-merge joins automatically;
  * explicit salting remains the tool for aggregations-after-join and
  * for engines/plans AQE cannot rewrite. */
object Skew {

  /** Inner equi-join `left.keyCol == right.keyCol` with the left side
    * salted by a deterministic hash of `leftSaltCols`. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftSaltCols: Seq[String],
      saltFactor: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(hash(leftSaltCols.map(col): _*), lit(saltFactor)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated,
      salted(keyCol) === replicated(keyCol) && salted("__salt") === replicated("__salt"))
      .drop(replicated(keyCol))
      .drop("__salt")
  }
}

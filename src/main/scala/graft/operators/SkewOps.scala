package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §4 / builder brief: "skewed keys → salting or
  * AQE skew-join").
  *
  * AQE's skew-join handling splits oversized sort-merge partitions at
  * runtime and is ON in GraftSession — that is the first line of defense.
  * Salting is for the cases AQE can't fix: a broadcast-ineligible join
  * where ONE key dominates (a city-center tile, an empty-string category),
  * so even a split partition re-concentrates on the same reducer.
  */
object SkewOps {

  /** Salted equi-join, result-identical to `large.join(small, key)` (inner):
    * the skewed side's rows scatter across `saltFactor` sub-keys (salt =
    * hash of the whole row, deterministic); the small side replicates
    * `saltFactor`×. The hot key's work then spreads over saltFactor
    * reducers at the cost of replicating the small side — the classic
    * trade, worth it only when `small` is modest but above the broadcast
    * threshold. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val largeSalted = large.withColumn("__salt",
      pmod(hash(large.columns.toIndexedSeq.map(col): _*), lit(saltFactor)))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    largeSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-occurrence / affinity mining — the market-basket view of any
  * (container, member) table: which members appear together more often
  * than chance. The same shape serves product affinity (orders ×
  * parts), tag co-occurrence, and corpus topic-term association.
  *
  * Integer-exact like every scored operator here: lift is emitted in
  * micro-units with the denominators cleared — no float division until
  * the caller wants one.
  */
object AffinityOps {

  /** Frequent co-occurring item PAIRS with support and lift — the
    * A-priori k=2 pass, which in practice is the market-basket report
    * (higher orders are built by joining this table against itself).
    *
    * Lift compares the pair's observed co-occurrence to the rate
    * independence predicts:  lift = N·n_ab / (n_a·n_b)  over basket
    * counts. Emitted as `lift_micro` = n_ab·N·10⁶ div (n_a·n_b) —
    * exact integer, >10⁶ means positively associated.
    *
    * Scale shape: (basket, item) is first made DISTINCT (multiplicity
    * within a basket is presence, not repeated evidence), then pairs
    * come from a self-equi-join ON THE BASKET KEY with `i < j` — the
    * fan-out is C(basket size, 2), bounded by the data model, never by
    * the item vocabulary; per-item supports are one aggregate, joined
    * back by broadcast twice (item domains are small by construction —
    * the caller picks the item granularity). `minSupport` prunes the
    * pair tail BEFORE the lift joins. Output:
    * (item_i, item_j, n_ab, lift_micro), i < j lexicographically. */
  def copurchasePairs(items: DataFrame, basketCol: String, itemCol: String,
                      minSupport: Long = 1L): DataFrame = {
    require(minSupport >= 1, s"bad minSupport=$minSupport")
    // Materialized ONCE: presence feeds FOUR consumers (basket count,
    // item supports, both self-join sides) — uncut, the distinct's
    // shuffle and the upstream scan re-run per consumer (the q178
    // triple-scan family; ReusedExchange only covers the join sides).
    // persist(MEMORY_AND_DISK), NOT localCheckpoint: this frame is
    // CORPUS-sized (one row per basket-item presence), and
    // localCheckpoint PINS its blocks (truncated lineage makes them
    // unevictable), so at 100× storage starved execution memory and
    // OOM'd the JVM — caught by the refreshed second-decade session the
    // moment q162 entered the mechanical set. A disk-backed persist
    // keeps the reuse (four consumers, one computation) while letting
    // the memory manager evict under pressure; lineage here is one
    // scan + one distinct, so the eviction re-read is cheap and the
    // re-planning cost localCheckpoint existed to cut does not apply
    // (that cost is the ITERATIVE-lineage class: PQ trainings, frontier
    // rounds).
    val present = items.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBaskets = present.select(countDistinct("basket").as("n_baskets"))
    val support = present.groupBy("item").agg(count(lit(1)).as("n_i"))
    val pairs = present.as("a")
      .join(present.as("b"), Seq("basket"))
      .filter(col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_i"), col("b.item").as("item_j"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    // NO broadcast hint on the support joins: support's cardinality is the
    // ITEM DOMAIN, which grows with the catalog — at 100× data the forced
    // broadcast OOM'd an 8 GiB driver (SCALECHECK 100× campaign) while
    // buying nothing at small scale (AQE broadcasts a small support on its
    // own). Only the 1-row basket count is hint-broadcast.
    pairs
      .join(support.select(col("item").as("item_i"), col("n_i").as("n_a")), Seq("item_i"))
      .join(support.select(col("item").as("item_j"), col("n_i").as("n_b")), Seq("item_j"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_i"), col("item_j"), col("n_ab"),
        expr("(n_ab * n_baskets * 1000000) div (n_a * n_b)").as("lift_micro"))
  }
}

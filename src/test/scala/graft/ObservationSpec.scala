package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** `df.observe` — Spark's zero-extra-job pipeline metrics: named
  * aggregates are accumulated DURING the action that materializes the
  * frame, so an ingest job reports its row/null/mass accounting without
  * re-scanning (at 100 TB, a separate `.count()` per metric IS a second
  * job over the input). The engine's pipelines count stages with
  * dedicated actions on cached frames (correct, but per-stage jobs);
  * this pins the in-band alternative the production deployment uses. */
class ObservationSpec extends SparkSpec {
  import spark.implicits._

  test("observe: metrics ride the materializing action and match direct aggregates") {
    val rows = (1L to 500L).map(i =>
      (i, if (i % 7 == 0) null else s"u$i", (i % 100) / 100.0 * 10))
    val df = rows.toDF("id", "name", "value")
    val obs = Observation("intake")
    val observed = df.observe(obs,
      count(lit(1)).as("rows"),
      sum(when(col("name").isNull, 1L).otherwise(0L)).as("null_names"),
      sum(round(col("value") * 100).cast("long")).as("mass_c"))
    val n = observed.filter(col("id") % 2 === 0).count() // any action works
    val m = obs.get
    assert(n == 250)
    assert(m("rows") == 500L)                      // metrics see the FULL scan,
    assert(m("null_names") == rows.count(_._2 == null).toLong) // not the filter
    assert(m("mass_c") == rows.map(r => math.round(r._3 * 100)).sum)
  }

  test("observe: metrics reset per action and survive plan reuse") {
    val df = (1L to 100L).toDF("id")
    val obs = Observation()
    val observed = df.observe(obs, count(lit(1)).as("n"))
    observed.collect()
    assert(obs.get("n") == 100L)
  }
}

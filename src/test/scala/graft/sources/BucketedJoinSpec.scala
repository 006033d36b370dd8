package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The co-located join story (builder brief: "co-locate joins via bucketing
  * or pre-partitioning"): both sides bucketed by the join key at write time
  * join WITHOUT a shuffle — the exchange that dominates a repeated
  * fact-to-fact join at 100 TB happens once, at ingest. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key plans no shuffle exchange") {
    val nodes = (0 until 2000).map(i => (i, s"n$i")).toDF("node_idx", "name")
    val reach = (0 until 2000).map(i => (i, (i % 13) * 10.0)).toDF("node_idx", "dist_m")
    spark.sql("DROP TABLE IF EXISTS b_nodes")
    spark.sql("DROP TABLE IF EXISTS b_reach")
    nodes.write.bucketBy(8, "node_idx").sortBy("node_idx").saveAsTable("b_nodes")
    reach.write.bucketBy(8, "node_idx").sortBy("node_idx").saveAsTable("b_reach")

    val joined = spark.table("b_nodes").join(spark.table("b_reach"), "node_idx")
    val plan = joined.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == 2000)

    // control: the same data UNbucketed shuffles both sides
    val plain = nodes.join(reach, "node_idx")
    assert(plain.queryExecution.executedPlan.toString().contains("Exchange hashpartitioning"))
  }
}

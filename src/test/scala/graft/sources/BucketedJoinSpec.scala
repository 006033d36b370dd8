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

  test("storage-partitioned join: two keyed DSv2 tables join with no shuffle") {
    val fmt = "graft.sources.v2.GraftCsv"
    import org.apache.spark.sql.types._
    val pa = java.nio.file.Files.createTempDirectory("spj-a").toString
    val pb = java.nio.file.Files.createTempDirectory("spj-b").toString
    val a = (0 until 4000).map(i => (i.toLong % 16, i.toLong)).toDF("k", "va")
    val b = (0 until 160).map(i => (i.toLong % 16, i.toLong * 7)).toDF("k", "vb")
    a.repartition(8, col("k")).write.format(fmt)
      .option("partition_col", "k").mode("overwrite").save(pa)
    b.repartition(8, col("k")).write.format(fmt)
      .option("partition_col", "k").mode("overwrite").save(pb)
    val sa = StructType(Seq(StructField("k", LongType), StructField("va", LongType)))
    val sb = StructType(Seq(StructField("k", LongType), StructField("vb", LongType)))
    def run(bucketing: Boolean): (String, Array[(Long, Long, Long)]) = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.sources.v2.bucketing.enabled", bucketing.toString)
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val ra = s2.read.schema(sa).format(fmt).load(pa)
      val rb = s2.read.schema(sb).format(fmt).load(pb)
      val j = ra.join(rb, "k").groupBy("k")
        .agg(count(lit(1)).as("n"), sum(col("va") + col("vb")).as("s"))
      val rows = j.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      (j.queryExecution.executedPlan.toString, rows)
    }
    val (spjPlan, spjRows) = run(bucketing = true)
    assert(!spjPlan.contains("Exchange hashpartitioning"),
      s"storage-partitioned join should not shuffle:\n$spjPlan")
    // control: same layout, bucketing conf off -> both sides shuffle
    val (plainPlan, plainRows) = run(bucketing = false)
    assert(plainPlan.contains("Exchange hashpartitioning"))
    // and the answers are identical either way
    assert(spjRows.toSeq == plainRows.toSeq && spjRows.length == 16)
    // every landed file is key-pure and recorded: 16 keys, 16+ files
    val keys = graft.sources.GraftCsvKeysProbe.read(pa)
    assert(keys.values.map(_._2).toSet == (0L until 16L).toSet)
  }
}

/** Test-only bridge into the package-private keys metadata. */
object GraftCsvKeysProbe {
  def read(path: String): Map[String, (String, Long)] =
    graft.sources.v2.GraftCsv.readKeys(path)
}

package graft.sources

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Storage-partitioned join under SKEW (the q344 contract meeting the
  * q336 problem): when one key holds most of the mass, plain key-grouped
  * planning merges all of that key's files into ONE task. With
  * partially-clustered distribution Spark keeps the big side's same-key
  * splits separate and REPLICATES the other side's matching group across
  * them — skew parallelism with still zero shuffle. */
class SpjSkewSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private val fmt = "graft.sources.v2.GraftCsv"

  test("partially-clustered SPJ keeps the dominant key's splits parallel, zero shuffle") {
    val pa = java.nio.file.Files.createTempDirectory("spjskew-a").toString
    val pb = java.nio.file.Files.createTempDirectory("spjskew-b").toString
    // left: 75% of rows on key 0, spread over 8 round-robin tasks so the
    // dominant key lands in 8 separate files; keys 1..15 one file each
    val a = (0 until 40000).map(i =>
      (if (i % 4 < 3) 0L else (i % 16).toLong, i.toLong)).toDF("k", "va")
    a.repartition(8).write.format(fmt)
      .option("partition_col", "k")
      .option("no_cluster", "true") // the 8-way spread of key 0 IS the fixture
      .mode("overwrite").save(pa)
    val b = (0 until 160).map(i => (i.toLong % 16, i.toLong * 7)).toDF("k", "vb")
    b.repartition(8, col("k")).write.format(fmt)
      .option("partition_col", "k").mode("overwrite").save(pb)
    val sa = StructType(Seq(StructField("k", LongType), StructField("va", LongType)))
    val sb = StructType(Seq(StructField("k", LongType), StructField("vb", LongType)))

    def run(partially: Boolean): (Int, Boolean, Boolean, Long, Long) = {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s2.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      s2.conf.set("spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled",
        partially.toString)
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val j = s2.read.schema(sa).format(fmt).load(pa)
        .join(s2.read.schema(sb).format(fmt).load(pb), "k")
      val agg = j.agg(count(lit(1)).as("n"), sum($"va" + $"vb").as("s")).collect().head
      val plan = j.queryExecution.executedPlan
      val shuffled = plan.toString.contains("Exchange hashpartitioning")
      // the replication flag lands on the replicated (small) side's scan
      val replicated = collectWithSubqueries(plan) { case b: BatchScanExec => b }
        .exists(_.spjParams.toString.contains("true,true"))
      (j.rdd.getNumPartitions, shuffled, replicated, agg.getLong(0), agg.getLong(1))
    }

    val (nOn, shuffledOn, replicatedOn, cntOn, sumOn) = run(partially = true)
    val (nOff, shuffledOff, _, cntOff, sumOff) = run(partially = false)
    assert(!shuffledOn && !shuffledOff, "SPJ must not shuffle either way")
    // without partial clustering: one task per key value (16, the skew
    // bottleneck); with it: the dominant key's 8 splits stay parallel
    assert(nOff == 16, s"plain SPJ should group to one task per key: $nOff")
    assert(nOn > 16, s"partially-clustered SPJ should keep same-key splits: $nOn")
    assert(replicatedOn, "small side should carry replicatePartitions")
    // identical answers (count = 10 rows/key on b side fan-out)
    assert(cntOn == cntOff && sumOn == sumOff, "skew handling changed the answer")
  }
}

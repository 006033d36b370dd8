package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction collapses the file count and preserves every row") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    val df = (0 until 5000).map(i => (i.toLong, s"row$i", i * 1.5))
      .toDF("id", "tag", "x")
    df.repartition(32).write.parquet(dir)
    val (before, after) = Compaction.compact(spark, dir, targetBytes = 64L << 20)
    assert(before == 32)
    assert(after < before && after >= 1)
    val back = spark.read.parquet(dir).as[(Long, String, Double)].collect().toSet
    assert(back == df.as[(Long, String, Double)].collect().toSet)
    // no leftover staging directory
    assert(!new java.io.File(dir + "__compacting").exists())
  }

  test("already-compact tables stay intact (n never drops below 1)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact1").toString + "/t"
    Seq((1L, "a")).toDF("id", "tag").coalesce(1).write.parquet(dir)
    val (_, after) = Compaction.compact(spark, dir, targetBytes = 1L)
    assert(after >= 1)
    assert(spark.read.parquet(dir).count() == 1)
  }
}

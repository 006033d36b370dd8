package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The §4 storage convention: big tables partitioned by grid_id so tile
  * predicates become partition pruning (the engine's substitute for the
  * reference's per-tile files). */
class PartitionLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("grid_id-partitioned parquet prunes partitions on tile predicates") {
    val dir = Files.createTempDirectory("graft-part").resolve("nodes").toString
    val nodes = (0 until 1200)
      .map(i => (i, s"r${i % 4}_c0", 18.0 + i * 1e-4, 54.0))
      .toDF("node_idx", "grid_id", "lon", "lat")
    nodes.write.partitionBy("grid_id").parquet(dir)

    val one = spark.read.parquet(dir).filter(col("grid_id") === "r2_c0")
    assert(one.count() == 300)
    // the tile predicate must reach the scan as a PartitionFilter (pruned
    // at planning — no data files of other tiles are opened)
    val plan = one.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("grid_id"))
    val scannedFiles = one.select(input_file_name()).distinct().as[String].collect()
    assert(scannedFiles.nonEmpty && scannedFiles.forall(_.contains("grid_id=r2_c0")))
  }

  test("multi-tile IN-predicate prunes to exactly those partitions") {
    val dir = Files.createTempDirectory("graft-part2").resolve("edges").toString
    (0 until 800).map(i => (i, i + 1, 1.0, s"t${i % 8}"))
      .toDF("u", "v", "w", "grid_id")
      .write.partitionBy("grid_id").parquet(dir)
    val two = spark.read.parquet(dir).filter(col("grid_id").isin("t3", "t5"))
    val files = two.select(input_file_name()).distinct().as[String].collect()
    assert(files.forall(f => f.contains("grid_id=t3") || f.contains("grid_id=t5")))
    assert(two.count() == 200)
  }
}

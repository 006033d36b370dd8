package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue: known Morton codes") {
    val got = Seq((5L, 3L), (0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")))
      .as[Long].collect().toSeq
    // interleave: x bits → even positions, y bits → odd
    assert(got == Seq(27L, 0L, 1L, 2L, 4294967295L))
  }

  test("clustered layout: tight per-file boxes and result-invariant box scans") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // 64×64 uniform grid, 4 rows per cell, scattered row order
    val rnd = new scala.util.Random(9)
    val grid = rnd.shuffle(
      (for { x <- 0 until 64; y <- 0 until 64; _ <- 0 until 4 } yield (x.toLong, y.toLong)).toList)
      .toDF("x", "y")

    ZOrder.writeClustered(grid, "x", "y", s"$dir/z", files = 16)
    grid.repartition(16).write.parquet(s"$dir/naive")

    def meanBoxArea(path: String): Double = {
      val boxes = ZOrder.fileBoxes(spark.read.parquet(path), "x", "y")
        .select((col("x_max") - col("x_min") + 1) * (col("y_max") - col("y_min") + 1))
        .as[Long].collect()
      boxes.sum.toDouble / boxes.length
    }
    // naive hash layout: every file spans ~the whole 64×64 space; the
    // Z-curve segments must be at least 4× tighter
    assert(meanBoxArea(s"$dir/z") < meanBoxArea(s"$dir/naive") / 4.0)

    val box = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("x").between(10, 20) && col("y").between(30, 35))
        .groupBy("x").agg(count(lit(1)).as("n"))
        .orderBy("x").as[(Long, Long)].collect().toSeq
    assert(box(spark.read.parquet(s"$dir/z")) == box(grid))
  }
}

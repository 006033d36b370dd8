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

  test("hilbertD: continuous traversal — every step is unit-adjacent (Morton jumps)") {
    // the first 256 d-values of the order-16 curve cover one 16×16 block
    // as a contiguous unit-step walk; the Z-curve jumps at every
    // power-of-2 boundary, which is exactly why Hilbert boxes are tighter
    val pts = (for (x <- 0 until 16; y <- 0 until 16)
      yield (ZOrder.hilbertD(x, y), x, y)).sortBy(_._1)
    assert(pts.map(_._1) == (0 until 256).map(_.toLong), "d not a 0..255 bijection")
    pts.zip(pts.tail).foreach { case ((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1, s"jump at ($x1,$y1)->($x2,$y2)")
    }
    // Morton fails continuity on the same block (e.g. 3 -> 4 jumps)
    val mpts = (for (x <- 0 until 16; y <- 0 until 16)
      yield ((0 until 4).map(i => (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))).sum, x, y))
      .sortBy(_._1)
    assert(mpts.zip(mpts.tail).exists { case ((_, x1, y1), (_, x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    })
  }

  test("hilbert layout beats morton at unaligned file splits; SQL surface registered") {
    // 64×64 grid, 10 equal chunks (NOT a power of 2 — splits can't land
    // on aligned quadrants): total bounding-box area must be tighter for
    // the continuous curve. Kernel-level check, no files needed.
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    def totalArea(key: ((Long, Long)) => Long): Long = {
      val rows = grid.sortBy(key)
      val n = rows.length
      (0 until 10).map { i =>
        val c = rows.slice(i * n / 10, (i + 1) * n / 10)
        (c.map(_._1).max - c.map(_._1).min + 1) * (c.map(_._2).max - c.map(_._2).min + 1)
      }.sum
    }
    def morton(x: Long, y: Long): Long =
      (0 until 6).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val h = totalArea { case (x, y) => ZOrder.hilbertD(x, y) }
    val m = totalArea { case (x, y) => morton(x, y) }
    assert(h < m, s"hilbert $h not tighter than morton $m")
    // the registered expression equals the kernel
    val got = Seq((3L, 5L), (0L, 0L), (65535L, 65535L)).toDF("x", "y")
      .selectExpr("graft_hilbert(x, y)").as[Long].collect()
    assert(got.toSeq == Seq(ZOrder.hilbertD(3, 5), ZOrder.hilbertD(0, 0),
      ZOrder.hilbertD(65535, 65535)))
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GeoFunctions._

class SnapJoinSpec extends SparkSpec {
  import spark.implicits._

  // seeded clouds around Gdansk
  private val rnd = new scala.util.Random(4242)
  private lazy val nodes = (0 until 300)
    .map(i => (i, 18.5 + rnd.nextDouble() * 0.05, 54.30 + rnd.nextDouble() * 0.05))
    .toDF("node_idx", "lon", "lat")
  private lazy val points = (0 until 150)
    .map(i => (i.toLong, 18.5 + rnd.nextDouble() * 0.06 - 0.005, 54.30 + rnd.nextDouble() * 0.06 - 0.005))
    .toDF("pid", "lon", "lat")

  test("bucketed snap equals brute-force argmin (incl. cutoff -1)") {
    val got = SnapJoin.nearestNode(points, nodes, "pid", maxSnapM = 300.0)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    // brute force in SQL over the same mercator metric
    val brute = points.alias("p").crossJoin(nodes.alias("n"))
      .withColumn("d", sqrt(
        (mercatorX(col("n.lon")) - mercatorX(col("p.lon"))) * (mercatorX(col("n.lon")) - mercatorX(col("p.lon"))) +
          (mercatorY(col("n.lat")) - mercatorY(col("p.lat"))) * (mercatorY(col("n.lat")) - mercatorY(col("p.lat")))))
      .filter(col("d") <= 300.0)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("pid").orderBy(col("d"), col("node_idx"))))
      .filter(col("rn") === 1)
      .select(col("pid"), col("node_idx"), col("d"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(got.size == 150)
    points.select("pid").as[Long].collect().foreach { pid =>
      brute.get(pid) match {
        case Some((nidx, d)) =>
          assert(got(pid)._1 == nidx, s"pid=$pid")
          assert(math.abs(got(pid)._2.get - d) < 1e-9)
        case None =>
          assert(got(pid) == ((-1, None)), s"pid=$pid expected unsnapped")
      }
    }
    // the cutoff branch must actually occur in this cloud
    assert(got.values.exists(_._1 == -1), "test cloud should contain unsnappable points")
  }

  test("snap is idempotent: a node's own coordinates snap to itself at dist 0") {
    val selfPoints = nodes.select(
      col("node_idx").cast("long").as("pid"), col("lon"), col("lat"))
    val got = SnapJoin.nearestNode(selfPoints, nodes, "pid")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.forall { case (pid, nidx, d) => nidx == pid.toInt && d == 0.0 })
  }

  test("quantize mode keeps ties deterministic and within a cm of raw") {
    val a = SnapJoin.nearestNode(points, nodes, "pid", 300.0, quantize = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = SnapJoin.nearestNode(points, nodes, "pid", 300.0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b) // 1 cm coordinate rounding cannot flip any argmin here
  }
}

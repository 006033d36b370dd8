package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions.{mercatorX, mercatorY}
import graft.operators.{Dijkstra, GraphOps, PoiExtract, QueryLayer, SnapJoin, TileEdge, TileSource}

/** Stage-level attribution harness for the graph-query trio that clusters
  * just under the 3× line at 10× (q23_snap 2.6×, q24_poi_extract 2.6×,
  * q38_point_query 2.8× — round-7 verdict item 7): times each query's
  * internal stages SEPARATELY on the base and scaled directories, so the
  * residual growth is pinned to a named stage instead of a narrative
  * guess. Also counts the snap join's CANDIDATE rows (Σ over 3×3 cell
  * neighborhoods of points×nodes) on both directories — the synthetic
  * node layout draws positions from a FIXED 97×89 coordinate lattice, so
  * scaled copies stack onto the same cells and candidate volume grows
  * ∝ points × density ≈ k², where real OSM growth adds AREA at constant
  * density (candidates ∝ k). The count states how much of the ratio is
  * that data-construction artifact rather than the operator.
  *
  * Usage: `sbt "runMain graft.StageBench [baseDir] [scaledDir]"` (defaults
  * /root/testdata/sf0.1 and /tmp/graft_scale — run ScaleBench first or set
  * SPARK_GRAFT_SKIP_MAT with an existing copy). Prints one JSON line.
  */
object StageBench {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scaled = args.lift(1).getOrElse("/tmp/graft_scale")
    val spark = GraftSession.get("graft-stagebench")
    import spark.implicits._
    spark.range(1).count()

    def reset(): Unit = { spark.catalog.clearCache(); System.gc() }
    // ScaleBench methodology: one untimed warm-up absorbs codegen/JIT for
    // the plan shape, then the timed run measures warm-plan cold-cache.
    def timed(mk: => DataFrame): Double = {
      noop(mk); reset()
      val t0 = System.nanoTime(); noop(mk); val t = (System.nanoTime() - t0) / 1e9
      reset(); t
    }

    // ---- q23 stages: pois derivation (part×nodes join) vs the bucketed
    // snap join itself (the full query minus the derivation).
    def q23Stages(dir: String): Seq[(String, Double)] = {
      val n = Derive.nodes(spark, dir)
      def p = Derive.pois(spark, dir).select("poi_id", "lon", "lat")
      Seq(
        "pois_derive" -> timed(p),
        "full" -> timed(SparkEntry.queries("q23_snap")(spark, dir)))
    }

    // Candidate volume of the 300 m bucket join (exact: Σ_cells
    // points-in-3×3-neighborhood × nodes-in-cell).
    def snapCandidates(dir: String): Long = {
      val cell = 300.0
      val n = Derive.nodes(spark, dir).select(
        floor(mercatorX(col("lon")) / cell).cast("long").as("cx"),
        floor(mercatorY(col("lat")) / cell).cast("long").as("cy"))
        .groupBy("cx", "cy").agg(count(lit(1)).as("nn"))
      val p = Derive.pois(spark, dir).select(
        floor(mercatorX(col("lon")) / cell).cast("long").as("px"),
        floor(mercatorY(col("lat")) / cell).cast("long").as("py"))
        .groupBy("px", "py").agg(count(lit(1)).as("np"))
        .withColumn("dx", explode(array((-1 to 1).map(lit): _*)))
        .withColumn("dy", explode(array((-1 to 1).map(lit): _*)))
        .select((col("px") + col("dx")).as("cx"), (col("py") + col("dy")).as("cy"), col("np"))
      p.join(n, Seq("cx", "cy"))
        .agg(sum(col("np") * col("nn"))).head.getLong(0)
    }

    // ---- q24 stages: elements derivation, tag pre-filter, full extract.
    def q24Stages(dir: String): Seq[(String, Double)] = Seq(
      "elements_derive" -> timed(Derive.elements(spark, dir)),
      "prefilter" -> timed(PoiExtract.tagPreFilter(Derive.elements(spark, dir))),
      "full" -> timed(SparkEntry.queries("q24_poi_extract")(spark, dir)))

    // ---- q38 stages: symmetrized edges, the Dijkstra reach kernel, the
    // point snap, and the full query (reach + snap + radius join).
    def q38Stages(dir: String): Seq[(String, Double)] = {
      def n = Derive.nodes(spark, dir)
      def sym = GraphOps.symmetrizeDedup(Derive.edges(n))
        .select(lit("t0").as("tile"), col("u"), col("v"), col("w")).as[TileEdge]
      def srcs = Derive.pois(spark, dir)
        .select(lit("t0").as("tile"), col("category"), col("node_idx"), col("poi_id"))
        .as[TileSource]
      def reach = Dijkstra.reach(sym, srcs, limitM = 1000.0).toDF()
      def qp = n.filter(col("node_idx") % 300 === 7)
        .select(col("node_idx").cast("long").as("query_id"),
          (col("lon") + 1.1e-4).as("lon"), (col("lat") - 0.9e-4).as("lat"))
      Seq(
        "sym_edges" -> timed(sym.toDF()),
        "reach" -> timed(reach),
        "snap_points" -> timed(QueryLayer.snapPoints(qp, n, maxSnapM = 300.0)),
        "full" -> timed(SparkEntry.queries("q38_point_query")(spark, dir)))
    }

    def fmt(d: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    def render(stages: String => Seq[(String, Double)]): String = {
      val b = stages(base)
      val s = stages(scaled)
      b.zip(s).map { case ((k, tb), (_, ts)) =>
        s""""$k":{"base":${fmt(tb)},"scaled":${fmt(ts)},"ratio":${fmt(if (tb > 0) ts / tb else -1)}}"""
      }.mkString("{", ",", "}")
    }

    val candB = snapCandidates(base)
    val candS = snapCandidates(scaled)
    val line =
      s"""{"metric":"stages","base":"$base","scaled":"$scaled",""" +
        s""""q23":${render(q23Stages)},"q24":${render(q24Stages)},""" +
        s""""q38":${render(q38Stages)},""" +
        s""""snap_candidates":{"base":$candB,"scaled":$candS,"ratio":${fmt(candS.toDouble / candB)}}}"""
    println(line)
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Conventions for oracle (DuckDB) hash-parity:
  *  - every query ends in a total ORDER BY (all columns tie-broken);
  *  - money sums go through round(x*100)/100 so the sum is over exactly
  *    representable integer cents (order-independent, engine-independent);
  *  - graph edge weights are integer-valued doubles (Derive.scala), so path
  *    sums in the Dijkstra kernel are exact;
  *  - every computed column is aliased identically in Spark and SQL.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A-ops / pushdown: TPC-H Q1-shaped pricing summary (SURVEY A1-analog).
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          (sum(round(col("l_extendedprice") * 100)) / 100).as("sum_base_price"),
          (sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)) / 100).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // P-ops: projection + predicate pushdown to the parquet scan.
    "q02_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_discount") > 0.05 && col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // J1-analog: broadcast dimension joins + aggregation.
    "q03_revenue_by_nation" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg((sum(round(col("o_totalprice") * 100)) / 100).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("n_name")
    }),

    // J6-analog: left-semi join (EXISTS).
    "q04_semi_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // S5-analog (empty-tile deletion): left-anti join (NOT EXISTS).
    "q05_anti_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // W5-analog: grouped top-k via row_number window.
    "q06_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // W3/A8-analog: running sum (cumulative distance along a path).
    "q07_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("running_value", sum(round(col("value") * 100)).over(w) / 100)
        .select("user_id", "event_id", "running_value")
        .orderBy("user_id", "event_id")
    }),

    // U3-analog: union + distinct.
    "q08_union_distinct" -> ((s, dir) => {
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy("nationkey")
    }),

    // W1/G5-analog: the derived node table itself (row_number indexing + grid math).
    "q20_nodes" -> ((s, dir) => {
      Derive.nodes(s, dir).orderBy("node_idx")
    }),

    // U1+P4+A1: symmetrize + self-loop drop + parallel-edge min-dedup.
    // Parallel edges injected as a +10 m duplicate of every edge.
    "q21_sym_dedup" -> ((s, dir) => {
      val e = Derive.edges(Derive.nodes(s, dir))
      GraphOps.symmetrizeDedup(e.union(e.withColumn("w", col("w") + 10)))
        .orderBy("u", "v")
    }),

    // A2: out-degrees of the symmetrized graph.
    "q22_degrees" -> ((s, dir) => {
      val e = Derive.edges(Derive.nodes(s, dir))
      GraphOps.outDegrees(GraphOps.symmetrizeDedup(e))
        .orderBy("node_idx")
    }),

    // G1+J5: bounded multi-source Dijkstra reach, one tile, one category.
    // Ties resolve to min poi_id (deterministic lexicographic kernel).
    "q26_dijkstra_reach" -> ((s, dir) => {
      import s.implicits._
      val n = Derive.nodes(s, dir)
      val sym = GraphOps.symmetrizeDedup(Derive.edges(n))
        .select(lit("t0").as("tile"), col("u"), col("v"), col("w")).as[TileEdge]
      val srcs = Derive.pois(s, dir)
        .filter(col("category") === "supermarket")
        .select(lit("t0").as("tile"), col("category"), col("node_idx"), col("poi_id"))
        .as[TileSource]
      Dijkstra.reach(sym, srcs, limitM = 1000.0)
        .select(col("node_idx"), col("dist_m"), col("time_s"), col("poi_id"))
        .orderBy("node_idx")
    })
  )

  // -------------------------------------------------------------- oracle SQL

  private val P = Derive.Sql.prelude

  def oracleSql: Map[String, String] = Map(

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       sum(round(l_extendedprice*100))/100 AS sum_base_price,
        |       sum(round(l_extendedprice*(1-l_discount)*100))/100 AS sum_disc_price,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem WHERE l_discount > 0.05 AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_revenue_by_nation" ->
      """SELECT n_name, sum(round(o_totalprice*100))/100 AS revenue, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q04_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_mktsegment = 'BUILDING'
        |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q05_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q06_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q07_running_sum" ->
      """SELECT user_id, event_id,
        |       sum(round(value*100)) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)/100 AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q08_union_distinct" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin,

    "q20_nodes" ->
      s"""WITH ${Derive.Sql.nodes}
         |SELECT * FROM nodes ORDER BY node_idx""".stripMargin,

    "q21_sym_dedup" ->
      s"""WITH ${Derive.Sql.nodes},
         |${Derive.Sql.edges},
         |dup AS (SELECT u, v, w FROM edges UNION ALL SELECT u, v, w + 10 AS w FROM edges),
         |sym AS (SELECT u, v, w FROM dup UNION ALL SELECT v AS u, u AS v, w FROM dup)
         |SELECT u, v, min(w) AS w FROM sym WHERE u <> v GROUP BY u, v ORDER BY u, v""".stripMargin,

    "q22_degrees" ->
      s"""WITH ${Derive.Sql.nodes},
         |${Derive.Sql.edges},
         |${Derive.Sql.symEdges}
         |SELECT u AS node_idx, count(*) AS degree FROM sym GROUP BY u ORDER BY node_idx""".stripMargin,

    "q26_dijkstra_reach" ->
      s"""WITH RECURSIVE $P,
         |walk(node, poi, dist) AS (
         |  SELECT node_idx, min(poi_id), CAST(0 AS DOUBLE)
         |  FROM pois WHERE category = 'supermarket' GROUP BY node_idx
         |  UNION
         |  SELECT s.v, w.poi, w.dist + s.w
         |  FROM walk w JOIN sym s ON s.u = w.node
         |  WHERE w.dist + s.w <= 1000),
         |best AS (SELECT node, min(dist) AS dist_m FROM walk GROUP BY node)
         |SELECT b.node AS node_idx, b.dist_m, b.dist_m / 1.111 AS time_s,
         |       min(w.poi) AS poi_id
         |FROM best b JOIN walk w ON w.node = b.node AND w.dist = b.dist_m
         |GROUP BY b.node, b.dist_m
         |ORDER BY node_idx""".stripMargin
  )
}

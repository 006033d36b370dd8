package graft

import org.apache.spark.sql.functions._

/** q355's WITH RECURSIVE surface: the same statement text both engines
  * run, validated here against a plain-Scala BFS replay of the
  * functional graph — so the gate's cross-engine agreement sits on an
  * independently-proven fixed point, and the recursion depth/termination
  * semantics (6-hop bound, min-hop fold) are pinned in-JVM. */
class SqlRecursionSpec extends SparkSpec {
  import spark.implicits._

  test("WITH RECURSIVE BFS equals a Scala frontier replay on the 25-node graph") {
    (0 until 25).map(_.toLong).toDF("n_nationkey")
      .createOrReplaceTempView("nation")
    val got = spark.sql(SparkEntry.SharedSql.recursiveBfs)
      .as[(Long, Long)].collect().toSeq

    // independent replay: min-hop BFS from 0 over u -> (7u+3)%25, (11u+5)%25
    def step(u: Long): Seq[Long] = Seq((u * 7 + 3) % 25, (u * 11 + 5) % 25)
    var dist = Map(0L -> 0L)
    var frontier = Set(0L)
    for (d <- 1L to 6L) {
      val next = frontier.flatMap(step).filterNot(dist.contains)
      dist ++= next.map(_ -> d)
      frontier = next
    }
    val expect = dist.toSeq.sortBy(_._1)
    assert(got == expect, s"got $got\nexpect $expect")
    // the recursion genuinely multi-hop: some node is only reached at d >= 2
    assert(expect.exists(_._2 >= 2), "fixture too shallow to prove recursion")
  }
}

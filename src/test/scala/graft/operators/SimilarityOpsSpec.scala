package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilarityOpsSpec extends SparkSpec {
  import spark.implicits._

  private def randomVecs(seed: Int, n: Int, dim: Int = 16): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)((rnd.nextGaussian() / 4).toFloat)))
  }

  private lazy val vecs = randomVecs(1, 60).toDF("vec_id", "embedding")

  test("cosQ: self-similarity is 1.0 to an ulp; bounded by [-1, 1]") {
    // n/(sqrt(n)*sqrt(n)) is 1 ± 1 ulp (sqrt(n)² ≠ n exactly); what matters
    // is that the SAME double comes out of every engine, not that it's 1.0
    val self = vecs.select(SimilarityOps.cosQ(
      SimilarityOps.quantize(col("embedding")),
      SimilarityOps.quantize(col("embedding")))).as[Double].collect()
    assert(self.forall(x => math.abs(x - 1.0) <= 1e-15))
    val cross = vecs.alias("a").crossJoin(vecs.alias("b"))
      .select(SimilarityOps.cosQ(
        SimilarityOps.quantize(col("a.embedding")),
        SimilarityOps.quantize(col("b.embedding")))).as[Double].collect()
    assert(cross.forall(c => c >= -1.0000001 && c <= 1.0000001))
  }

  test("bruteTopK matches a local reference computation") {
    val data = randomVecs(2, 40)
    val df = data.toDF("vec_id", "embedding")
    val got = SimilarityOps.bruteTopK(df, df.filter(col("vec_id") < 2), k = 3)
      .select("qid", "rank", "vec_id").as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._2).map(_._3).toSeq }
    def qz(v: Seq[Float]): Seq[Long] = v.map(x => math.round(x.toDouble * 1e7))
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) * math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    for (q <- 0L to 1L) {
      val qv = qz(data(q.toInt)._2)
      val expect = data.filter(_._1 != q)
        .map { case (id, v) => (id, cos(qv, qz(v))) }
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1)
      assert(got(q) == expect, s"query $q")
    }
  }

  test("ivfTopK: every result comes from a probed cluster; ranks are 1..k") {
    val df = randomVecs(3, 50).toDF("vec_id", "embedding")
    val centroids = df.filter(col("vec_id") % 10 === 0) // 5 centroids
    val got = SimilarityOps.ivfTopK(df, centroids, df.filter(col("vec_id") < 3), k = 3)
      .collect()
    assert(got.nonEmpty)
    got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
    }
  }

  test("lshNearDup finds exact copies and nothing below threshold") {
    val base = randomVecs(4, 50)
    val corpus = (base ++ base.take(5).map { case (id, v) => (id + 1000, v) })
      .toDF("vec_id", "embedding")
    val planes = base.slice(20, 28).map { case (id, v) => (id, v) }.toDF("vec_id", "embedding")
    val got = SimilarityOps.lshNearDup(corpus, planes, threshold = 0.99)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert((0 until 5).forall(i => got.contains((i.toLong, i + 1000L))))
    // random gaussian pairs essentially never reach cos 0.99
    assert(got.size == 5)
  }
}

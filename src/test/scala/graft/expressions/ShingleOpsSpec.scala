package graft.expressions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Equivalence pins for the round-14 native shingle/minhash/LSH kernels:
  * each `graft_*` expression must be BIT-IDENTICAL to the higher-order
  * column composition it replaced (TextOps' pre-round-14 forms, re-built
  * here verbatim as the reference), across planted edge cases and a
  * seeded random corpus. The 363-query oracle gate re-proves the same
  * thing end-to-end against DuckDB; this spec keeps the contract pinned
  * at the operator level with the edge cases spelled out. */
class ShingleOpsSpec extends SparkSpec {
  import spark.implicits._

  private val P = ShingleOps.P

  // ---- the ORIGINAL column compositions (reference semantics) ----
  private def refShingles(w: Column, n: Int): Column =
    array_distinct(
      when(size(w) >= n,
        transform(sequence(lit(0), size(w) - n),
          i => concat_ws(" ", slice(w, i + lit(1), lit(n)))))
        .otherwise(array().cast("array<string>")))

  private def refShingleHashes(sh: Column): Column =
    transform(sh, s => conv(substring(md5(s), 1, 8), 16, 10).cast("long") % P)

  private def refMinhashSig(hs: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(hs,
        h => (h * ShingleOps.hashA(i) + ShingleOps.hashB(i)) % P))
    }: _*)

  private def refLshBands(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      val parts = (0 until rows).map(r => element_at(sig, b * rows + r + 1))
      struct(lit(b).as("band"), md5(concat_ws(",", parts: _*)).as("bkey"))
    }: _*)

  private def refGramHashes(w: Column, n: Int): Column =
    transform(sequence(lit(0), size(w) - n),
      i => md5(concat_ws(" ", slice(w, i + lit(1), lit(n)))))

  // planted edges: empty text, single word, exactly n words, duplicate
  // n-grams, runs of spaces (empty tokens), unicode, long repetitive doc
  private val planted = Seq(
    "",
    "one",
    "one two three",
    "a b c a b c a b c",
    "x  y   z q",
    "naïve café déjà vu naïve café déjà vu naïve",
    ("tok " * 50).trim,
    "solo pair trio quad quint",
    "a a a a a a a a a a"
  )

  private def corpus(): DataFrame = {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "yy", "zzz", "état", "0", "")
    val random = (1 to 60).map(_ =>
      (1 to (1 + rnd.nextInt(30))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    (planted ++ random).zipWithIndex.map(_.swap).toDF("id", "text")
      .select(col("id"), split(col("text"), " ").as("w"))
  }

  private def assertSame(df: DataFrame, nat: Column, ref: Column, what: String): Unit = {
    val bad = df.select(col("id"), nat.as("nat"), ref.as("ref"))
      .filter(not(col("nat") <=> col("ref")))
    val rows = bad.collect()
    assert(rows.isEmpty, s"$what diverges: ${rows.take(3).mkString("; ")}")
  }

  test("graft_shingles == array_distinct(transform(...)) incl. guard branch") {
    for (n <- Seq(2, 3, 8)) {
      assertSame(corpus(),
        call_function("graft_shingles", col("w"), lit(n)),
        refShingles(col("w"), n), s"shingles n=$n")
    }
  }

  test("graft_shingles on NULL words takes the otherwise branch (empty array)") {
    val df = Seq((1, null: String), (2, "a b c d")).toDF("id", "text")
      .select(col("id"), split(col("text"), " ").as("w"))
    assertSame(df,
      call_function("graft_shingles", col("w"), lit(3)),
      refShingles(col("w"), 3), "shingles null input")
  }

  test("graft_shingle_hashes == conv(substring(md5,1,8),16,10) % P") {
    val sh = corpus().select(col("id"),
      call_function("graft_shingles", col("w"), lit(3)).as("sh"))
    assertSame(sh,
      call_function("graft_shingle_hashes", col("sh")),
      refShingleHashes(col("sh")), "shingleHashes")
  }

  test("graft_shingle_hashes keeps null elements null") {
    val df = Seq(1).toDF("id")
      .select(col("id"), array(lit("a"), lit(null.asInstanceOf[String]), lit("b")).as("sh"))
    assertSame(df,
      call_function("graft_shingle_hashes", col("sh")),
      refShingleHashes(col("sh")), "shingleHashes null element")
  }

  test("graft_minhash_sig == array(array_min(transform(...))) for k=12 and k=32") {
    val hs = corpus().select(col("id"),
      refShingleHashes(call_function("graft_shingles", col("w"), lit(3))).as("hs"))
    for (k <- Seq(12, 32)) {
      assertSame(hs,
        call_function("graft_minhash_sig", col("hs"), lit(k)),
        refMinhashSig(col("hs"), k), s"minhashSig k=$k")
    }
  }

  test("graft_minhash_sig: empty and all-null hash arrays give k nulls") {
    val df = Seq(1).toDF("id").select(col("id"),
      array().cast("array<long>").as("empty"),
      array(lit(null).cast("long")).as("allnull"))
    assertSame(df, call_function("graft_minhash_sig", col("empty"), lit(4)),
      refMinhashSig(col("empty"), 4), "minhashSig empty")
    assertSame(df, call_function("graft_minhash_sig", col("allnull"), lit(4)),
      refMinhashSig(col("allnull"), 4), "minhashSig all-null")
  }

  test("graft_lsh_bands == struct-array fold (6 bands x 2 rows)") {
    val sig = corpus().select(col("id"),
      refMinhashSig(refShingleHashes(
        call_function("graft_shingles", col("w"), lit(3))), 12).as("sig"))
    assertSame(sig,
      call_function("graft_lsh_bands", col("sig"), lit(6), lit(2)),
      refLshBands(col("sig"), 6, 2), "lshBands")
  }

  test("graft_lsh_bands skips null signature values like concat_ws") {
    val df = Seq(1).toDF("id").select(col("id"),
      array(lit(5L), lit(null).cast("long"), lit(7L), lit(9L)).as("sig"))
    assertSame(df,
      call_function("graft_lsh_bands", col("sig"), lit(2), lit(2)),
      refLshBands(col("sig"), 2, 2), "lshBands null element")
  }

  test("graft_gram_hashes == positional transform md5 (n=8, size>=n rows)") {
    val df = corpus().filter(size(col("w")) >= 8)
    assertSame(df,
      call_function("graft_gram_hashes", col("w"), lit(8)),
      refGramHashes(col("w"), 8), "gramHashes")
  }

  test("kernels run identically under codegen and interpreted eval") {
    // force both paths: the default runs whole-stage codegen; the
    // CODEGEN_ONLY/NO_CODEGEN factory modes pin the projection factories
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        assertSame(corpus(),
          call_function("graft_shingles", col("w"), lit(3)),
          refShingles(col("w"), 3), s"shingles factoryMode=$mode")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}

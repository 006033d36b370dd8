package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merges: hand-computed rounds on a tiny corpus") {
    // vocab: ab×3, abc×2. Round 1 pairs: (a,b)=5, (b,c)=2 → merge (a,b).
    // Round 2: ab is one symbol; pairs: (ab,c)=2 → merge (ab,c).
    val docs = Seq((1L, "ab ab abc"), (2L, "ab abc")).toDF("doc_id", "text")
    val got = Bpe.merges(docs, rounds = 2)
      .orderBy("round").as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", 5L), (2, "ab", "c", 2L)))
  }

  test("merges: greedy left-to-right on overlapping runs (a a a -> aa a)") {
    // "aaaa": round-1 pair (a,a) has count 3 (overlaps counted, as in BPE);
    // the merge pass fuses non-overlapping left-to-right: a a a a → aa aa.
    // Round 2 must therefore see (aa,aa)=1, NOT (a,a) remnants.
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = Bpe.merges(docs, rounds = 2)
      .orderBy("round").as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("merges: ties break on (left, right) ascending") {
    // (a,b) and (b,a) both occur twice in "abab"+"baba"? Compute: "abab"
    // pairs a-b, b-a, a-b; "bab" pairs b-a, a-b. (a,b)=3, (b,a)=2 — use a
    // symmetric corpus instead: "ab"×2 and "ba"×2 → (a,b)=2, (b,a)=2;
    // the winner must be (a,b) by lexicographic tie-break.
    val docs = Seq((1L, "ab ab ba ba")).toDF("doc_id", "text")
    val got = Bpe.merges(docs, rounds = 1)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", 2L)))
  }

  test("mergesDeep == merges row-for-row on fixed fixtures, at full depth") {
    def table(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("round").as[(Int, String, String, Long)].collect().toSeq
    val fixtures = Seq(
      Seq((1L, "ab ab abc"), (2L, "ab abc")),
      Seq((1L, "aaaa")),                       // overlap-count + greedy merge
      Seq((1L, "ab ab ba ba")),                // lexicographic tie
      Seq((1L, "the cat sat on the mat"), (2L, "the cat ate the rat")))
    fixtures.foreach { rows =>
      val docs = rows.toDF("doc_id", "text")
      // rounds=50 over-asks on every fixture: both paths must exhaust at
      // the same depth with identical (round, left, right, weight) rows
      assert(table(Bpe.mergesDeep(docs, 50)) == table(Bpe.merges(docs, 50)))
    }
  }

  test("mergesDeep/encodeDeep treat supplementary-plane chars as one symbol") {
    // "😀" is U+1F600 (two UTF-16 code units): substr/length split by
    // CODE POINT, so the kernels must too — a surrogate-pair split would
    // learn a different table and fail the replay equivalence
    val docs = Seq((1L, "a😀b a😀b 😀😀 a😀b"), (2L, "😀😀 b😀")).toDF("doc_id", "text")
    def table(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("round").as[(Int, String, String, Long)].collect().toSeq
    val deep = table(Bpe.mergesDeep(docs, 20))
    assert(deep == table(Bpe.merges(docs, 20)) && deep.nonEmpty)
    val mergeTable = deep.map(r => (r._2, r._3))
    val words = docs.select(explode(split(col("text"), " ")).as("word")).distinct()
    val replay = Bpe.encode(words, mergeTable)
      .as[(String, Seq[String])].collect().toMap
    val viaKernel = Bpe.encodeDeep(words, mergeTable)
      .as[(String, Seq[String])].collect().toMap
    assert(viaKernel == replay)
    assert(viaKernel.forall { case (w, ts) => ts.mkString == w })
  }

  test("mergesDeep == merges on a randomized corpus (cross-checks the heap/index)") {
    val rnd = new scala.util.Random(41)
    val words = Vector("aa", "ab", "ba", "abc", "cab", "aab", "bba", "ccc",
      "abab", "baba", "aabb", "x", "y", "xy", "yx")
    val docs = (0 until 40).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(8))(words(rnd.nextInt(words.length)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    def table(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("round").as[(Int, String, String, Long)].collect().toSeq
    val deep = table(Bpe.mergesDeep(docs, 30))
    val iter = table(Bpe.merges(docs, 30))
    assert(deep == iter && deep.nonEmpty)
  }

  test("mergesDeep runs production depth in one kernel pass") {
    // a corpus whose vocabulary admits hundreds of merges: the kernel must
    // learn them all in ONE job (no per-round Spark round-trips) and stop
    // exactly when no adjacent pair remains
    val rnd = new scala.util.Random(7)
    val docs = (0 until 200).map { i =>
      (i.toLong, (0 until 6).map(_ =>
        (0 until (3 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(6)).toChar)
          .mkString).mkString(" "))
    }.toDF("doc_id", "text")
    val got = Bpe.mergesDeep(docs, 2000)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    // the depth cap is honored exactly (this corpus admits >2000 merges)
    assert(got.length == 2000, s"expected 2000 rounds, got ${got.length}")
    // rounds are dense 1..n and weights are positive
    assert(got.map(_._1).toSeq == (1 to got.length))
    assert(got.forall(_._4 > 0))
    // exhaustion is real: two over-asks land on the same full schedule
    val full = Bpe.mergesDeep(docs, 5000)
      .as[(Int, String, String, Long)].collect()
    val again = Bpe.mergesDeep(docs, 9000)
      .as[(Int, String, String, Long)].collect()
    assert(full.length > 2000 && again.length == full.length)
    // and the capped run is the exact prefix of the full schedule
    assert(full.sortBy(_._1).take(2000).toSeq == got.toSeq)
  }

  test("encodeDeep == encode on a trained table (priority loop == replay)") {
    val rnd = new scala.util.Random(13)
    val docs = (0 until 60).map { i =>
      (i.toLong, (0 until 4).map(_ =>
        (0 until (2 + rnd.nextInt(7))).map(_ => ('a' + rnd.nextInt(4)).toChar)
          .mkString).mkString(" "))
    }.toDF("doc_id", "text")
    val table = Bpe.mergesDeep(docs, 500)
      .orderBy("round").as[(Int, String, String, Long)].collect()
      .map(r => (r._2, r._3)).toSeq
    assert(table.length > 20)
    val words = docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0).distinct()
    val replay = Bpe.encode(words, table)
      .as[(String, Seq[String])].collect().toMap
    val deep = Bpe.encodeDeep(words, table)
      .as[(String, Seq[String])].collect().toMap
    assert(deep == replay)
    // and the segmentation is lossless
    assert(deep.forall { case (w, ts) => ts.mkString == w })
  }

  test("encode replays the merge table in order") {
    val words = Seq("ab", "abc", "cab", "x").toDF("word")
    val got = Bpe.encode(words, Seq(("a", "b"), ("ab", "c")))
      .as[(String, Seq[String])].collect().toMap
    assert(got("ab") == Seq("ab"))
    assert(got("abc") == Seq("abc"))
    assert(got("cab") == Seq("c", "ab"))
    assert(got("x") == Seq("x"))
  }

  test("wordpieceEncode: greedy longest match, total, lossless") {
    // distinct words {ababc, abc}: every substring of length 2-4 lands in
    // the top-20, so greedy takes 'abab' first in 'ababc' then the 'c'
    val docs = Seq((1L, "ababc abc")).toDF("doc_id", "text")
    val got = Bpe.wordpieceEncode(docs)
      .as[(String, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("ababc") == (("ababc", "abab|c", 2L)))
    assert(got("abc") == (("abc", "abc", 1L)))
    // lossless on a wider corpus: concatenating the pieces restores the
    // word, and the encoder is total (chars are always in the vocab)
    val wide = Seq((1L, "table value spark fast merge window"),
      (2L, "agg row scan slow customer query")).toDF("doc_id", "text")
    val all = Bpe.wordpieceEncode(wide).as[(String, String, Long)].collect()
    assert(all.length == 12)
    assert(all.forall { case (w, p, n) =>
      p.split("\\|").mkString == w && p.split("\\|").length.toLong == n })
  }

  test("wordpieceEncode: vocab strings with quotes/backslashes are escaped") {
    // "don't" puts ' into the character vocab and "n't"/"on'" style
    // substrings into the piece candidates — unescaped SQL literals would
    // fail the expr() parse before any row is processed
    val docs = Seq((1L, "don't can't it\\s don't")).toDF("doc_id", "text")
    val all = Bpe.wordpieceEncode(docs).as[(String, String, Long)].collect()
    assert(all.length == 3)
    assert(all.forall { case (w, p, n) =>
      p.split("\\|").mkString == w && p.split("\\|").length.toLong == n })
  }
}

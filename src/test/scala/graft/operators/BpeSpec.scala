package graft.operators

import graft.SparkSpec

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
}

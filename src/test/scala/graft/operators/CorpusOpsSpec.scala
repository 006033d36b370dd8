package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats: exact dup-2gram ratio and top-token share") {
    val d = Seq(
      (1L, "a b a b a"), // 2grams: [a b, b a, a b, b a] -> 2 dups of 4
      (2L, "all words here differ now"), // no repeats
      (3L, "x")) // too short for 2-grams
      .toDF("doc_id", "text")
    val r = CorpusOps.repetitionStats(d).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getInt(2) == 4 && r(1L).getInt(3) == 2)
    assert(r(1L).getDouble(4) == 0.5) // dup_2gram_ratio
    assert(r(1L).getDouble(5) == 3.0 / 5) // 'a' appears 3 of 5
    assert(r(2L).getInt(3) == 0 && r(2L).getDouble(4) == 0.0)
    assert(r(2L).getDouble(5) == 1.0 / 5)
    assert(r(3L).getInt(2) == 0 && r(3L).getDouble(4) == 0.0)
    assert(r(3L).getDouble(5) == 1.0) // single token is 1/1
  }

  test("dedupLines: first occurrence survives, docs reassembled in order") {
    // lineWords=2 -> lines are word pairs. Doc 1 repeats "a b" internally
    // (pos 0 keeps, pos 2 drops); doc 2 repeats doc 1's "a b" and "c d"
    // (both drop, smaller doc_id won) but keeps its own tail; doc 3 is
    // entirely doc 1's first line (drops to empty); doc 4 is untouched.
    val d = Seq(
      (1L, "a b c d a b"),
      (2L, "a b c d x y"),
      (3L, "a b"),
      (4L, "p q r")) // odd tail: line "r" (shorter than lineWords)
      .toDF("doc_id", "text")
    val r = CorpusOps.dedupLines(d, lineWords = 2).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getString(3))).toMap
    assert(r(1L) == ((3L, 2L, "a b c d"))) // internal repeat dropped
    assert(r(2L) == ((3L, 1L, "x y"))) // cross-doc lines lost to doc 1
    assert(r(3L) == ((1L, 0L, ""))) // fully deduplicated, row kept
    assert(r(4L) == ((2L, 2L, "p q r"))) // unique lines untouched
  }

  test("prioritySample: weight-proportional, deterministic, exact top-k") {
    val docs = (0L until 300L).map(i => (i, 1L + i % 7)).toDF("doc_id", "n_chars")
    val a = CorpusOps.prioritySample(docs, k = 20).as[(Long, Long, Long)].collect()
    val b = CorpusOps.prioritySample(docs, k = 20).as[(Long, Long, Long)].collect()
    assert(a.toSeq == b.toSeq) // deterministic draw, stable order
    assert(a.length == 20)
    // priorities strictly follow the published formula
    a.foreach { case (id, w, p) =>
      assert(w == 1L + id % 7)
      assert(p >= w) // u ≤ 1 → priority ≥ weight
    }
    // weight-proportional in aggregate: the mean weight of the sample
    // must exceed the population mean (heavier rows are likelier)
    val popMean = docs.agg(avg("n_chars")).as[Double].head()
    assert(a.map(_._2).sum.toDouble / a.length > popMean)
    // zero-weight rows can never be drawn (priority 0)
    val withZero = docs.withColumn("n_chars",
      when(col("doc_id") < 290, lit(0L)).otherwise(col("n_chars")))
    val z = CorpusOps.prioritySample(withZero, k = 10).as[(Long, Long, Long)].collect()
    assert(z.forall(_._1 >= 290))
  }

  test("mixtureRates: capped source reports deficit, uncapped gets exact ppm") {
    val docs = Seq(
      (0L, "big", 6000L), (1L, "big", 6000L),   // w = 12000
      (2L, "small", 1000L))                     // w = 1000
      .toDF("doc_id", "source", "n_chars")
    val shares = Seq(("big", 500000L), ("small", 500000L)).toDF("source", "share_ppm")
    // T = 8000: want = 4000 each. big: rate 4000/12000 → 333333 ppm,
    // planned 3999; small: want 4000 > 1000 → rate 1e6, deficit 3000
    val got = CorpusOps.mixtureRates(docs, shares, totalChars = 8000L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("big") == (("big", 12000L, 4000L, 333333L, 3999L, 0L)))
    assert(got("small") == (("small", 1000L, 4000L, 1000000L, 1000L, 3000L)))
  }

  test("datasetCard: volumes, exact mean/median, lang spread, ppm shares") {
    val docs = Seq(
      (0L, "a", "en", 100L), (1L, "a", "en", 200L), (2L, "a", "de", 400L),
      (3L, "b", "en", 300L))
      .toDF("doc_id", "source", "lang", "n_chars")
    val got = CorpusOps.datasetCard(docs)
      .as[(String, Long, Long, Long, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // a: 3 docs, 700 chars, mean 233 (div), median 200.0, 2 langs, 700k ppm
    assert(got("a") == (("a", 3L, 700L, 233L, 200.0, 2L, 700000L)))
    assert(got("b") == (("b", 1L, 300L, 300L, 300.0, 1L, 300000L)))
  }

  test("prioritySampleByGroup: per-group quota, agrees with global formula") {
    val docs = (0L until 200L).map(i => (i, 1L + i % 7, s"src${i % 3}"))
      .toDF("doc_id", "n_chars", "source")
    val got = CorpusOps.prioritySampleByGroup(docs, k = 4, groupCol = "source")
      .as[(String, Long, Long, Long)].collect()
    assert(got.length == 12) // 3 groups × 4
    // per group: rn is 1..4 and priorities are non-increasing
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == Seq(1L, 2L, 3L, 4L))
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.reverse.toSeq)
    }
    // the winner of each group carries the same priority the global
    // sampler computes for that doc (same formula, same seed)
    val global = CorpusOps.prioritySample(docs, k = 200)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    got.foreach { case (_, _, p, id) => assert(global(id) == p) }
  }

  test("sampleByHash: deterministic, stratified, extreme rates exact") {
    val d = (0L until 400L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val rates = Map("src0" -> 1.0, "src1" -> 0.0, "src2" -> 0.5)
    val kept = CorpusOps.sampleByHash(d, rates).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(kept.count(_._2 == "src0") == 100) // rate 1.0 keeps all
    assert(!kept.exists(_._2 == "src1")) // rate 0.0 drops all
    assert(!kept.exists(_._2 == "src3")) // unlisted stratum defaults to 0
    val n2 = kept.count(_._2 == "src2")
    assert(n2 > 20 && n2 < 80, s"src2 kept $n2 of 100 at rate 0.5")
    // reproducible: second run identical
    val again = CorpusOps.sampleByHash(d, rates).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(kept.toSet == again.toSet)
    // monotone in the rate (same hash, higher threshold), including a rate
    // whose double form is fractionally below its bucket count (0.29)
    val low = CorpusOps.sampleByHash(d, Map("src2" -> 0.29)).collect().map(_.getLong(0)).toSet
    val high = CorpusOps.sampleByHash(d, Map("src2" -> 0.5)).collect().map(_.getLong(0)).toSet
    assert(low.subsetOf(high))
  }

  test("scrubPii: emails, phones, card numbers replaced and counted") {
    val d = Seq(
      (1L, "mail me at jane.doe+x@example.co.uk today"),
      (2L, "call +1 555 123 4567 or write a@b.io"),
      (3L, "card 4111111111111111 exp 12/26"),
      (4L, "nothing sensitive here"),
      (5L, "write 123-456-7890@example.com now")) // phone-shaped local part
      .toDF("doc_id", "text")
    val r = CorpusOps.scrubPii(d).collect()
      .map(x => x.getLong(0) -> (x.getString(1), x.getInt(2))).toMap
    assert(r(1L)._1 == "mail me at <EMAIL> today" && r(1L)._2 == 1)
    assert(r(2L)._1 == "call <PHONE> or write <EMAIL>" && r(2L)._2 == 2)
    assert(r(3L)._1 == "card <NUMBER> exp 12/26" && r(3L)._2 == 1)
    assert(r(4L)._1 == "nothing sensitive here" && r(4L)._2 == 0)
    // overlap: the email swallows the phone-shaped local part; sequential
    // counting keeps the audit equal to replacements performed (1, not 2)
    assert(r(5L)._1 == "write <EMAIL> now" && r(5L)._2 == 1)
  }

  test("chunkTokens: window starts, overlap, tail chunk, exact counts") {
    val d = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b")) // shorter than one window
      .toDF("doc_id", "text")
    val got = CorpusOps.chunkTokens(d, size = 4, stride = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getInt(3))).toMap
    // starts 0,2,4,6 -> four windows; start 8 is dropped because window 6
    // already reached the end ("t9 t10" would be a pure suffix duplicate)
    assert(got.keySet.filter(_._1 == 1L).map(_._2) == Set(0, 1, 2, 3))
    assert(got((1L, 0)) == ("t1 t2 t3 t4", 4))
    assert(got((1L, 1)) == ("t3 t4 t5 t6", 4)) // stride-2 overlap
    assert(got((1L, 3)) == ("t7 t8 t9 t10", 4)) // last window reaches the end
    assert(got((2L, 0)) == ("a b", 2)) // short doc -> one tail-only window
    assert(!got.contains((2L, 1)))
    // an 11-token doc DOES need a genuine tail window (adds token 11)
    val tail = CorpusOps.chunkTokens(
        Seq((3L, (1 to 11).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text"),
        size = 4, stride = 2).collect()
      .map(r => r.getInt(1) -> (r.getString(2), r.getInt(3))).toMap
    assert(tail(4) == ("t9 t10 t11", 3))
  }

  test("chunkTokens property: full coverage, no subset chunks, exact counts") {
    val rnd = new scala.util.Random(23)
    val docs = (0 until 40).map { i =>
      val n = rnd.between(1, 41)
      (i.toLong, (1 to n).map(t => s"w$t").mkString(" "))
    }
    val lens = docs.map { case (id, t) => id -> t.split(" ").length }.toMap
    val (size, stride) = (5, 3)
    val chunks = CorpusOps.chunkTokens(docs.toDF("doc_id", "text"),
        size = size, stride = stride).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(3)))
      .groupBy(_._1)
    docs.foreach { case (id, _) =>
      val n = lens(id)
      val cs = chunks(id).sortBy(_._2)
      // contiguous chunk ids from 0
      assert(cs.map(_._2).toSeq == cs.indices.toSeq, s"doc $id ids")
      val ranges = cs.map { case (_, idx, nt) => (idx * stride, idx * stride + nt) }
      // exact window length
      ranges.foreach { case (s, e) =>
        assert(e - s == math.min(size, n - s), s"doc $id window $s") }
      // full coverage of [0, n)
      assert(ranges.map(_._2).max == n && ranges.map(_._1).min == 0, s"doc $id cover")
      // no window is contained in another (the suffix-dup rule, generalized)
      for (a <- ranges; b <- ranges if a != b)
        assert(!(a._1 >= b._1 && a._2 <= b._2), s"doc $id $a subset of $b")
    }
  }

  test("decontamination: n-gram collision flags leaks, spares clean docs") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val docs = Seq(
      // embeds an 8-gram of the benchmark -> contaminated
      (1L, "prefix words the quick brown fox jumps over the lazy dog and more"),
      // shares tokens but no 8-gram run -> clean
      (2L, "the quick brown cat sleeps under the lazy dog tonight again"),
      (3L, "completely unrelated text with eight plus words in it here"))
      .toDF("doc_id", "text")
    val bad = CorpusOps.contaminated(docs, bench, n = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bad.keySet == Set(1L))
    // shares "the quick...the lazy" and "quick...lazy dog"; the third
    // benchmark 8-gram needs "tonight", which doc 1 lacks
    assert(bad(1L) == 2)
    val kept = CorpusOps.decontaminate(docs, bench, n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("shuffleShard: deterministic, balanced-ish, dense per-shard positions") {
    val d = (0L until 200L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val a = CorpusOps.shuffleShard(d, nShards = 4)
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    val b = CorpusOps.shuffleShard(d, nShards = 4)
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b)) // reproducible
    assert(a.map(_._1).toSet == (0L until 200L).toSet) // every doc exactly once
    val byShard = a.groupBy(_._2)
    assert(byShard.keySet.subsetOf(Set(0, 1, 2, 3)))
    byShard.values.foreach { rows => // positions dense 0..n_s-1
      assert(rows.map(_._3).sorted.sameElements(rows.indices.map(_.toLong)))
    }
    // a different seed produces a different order (not a fixed permutation)
    val c = CorpusOps.shuffleShard(d, seed = "other", nShards = 4)
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(!a.sameElements(c))
  }

  test("capPerDomain: keeps at most cap docs per domain, deterministic order") {
    val d = (0L until 30L).map(i => (i, s"d${i % 3}")).toDF("doc_id", "domain")
    val kept = CorpusOps.capPerDomain(d, cap = 4)
      .collect().map(r => (r.getString(1), r.getLong(0)))
    assert(kept.length == 12)
    // lowest doc_ids win per domain
    assert(kept.filter(_._1 == "d0").map(_._2).sorted.sameElements(Seq(0L, 3L, 6L, 9L)))
    assert(kept.filter(_._1 == "d2").map(_._2).sorted.sameElements(Seq(2L, 5L, 8L, 11L)))
  }

  test("canonicalUrl applies each normalization rule and composes them") {
    val cases = Seq(
      "https://Example.COM/Path"            -> "https://example.com/Path",
      "HTTPS://a.b/x"                       -> "https://a.b/x",
      "https://a.b:443/x"                   -> "https://a.b/x",
      "http://a.b:80/x"                     -> "http://a.b/x",
      "https://a.b:8080/x"                  -> "https://a.b:8080/x", // non-default kept
      "https://a.b/x#frag"                  -> "https://a.b/x",
      "https://a.b/x/"                      -> "https://a.b/x",
      "https://a.b"                         -> "https://a.b/",
      "https://a.b/"                        -> "https://a.b/",
      "https://a.b/x?utm_source=f"          -> "https://a.b/x",
      "https://a.b/x?utm_source=f&id=3"     -> "https://a.b/x?id=3",
      "https://a.b/x?id=3&utm_campaign=c"   -> "https://a.b/x?id=3",
      "https://a.b/x?id=3&fbclid=z&gclid=q" -> "https://a.b/x?id=3",
      "https://a.b/x?ID=3"                  -> "https://a.b/x?ID=3", // query case kept
      "https://A.B:443/x/?utm_medium=m#f"   -> "https://a.b/x")
    val got = cases.map(_._1).toDF("url")
      .select(CorpusOps.canonicalUrl(col("url"))).as[String].collect()
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"canonicalUrl($in) = $g, want $want")
    }
  }

  test("dedupByUrl keeps the min id per canonical URL and counts variants") {
    val d = Seq(
      (5L, "https://A.com/x?utm_source=f"),
      (3L, "https://a.com/x/"),
      (9L, "https://a.com/x#top"),
      (7L, "https://a.com/y"))
      .toDF("doc_id", "url")
    val got = CorpusOps.dedupByUrl(d)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("https://a.com/x", 3L, 3L), ("https://a.com/y", 7L, 1L)))
  }

  test("lengthReport matches brute-force rank percentiles per group") {
    val rnd = new scala.util.Random(11)
    val docs = (0 until 300).map { i =>
      val g = s"g${i % 3}"
      (g, Seq.fill(1 + rnd.nextInt(40))("w").mkString(" "))
    }
    val got = CorpusOps.lengthReport(docs.toDF("lang", "text"), "lang")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    def brute(lens: Seq[Int], p: Int): Long = {
      val sorted = lens.sorted
      // smallest value whose cumulative count*100 >= p*n
      sorted(math.ceil(p * sorted.size / 100.0).toInt - 1).toLong
    }
    docs.groupBy(_._1).foreach { case (g, rows) =>
      val lens = rows.map(_._2.split(" ").length)
      val (_, n, p50, p90, p99) = got(g)
      assert(n == lens.size)
      assert(p50 == brute(lens, 50) && p90 == brute(lens, 90) && p99 == brute(lens, 99))
    }
  }

  test("packOffsets tiles each shard's token stream exactly (concat-and-chunk)") {
    val docs = (0L until 80L)
      .map(i => (i, Seq.fill(1 + (i % 9).toInt)(s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = CorpusOps.packOffsets(docs, capacity = 10, nShards = 3)
      .as[(Long, Int, Long, Long, Long, Long)].collect()
    assert(got.length == 80)
    got.groupBy(_._2).values.foreach { rows =>
      val sorted = rows.sortBy(_._3).toList
      assert(sorted.head._3 == 0L) // stream starts at offset 0
      sorted.sliding(2).foreach { // spans tile: next start == prev end
        case List(a, b) => assert(a._4 == b._3)
        case _ => ()
      }
      sorted.foreach { case (id, _, s, e, f, l) =>
        assert(e - s == 1 + (id % 9)) // span length == token count
        assert(f == s / 10 && l == (e - 1) / 10) // sequence indices
      }
    }
    // total tokens conserved across shards
    assert(got.map(r => r._4 - r._3).sum == (0L until 80L).map(i => 1 + (i % 9)).sum)
  }

  test("contaminatedBloom returns exactly the exact-join contamination result") {
    val docs = (0L until 60L).map { i =>
      // every 7th doc quotes the shared benchmark sentence verbatim
      val base = (0 until 12).map(j => s"w${(i * 31 + j * 7) % 97}").mkString(" ")
      val text = if (i % 7 == 0) base + " the bench mark sentence appears here in full today ok" else base
      (i, text)
    }.toDF("doc_id", "text")
    val bench = Seq((1000L, "the bench mark sentence appears here in full today ok yes"))
      .toDF("doc_id", "text")
    val exact = CorpusOps.contaminated(docs, bench, n = 8)
      .as[(Long, Long)].collect().toSet
    val bloom = CorpusOps.contaminatedBloom(docs, bench, n = 8)
      .as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty && bloom == exact)
  }

  test("stratifiedSplit: exact per-stratum shares, id-pure under repartition") {
    val docs = (0L until 430L).map(i => (s"s${i % 3}", i)).toDF("source", "doc_id")
    val got = CorpusOps.stratifiedSplit(docs)
      .as[(String, Long, String)].collect()
    got.groupBy(_._1).foreach { case (_, rows) =>
      val n = rows.size
      val bySplit = rows.groupBy(_._3).view.mapValues(_.size).toMap
      assert(bySplit.getOrElse("train", 0) == n * 800 / 1000)
      assert(bySplit.getOrElse("val", 0) == n * 900 / 1000 - n * 800 / 1000)
      assert(bySplit.getOrElse("test", 0) == n - n * 900 / 1000)
    }
    // pure function of the id: a shuffled, repartitioned input assigns
    // every document to the SAME split
    val again = CorpusOps.stratifiedSplit(docs.orderBy(rand(42)).repartition(7))
      .as[(String, Long, String)].collect()
    assert(again.toSet == got.toSet)
  }

  test("ipfRake: the last-fitted margin matches its target to truncation") {
    val rnd = new scala.util.Random(29)
    val target = (0 until 4000).map(i =>
      (s"s${rnd.nextInt(6)}", s"l${rnd.nextInt(4)}", i)).toDF("source", "lang", "i")
    val panel = target.filter(col("i") % 3 === 0) // a skewed third
    val cells = CorpusOps.ipfRake(panel, target)
      .as[(String, String, Long, Long, Long)].collect()
    // the final half-round fits the LANG margin: per-lang weighted mass
    // must equal t_col*1e6 up to one truncation unit per cell
    val targetLang = target.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    cells.groupBy(_._2).foreach { case (lang, cs) =>
      val mass = cs.map(c => BigInt(c._3) * c._4).sum
      val want = BigInt(targetLang(lang)) * 1000000
      // truncation loses < cnt per cell in w, i.e. < cnt*1 in mass — and
      // cnt sums to the panel lang margin; bound loosely by that
      val slack = cs.map(_._3).sum
      assert(mass <= want && want - mass <= slack,
        s"$lang: mass=$mass want=$want slack=$slack")
    }
    // the row margins (fitted one half-round earlier) converge too: within
    // 2% after two full rounds on this data
    val targetSrc = target.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    cells.groupBy(_._1).foreach { case (src, cs) =>
      val mass = cs.map(c => BigInt(c._3) * c._4).sum.toDouble
      val want = targetSrc(src) * 1e6
      assert(math.abs(mass - want) / want < 0.02, s"$src: $mass vs $want")
    }
  }

  test("apportion: conservation and the quota property (seeded random cells)") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 5000).map { i =>
      (s"s${rnd.nextInt(7)}", s"l${rnd.nextInt(5)}", i)
    }.toDF("source", "lang", "i")
    for (seats <- Seq(997L, 1000000L)) {
      val got = CorpusOps.apportion(rows, Seq("source", "lang"), seats)
        .select("cnt", "base", "alloc")
        .as[(Long, Long, Long)].collect()
      val total = got.map(_._1).sum
      // hard conservation: the budget is hit EXACTLY
      assert(got.map(_._3).sum == seats)
      // quota property: floor(q) = base <= alloc <= base + 1
      assert(got.forall { case (cnt, base, alloc) =>
        base == cnt * seats / total && (alloc == base || alloc == base + 1)
      })
    }
  }

  test("dsirSelect: k past the corpus returns every doc, order intact") {
    val docs = Seq((1L, "en", "alpha"), (2L, "fr", "beta"))
      .toDF("doc_id", "lang", "text")
    val got = CorpusOps.dsirSelect(docs, col("lang") === "en", k = 50)
      .as[(Long, String, Long)].collect().toSeq
    assert(got.size == 2)
    assert(got == got.sortBy(r => (-r._3, r._1)))
  }

  test("rendezvousShards: HRW minimal movement — only the new shard gains") {
    val docs = (0L until 400L).toDF("doc_id")
    val got = CorpusOps.rendezvousShards(docs, nOld = 5, nNew = 6)
      .as[(Int, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == (0 to 5))
    // conservation: both fleets own every doc exactly once
    assert(got.map(_._2).sum == 400L && got.map(_._3).sum == 400L)
    // the HRW law: a pre-existing shard NEVER gains a doc on grow —
    // docs move only to the new shard, and everything it owns moved in
    assert(got.filter(_._1 < 5).forall(_._4 == 0L))
    val s5 = got.find(_._1 == 5).get
    assert(s5._2 == 0L && s5._4 == s5._3 && s5._3 > 0L)
  }

  test("temperatureMixture: α=1/2 law replayed in BigInt; exact conservation") {
    // perfect squares → sqrt exact; budget chosen so remainders matter
    val docs = (Seq.fill(64)("big") ++ Seq.fill(16)("mid") ++
      Seq.fill(4)("small") ++ Seq.fill(1)("tiny")).toDF("source")
    val budget = 10L
    val got = CorpusOps.temperatureMixture(docs, budget).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    // independent replay: w = floor(sqrt(n)·1e6), largest remainder
    val n = Map("big" -> 64L, "mid" -> 16L, "small" -> 4L, "tiny" -> 1L)
    val w = n.map { case (s, c) =>
      s -> BigInt(math.floor(math.sqrt(c.toDouble) * 1e6).toLong) }
    val wTot = w.values.sum
    val base = w.map { case (s, v) => s -> (v * budget / wTot) }
    val rem = w.map { case (s, v) => s -> (v * budget % wTot) }
    val short = budget - base.values.sum.toLong
    val topUp = rem.toSeq.sortBy { case (s, r) => (-r, s) }
      .take(short.toInt).map(_._1).toSet
    val exp = n.keys.toSeq.sorted.map { s =>
      (s, n(s), w(s).toLong, (w(s) * 1000000 / wTot).toLong,
        base(s).toLong + (if (topUp(s)) 1L else 0L))
    }
    assert(got.toSeq == exp, s"got ${got.toSeq}\nexp $exp")
    // conservation: the budget is apportioned exactly
    assert(got.map(_._5).sum == budget)
    // the α < 1 point: the tail's allocation share strictly exceeds its
    // document share (8M/15M of 10 ≥ 5 for big → tiny gets ≥ its 1/85th)
    val tiny = got.find(_._1 == "tiny").get
    assert(tiny._5 * 85 > budget * tiny._2, s"tail not upsampled: $tiny")
  }

  test("dsirSelect equals an independent JVM replay of the scoring law") {
    // Four docs, target = en; replay md5 buckets, Laplace micro-nat
    // costs (rounded BEFORE the subtraction), integer scores, and the
    // (score DESC, doc_id) total order entirely in plain Scala.
    val docs = Seq(
      (1L, "en", "good good signal"), (2L, "fr", "noise noise noise"),
      (3L, "fr", "good signal"), (4L, "en", "noise"))
    val buckets = 16
    def bucket(w: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % buckets
    }
    def mn(x: Double): Long = math.floor(-math.log(x) * 1e6 + 0.5).toLong
    val toks = docs.flatMap { case (id, lang, text) =>
      text.split(" ").map(w => (id, lang, lang == "en", bucket(w))) }
    val cRaw = toks.groupBy(_._4).view.mapValues(_.size.toLong).toMap
    val cTgt = toks.filter(_._3).groupBy(_._4).view.mapValues(_.size.toLong).toMap
    val (tRaw, tTgt) = (toks.size.toLong, toks.count(_._3).toLong)
    val lambda = cRaw.keys.map { f =>
      f -> (mn((cRaw(f) + 1).toDouble / (tRaw + buckets)) -
        mn((cTgt.getOrElse(f, 0L) + 1).toDouble / (tTgt + buckets))) }.toMap
    val want = toks.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(t => lambda(t._4)).sum).toSeq
      .map { case ((id, lang), s) => (id, lang, s) }
      .sortBy(r => (-r._3, r._1)).take(3)
    val got = CorpusOps.dsirSelect(docs.toDF("doc_id", "lang", "text"),
        col("lang") === "en", k = 3, buckets = buckets)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == want)
    // the pure-noise doc (its every token dominated by the raw pool)
    // must be the one cut by the top-3 selection
    assert(!got.exists(_._1 == 2L))
  }
}

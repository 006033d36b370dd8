package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  // (user_id, id, ts_us, value) with seeded collisions: several events per
  // user share a timestamp so the deterministic tie rules are exercised.
  private lazy val evSeq: Seq[(Long, Long, Long, Double)] = {
    val rnd = new scala.util.Random(7)
    (0L until 400L).map { i =>
      (rnd.nextInt(5).toLong, i, rnd.nextInt(1000).toLong * 1000L, rnd.nextInt(500) / 100.0)
    }
  }
  private lazy val ev = evSeq.toDF("user_id", "id", "ts_us", "value")

  test("asofJoin matches a brute-force per-key scan (random data with ts ties)") {
    val left = ev.filter(col("id") % 3 === 0)
    val right = ev.filter(col("id") % 3 === 1)
    val rightSeq = evSeq.filter(_._2 % 3 == 1)
    val got = EventOps.asofJoin(left, right, "user_id", Seq("value"))
      .select("user_id", "id", "asof_id")
      .as[(Long, Long, Option[Long])].collect().toSet
    val want = evSeq.filter(_._2 % 3 == 0).map { case (u, id, ts, _) =>
      // latest right at ts_r <= ts; ties on ts broken by max id (the
      // operator's per-(key,ts) max-id dedup + (ts, id) carry order)
      val cands = rightSeq.filter(r => r._1 == u && r._3 <= ts)
      val best = if (cands.isEmpty) None
                 else Some(cands.maxBy(r => (r._3, r._2))._2)
      (u, id, best)
    }.toSet
    assert(got == want)
  }

  test("asofJoinForward matches a brute-force forward scan (min-id tie rule)") {
    val left = ev.filter(col("id") % 3 === 0)
    val right = ev.filter(col("id") % 3 === 1)
    val rightSeq = evSeq.filter(_._2 % 3 == 1)
    val got = EventOps.asofJoinForward(left, right, "user_id", Seq("value"))
      .select("user_id", "id", "asof_id")
      .as[(Long, Long, Option[Long])].collect().toSet
    val want = evSeq.filter(_._2 % 3 == 0).map { case (u, id, ts, _) =>
      // earliest right at ts_r >= ts; ties on ts broken by MIN id (the
      // time-reversed dedup rule)
      val cands = rightSeq.filter(r => r._1 == u && r._3 >= ts)
      val best = if (cands.isEmpty) None
                 else Some(cands.minBy(r => (r._3, r._2))._2)
      (u, id, best)
    }.toSet
    assert(got == want)
  }

  test("asofJoin is inclusive on equal timestamps and NULL before any match") {
    val left = Seq((1L, 10L, 1000L, 1.0), (1L, 11L, 500L, 1.0)).toDF("user_id", "id", "ts_us", "value")
    val right = Seq((1L, 20L, 1000L, 2.0), (1L, 21L, 900L, 3.0)).toDF("user_id", "id", "ts_us", "value")
    val got = EventOps.asofJoin(left, right, "user_id", Seq("value"))
      .select("id", "asof_id").as[(Long, Option[Long])].collect().toMap
    assert(got(10L).contains(20L)) // equal ts matches (inclusive)
    assert(got(11L).isEmpty)       // nothing at or before 500
  }

  test("sessionize splits on gap > threshold and aggregates exactly") {
    // one user, gaps: 10, 100(split), 10, 200(split) → sessions of 2, 2, 1
    val e = Seq((1L, 0L, 0L, 1.00), (1L, 1L, 10L, 2.00), (1L, 2L, 110L, 0.25),
      (1L, 3L, 120L, 0.25), (1L, 4L, 320L, 4.00))
      .toDF("user_id", "id", "ts_us", "value")
    val got = EventOps.sessionize(e, "user_id", gapUs = 50L)
      .select("session_idx", "n_events", "start_us", "end_us", "duration_us", "sum_cents")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 2L, 0L, 10L, 10L, 300L),
      (2L, 2L, 110L, 120L, 10L, 50L),
      (3L, 1L, 320L, 320L, 0L, 400L)))
  }

  test("sessionize counts every input event exactly once") {
    val total = EventOps.sessionize(ev, "user_id", gapUs = 5000L)
      .agg(sum("n_events")).as[Long].head()
    assert(total == 400L)
  }

  test("tumblingRollup buckets are epoch-aligned floors") {
    val e = Seq((0L, "a", 1.0), (3599999999L, "a", 2.0), (3600000000L, "a", 4.0))
      .toDF("ts_us", "event_type", "value")
    val got = EventOps.tumblingRollup(e, "1 hour")
      .select("bucket_us", "n", "sum_cents")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 2L, 300L), (3600000000L, 1L, 400L)))
  }

  test("rollingAgg matches a brute-force trailing-window scan") {
    val W = 100000L
    val got = EventOps.rollingAgg(ev, "user_id", windowUs = W)
      .select("id", "n_trail", "sum_cents_trail")
      .as[(Long, Long, Long)].collect().toSet
    val want = evSeq.map { case (u, id, ts, _) =>
      val inWin = evSeq.filter(r => r._1 == u && r._3 >= ts - W && r._3 <= ts)
      (id, inWin.size.toLong, inWin.map(r => math.round(r._4 * 100)).sum)
    }.toSet
    assert(got == want)
  }

  test("funnel requires the exit STRICTLY after the entry") {
    val e = Seq(
      (1L, 100L, "signup"), (1L, 100L, "purchase"), // same instant: no conversion
      (2L, 100L, "signup"), (2L, 101L, "purchase"), // converts, ttc 1
      (3L, 100L, "purchase"), (3L, 200L, "signup"), // purchase precedes signup only
      (4L, 100L, "signup")) // never converts
      .toDF("user_id", "ts_us", "event_type")
    val got = EventOps.funnel(e, "user_id", "signup", "purchase")
      .select("user_id", "converted", "ttc_us")
      .as[(Long, Int, Option[Long])].collect()
      .map { case (k, v, t) => k -> (v, t) }.toMap
    assert(got(1L) == ((0, None)))       // same-instant purchase doesn't count
    assert(got(2L) == ((1, Some(1L))))
    assert(got(3L) == ((0, None)))       // purchase strictly before signup
    assert(got(4L) == ((0, None)))       // no purchase at all
    assert(!got.contains(5L))            // no entry event → no row
  }

  test("multiTouchAttribution: exact 10^6 split, remainder to earliest, window edges") {
    val e = Seq(
      // user 1: three views in window, one outside; purchase at 10000
      (1L, 1L, 9000L, "view"), (1L, 2L, 9500L, "view"), (1L, 3L, 10000L, "view"),
      (1L, 4L, 7999L, "view"), // outside: touch_us <= conv_us - window
      (1L, 5L, 10000L, "purchase"),
      // user 2: purchase with no touches -> no rows
      (2L, 6L, 5000L, "purchase"),
      // user 3: exactly-one-touch split
      (3L, 7L, 4000L, "view"), (3L, 8L, 4100L, "purchase"))
      .toDF("user_id", "event_id", "ts_us", "event_type")
    val got = EventOps.multiTouchAttribution(e, "user_id", "view", "purchase",
        windowUs = 2000L)
      .select("conv_id", "touch_id", "weight_micro")
      .as[(Long, Long, Long)].collect().toSet
    // 10^6 div 3 = 333333 rem 1; earliest touch (id 1) gets the remainder
    assert(got == Set((5L, 1L, 333334L), (5L, 2L, 333333L), (5L, 3L, 333333L),
      (8L, 7L, 1000000L)))
    // conservation: every conversion's credit sums to exactly 10^6
    // (toSeq first — summing over the Set would dedup equal weights)
    val sums = got.toSeq.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    assert(sums.values.forall(_ == 1000000L))
  }

  test("m4Downsample: per-bucket min/max/first/last preserved, at most 4 rows each") {
    val rnd = new scala.util.Random(31)
    val pts = (0 until 500).map(i =>
      ("s" + (i % 2), i.toLong, (i * 17L) % 1000, rnd.nextInt(2000).toLong - 1000))
      .toDF("event_type", "id", "ts_us", "value_c")
    val out = EventOps.m4Downsample(pts, "event_type", nBuckets = 10)
      .as[(String, Long, Long, Long)].collect()
    assert(out.groupBy(r => (r._1, r._2)).forall(_._2.length <= 4))
    // rendering invariants: per bucket the output's value extrema and
    // time extrema equal the input's — the M4 error-free guarantee
    val rng = pts.agg(min("ts_us"), max("ts_us")).as[(Long, Long)].head()
    val in = pts.as[(String, Long, Long, Long)].collect()
      .map { case (s, id, ts, v) =>
        (s, (ts - rng._1) * 10 / (rng._2 - rng._1 + 1), ts, v)
      }
    for (((series, bucket), rows) <- in.groupBy(r => (r._1, r._2))) {
      val o = out.filter(r => r._1 == series && r._2 == bucket)
      assert(o.map(_._4).min == rows.map(_._4).min, s"vmin $series/$bucket")
      assert(o.map(_._4).max == rows.map(_._4).max, s"vmax $series/$bucket")
      assert(o.map(_._3).min == rows.map(_._3).min, s"tmin $series/$bucket")
      assert(o.map(_._3).max == rows.map(_._3).max, s"tmax $series/$bucket")
    }
  }

  test("cdcSnapshot keeps the latest (ts, id) row per key and honors tombstones") {
    val feed = Seq(
      (1L, 0L, 100L, "u", 10L), (1L, 1L, 200L, "u", 20L),  // latest upsert wins
      (2L, 2L, 100L, "u", 30L), (2L, 3L, 200L, "d", 0L),   // deleted: absent
      (3L, 4L, 100L, "d", 0L), (3L, 5L, 200L, "u", 40L),   // re-created after delete
      (4L, 6L, 100L, "u", 50L), (4L, 7L, 100L, "u", 60L))  // ts tie: max id wins
      .toDF("user_id", "id", "ts_us", "op", "state")
    val got = EventOps.cdcSnapshot(feed, "user_id", "state")
      .select("user_id", "state").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 20L, 3L -> 40L, 4L -> 60L))
  }

  test("mergeUpsert: matched update, matched delete, insert, unmatched base kept") {
    val base = Seq((1L, 0L, 100L, 10L), (2L, 1L, 100L, 20L), (3L, 2L, 100L, 30L))
      .toDF("user_id", "id", "ts_us", "state")
    val delta = Seq(
      (1L, 10L, 200L, "u", 11L),                           // matched update
      (2L, 11L, 200L, "d", 0L),                            // matched delete
      (4L, 12L, 200L, "u", 40L),                           // not-matched insert
      (5L, 13L, 200L, "u", 50L), (5L, 14L, 300L, "d", 0L)) // insert then delete → absent
      .toDF("user_id", "id", "ts_us", "op", "state")
    val got = EventOps.mergeUpsert(base, delta, "user_id", "state")
      .select("user_id", "state").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 11L, 3L -> 30L, 4L -> 40L))
  }

  test("mergeUpsert: snapshot(before) + delta(after) == snapshot(whole feed), any cut") {
    val rnd = new scala.util.Random(11)
    val feed = (0L until 500L).map { i =>
      (rnd.nextInt(40).toLong, i, rnd.nextInt(100).toLong * 10L,
        if (rnd.nextInt(5) == 0) "d" else "u", rnd.nextInt(1000).toLong)
    }.toDF("user_id", "id", "ts_us", "op", "state")
    val want = EventOps.cdcSnapshot(feed, "user_id", "state")
      .orderBy("user_id").collect().toSeq
    for (cut <- Seq(0L, 300L, 990L, 2000L)) {
      val base = EventOps.cdcSnapshot(feed.filter(col("ts_us") < cut), "user_id", "state")
      val got = EventOps.mergeUpsert(base, feed.filter(col("ts_us") >= cut), "user_id", "state")
        .orderBy("user_id").collect().toSeq
      assert(got == want, s"cut=$cut")
    }
  }

  test("scd2 collapses same-state runs and closes intervals at the next change") {
    val feed = Seq(
      (1L, 0L, 100L, "a"), (1L, 1L, 200L, "a"),  // run-collapse: one 'a' version
      (1L, 2L, 300L, "b"), (1L, 3L, 400L, "a"),  // a → b → a is three versions
      (2L, 4L, 100L, "x"))
      .toDF("user_id", "id", "ts_us", "state")
    val got = EventOps.scd2(feed, "user_id", "state")
      .select("user_id", "version", "state", "valid_from_us", "valid_to_us", "is_current")
      .as[(Long, Int, String, Long, Option[Long], Int)].collect().toSet
    assert(got == Set(
      (1L, 1, "a", 100L, Some(300L), 0),
      (1L, 2, "b", 300L, Some(400L), 0),
      (1L, 3, "a", 400L, None, 1),
      (2L, 1, "x", 100L, None, 1)))
  }

  test("scd2 intervals tile each key's timeline: from = previous to, one current row") {
    val ev = evSeq.map { case (u, id, ts, v) => (u, id, ts, (v * 10).toInt % 3) }
      .toDF("user_id", "id", "ts_us", "state")
    val got = EventOps.scd2(ev, "user_id", "state")
      .select("user_id", "version", "valid_from_us", "valid_to_us")
      .as[(Long, Int, Long, Option[Long])].collect()
      .groupBy(_._1).values
    got.foreach { rows =>
      val sorted = rows.sortBy(_._2).toList
      sorted.sliding(2).foreach {
        case Seq((_, _, _, Some(to)), (_, _, from, _)) => assert(to == from)
        case _ => ()
      }
      assert(sorted.init.forall(_._4.isDefined) && sorted.last._4.isEmpty)
    }
  }

  test("cohortRetention reproduces a hand-built weekly matrix") {
    val WK = 604800000000L // µs per week
    val rows = Seq( // user 1: weeks 0,1,3; user 2: weeks 1,1,2; user 3: week 0
      (1L, 0L * WK + 5L), (1L, 1L * WK + 6L), (1L, 3L * WK + 7L),
      (2L, 1L * WK + 1L), (2L, 1L * WK + 2L), (2L, 2L * WK + 3L),
      (3L, 0L * WK + 9L))
    // ts is the harness convention: TIMESTAMP(NANOS) parquet surfaced as a
    // nanos LONG (nanosAsLong), so tsUs = ts div 1000
    val df = rows.toDF("user_id", "us")
      .select(col("user_id"), (col("us") * 1000L).as("ts"))
    val got = EventOps.cohortRetention(df)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 3L, 1L), // cohort week 0: users 1,3
      (1L, 0L, 1L), (1L, 1L, 1L)))              // cohort week 1: user 2
  }

  test("zscoreOutliers flags the planted spike only; a constant group flags nothing") {
    val normal = (0 until 20).map(i => (i.toLong, "a", 1.0))
    val spike = Seq((99L, "a", 100.0))
    val const = (100 until 110).map(i => (i.toLong, "b", 5.0)) // σ = 0
    val df = (normal ++ spike ++ const).toDF("event_id", "event_type", "value")
    val got = EventOps.zscoreOutliers(df).as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((99L, "a", 10000L)))
  }

  test("markovTransitions: per-user successor order, integer row-conditional P") {
    // user 1: a→b→a→c; user 2: b→a. Transitions: a→b, b→a(×2), a→c
    val ev = Seq(
      (1L, 10L, "a", 1000L), (1L, 11L, "b", 2000L),
      (1L, 12L, "a", 3000L), (1L, 13L, "c", 4000L),
      (2L, 20L, "b", 1000L), (2L, 21L, "a", 2000L))
      .toDF("user_id", "event_id", "event_type", "ts_us")
      .withColumn("ts", col("ts_us") * 1000L).drop("ts_us")
    val got = EventOps.markovTransitions(ev)
      .as[(String, String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("a", "b", 1L, 500000L), ("a", "c", 1L, 500000L), ("b", "a", 2L, 1000000L)))
  }

  test("markovTransitions: same-timestamp successors resolve by event_id") {
    val ev = Seq((1L, 2L, "x", 1000L), (1L, 1L, "y", 1000L))
      .toDF("user_id", "event_id", "event_type", "ts_us")
      .withColumn("ts", col("ts_us") * 1000L).drop("ts_us")
    // tie on ts → event_id 1 precedes 2, so the only transition is y→x
    val got = EventOps.markovTransitions(ev)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("y", "x", 1L, 1000000L)))
  }

  test("pathTrigrams: consecutive triples per user, top-k with lexicographic ties") {
    // user 1: a b c a b c → triples abc, bca, cab, abc; user 2: a b c → abc
    val ev = (Seq("a", "b", "c", "a", "b", "c").zipWithIndex.map {
      case (t, i) => (1L, i.toLong, t, (i + 1) * 1000L)
    } ++ Seq("a", "b", "c").zipWithIndex.map {
      case (t, i) => (2L, 10L + i, t, (i + 1) * 1000L)
    }).toDF("user_id", "event_id", "event_type", "ts_us")
      .withColumn("ts", col("ts_us") * 1000L).drop("ts_us")
    val got = EventOps.pathTrigrams(ev, k = 2)
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "a", "b", "c", 3L), (2L, "b", "c", "a", 1L)))
  }

  test("rateChange: week-over-week deltas, sparse weeks compare across the gap") {
    val WK = 604800000000L // µs per week
    val a = (Seq.fill(4)(0L) ++ Seq.fill(6)(1L) ++ Seq.fill(3)(3L)) // wk2 absent
      .zipWithIndex.map { case (wk, i) => (i.toLong, "a", wk * WK + i) }
    val b = (Seq.fill(3)(0L) ++ Seq.fill(2)(1L)) // non-exact negative delta
      .zipWithIndex.map { case (wk, i) => (100L + i, "b", wk * WK + i) }
    val ev = (a ++ b).toDF("event_id", "event_type", "ts_us")
      .withColumn("ts", col("ts_us") * 1000L).drop("ts_us")
    val got = EventOps.rateChange(ev)
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("a", 1L, 0L, 6L, 4L, 500000L),    // +50%
      ("a", 3L, 1L, 3L, 6L, -500000L),   // −50%, across the empty week 2
      // TRUNCATED toward zero: −1e6/3 → −333333 — both Spark's div and
      // DuckDB's integer // truncate (measured), so parity holds
      ("b", 1L, 0L, 2L, 3L, -333333L)))
  }

  test("madOutliers: robust to the masking that defeats the z-score gate") {
    // group "a": 20 values at 1.00, TWO spikes at 100.00 — the spikes
    // inflate σ enough that a 2σ z-gate keeps them (masking); the MAD
    // gate (median 1.00, MAD 0) must still flag both and nothing else
    val normal = (0 until 20).map(i => (i.toLong, "a", 1.0))
    val spikes = Seq((98L, "a", 100.0), (99L, "a", 100.0))
    val const = (100 until 110).map(i => (i.toLong, "b", 5.0)) // MAD 0, no dev
    val df = (normal ++ spikes ++ const).toDF("event_id", "event_type", "value")
    val got = EventOps.madOutliers(df).as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq((98L, "a", 10000L, 19800L), (99L, "a", 10000L, 19800L)))
  }

  test("madOutliers: half-integer median handled exactly") {
    // even-sized group: median of (100, 200, 300, 400) cents = 250.0 —
    // doubling keeps every lane integral; MAD = 200c, k=3 → threshold
    // |x−250c| > 600c, max deviation 150c, nothing flags. Adding 10.00
    // re-centers (median 300c, MAD 200c) and only the new point's
    // 700c deviation clears the 600c bar.
    val base = Seq((0L, "g", 1.0), (1L, "g", 2.0), (2L, "g", 3.0), (3L, "g", 4.0))
    val none = EventOps.madOutliers(base.toDF("event_id", "event_type", "value"))
    assert(none.isEmpty)
    val withBig = base :+ ((9L, "g", 10.0))
    val got = EventOps.madOutliers(withBig.toDF("event_id", "event_type", "value"))
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq((9L, "g", 1000L, 1400L)))
  }

  test("cusum: closed form == textbook recursion, first alarm only") {
    // three users with deterministic pseudo-random cent values; expected
    // alarms from the literal S_i = max(0, S_{i-1} + x_i − t) recursion
    val target = 5000L; val h = 12000L
    val rows = for (u <- 1L to 3L; i <- 0L until 40L) yield
      (u * 1000 + i, u, i * 60000000L, ((i * 37 + u * 53) % 130) * 100L)
    val expected = rows.groupBy(_._2).flatMap { case (u, evs) =>
      var s = 0L
      evs.sortBy(e => (e._3, e._1)).collectFirst {
        case e if { s = math.max(0L, s + e._4 - target); s > h } =>
          (u, e._3, e._1, s)
      }
    }.toSeq.sortBy(_._1)
    val ev = rows.toSeq.toDF("event_id", "user_id", "ts_us", "v_c")
      .withColumn("ts", col("ts_us") * 1000L)
      .withColumn("value", col("v_c") / 100.0)
      .select("event_id", "user_id", "ts", "value")
    val got = EventOps.cusum(ev, target, h)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(expected.nonEmpty && got == expected)
  }

  test("cusum: reset semantics — a deep dip does not bank negative credit") {
    // value 0 for 10 events (prefix dives −500c each), then 10 events at
    // +600c over target: max(0,·) resets, so the alarm arrives once the
    // POST-DIP excess alone crosses h — the running-min subtraction
    // must reproduce that, not offset the dip against the rise
    val target = 500L; val h = 1500L
    val vals = Seq.fill(10)(0L) ++ Seq.fill(10)(1100L)
    val ev = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, 7L, i * 60000000L, v) }
      .toDF("event_id", "user_id", "ts_us", "v_c")
      .withColumn("ts", col("ts_us") * 1000L)
      .withColumn("value", col("v_c") / 100.0)
      .select("event_id", "user_id", "ts", "value")
    val got = EventOps.cusum(ev, target, h)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // events 10,11,12 add +600 each: S = 600, 1200, 1800 → alarm at id 12
    assert(got == Seq((7L, 12L * 60000000L, 12L, 1800L)))
  }

  test("gapFillDaily: hand-computed interpolation + conservation") {
    val day = 86400000000L
    // user 1: day 100 → 10.00 (two events summed), day 103 → 4.00
    val ev = Seq(
      (1L, 1L, 100 * day + 5L, 6.0), (2L, 1L, 100 * day + 9L, 4.0),
      (3L, 1L, 103 * day + 1L, 4.0),
      // user 2: single day — spine is one observed row, nothing filled
      (4L, 2L, 200 * day, 9.5))
      .toDF("event_id", "user_id", "ts_us", "value")
      .withColumn("ts", col("ts_us") * 1000L)
      .select("event_id", "user_id", "ts", "value")
    val got = EventOps.gapFillDaily(ev)
      .as[(Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    // interp day 101: 1000c + (400−1000)·1/3 → 1e9 − 200e6; day 102: −400e6
    assert(got == Seq(
      (1L, 100L, 1000L * 1000000, "obs"),
      (1L, 101L, 800000000L, "fill"),
      (1L, 102L, 600000000L, "fill"),
      (1L, 103L, 400L * 1000000, "obs"),
      (2L, 200L, 950L * 1000000, "obs")))
  }

  test("rfm: quintile scores, aligned metrics → monotone segments") {
    val day = 86400000000L
    // user u (1..10) has u events of u·1.00 on day 100+u: user 10 is the
    // most recent, most frequent, highest-spend. recency = 10−u days,
    // n = u, mon = u²·100c; all three ntile(5) orderings list users in
    // id order → 2 per tile → every score is ⌈u/2⌉
    val ev = for (u <- 1L to 10L; i <- 0L until u) yield
      (u * 100 + i, u, (100 + u) * day + i * 1000000L, u * 1.0)
    val df = ev.toDF("event_id", "user_id", "ts_us", "value")
      .withColumn("ts", col("ts_us") * 1000L)
      .select("event_id", "user_id", "ts", "value")
    val got = EventOps.rfm(df)
      .as[(Long, Long, Long, Long, Long, Long, Long, String)]
      .collect().sortBy(_._1).toSeq
    val expected = (1L to 10L).map { u =>
      val s = (u + 1) / 2
      (u, 10 - u, u, u * u * 100, s, s, s, s"$s$s$s")
    }
    assert(got == expected)
  }

  test("ewmaHalf matches a per-user Scala fold (ties + singleton users)") {
    val rnd = new scala.util.Random(11)
    // user 9 gets exactly one purchase (fold degenerates to x1); ts ties
    // within a user are broken by event_id, which the struct sort pins
    val rows = (0L until 300L).map { i =>
      val u = rnd.nextInt(10).toLong
      val ts = if (u == 9) 5000L else rnd.nextInt(50).toLong * 1000
      (i, u, ts * 1000000L, // micros → nanos
        if (rnd.nextBoolean()) "purchase" else "view", rnd.nextInt(10000) / 100.0)
    }.filter { case (_, u, _, tpe, _) => u != 9 || tpe != "purchase" } :+
      (999L, 9L, 5000L * 1000000L, "purchase", 42.0)
    val df = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventOps.ewmaHalf(df)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val want = rows.filter(_._4 == "purchase")
      .groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (u, es) =>
        val xs = es.sortBy(e => (e._3 / 1000, e._1))
          .map(e => math.round(e._5 * 100))
        (u, xs.size.toLong, xs.tail.foldLeft(xs.head)((acc, x) => (acc + x) / 2))
      }
    assert(got == want)
  }

  test("seasonalProfile: known weekday means and anomaly counts") {
    val day = 86400000000L
    // day 0 = Thu (isodow 4), day 1 = Fri (5). Type A on Thursdays:
    // values 10.00, 20.00, 90.00 → mean 40.00, one |resid| > 100? no —
    // anomC default 10000c ($100): resids 30/20/50 → none. Type B on
    // Friday: 1.00 and 250.00 → mean 125.50, resids 124.50 → both > $100.
    val rows = Seq(
      (1L, 0L * day, "A", 10.0), (2L, 0L * day + 7, "A", 20.0),
      (3L, 7L * day, "A", 90.0), // day 7 = Thursday again
      (4L, 1L * day, "B", 1.0), (5L, 1L * day + 9, "B", 250.0))
      .map { case (id, us, tpe, v) => (id, us * 1000, 0L, tpe, v) }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.seasonalProfile(df)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(("A", 4L, 3L, 4000L, 0L), ("B", 5L, 2L, 12550L, 2L)))
  }

  test("abTestReport: contingency + exact rational stats vs BigInt reference") {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 500L).map { i =>
      (i, rnd.nextInt(40).toLong, i * 1000000000L,
        if (i % 2 == 0) "click" else "buy", rnd.nextInt(10000) / 100.0)
    }
    val df = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventOps.abTestReport(df, succThreshold = 50.0)
      .select("event_type", "n", "sa", "fa", "sb", "fb",
        "p_a_ppm", "p_b_ppm", "lift_ppm", "chi2_micro")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Option[Long], Long)]
      .collect().sortBy(_._1).toSeq
    val want = rows.groupBy(_._4).toSeq.sortBy(_._1).map { case (tpe, es) =>
      def cnt(a: Boolean, s: Boolean) = es.count(e =>
        (e._2 % 2 == 0) == a && (e._5 >= 50.0) == s).toLong
      val (sa, fa, sb, fb) = (cnt(true, true), cnt(true, false),
        cnt(false, true), cnt(false, false))
      val n = sa + fa + sb + fb
      def q(num: BigInt, den: BigInt) = (num / den).toLong // BigInt / truncates
      val dlt = BigInt(sa) * fb - BigInt(fa) * sb
      (tpe, n, sa, fa, sb, fb,
        q(BigInt(sa) * 1000000, BigInt(sa + fa)),
        q(BigInt(sb) * 1000000, BigInt(sb + fb)),
        if (sb > 0) Some(q(BigInt(sa) * (sb + fb) * 1000000, BigInt(sa + fa) * sb)) else None,
        q(BigInt(n) * dlt * dlt * 1000000,
          BigInt(sa + fa) * (sb + fb) * (sa + sb) * (fa + fb)))
    }
    assert(got == want)
  }

  test("kaplanMeier: hand example with right-censoring and the at-risk convention") {
    val day = 86400000000L // µs
    // durations: u1=2 obs, u3=2 obs (later events ignored), u4=7 obs,
    // u2=5 censored, u5=3 censored
    val evs = Seq(
      (1L, 0L, "view"), (1L, 2L, "purchase"),
      (2L, 0L, "view"), (2L, 5L, "view"),
      (3L, 0L, "view"), (3L, 2L, "purchase"), (3L, 9L, "view"),
      (4L, 0L, "view"), (4L, 7L, "purchase"),
      (5L, 0L, "view"), (5L, 3L, "view"))
      .toDF("user_id", "d", "event_type")
      .select(col("user_id"), (col("d") * day * 1000L).as("ts"), col("event_type"))
    val got = EventOps.kaplanMeier(evs)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // t=2: d=2 of n=5 at risk -> S = (1e6*3) div 5 = 600000
    // t=7: d=1 of n=1 at risk -> S = (600000*0) div 1 = 0
    assert(got == Seq((2L, 2L, 5L, 600000L), (7L, 1L, 1L, 0L)))
    // survival is monotone non-increasing by construction of the fold
    assert(got.map(_._4) == got.map(_._4).sorted.reverse)
  }

  test("theilSen: recovers a planted line exactly through a wild outlier") {
    val day = 86400000000L
    // y = 5.00·t dollars on days 0-9, except day 5 explodes to 1000.00:
    // 36 of 45 pair slopes sit exactly at 500 cents/day -> the median
    // ignores the outlier completely (OLS would not); residual median 0
    val ev = (0 until 10).map { t2 =>
      val v = if (t2 == 5) 1000.0 else 5.0 * t2
      ("m", t2.toLong, t2.toLong * day * 1000L, v)
    }.toDF("event_type", "event_id", "ts", "value")
    val r = EventOps.theilSen(ev)
      .as[(String, Long, Long, Long, Long)].head()
    assert(r == (("m", 10L, 45L, 500000000L, 0L)))
  }

  test("qiniCurve: planted uplift shows in the top decile, zero effect cancels") {
    // treated (even ids) convert at high score, control does not ->
    // positive qini; the score domain {10.0, 5.0} bins to deciles 0 and 5
    def mk(rows: Seq[(Long, String, Double)]) =
      rows.zipWithIndex.map { case ((u, et, v), i) =>
        (u, i.toLong, i.toLong * 1000000000L, et, v) }
        .toDF("user_id", "event_id", "ts", "event_type", "value")
    val uplift = mk(Seq((0L, "purchase", 10.0), (2L, "view", 5.0),
      (1L, "view", 10.0), (3L, "view", 5.0)))
    val got = EventOps.qiniCurve(uplift)
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    // bin 0 (score 10): Nt=1 Rt=1 Nc=1 Rc=0 -> num=1 -> 1e6 micro
    assert(got(0L)._6 == Some(1000000L))
    // symmetric outcomes cancel exactly
    val flat = mk(Seq((0L, "purchase", 10.0), (2L, "view", 5.0),
      (1L, "purchase", 10.0), (3L, "view", 5.0)))
    val z = EventOps.qiniCurve(flat)
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect()
    assert(z.forall(_._6 == Some(0L)))
  }

  test("didReadout: planted parallel-trends violation is the exact contrast") {
    // treated pre 1.00 post 3.00; control pre 1.00 post 2.00 -> DiD 1.00
    // ts domain {1,2,3,4} µs x2 users: lower-median cut at ts=2
    val ev = (for {
      u <- Seq(0L, 1L); tsU <- Seq(1L, 2L, 3L, 4L)
    } yield {
      val post = tsU > 2
      val v = (u, post) match {
        case (0L, false) => 1.0; case (0L, true) => 3.0
        case (_, false) => 1.0;  case (_, true) => 2.0
      }
      (u, u * 10 + tsU, tsU * 1000L, v) // ts nanos = µs*1000
    }).toDF("user_id", "event_id", "ts", "value")
    val r = EventOps.didReadout(ev)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Option[Long])].head()
    assert(r._9 == Some(100000000L)) // 1.00 in cents-micro
    assert((r._1, r._3, r._5, r._7) == ((2L, 2L, 2L, 2L)))
  }

  test("binarySegmentation: locates a planted step exactly") {
    // 5 values at 100.00 then 5 at 200.00: the contrast peaks at p = 5,
    // mean rises -> dir = +1; key = (250000² ) div (25·1e6) = 2500
    val ev = (0 until 10).map(i =>
      ("m", i.toLong, i.toLong * 1000000L, if (i < 5) 100.0 else 200.0))
      .toDF("event_type", "event_id", "ts_us", "value")
      .select(col("event_type"), col("event_id"), (col("ts_us") * 1000L).as("ts"),
        col("value"))
    val r = EventOps.binarySegmentation(ev)
      .as[(String, Long, Long, Long, Long, Int)].head()
    assert(r == (("m", 10L, 5L, 4000000L, 2500L, 1)))
  }

  test("autocorrelation: alternating series gives exact sign-flipping ppm; constant gives NULL") {
    val mk = (0 until 8).map(i =>
      ("alt", i.toLong, i.toLong * 1000000L, if (i % 2 == 0) 1.0 else 0.0)) ++
      (0 until 6).map(i => ("const", (100 + i).toLong, i.toLong * 1000000L, 2.5))
    val ev = mk.toDF("event_type", "event_id", "ts_us", "value")
      .select(col("event_type"), col("event_id"), (col("ts_us") * 1000L).as("ts"),
        col("value"))
    val got = EventOps.autocorrelation(ev)
      .as[(String, Int, Long, Option[Long])].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    // alt: x = 100,0,...; y = ±400; den = 8*160000; num_1 = -7*160000,
    // num_2 = +6*160000, num_3 = -5*160000
    assert(got(("alt", 1)) == Some(-875000L))
    assert(got(("alt", 2)) == Some(750000L))
    assert(got(("alt", 3)) == Some(-625000L))
    assert(Seq(1, 2, 3).forall(k => got(("const", k)).isEmpty))
  }

  test("holtHalf matches a per-type Scala fold (negative trend + single day)") {
    val dayUs = 86400000000L
    def half(v: Long): Long = if (v >= 0) v / 2 else -((-v) / 2)
    // "down" declines (trend state goes negative — the sign-safe lane),
    // "up" rises, "one" has a single day (fold degenerates to l=x1, b=0);
    // day 3 of "down" has TWO events that must sum before the fold
    val rows = Seq(
      ("down", 0L, 100.0), ("down", 1L, 90.0), ("down", 2L, 78.5),
      ("down", 3L, 40.0), ("down", 3L, 25.37), ("down", 4L, 50.0),
      ("up", 0L, 1.0), ("up", 2L, 5.0), ("up", 5L, 20.0), ("up", 6L, 43.21),
      ("one", 7L, 12.34))
    val df = rows.map { case (t, d, v) => (t, d * dayUs * 1000L + 7000L, v) }
      .toDF("event_type", "ts", "value")
    val got = EventOps.holtHalf(df)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, es) =>
      val xs = es.groupBy(_._2).toSeq.sortBy(_._1)
        .map(_._2.map(e => math.round(e._3 * 100)).sum)
      val (l, b) = xs.tail.foldLeft((xs.head, 0L)) { case ((l0, b0), x) =>
        val l1 = half(l0 + b0 + x)
        (l1, half(b0 + l1 - l0))
      }
      (t, xs.size.toLong, l, b, l + b)
    }
    assert(got == want)
    // the declining series must actually exercise the negative lane
    assert(want.find(_._1 == "down").get._4 < 0)
  }

  test("holtBacktest matches a Scala fold with error masses; single day NULLs") {
    val dayUs = 86400000000L
    def half(v: Long): Long = if (v >= 0) v / 2 else -((-v) / 2)
    val rows = Seq(
      ("down", 0L, 100.0), ("down", 1L, 90.0), ("down", 2L, 78.5),
      ("down", 3L, 40.0), ("down", 4L, 50.0),
      ("up", 0L, 1.0), ("up", 2L, 5.0), ("up", 5L, 20.0),
      ("one", 7L, 12.34))
    val df = rows.map { case (t, d, v) => (t, d * dayUs * 1000L, v) }
      .toDF("event_type", "ts", "value")
    val got = EventOps.holtBacktest(df)
      .as[(String, Long, Long, Long, Long, Long, Option[Long], Option[Long],
        Option[Long])].collect().sortBy(_._1).toSeq
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, es) =>
      val xs = es.sortBy(_._2).map(e => math.round(e._3 * 100))
      var (l, b) = (xs.head, 0L)
      var (sae, se, sax) = (0L, 0L, 0L)
      xs.tail.foreach { x =>
        val err = x - (l + b)
        sae += math.abs(err); se += err; sax += math.abs(x)
        val l1 = half(l + b + x); b = half(b + l1 - l); l = l1
      }
      val nEval = xs.size - 1L
      (t, xs.size.toLong, nEval, sae, se, sax,
        if (nEval == 0) None else Some(sae / nEval),
        if (nEval == 0) None
        else Some(if (se >= 0) se / nEval else -((-se) / nEval)),
        if (sax == 0) None else Some(sae * 1000 / sax))
    }
    assert(got == want)
    // single-day series: every per-eval metric is NULL, masses are zero
    assert(got.find(_._1 == "one").get
      == (("one", 1L, 0L, 0L, 0L, 0L, None, None, None)))
  }

  test("interarrival: metronome 0, planted CV2, zero-mass NULL, ties by id") {
    val s = 1000000000L // seconds -> nanos
    val rows = Seq(
      // metro/user 1: gaps 10,10,10 -> cv2 = 0
      ("metro", 1L, 1L, 0L), ("metro", 2L, 1L, 10L),
      ("metro", 3L, 1L, 20L), ("metro", 4L, 1L, 30L),
      // burst/user 2: ts tie broken by event_id -> gaps 0, 100
      ("burst", 5L, 2L, 0L), ("burst", 6L, 2L, 0L), ("burst", 7L, 2L, 100L),
      // zero/user 3: one gap of 0 -> sum 0 -> NULL cv2
      ("zero", 8L, 3L, 0L), ("zero", 9L, 3L, 0L),
      // singleton user contributes NO gap to metro
      ("metro", 10L, 4L, 500L))
    val df = rows.map { case (t, id, u, sec) => (t, id, u, sec * s) }
      .toDF("event_type", "event_id", "user_id", "ts")
    val got = EventOps.interarrival(df)
      .as[(String, Long, Long, Long, Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("metro") == (("metro", 3L, 30L, 10L, Some(0L))))
    // burst: n=2, sg=100, sg2=10000 -> ((2*10000-10000)*1000) div 10000
    assert(got("burst") == (("burst", 2L, 100L, 50L, Some(1000L))))
    assert(got("zero") == (("zero", 1L, 0L, 0L, None)))
  }

  test("conversionLatency: at-or-after semantics, ceil-rank percentiles") {
    val s = 1000000000L
    val rows = Seq(
      // user 1: view@10, purchase@70 -> 60 s
      (1L, "view", 10L), (1L, "purchase", 70L),
      // user 2: purchase@5 BEFORE first view@10 doesn't count; @250 does
      (2L, "purchase", 5L), (2L, "view", 10L), (2L, "purchase", 250L),
      // user 3: view only -> in denominator, not converted
      (3L, "view", 40L),
      // user 4: purchase only -> no view, excluded entirely
      (4L, "purchase", 99L))
    val df = rows.zipWithIndex.map { case ((u, t, sec), i) =>
      (i.toLong, u, t, sec * s) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = EventOps.conversionLatency(df)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    // latencies {60, 240}; n_from=3, n_conv=2 -> conv 666666 ppm;
    // ceil-ranks: p25/p50 -> 1st (60), p75/p90 -> 2nd (240)
    assert(got == ((3L, 2L, 666666L, 60L, 60L, 240L, 240L, 240L)))
  }

  test("covariateBalance: hand SMD and the zero-pooled-variance NULL") {
    // arms by user parity; every user has 2 events (n_events vars both 0
    // -> NULL); cents masses A {300, 300}, B {400, 100} -> SMD = 50/150
    val rows = Seq(
      (0L, 1.00), (0L, 2.00), (2L, 1.50), (2L, 1.50),   // arm A
      (1L, 2.00), (1L, 2.00), (3L, 0.50), (3L, 0.50))   // arm B
    val df = rows.zipWithIndex.map { case ((u, v), i) =>
      (i.toLong, u, i.toLong * 1000000000L, "purchase", v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventOps.covariateBalance(df)
      .as[(String, Long, Long, Long, Long, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("n_events", 2L, 2L, 4L, 4L, None),
      ("sum_cents", 2L, 2L, 600L, 500L, Some(333L))))
  }

  test("simpsonAudit: the classic reversal — A wins every stratum, loses pooled") {
    val day = 86400000000L * 1000L // nanos
    def ev(u: Long, d: Long, succ: Boolean, n: Int) =
      Seq.fill(n)((u, d * day, if (succ) 60.0 else 10.0))
    // Thu (dow 4): A 1/1 vs B 3/4; Fri (dow 5): A 2/8 vs B 1/6
    val rows = ev(0L, 0L, succ = true, 1) ++
      ev(1L, 0L, succ = true, 3) ++ ev(1L, 0L, succ = false, 1) ++
      ev(0L, 1L, succ = true, 2) ++ ev(0L, 1L, succ = false, 6) ++
      ev(1L, 1L, succ = true, 1) ++ ev(1L, 1L, succ = false, 5)
    val df = rows.zipWithIndex.map { case ((u, ts, v), i) =>
      (i.toLong, u, ts, "purchase", v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventOps.simpsonAudit(df)
      .as[(Long, Long, Long, Long, Long, Option[Long], Long, Boolean)]
      .collect().sortBy(_._1).toSeq
    // pooled: A 3/9 vs B 4/10 -> pooled_num = -6, ppm = -(6e6 div 90)
    assert(got == Seq(
      (4L, 1L, 1L, 4L, 3L, Some(250000L), -66666L, true),
      (5L, 8L, 2L, 6L, 1L, Some(83333L), -66666L, true)))
  }
}

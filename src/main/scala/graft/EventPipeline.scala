package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventOps, HeavyHitters, ProfileOps}

/** End-to-end event-analytics build — the behavioral-data analog of
  * [[CorpusPipeline]]: the event-stream operators the engine ships,
  * chained over ONE events read in the order a product-analytics job
  * runs them, each stage holding a CONSERVATION contract against the
  * intake instead of a monotonicity one (event analytics reshapes rows;
  * what must never change is the accounting):
  *
  *   intake (dedup by event_id, min-(ts,type,value) survivor) →
  *   CDC latest-wins user state → gap sessionization → signup→purchase
  *   funnel → A/B chi² readout → weekday seasonal profile → calibration
  *   curve → count-min frequency sketch.
  *
  * Contracts checked (each is an exact-integer equality, printed and
  * enforced):
  *   - sessions partition events: Σ per-session n == intake rows;
  *   - CDC snapshot keys == distinct users whose LAST event isn't a
  *     tombstone;
  *   - the A/B contingency cells sum to the intake rows, per type;
  *   - seasonal profile masses sum to the intake rows;
  *   - calibration bin masses sum to the intake rows and bins are
  *     exhaustive;
  *   - every count-min estimate ≥ its exact count (the one-sided bound).
  *
  * Usage: `sbt "runMain graft.EventPipeline [sfDir]"`; prints one line
  * per stage, exits nonzero on any broken contract. */
object EventPipeline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get("graft-event-pipeline")
    var failed = false
    def stage(name: String, detail: String, ok: Boolean): Unit = {
      println(f"[events] $name%-22s $detail ${if (ok) "OK" else "FAIL"}")
      if (!ok) failed = true
    }

    val raw = GraftSession.canonTs(spark.read.parquet(s"$dir/events.parquet"))
    // 1. intake: exactly-once by event_id with a deterministic survivor
    // (min (ts, event_type, value-cents) — the batch analog of streaming
    // first-arrival dedup, replay-stable like CorpusPipeline's min-id rule)
    val intake = raw
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_id")
          .orderBy(col("ts"), col("event_type"),
            round(col("value") * 100).cast("long"))))
      .filter(col("rn") === 1).drop("rn")
      .cache()
    val n = intake.count()
    stage("intake", f"rows=$n%-8d", n > 0)

    // 2. CDC latest-wins user state (q77 machinery: 'error' = tombstone)
    val feed = intake.select(col("user_id"), col("event_id").as("id"),
      EventOps.tsUs("ts").as("ts_us"),
      when(col("event_type") === "error", lit("d")).otherwise(lit("u")).as("op"),
      round(col("value") * 100).cast("long").as("state_cents"))
    val snap = EventOps.cdcSnapshot(feed, "user_id", "state_cents")
    val liveUsers = intake
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
    val (nSnap, nLive) = (snap.count(), liveUsers.count())
    stage("cdc_snapshot", f"users=$nSnap%-8d", nSnap == nLive)

    // the sessionize/funnel operators take the pre-shaped long form
    val shaped = intake.select(col("user_id"), col("event_id").as("id"),
      EventOps.tsUs("ts").as("ts_us"), col("event_type"), col("value"))

    // 3. gap sessionization (q65 machinery): sessions PARTITION events
    val sessions = EventOps.sessionize(
      shaped.select("user_id", "id", "ts_us", "value"),
      "user_id", gapUs = 30L * 60 * 1000000)
    val sessMass = sessions.agg(sum("n_events")).head.getLong(0)
    stage("sessions", f"sessions=${sessions.count()}%-7d mass=$sessMass%-8d",
      sessMass == n)

    // 4. ordered funnel (q69 machinery): first signup → later purchase
    val fun = EventOps.funnel(shaped, "user_id", "signup", "purchase")
    val nConv = fun.filter(col("converted") === 1).count()
    val nEntry = fun.count()
    stage("funnel", f"entered=$nEntry%-7d converted=$nConv%-7d", nConv <= nEntry)

    // 5. A/B readout (q177 machinery): cells must sum back to the intake
    val ab = EventOps.abTestReport(intake)
    val cellMass = ab.agg(sum(col("sa") + col("fa") + col("sb") + col("fb")))
      .head.getLong(0)
    stage("ab_report", f"types=${ab.count()}%-7d cell_mass=$cellMass%-8d",
      cellMass == n)

    // 6. weekday seasonal profile (q182 machinery): masses conserve
    val prof = EventOps.seasonalProfile(intake)
    val profMass = prof.agg(sum("n")).head.getLong(0)
    stage("seasonal", f"cells=${prof.count()}%-7d mass=$profMass%-8d",
      profMass == n)

    // 7. calibration deciles (q185 machinery): exhaustive, mass-conserving
    val cal = ProfileOps.calibrationBins(
      intake.select(round(col("value") * 100).cast("long").as("v_c"),
        (col("event_type") === "purchase").as("conv")), "v_c", "conv", nb = 10)
    val calMass = cal.agg(sum("n")).head.getLong(0)
    stage("calibration", f"bins=${cal.count()}%-7d mass=$calMass%-8d",
      calMass == n)

    // 8. count-min sketch (q183 machinery): one-sided bound on EVERY key
    val cms = HeavyHitters.countMin(intake, "user_id")
    val nViol = cms.filter(col("within_bound") === 0).count()
    stage("countmin", f"keys=${cms.count()}%-7d bound_violations=$nViol", nViol == 0)

    intake.unpersist()
    spark.stop()
    if (failed) sys.exit(1)
  }
}

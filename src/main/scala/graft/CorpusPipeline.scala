package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, TextOps}

/** End-to-end training-corpus build — the LLM-side analog of [[Pipeline]]:
  * every curation stage the engine ships, chained as ONE Spark job graph in
  * the order a production data build runs them:
  *
  *   intake (content dedup + token gate) → benchmark decontamination
  *   (8-gram collision) → MinHash-LSH near-dup drop (keep the smaller id
  *   of each verified pair) → repetition quality gate → per-domain cap →
  *   deterministic stratified mixture sampling → token-window chunking.
  *
  * Every operator here is individually oracle-checked (q30/q31, q56-q63);
  * this main demonstrates they COMPOSE — each stage consumes the previous
  * stage's survivors, and the chunker emits the final training segments.
  * Stage frames are cached so each stage computes exactly once, and the
  * dedup survivor rule is the deterministic min-doc_id (see stage 1).
  *
  * Usage: `sbt "runMain graft.CorpusPipeline [sfDir]"`. Prints one line
  * per stage with surviving row counts; exits nonzero if any stage ends
  * empty or any stage GROWS (each is a filter — growth means a join
  * fanned out, which would silently duplicate training data).
  */
object CorpusPipeline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get("graft-corpus-pipeline")

    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def stage(name: String, n: Long): Long = {
      println(f"[corpus] $name%-22s rows=$n"); counts(name) = n; n
    }

    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "source")
    val benchmark = all.filter(col("doc_id") % 5 === 0) // stand-in eval set
    val corpus = all.filter(col("doc_id") % 5 =!= 0)
    stage("corpus_in", corpus.count())

    // Every stage frame is cache()d before its count: each count is an
    // action, and uncached lineage would (a) recompute all earlier stages
    // per action — O(stages²) work — and (b) replay any nondeterministic
    // choice per action, so two actions could disagree about WHICH row
    // survived and trip the monotonicity contract below on phantoms.
    def cached(df: org.apache.spark.sql.DataFrame) = df.cache()

    // 1. intake: content dedup + minimum token count. DETERMINISTIC
    // min-doc_id survivor (q30/q47's rule), not dropDuplicates: batch
    // replays pick an arbitrary survivor per duplicate group, and every
    // later stage keys on the surviving doc_id (domain, sample bucket,
    // near-dup ids), so arbitrariness would cascade. The streaming twin
    // (StreamPipeline stage 4) keeps first-ARRIVAL instead — a real
    // ordering, just one batch replays don't have.
    val exactKeep = corpus
      .groupBy(md5(col("text")).as("h")).agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val intake = cached(corpus
      .join(exactKeep, Seq("doc_id"), "left_semi")
      .filter(size(TextOps.words(col("text"))) >= 20))
    stage("intake", intake.count())

    // 2. benchmark decontamination (8-gram collision, q62 machinery)
    val decon = cached(CorpusOps.decontaminate(intake, benchmark, n = 8))
    stage("decontaminated", decon.count())

    // 3. MinHash-LSH near-dup drop — the q47 policy via the shared helper
    // (keep the smallest id of each verified pair)
    val deduped = cached(decon.join(
      TextOps.nearDupDropIds(decon, "doc_id"), Seq("doc_id"), "left_anti"))
    stage("near_dedup", deduped.count())

    // 3b. CROSS-CHECK (not a stage): the cluster-level dedup policy
    // (q71 machinery — keep exactly one doc per connected near-dup
    // component) must be consistent with the pairwise keep-min rule just
    // applied: every component's canonical representative (its min id,
    // never the larger side of any pair) survives the pair rule too, so
    // the component representatives are a SUBSET of stage-3 survivors.
    // A violation means the two dedup policies disagree about who
    // survives — the swap-deduper-without-changing-survivors contract.
    locally {
      val sh = TextOps.shingleTable(decon, "doc_id").cache()
      val pairs = TextOps.jaccardVerify(
        TextOps.minhashCandidates(sh, "doc_id"), sh, "doc_id", 0.5)
      val reps = graft.operators.GraphOps
        .connectedComponents(pairs.select("id1", "id2"))
        .filter(col("id") === col("component"))
        .select(col("id").as("doc_id"))
      val nComps = reps.count()
      val escaped = reps.join(deduped, Seq("doc_id"), "left_anti").count()
      println(f"[corpus] component_check       comps=$nComps reps_outside_pair_survivors=$escaped")
      if (escaped != 0) { counts("component_check_FAILED") = 0 } // trips the empty-stage gate
      sh.unpersist()
    }

    // 4. repetition quality gate (q56 machinery) + character-entropy
    // floor (q110 machinery): drop boilerplate/spam and entropy-degenerate
    // text (repeated-char padding, binary-ish junk — natural prose sits
    // ~2.8-3.3 nats, the floor only fires on pathological docs)
    val rep = CorpusOps.repetitionStats(deduped)
      .filter(col("dup_2gram_ratio") <= 0.5 && col("top_tok_share") <= 0.5)
      .select("doc_id")
    val ent = TextOps.charEntropy(deduped)
      .filter(col("entropy_nat") >= 1.0).select("doc_id")
    val quality = cached(deduped.join(rep, Seq("doc_id"), "left_semi")
      .join(ent, Seq("doc_id"), "left_semi"))
    stage("quality", quality.count())

    // 5. per-domain frequency cap (q59 machinery; synthetic domain key)
    val capped = cached(CorpusOps.capPerDomain(
        quality.withColumn("domain", concat(lit("d"), (col("doc_id") % 37).cast("string"))),
        cap = 8)
      .drop("domain"))
    stage("domain_capped", capped.count())

    // 6. deterministic stratified mixture sampling (q57 machinery)
    val rates = Map("src0" -> 1.0, "src1" -> 1.0, "src2" -> 1.0, "src3" -> 1.0,
      "src4" -> 0.5, "src5" -> 0.5, "src6" -> 0.5, "src7" -> 0.5)
      .withDefaultValue(0.25)
    val allSources = capped.select("source").distinct()
      .collect().map(_.getString(0)) // tiny: one row per stratum
    val sampled = cached(CorpusOps.sampleByHash(capped,
      allSources.map(s => s -> rates(s)).toMap))
    stage("sampled", sampled.count())

    // 6b. CROSS-CHECK (not a stage): duplicated-span accounting (q93
    // machinery) over the survivors — after exact + near dedup, no doc
    // should remain MOSTLY duplicated text (>50% of its tokens under a
    // cross-doc repeated 8-gram). Catches the family of dups the
    // whole-document policies can't see: concatenations and long shared
    // boilerplate inside otherwise-distinct docs.
    locally {
      val masked = TextOps.dupSpanMask(sampled, "doc_id", n = 8, minDocs = 2)
        .filter(col("dup_tokens") * 2 > col("n_tokens"))
      val nMostlyDup = masked.count()
      println(f"[corpus] span_dup_check        mostly_dup_docs=$nMostlyDup")
      if (nMostlyDup != 0) { counts("span_dup_check_FAILED") = 0 } // trips the gate
    }

    // 7. token-window chunking: the final training segments (q63 machinery)
    val chunks = CorpusOps.chunkTokens(sampled, size = 32, stride = 16)
    val nChunks = chunks.count()
    println(f"[corpus] chunks                 rows=$nChunks")
    chunks.orderBy("doc_id", "chunk_idx").show(3, truncate = 60)

    // 8. tokenizer induction on the FINAL corpus (q97 machinery): the
    // merge table a downstream trainer would ship with these chunks. Runs
    // on the curated text — training a tokenizer on pre-dedup data skews
    // merges toward boilerplate (the order matters, which is why this is
    // the last stage).
    val merges = graft.operators.Bpe.merges(sampled, rounds = 6)
      .collect().sortBy(_.getInt(0))
    println(s"[corpus] bpe_merges             " + merges.map(r =>
      s"${r.getString(1)}+${r.getString(2)}(${r.getLong(3)})").mkString(" "))
    if (merges.length != 6) { counts("bpe_merges_FAILED") = 0 } // trips the gate

    // contract: every stage is a FILTER over the previous one — growth
    // means some join fanned out and duplicated training data
    val order = counts.toSeq
    val grew = order.sliding(2).collect {
      case Seq((a, na), (b, nb)) if nb > na => s"$a($na) -> $b($nb)"
    }.toSeq
    val empty = counts.collect { case (k, 0) => k } ++
      (if (nChunks == 0) Seq("chunks") else Nil)
    if (grew.nonEmpty) println(s"[corpus] STAGE GREW: ${grew.mkString("; ")}")
    if (empty.nonEmpty) println(s"[corpus] EMPTY stages: ${empty.mkString(", ")}")
    spark.stop()
    if (grew.nonEmpty || empty.nonEmpty) sys.exit(1)
  }
}

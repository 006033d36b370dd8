package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for the training-data pipeline, beyond the
  * dedup/similarity family in [[TextOps]]: repetition-based quality gates,
  * reproducible stratified sampling, PII scrubbing, and per-domain caps —
  * the remaining standard stages of a pretraining data build.
  *
  * Same design rules as TextOps: `org.apache.spark.sql.functions` only (no
  * UDFs), md5 for anything hashed (engine-portable, oracle-checkable),
  * exact integer ratios for every score, and no operation whose cost grows
  * faster than the corpus (every groupBy keys on document or (document,
  * token) — shuffle-friendly at 100 TB).
  */
object CorpusOps {

  /** Gopher-style repetition metrics per document: the fraction of word
    * 2-grams that are repeats (1 − distinct/total) and the share of the
    * most frequent token. High values mark boilerplate/spam for the
    * quality gate. Exact integer ratios; short docs (<2 words) get
    * zero-filled metrics, matching "nothing to repeat".
    *
    * Shape: the 2-gram ratio is per-row array math (no shuffle); the
    * top-token share is explode → count per (doc, token) → max per doc —
    * two partial-aggregated shuffles on (doc, token)/(doc), the
    * word-count pattern that scales linearly. */
  def repetitionStats(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val grams = docs
      .select(col(idCol), col(textCol), TextOps.words(col(textCol)).as("w"))
      .select(col(idCol), col(textCol), col("w"),
        when(size(col("w")) >= 2,
          transform(sequence(lit(1), size(col("w")) - 1),
            i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1))))
          .otherwise(array().cast("array<string>")).as("g2"))
      .select(col(idCol), col(textCol),
        size(col("w")).as("n_words"),
        size(col("g2")).as("n_2grams"),
        (size(col("g2")) - size(array_distinct(col("g2")))).as("n_dup_2grams"))
    val topShare = docs
      // explode_outer: words() is never empty, and plain explode's
      // inferred size-filter would re-evaluate the split in the scan
      .select(col(idCol), explode_outer(TextOps.words(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("n"))
      .groupBy(col(idCol)).agg(max(col("n")).as("top_tok_n"))
    grams.join(topShare, Seq(idCol), "left")
      .select(col(idCol),
        col("n_words"), col("n_2grams"), col("n_dup_2grams"),
        when(col("n_2grams") > 0, col("n_dup_2grams") / col("n_2grams"))
          .otherwise(lit(0.0)).as("dup_2gram_ratio"),
        when(col("n_words") > 0, coalesce(col("top_tok_n"), lit(0L)) / col("n_words"))
          .otherwise(lit(0.0)).as("top_tok_share"))
  }

  /** Deterministic stratified sampling — the mixture-weighting primitive:
    * keep a row iff md5(source ∥ ':' ∥ id) mod 10⁴ < rate(source)·10⁴.
    * Reproducible across engines/runs/partitionings (no RNG state), per-
    * stratum rates, and a pure map-side filter — the only way to sample
    * 100 TB without a shuffle. Unlisted strata default to rate 0. */
  def sampleByHash(docs: DataFrame, rates: Map[String, Double],
                   strataCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    val bucket = conv(substring(md5(
      concat(col(strataCol), lit(":"), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("long") % 10000
    // .round, not .toInt: truncation would bias any rate whose double
    // form sits fractionally below the bucket count (0.29 * 10000 =
    // 2899.999…95 → 2899 buckets = a silent 28.99% stratum)
    val threshold = rates.foldLeft(lit(0.0)) { case (rest, (s, r)) =>
      when(col(strataCol) === s, lit(math.round(r * 10000).toInt)).otherwise(rest)
    }
    docs.filter(bucket < threshold)
  }

  /** Weighted sampling without replacement via PRIORITY SAMPLING
    * (Duffield–Lund–Thorup, JACM '07): each row gets priority
    * qᵢ = wᵢ / uᵢ with uᵢ uniform on (0,1], and the k largest priorities
    * are the sample — inclusion probability ∝ weight, one scan, no
    * global state. uᵢ here is hash-derived ((h32+1)/2³², h32 from
    * md5(seed:id)), which keeps the draw DETERMINISTIC and the whole
    * computation in exact 64-bit integer math: qᵢ = wᵢ·2³² div (h32+1) —
    * bit-identical on any engine, no float division, re-runnable (the
    * corpus-pipeline property every sampling stage here shares, cf.
    * [[sampleByHash]] and [[shuffleShard]]).
    *
    * The top-k is `orderBy(...).limit(k)` ON PURPOSE: Spark plans it as
    * TakeOrderedAndProject — per-partition heaps, k rows shipped per
    * partition, NO global sort — so the 100 TB form is the same code. */
  def prioritySample(docs: DataFrame, k: Int, weightCol: String = "n_chars",
                     seed: String = "graft-ps", idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"bad k=$k")
    val h32 = conv(substring(md5(
      concat(lit(seed + ":"), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("long")
    docs
      .select(col(idCol), col(weightCol).cast("long").as("weight"),
        (h32 + 1L).as("u_num"))
      .select(col(idCol), col("weight"),
        expr("(weight * 4294967296) div u_num").as("priority"))
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }

  /** Per-group weighted top-k sampling: [[prioritySample]]'s
    * Duffield–Lund–Thorup draw, stratified — the k highest-priority rows
    * WITHIN each group (per-source corpus quotas, per-language caps).
    * The per-group top-k runs through the native `graft_top_k`
    * TypedImperativeAggregate, NOT a row_number window: the aggregate
    * ships ≤k (priority, id) pairs per group per partition (map-side
    * bounded partials), where the window would shuffle and sort every
    * row of every group. Same integer-exact priority as
    * [[prioritySample]], so the two sampling modes agree on what
    * "priority" means. Output: (group, rn, priority, id), rn 1..k
    * priority-descending, id ascending on ties. */
  def prioritySampleByGroup(docs: DataFrame, k: Int,
                            groupCol: String = "source",
                            weightCol: String = "n_chars",
                            seed: String = "graft-ps",
                            idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"bad k=$k")
    val h32 = conv(substring(md5(
      concat(lit(seed + ":"), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("long")
    docs
      .select(col(groupCol), col(idCol), col(weightCol).cast("long").as("weight"),
        (h32 + 1L).as("u_num"))
      .select(col(groupCol), col(idCol),
        expr("(weight * 4294967296) div u_num").as("priority"))
      .groupBy(col(groupCol))
      .agg(call_function("graft_top_k", col("priority"), col(idCol), lit(k)).as("top"))
      .select(col(groupCol), posexplode(col("top")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rn"),
        col("col.key").as("priority"), col("col.payload").as(idCol))
  }

  /** Mixture-rate planning: given a per-source char budget implied by a
    * target share, the per-source KEEP RATE (in ppm) that realizes it —
    * the step that turns "40% web, 30% code, …" into executable
    * [[sampleByHash]] rates. For source s with w_s available chars and
    * target want_s = T·share_s: rate_s = min(1, want_s/w_s) — a source
    * with less data than its target keeps everything (rate 10⁶); the
    * shortfall is reported (`deficit_chars`) rather than silently
    * redistributed, so the caller decides the reallocation policy.
    * All integer ppm arithmetic. One aggregate over sources + a
    * broadcast of the (tiny) share table. Output: (source, w_chars,
    * want_chars, rate_ppm, planned_chars, deficit_chars). */
  def mixtureRates(docs: DataFrame, shares: DataFrame, totalChars: Long,
                   sourceCol: String = "source",
                   weightCol: String = "n_chars"): DataFrame = {
    require(totalChars > 0, s"bad totalChars=$totalChars")
    val w = docs.groupBy(col(sourceCol))
      .agg(sum(col(weightCol).cast("long")).as("w_chars"))
    w.join(broadcast(shares.select(col(sourceCol), col("share_ppm"))), Seq(sourceCol))
      .withColumn("want_chars", expr(s"(${totalChars}L * share_ppm) div 1000000"))
      .withColumn("rate_ppm",
        least(lit(1000000L), expr("(want_chars * 1000000) div w_chars")))
      .withColumn("planned_chars", expr("(w_chars * rate_ppm) div 1000000"))
      .select(col(sourceCol), col("w_chars"), col("want_chars"), col("rate_ppm"),
        col("planned_chars"),
        greatest(lit(0L), col("want_chars") - col("w_chars")).as("deficit_chars"))
  }

  /** Per-source dataset card: the summary table a corpus release ships
    * with (and the sanity dashboard a pipeline watches) — doc and char
    * volumes, exact mean/median lengths, language spread, and each
    * source's share of the corpus in ppm. One pass: a single
    * partial-aggregated groupBy on source (median is exact over the
    * per-source length domain; swap percentile_approx at petabyte group
    * sizes, same shape), plus one broadcast of the 1-row corpus total.
    * All integers: mean and share use `div`; median of longs lands on
    * exactly-representable halves. */
  def datasetCard(docs: DataFrame, sourceCol: String = "source",
                  langCol: String = "lang", weightCol: String = "n_chars"): DataFrame = {
    val per = docs.groupBy(col(sourceCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(col(weightCol).cast("long")).as("sum_chars"),
      expr(s"sum(CAST($weightCol AS BIGINT)) div count(1)").as("mean_chars"),
      median(col(weightCol).cast("long")).as("median_chars"),
      countDistinct(col(langCol)).as("n_langs"))
    val tot = docs.agg(sum(col(weightCol).cast("long")).as("total_chars"))
    per.crossJoin(broadcast(tot))
      .select(col(sourceCol), col("n_docs"), col("sum_chars"), col("mean_chars"),
        col("median_chars"), col("n_langs"),
        expr("(sum_chars * 1000000) div total_chars").as("share_ppm"))
  }

  /** PII scrubbing: replace e-mail addresses, phone-shaped digit runs, and
    * 13-19-digit card-shaped runs with typed placeholder tokens, appending
    * a per-row replacement count for audit. Patterns stay in the regex
    * subset Java and RE2 agree on (character classes, bounded repeats — no
    * backrefs/lookaround), so the same scrub is expressible in any engine.
    * Per-row regex work: linear scan, no shuffle. */
  /** The PII patterns, shared with the SQL oracle mirror (single source of
    * truth; no `\\`-escape sequences so the strings embed verbatim in
    * single-quoted SQL literals). */
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val PhonePat = "[+]?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ]?[0-9]{0,4}"
  val CardPat = "[0-9]{13,19}"

  def scrubPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    def countMatches(c: Column, pat: String): Column =
      size(regexp_extract_all(c, lit(pat), lit(0)))
    // Count and replace SEQUENTIALLY (emails, then phones on the
    // email-scrubbed text, then cards): counting all three patterns on the
    // raw text would double-count overlaps (a phone- or card-shaped local
    // part inside an email address), making the audit count disagree with
    // the replacements actually performed.
    val afterEmail = regexp_replace(col(textCol), EmailPat, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, PhonePat, "<PHONE>")
    val afterCard = regexp_replace(afterPhone, CardPat, "<NUMBER>")
    val nPii = countMatches(col(textCol), EmailPat) +
      countMatches(afterEmail, PhonePat) + countMatches(afterPhone, CardPat)
    docs
      .withColumn("n_pii", nPii.cast("int"))
      .withColumn(textCol, afterCard)
  }

  /** Fixed-size token-window chunking with overlap — the packing step that
    * turns cleaned documents into training-ready segments. Window starts
    * every `stride` tokens; the final window keeps the (shorter) tail, but
    * a start whose PREVIOUS window already reached the end is dropped —
    * such a window is a strict suffix of its predecessor and would
    * double-weight document tails in the packed data. Only trailing starts
    * can be dropped, so chunk_idx = start/stride stays contiguous.
    * `stride` < `size` gives overlapping windows for context continuity.
    * Pure per-row array work (one posexplode, no shuffle).
    *
    * Output: (idCol, chunk_idx, chunk_text, n_tokens). */
  def chunkTokens(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", size: Int = 128, stride: Int = 64): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val n = org.apache.spark.sql.functions.size(col("w"))
    docs
      .select(col(idCol), TextOps.words(col(textCol)).as("w"))
      .select(col(idCol), posexplode(transform(
        filter(
          sequence(lit(0), n - 1, lit(stride)),
          // keep s iff its previous window (ending at s - stride + size)
          // did not already cover the whole document
          s => s === 0 || s + lit(size - stride) < n),
        s => struct(
          concat_ws(" ", slice(col("w"), s + 1, lit(size))).as("t"),
          // pure arithmetic — a second slice just to count would double
          // the per-window array-copy work (the measured HOF pitfall)
          least(lit(size), n - s).as("n")))))
      .select(col(idCol), col("pos").as("chunk_idx"),
        col("col.t").as("chunk_text"), col("col.n").cast("int").as("n_tokens"))
  }

  /** Line-level exact deduplication — the C4 §2.2 / RefinedWeb / CCNet
    * corpus stage that [[TextOps.dupSpanMask]]'s n-gram masking
    * generalizes but real pipelines still run first because it is an
    * order of magnitude cheaper: every line whose EXACT text occurs more
    * than once in the corpus (across documents or within one) survives
    * only at its first occurrence — smallest (doc, position) — and is
    * dropped everywhere else; documents are then reassembled from their
    * surviving lines in original order.
    *
    * The synthetic corpus has no newline structure, so the liner is a
    * parameter: `lineWords` groups each document's tokens into fixed
    * `lineWords`-word lines. The dedup plumbing — line explode, global
    * first-occurrence argmin, reassembly — is delimiter-agnostic; a real
    * corpus would feed `split(text, '\n')` lines instead.
    *
    * Shape at scale: one Generate (per-doc line windows, pure array
    * math), ONE shuffle partitioning on the line text for the
    * first-occurrence window (rn = 1 over (doc, pos) — partition sizes
    * are per-line occurrence counts, so even planet-scale boilerplate
    * lines stay bounded by their own frequency), and one per-doc
    * aggregate for reassembly. Partitioning carries the line text
    * itself, keeping the keep-rule EXACT; a 100 TB run would shuffle
    * md5(line) and accept the collision odds (the dupSpanMask trade,
    * documented there).
    *
    * Output: (idCol, n_lines, kept_lines, text_dedup) for every input
    * document — fully-deduplicated docs keep their row with kept_lines=0
    * and empty text so the drop accounting stays visible downstream. */
  def dedupLines(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", lineWords: Int = 20): DataFrame = {
    require(lineWords > 0, s"need lineWords > 0, got $lineWords")
    val n = org.apache.spark.sql.functions.size(col("w"))
    val lines = docs
      .select(col(idCol), TextOps.words(col(textCol)).as("w"))
      // guard the empty-words case: sequence(0, -1, step) counts DOWN
      // (the shinglesFromWords lesson); posexplode of the empty array
      // drops the doc here and the final left join restores its row
      .select(col(idCol), posexplode(
        when(n > 0, transform(
          sequence(lit(0), n - 1, lit(lineWords)),
          s => concat_ws(" ", slice(col("w"), s + 1, lit(lineWords)))))
          .otherwise(array().cast("array<string>"))))
      .select(col(idCol), col("pos"), col("col").as("line"))
    val wFirst = Window.partitionBy("line").orderBy(col(idCol), col("pos"))
    val agg = lines
      .withColumn("rn", row_number().over(wFirst))
      .filter(col("rn") === 1)
      .groupBy(idCol)
      .agg(count(lit(1)).as("kept_lines"),
        sort_array(collect_list(struct(col("pos"), col("line")))).as("ls"))
      // separate select: the transform lambda must see the bound `ls`
      // attribute, not the collect_list subtree (the HOF staging rule)
      .select(col(idCol), col("kept_lines"),
        concat_ws(" ", transform(col("ls"), p => p.getField("line"))).as("text_dedup"))
    docs
      .select(col(idCol),
        ((org.apache.spark.sql.functions.size(TextOps.words(col(textCol)))
          + lit(lineWords - 1)) cast "long").as("nw"))
      .select(col(idCol), expr(s"nw div $lineWords").as("n_lines"))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("kept_lines"), lit(0L)).as("kept_lines"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }

  /** Benchmark decontamination — the eval-leak gate: find corpus documents
    * sharing at least `minOverlap` distinct word `n`-gram shingles with any
    * benchmark document. An 8-gram collision is already near-certain
    * contamination (the standard n-gram decontamination rule), so no
    * similarity index is needed: candidates come from an equi-join on the
    * shingle STRING itself — one shuffle on the shingle, the benchmark
    * side is tiny relative to the corpus (broadcastable), and nothing is
    * all-pairs. Returns (idCol, n_overlap) for contaminated docs;
    * [[decontaminate]] anti-joins them away. */
  def contaminated(docs: DataFrame, benchmark: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", n: Int = 8, minOverlap: Int = 1): DataFrame = {
    // explode_outer, not explode: shingleTable guarantees non-empty
    // arrays (identical output), but plain explode makes
    // InferFiltersFromGenerate add a size(sh)>0 predicate that pushdown
    // re-embeds as a SECOND full shingle evaluation inside the scan
    // filter (observed in the q62 physical plan)
    val ds = TextOps.shingleTable(docs, idCol, n, textCol)
      .select(col(idCol), explode_outer(col("sh")).as("s"))
    val bs = TextOps.shingleTable(benchmark, idCol, n, textCol)
      .select(explode_outer(col("sh")).as("s")).distinct()
    ds.join(bs, Seq("s"))
      .groupBy(col(idCol))
      // plain count, not count_distinct: per-doc shingles are already
      // distinct (shinglesFromWords) and the benchmark side is distinct(),
      // so (doc, s) pairs are unique — a distinct aggregate would pay a
      // per-group dedup pass on the stage's largest intermediate for
      // nothing
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Corpus minus [[contaminated]] documents (left anti join). */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", n: Int = 8, minOverlap: Int = 1): DataFrame =
    docs.join(contaminated(docs, benchmark, idCol, textCol, n, minOverlap),
      Seq(idCol), "left_anti")

  /** Per-domain frequency cap — the anti-SEO-farm gate: keep at most
    * `cap` documents per domain, preferring by `orderCol` ascending with
    * the id as a deterministic tie-break. Partitioned window (one shuffle
    * on domain); domains far above the cap are exactly the skewed keys AQE
    * splits, and the rank is per-domain so no global sort exists. */
  def capPerDomain(docs: DataFrame, cap: Int, domainCol: String = "domain",
                   orderCol: String = "doc_id", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(domainCol)).orderBy(col(orderCol), col(idCol))
    docs.withColumn("domain_rank", row_number().over(w))
      .filter(col("domain_rank") <= cap)
      .drop("domain_rank")
  }

  /** Global-percentile quality gate — "keep the top (1−frac) of the corpus
    * by lexical diversity": drop every document whose distinct-token ratio
    * sits below the exact `frac` quantile of the whole corpus.
    *
    * The exact global percentile uses the reduce-then-window shape (same
    * as GraphOps.weightSanity): count documents per DISTINCT score first —
    * a distributed shuffle — then run the unavoidable global cumsum window
    * over the |distinct scores| reduced rows, bounded by the value domain
    * (ratios of small integers), not the corpus. The threshold broadcasts
    * back over the scored table; no data-sized single-partition step
    * exists. At 100 TB the approximate path is percentile_approx over the
    * same score — swap one line; the exact form is the oracle-checkable
    * contract. */
  def qualityPercentileGate(docs: DataFrame, frac: Double,
                            idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    require(frac > 0 && frac < 1, s"bad frac=$frac")
    val scored = TextOps.qualityMetrics(docs, textCol)
      .select(col(idCol), col("uniq_ratio"))
    val byVal = scored.groupBy("uniq_ratio").agg(count(lit(1)).as("cnt"))
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.orderBy("uniq_ratio")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thr = byVal.withColumn("cum", sum("cnt").over(wCum))
      .crossJoin(broadcast(byVal.agg(sum("cnt").as("total"))))
      .agg(min(when(col("cum") >= col("total") * frac, col("uniq_ratio"))).as("thr"))
    scored.crossJoin(broadcast(thr))
      .filter(col("uniq_ratio") >= col("thr"))
      .select(col(idCol), col("uniq_ratio"))
  }

  /** Deterministic training-order shuffle + balanced sharding: the final
    * stage of a corpus build, where documents must be (a) decorrelated
    * from their source/crawl order and (b) split into N equal-ish shards,
    * reproducibly — rerunning the pipeline must yield byte-identical
    * shards, so `rand()` is out.
    *
    * Every doc gets a 60-bit seeded hash (15 hex digits of
    * md5(seed:id) — positive, engine-portable); shard = hash mod
    * nShards, position within the shard = rank by (hash, id). One
    * shuffle on the shard key with per-shard windows — no global sort,
    * and shards stay balanced for any nShards ≪ corpus because the hash
    * is uniform. Emits (id, shard, pos). */
  def shuffleShard(docs: DataFrame, idCol: String = "doc_id",
                   seed: String = "graft", nShards: Int = 8): DataFrame = {
    require(nShards > 0, s"bad nShards=$nShards")
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(md5(
      concat(lit(seed), lit(":"), col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("long")
    val w = Window.partitionBy("shard").orderBy("h", idCol)
    docs.select(col(idCol), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(nShards)).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Training-sequence packing offsets — the pretraining "concat and
    * chunk" layout: documents are laid end to end in the deterministic
    * [[shuffleShard]] order and the stream is cut into fixed `capacity`-
    * token sequences, documents straddling cuts (the standard packing
    * that wastes zero pad tokens). This operator computes each document's
    * placement: its token span [start_tok, end_tok) within its shard and
    * the first/last sequence indices it lands in — the manifest a
    * writer needs to emit packed sequences, and the lineage map from any
    * training sequence back to its source documents.
    *
    * Shape: the shard/pos assignment is [[shuffleShard]] (hash shuffle +
    * per-shard windows); the offsets are ONE more cumulative-sum window
    * over the same per-shard sort — nothing global, shards are the unit
    * of parallelism exactly as they are at training time. */
  def packOffsets(docs: DataFrame, capacity: Int, idCol: String = "doc_id",
                  seed: String = "graft", nShards: Int = 8,
                  textCol: String = "text"): DataFrame = {
    require(capacity > 0, s"bad capacity=$capacity")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol),
      size(TextOps.words(col(textCol))).cast("long").as("n_tok"))
    val sharded = shuffleShard(docs, idCol, seed, nShards)
      .join(toks, Seq(idCol))
    val w = Window.partitionBy("shard").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("end_tok", sum(col("n_tok")).over(w))
      .withColumn("start_tok", col("end_tok") - col("n_tok"))
      .select(col(idCol), col("shard"), col("start_tok"), col("end_tok"),
        expr(s"start_tok div $capacity").as("first_seq"),
        expr(s"(end_tok - 1) div $capacity").as("last_seq"))
  }

  /** Canonical URL — the web-dedup join key: two crawls of one page must
    * collapse even when the fetch URLs differ by case, tracking params,
    * default ports, fragments, or trailing slashes. Pure column regex
    * (codegen'd, map-side, engine-portable):
    *
    *  1. drop the `#fragment`;
    *  2. drop tracking query params (`utm_*`, `fbclid`, `gclid`, `ref`);
    *  3. tidy a dangling `?`/`&` the removal leaves behind;
    *  4. lowercase scheme and host (path/query stay case-sensitive);
    *  5. drop an explicit default port (`:80`/`:443`);
    *  6. drop a trailing slash (empty path prints as `/`).
    *
    * Not a full RFC 3986 normalizer (no percent-decoding or param
    * re-ordering — both engine-portable but rarely worth the ambiguity);
    * the six rules above are the ones that fire on real crawl data. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val noTrack = regexp_replace(noFrag,
      "(?:utm_[a-zA-Z]+|fbclid|gclid|ref)=[^&]*&?", "")
    val tidy = regexp_replace(noTrack, "[?&]$", "")
    val scheme = lower(regexp_extract(tidy, "^([a-zA-Z][a-zA-Z0-9+.-]*)://.*", 1))
    val host = lower(regexp_extract(tidy, "^[^:]+://([^/?#]+).*", 1))
    val rest = regexp_extract(tidy, "^[^:]+://[^/?#]*(.*)", 1)
    val noPort = regexp_replace(host, ":(80|443)$", "")
    val restNorm = regexp_replace(rest, "^(.*[^/])/$", "$1")
    concat(scheme, lit("://"), noPort,
      when(restNorm === "" || restNorm === "/", lit("/")).otherwise(restNorm))
  }

  /** URL-level dedup: one row per [[canonicalUrl]] — the kept doc is the
    * min id (first-crawled wins under monotone ids) and `n_variants`
    * counts the collapsed fetches. One partial-aggregated shuffle on the
    * canonical string; at 100 TB this is the cheapest dedup tier, run
    * BEFORE any content hashing (it needs no text bytes at all). */
  def dedupByUrl(docs: DataFrame, urlCol: String = "url",
                 idCol: String = "doc_id"): DataFrame =
    docs.select(canonicalUrl(col(urlCol)).as("canon_url"), col(idCol))
      .groupBy("canon_url")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_variants"))

  /** Per-group EXACT token-length percentile report (p50/p90/p99) — the
    * corpus-composition dashboard: length distributions per language (or
    * source) drive chunk-size and mixture decisions, and their drift is
    * the standard data-quality alarm.
    *
    * Exact percentiles via the engine's reduce-then-window discipline:
    * count docs per DISTINCT (group, length) — partial-aggregated
    * shuffle — then cumulative-sum over the per-group length domain (a
    * PARTITIONED window, bounded by distinct lengths per group, not
    * docs) and pick the smallest length with cum·100 ≥ p·n (all-integer
    * rank percentile, no interpolation — cross-engine exact). */
  def lengthReport(docs: DataFrame, groupCol: String = "lang",
                   textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lens = docs.select(col(groupCol),
      size(TextOps.words(col(textCol))).cast("long").as("len"))
    val byLen = lens.groupBy(col(groupCol), col("len"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(groupCol).orderBy("len")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byLen
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(groupCol)))
      .groupBy(col(groupCol))
      .agg(max(col("n")).as("n_docs"),
        min(when(col("cum") * 100 >= col("n") * 50, col("len"))).as("p50_tok"),
        min(when(col("cum") * 100 >= col("n") * 90, col("len"))).as("p90_tok"),
        min(when(col("cum") * 100 >= col("n") * 99, col("len"))).as("p99_tok"))
  }

  /** [[contaminated]] with a BROADCAST BLOOM pre-filter — the 100 TB form
    * of decontamination. The exact join must eventually run, but at scale
    * the expensive part is shuffling every corpus n-gram; a Bloom filter
    * of the benchmark's grams (a few MB of bits for millions of grams vs
    * gigabytes of strings) prunes the corpus stream MAP-SIDE to the rare
    * suspects, so the exact verify join only sees a sliver. False
    * positives are killed by the verify join; Bloom filters have no false
    * negatives — the result is bit-identical to [[contaminated]] by
    * construction, which is exactly what the oracle checks. This is the
    * same plan shape Spark's own InjectRuntimeFilter produces for
    * selective joins, applied deliberately.
    *
    * Building the filter runs one small eager job over the BENCHMARK side
    * (tiny by the operator's premise — benchmarks are MBs, corpora TBs).
    * The `mightContain` probe is the one deliberate UDF in the engine:
    * Spark's BloomFilterMightContain expression is not public API, and a
    * broadcast bitset probe is cheap enough that codegen exclusion does
    * not matter on a stream the filter immediately decimates. */
  def contaminatedBloom(docs: DataFrame, benchmark: DataFrame,
                        idCol: String = "doc_id", textCol: String = "text",
                        n: Int = 8, minOverlap: Int = 1,
                        expectedGrams: Long = 1L << 20,
                        fpp: Double = 0.03): DataFrame = {
    val bs = TextOps.shingleTable(benchmark, idCol, n, textCol)
      .select(explode_outer(col("sh")).as("s")).distinct()
      .cache() // two consumers: the filter build and the verify join
    val bloom = bs.stat.bloomFilter("s", expectedGrams, fpp)
    val bc = docs.sparkSession.sparkContext.broadcast(bloom)
    val might = udf((s: String) => s != null && bc.value.mightContain(s))
    graft.Materialize.thenRelease(
      TextOps.shingleTable(docs, idCol, n, textCol)
        .select(col(idCol), explode_outer(col("sh")).as("s"))
        .filter(might(col("s")))
        .join(bs, Seq("s"))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_overlap"))
        .filter(col("n_overlap") >= minOverlap),
      bs)
  }

  /** Deterministic STRATIFIED train/val/test assignment — every stratum
    * contributes exactly its proportional share to each split, and the
    * assignment is a pure function of the id (re-runs, re-orders, and
    * re-partitions cannot move a document between splits): rows rank
    * within their stratum by md5("split:" ∥ id) — a fixed random-but-
    * deterministic order both engines compute identically — and the
    * exact integer rule r·1000 ≤ n_s·permille cuts the boundaries, so
    * |train| = ⌊0.8·n_s⌋ per stratum, no float, no global sort (one
    * window per stratum). The leakage-control counterpart to q187's
    * contamination report: the split is decided before any content is
    * looked at. */
  def stratifiedSplit(docs: DataFrame, strataCol: String = "source",
                      idCol: String = "doc_id",
                      trainPermille: Int = 800, valPermille: Int = 900): DataFrame = {
    require(0 < trainPermille && trainPermille <= valPermille && valPermille <= 1000)
    val w = Window.partitionBy(strataCol).orderBy("h", idCol)
    docs.select(col(strataCol), col(idCol),
        md5(concat_ws(":", lit("split"), col(idCol).cast("string"))).as("h"))
      .withColumn("r", row_number().over(w))
      .withColumn("n_s", count(lit(1)).over(Window.partitionBy(strataCol)))
      .select(col(strataCol), col(idCol),
        when(expr(s"r * 1000 <= n_s * $trainPermille"), "train")
          .when(expr(s"r * 1000 <= n_s * $valPermille"), "val")
          .otherwise("test").as("split"))
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document
    * by how much more likely its hashed-unigram features are under a
    * TARGET distribution than under the RAW pool, then keep the top-k —
    * the importance-weighting selector behind quality-targeted pretrain
    * mixes. All integer-exact:
    *
    *   bucket(w)  = md5(w) mod `buckets`      (the q299 hashing trick)
    *   λ(f)       = cost_raw(f) − cost_target(f), each cost the
    *                Laplace −ln((c_f+1)/(T+buckets)) rounded ONCE to
    *                integer micro-nats (the q213/q300 shared-libm
    *                device) — so λ > 0 means "target-like"
    *   score(doc) = Σ_f cnt_doc(f)·λ(f)       (pure integer sum)
    *
    * Target = the `targetPred` slice of the corpus itself (e.g. one
    * trusted language/source); raw = the whole pool. Output: the top-k
    * docs by (score DESC, doc_id) with their integer scores — a total
    * order, so the selection is deterministic in both engines.
    *
    * Shape: one token explode feeds the bucket reduce (≤ `buckets` rows,
    * broadcast back) and the per-doc score join; the only corpus-sized
    * shuffle is the per-doc aggregate, and top-k plans as
    * TakeOrderedAndProject — no global sort. */
  def dsirSelect(docs: DataFrame, targetPred: Column, k: Int = 20,
                 buckets: Int = 128, idCol: String = "doc_id",
                 langCol: String = "lang",
                 textCol: String = "text"): DataFrame = {
    require(k >= 1 && buckets >= 2, s"bad k=$k buckets=$buckets")
    import TextOps.microNatNeg
    val toks = docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        targetPred.as("is_target"),
        explode(TextOps.words(col(textCol))).as("tok"))
      .withColumn("f",
        (conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")
          % buckets).cast("int"))
    val perBucket = toks.groupBy("f")
      .agg(count(lit(1)).as("c_raw"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("c_tgt"))
    val totals = broadcast(perBucket
      .agg(sum("c_raw").as("t_raw"), sum("c_tgt").as("t_tgt")))
    val lambda = broadcast(perBucket.crossJoin(totals)
      .select(col("f"),
        (microNatNeg((col("c_raw") + 1).cast("double") /
            (col("t_raw") + buckets).cast("double"))
          - microNatNeg((col("c_tgt") + 1).cast("double") /
            (col("t_tgt") + buckets).cast("double"))).as("lambda")))
    toks.groupBy("doc_id", "lang", "f").agg(count(lit(1)).as("cnt"))
      .join(lambda, Seq("f"))
      .groupBy("doc_id", "lang")
      .agg(sum(col("cnt") * col("lambda")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** RENDEZVOUS (highest-random-weight) SHARDING audit — the
    * consistent-placement law (Thaler & Ravishankar 1996) behind
    * minimal-movement data distribution: each doc's owner under n
    * shards is argmax_s md5(doc:s), so growing n to n+1 moves EXACTLY
    * the docs whose new-shard key wins (expected 1/(n+1)) and nothing
    * else — the property that makes resharding a 100 TB corpus touch
    * ~1/(n+1) of it instead of (n-1)/n under mod-hashing. Emits per
    * NEW shard: the old and new populations and how many docs moved in;
    * every moved-in doc on a pre-existing shard would violate the HRW
    * invariant (the spec pins moved_in = 0 for s < nOld).
    *
    * Shape: one projection computes both owners per doc (an 11-element
    * in-row argmax, no explode), two shard-domain reduces, one tiny
    * full-outer join. */
  def rendezvousShards(docs: DataFrame, nOld: Int = 5, nNew: Int = 6,
                       idCol: String = "doc_id"): DataFrame = {
    require(2 <= nOld && nOld < nNew, s"bad nOld=$nOld nNew=$nNew")
    def owner(n: Int) = expr(
      s"""array_max(transform(sequence(0, ${n - 1}), s -> struct(
         |  CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':',
         |    CAST(s AS STRING))), 1, 15), 16, 10) AS BIGINT) AS k,
         |  s AS s))).s""".stripMargin)
    val o = docs.select(col(idCol).as("doc_id"))
      .select(col("doc_id"), owner(nOld).as("o_old"), owner(nNew).as("o_new"))
    val newAgg = o.groupBy(col("o_new").as("shard"))
      .agg(count(lit(1)).as("n_new"),
        sum(when(col("o_old") === col("o_new"), 0L).otherwise(1L))
          .as("moved_in"))
    val oldAgg = o.groupBy(col("o_old").as("shard"))
      .agg(count(lit(1)).as("n_old"))
    oldAgg.join(newAgg, Seq("shard"), "full")
      .select(col("shard"), coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("moved_in"), lit(0L)).as("moved_in"))
      .orderBy("shard")
  }

  /** Largest-remainder (Hamilton) apportionment: split exactly `seats`
    * sample slots across the key cells proportionally to their row
    * counts, with the conservation GUARANTEE Σalloc = seats — the exact
    * allocator a mixture plan (q168) needs when the budget is a hard
    * integer (a crawl quota, a token budget, a GPU-hour split) and
    * truncated per-cell shares would silently under-fill it.
    *
    * base = (cnt·seats) div total; the Σbase..seats shortfall (< #cells
    * by construction) goes to the cells with the largest remainders,
    * ties broken by the key order — all exact integers, one aggregation
    * to the cell domain plus two windows OVER that tiny domain (never
    * the rows). cnt·seats ≤ 10⁸·10⁶ stays far under 2⁶³. */
  /** Iterative proportional fitting / raking (Deming & Stephan 1940) —
    * reweight a panel's (row, col) cells so both marginal totals match a
    * target population's margins: the survey-weighting / dataset-
    * rebalancing primitive ("make the crawl's source×lang mix look like
    * the census"). Integer-exact and replayable: weights live in micro
    * units (10⁶ = 1.0) and each half-round applies
    * w ← (w · target_margin · 10⁶) div current_margin, where
    * current_margin = Σ cnt·w over the row (resp. column) — a windowed
    * sum over the CELL domain, never the rows; the w·target product runs
    * in a DECIMAL(38) lane (it passes 2⁶³ past ~10⁵-doc targets). The
    * truncating recurrence is mirrored half-round by half-round in the
    * oracle's unrolled CTEs. Output: one row per cell with the final
    * weight and its weighted micro-doc mass. */
  def ipfRake(panel: DataFrame, target: DataFrame, rowCol: String = "source",
              colCol: String = "lang", rounds: Int = 2): DataFrame = {
    require(rounds >= 1, s"bad rounds=$rounds")
    val cells = panel.groupBy(col(rowCol), col(colCol)).agg(count(lit(1)).as("cnt"))
    val tRow = target.groupBy(col(rowCol)).agg(count(lit(1)).as("t_row"))
    val tCol = target.groupBy(col(colCol)).agg(count(lit(1)).as("t_col"))
    val wRow = Window.partitionBy(rowCol)
    val wCol = Window.partitionBy(colCol)
    val init = cells.join(broadcast(tRow), Seq(rowCol))
      .join(broadcast(tCol), Seq(colCol))
      .withColumn("w", lit(1000000L))
    (1 to rounds).foldLeft(init) { (df, _) =>
      df.withColumn("cur", sum(col("cnt") * col("w")).over(wRow))
        .withColumn("w",
          expr("(CAST(w AS DECIMAL(38,0)) * t_row * 1000000) div cur"))
        .withColumn("cur", sum(col("cnt") * col("w")).over(wCol))
        .withColumn("w",
          expr("(CAST(w AS DECIMAL(38,0)) * t_col * 1000000) div cur"))
        .drop("cur")
    }
      .select(col(rowCol), col(colCol), col("cnt"), col("w").as("w_micro"),
        (col("cnt") * col("w")).as("mass_micro"))
  }

  /** Temperature-scaled mixture weighting (the mT5 §3.1 / XLM-R α-sampling
    * law, α = 1/2): a source's sampling mass is n_docs^α — the tail is
    * upsampled, the head damped — and a document budget is apportioned
    * across sources by those weights under largest-remainder conservation
    * (Σ alloc == budget EXACTLY, the q254 discipline). sqrt is the one
    * shared-libm call (IEEE-754 requires it correctly rounded, so JVM and
    * DuckDB agree bit-for-bit — stronger than the ln gates' shared-libm
    * assumption), floored ONCE to integer micro-weights; every division
    * after that is exact integer arithmetic in DECIMAL(38) lanes (the
    * round-8 width-audit precedent: the w·budget product would pass 2⁶³
    * near n_docs ≈ 10¹² × budget ≈ 10⁹). One reduce to the |sources|
    * domain; the windows run over that reduced domain. */
  def temperatureMixture(docs: DataFrame, budget: Long,
                         sourceCol: String = "source"): DataFrame = {
    require(budget > 0, s"bad budget=$budget")
    val wAll = Window.partitionBy(lit(1)) // |sources| domain, not rows
    val wRank = Window.orderBy(col("rem").desc, col(sourceCol))
    docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("w_micro",
        floor(sqrt(col("n_docs").cast("double")) * lit(1e6)).cast("long"))
      .withColumn("w_total",
        sum(col("w_micro").cast("decimal(38,0)")).over(wAll))
      .withColumn("share_ppm", expr(
        "CAST((CAST(w_micro AS DECIMAL(38,0)) * 1000000) div w_total AS BIGINT)"))
      .withColumn("base", expr(
        s"CAST((CAST(w_micro AS DECIMAL(38,0)) * ${budget}L) div w_total AS BIGINT)"))
      .withColumn("rem", expr(
        s"(CAST(w_micro AS DECIMAL(38,0)) * ${budget}L) % w_total"))
      .withColumn("shortfall", lit(budget) - sum("base").over(wAll))
      .withColumn("rk", row_number().over(wRank))
      .select(col(sourceCol), col("n_docs"), col("w_micro"), col("share_ppm"),
        (col("base") + when(col("rk") <= col("shortfall"), 1L).otherwise(0L))
          .cast("long").as("alloc"))
  }

  def apportion(rows: DataFrame, keyCols: Seq[String], seats: Long): DataFrame = {
    require(keyCols.nonEmpty && seats > 0, s"need keys and seats > 0")
    val cells = rows.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
    val wAll = Window.partitionBy(lit(1)) // cell domain, not row domain
    val wRank = Window.orderBy(col("rem").desc +: keyCols.map(col): _*)
    cells
      .withColumn("total", sum("cnt").over(wAll))
      .withColumn("base", expr(s"(cnt * ${seats}L) div total"))
      .withColumn("rem", expr(s"(cnt * ${seats}L) % total"))
      .withColumn("shortfall", lit(seats) - sum("base").over(wAll))
      .withColumn("rk", row_number().over(wRank))
      .select(keyCols.map(col) ++ Seq(col("cnt"), col("base"),
        (col("base") + when(col("rk") <= col("shortfall"), 1L).otherwise(0L))
          .as("alloc")): _*)
  }
}

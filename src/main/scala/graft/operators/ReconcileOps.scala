package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-copy table reconciliation — "are these two 100 TB tables the
  * same, and if not, WHICH keys differ" — the audit every replicated /
  * migrated / re-ingested dataset needs. The brute-force answer is a full
  * outer join of the two tables (the oracle runs exactly that); at scale
  * that shuffles both tables end to end just to confirm they are equal.
  *
  * This instead runs MERKLE-STYLE: each side folds locally to `nb`
  * (bucket, xor-of-row-fingerprints) summary rows — a map-side-combined
  * aggregate, NO cross-table shuffle, summaries small enough to collect —
  * and only buckets whose checksums disagree are re-read row-level, with
  * a bucket-membership filter that prunes the second pass to the
  * mismatched slice on both sides. Equal tables cost two scans and a
  * 2·nb-row compare; a 10-key drift costs two scans plus a joined re-read
  * of ~(10/nb)-th of the data.
  *
  * XOR is the right fold: commutative + associative (partition-order
  * free), and a single changed row flips the bucket checksum with
  * probability 1 − 2⁻⁶⁴ᵇⁱᵗˢ. Fingerprints are md5-derived 60-bit
  * integers over a caller-supplied CANONICAL row rendering — integers
  * and pinned-format strings only, never raw float casts, the same
  * engine-portability rule as every micro-unit column in this repo.
  */
object ReconcileOps {

  /** 60-bit row fingerprint from the canonical rendering (15 hex chars of
    * md5 keeps the value positive in a signed 64-bit lane on any engine). */
  def fingerprint(canonical: Column): Column =
    conv(substring(md5(canonical), 1, 15), 16, 10).cast("long")

  /** Keys whose rows differ between `a` and `b`, found bucket-first.
    * `canon` is an unresolved column expression rendering a row
    * canonically (string concat of key + payload fields, integers and
    * pinned formats only) — it resolves against either side. Output is
    * (key, status) with status ∈ missing_a | missing_b | changed. */
  def tableDiff(a: DataFrame, b: DataFrame, keyCol: String,
                canon: Column, nb: Int = 256): DataFrame = {
    require(nb > 0, s"bad bucket count $nb")
    def summarize(df: DataFrame): DataFrame = df
      .select(pmod(col(keyCol), lit(nb.toLong)).as("bucket"),
        fingerprint(canon).as("fp"))
      .groupBy("bucket")
      // bit_xor is Spark SQL's (and any engine's) xor-fold aggregate
      .agg(expr("bit_xor(fp)").as("sig"), count(lit(1)).as("n"))
    val bad = summarize(a).as("sa")
      .join(summarize(b).as("sb"), Seq("bucket"), "full")
      .filter(col("sa.sig").isNull || col("sb.sig").isNull ||
        col("sa.sig") =!= col("sb.sig") || col("sa.n") =!= col("sb.n"))
      .select(col("bucket"))
    // second pass: row-level compare, pruned to the disagreeing buckets
    // on BOTH sides before the join (broadcast of a ≤nb-row bucket list)
    def slice(df: DataFrame): DataFrame = df
      .select(col(keyCol).as("key"),
        pmod(col(keyCol), lit(nb.toLong)).as("bucket"),
        fingerprint(canon).as("fp"))
      .join(broadcast(bad), Seq("bucket"))
    slice(a).select(col("key"), col("fp").as("fp_a"))
      .join(slice(b).select(col("key"), col("fp").as("fp_b")), Seq("key"), "full")
      .select(col("key"),
        when(col("fp_b").isNull, lit("missing_b"))
          .when(col("fp_a").isNull, lit("missing_a"))
          .when(col("fp_a") =!= col("fp_b"), lit("changed")).as("status"))
      .filter(col("status").isNotNull)
  }
}

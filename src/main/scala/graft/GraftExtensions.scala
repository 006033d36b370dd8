package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.{BlocklistHits, CharStats, DamerauLevenshtein, DotQ, GramHashes, HaversineM, HilbertIndex, JaroWinkler, LshBands, MinhashSig, NormalizeText, Quantize, RewriteAggToSummary, RewriteApproxDistinct, RewriteDotProduct, RewriteJoinElimination, RewriteRadiusPredicate, RewriteRangeJoin, SanitizeKey, ShingleHashes, Shingles, TopK, WinnowHashes, WinnowMins}

/** Engine extension point (`spark.sql.extensions=graft.GraftExtensions`):
  * registers the engine's native expressions with the session's function
  * registry (callable from SQL and `call_function` alike) and the
  * optimizer rule that rewrites the declarative HOF dot-product idiom
  * into the native expression ([[graft.expressions.RewriteDotProduct]]),
  * so users get the codegen'd loop without knowing the engine function
  * exists. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot_q"),
      new ExpressionInfo(classOf[DotQ].getCanonicalName, "graft_dot_q"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_dot_q takes exactly 2 arguments")
        DotQ(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_sanitize_key"),
      new ExpressionInfo(classOf[SanitizeKey].getCanonicalName, "graft_sanitize_key"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "graft_sanitize_key takes exactly 1 argument")
        SanitizeKey(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_top_k"),
      new ExpressionInfo(classOf[TopK].getCanonicalName, "graft_top_k"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 3, "graft_top_k takes exactly 3 arguments (key, payload, k)")
        TopK(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(classOf[NormalizeText].getCanonicalName, "graft_normalize"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2,
          "graft_normalize takes exactly 2 arguments (str, form)")
        val form = children(1) match {
          case lit if lit.foldable && lit.dataType == org.apache.spark.sql.types.StringType =>
            val v = lit.eval()
            require(v != null, "graft_normalize form must be a non-null literal")
            v.toString
          case other =>
            throw new IllegalArgumentException(
              s"graft_normalize form must be a string literal, got $other")
        }
        NormalizeText(children.head, form)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getCanonicalName, "graft_jaro_winkler"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_jaro_winkler takes exactly 2 arguments")
        JaroWinkler(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_blocklist_hits"),
      new ExpressionInfo(classOf[BlocklistHits].getCanonicalName, "graft_blocklist_hits"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2,
          "graft_blocklist_hits takes exactly 2 arguments (text, terms)")
        BlocklistHits(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_hilbert"),
      new ExpressionInfo(classOf[HilbertIndex].getCanonicalName, "graft_hilbert"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_hilbert takes exactly 2 arguments (x, y)")
        HilbertIndex(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_damerau"),
      new ExpressionInfo(classOf[DamerauLevenshtein].getCanonicalName, "graft_damerau"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_damerau takes exactly 2 arguments")
        DamerauLevenshtein(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_haversine_m"),
      new ExpressionInfo(classOf[HaversineM].getCanonicalName, "graft_haversine_m"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 4,
          "graft_haversine_m takes exactly 4 arguments (lon1, lat1, lon2, lat2)")
        HaversineM(children.head, children(1), children(2), children(3))
      }))
    // The shingle -> minhash -> LSH native chain (TextOps hot path): each
    // takes its size parameter as a foldable int literal.
    def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
               what: String): Int = e match {
      case l if l.foldable && l.dataType == org.apache.spark.sql.types.IntegerType =>
        val v = l.eval()
        require(v != null, s"$what must be a non-null int literal")
        v.asInstanceOf[Int]
      case other =>
        throw new IllegalArgumentException(s"$what must be an int literal, got $other")
    }
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[Shingles].getCanonicalName, "graft_shingles"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_shingles takes exactly 2 arguments (words, n)")
        Shingles(children.head, intLit(children(1), "graft_shingles n"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getCanonicalName, "graft_shingle_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "graft_shingle_hashes takes exactly 1 argument")
        ShingleHashes(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getCanonicalName, "graft_minhash_sig"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_minhash_sig takes exactly 2 arguments (hs, k)")
        MinhashSig(children.head, intLit(children(1), "graft_minhash_sig k"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_bands"),
      new ExpressionInfo(classOf[LshBands].getCanonicalName, "graft_lsh_bands"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 3,
          "graft_lsh_bands takes exactly 3 arguments (sig, bands, rows)")
        LshBands(children.head, intLit(children(1), "graft_lsh_bands bands"),
          intLit(children(2), "graft_lsh_bands rows"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_char_stats"),
      new ExpressionInfo(classOf[CharStats].getCanonicalName, "graft_char_stats"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "graft_char_stats takes exactly 1 argument")
        CharStats(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow_hashes"),
      new ExpressionInfo(classOf[WinnowHashes].getCanonicalName, "graft_winnow_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_winnow_hashes takes exactly 2 arguments (words, n)")
        WinnowHashes(children.head, intLit(children(1), "graft_winnow_hashes n"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow_mins"),
      new ExpressionInfo(classOf[WinnowMins].getCanonicalName, "graft_winnow_mins"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_winnow_mins takes exactly 2 arguments (hs, win)")
        WinnowMins(children.head, intLit(children(1), "graft_winnow_mins win"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_quantize"),
      new ExpressionInfo(classOf[Quantize].getCanonicalName, "graft_quantize"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "graft_quantize takes exactly 1 argument")
        Quantize(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_gram_hashes"),
      new ExpressionInfo(classOf[GramHashes].getCanonicalName, "graft_gram_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_gram_hashes takes exactly 2 arguments (words, n)")
        GramHashes(children.head, intLit(children(1), "graft_gram_hashes n"))
      }))
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    ext.injectOptimizerRule(_ => RewriteRadiusPredicate)
    ext.injectOptimizerRule(_ => RewriteRangeJoin)
    ext.injectOptimizerRule(s => new RewriteAggToSummary(s))
    ext.injectOptimizerRule(_ => RewriteJoinElimination)
    ext.injectOptimizerRule(_ => RewriteApproxDistinct)
  }
}

package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern blocklist matching via a plan-time-compiled Aho-Corasick
  * automaton — the C4-style bad-words / contamination-markers filter every
  * web-corpus pipeline runs over EVERY document. Returns the sorted
  * distinct blocklist terms occurring in the text (substring semantics,
  * the `contains` contract).
  *
  * Why a native expression: the declarative spelling
  * `filter(terms, t -> contains(text, t))` scans the text once PER TERM —
  * O(len·m) with interpreted lambdas — and real blocklists have hundreds
  * of terms. Aho-Corasick walks the text ONCE whatever the term count
  * (O(len + hits)): the automaton (trie + BFS failure links) is built
  * once at plan time from the foldable term array and shipped as a
  * codegen reference object, so per-row work is a single automaton walk
  * inside whole-stage codegen.
  *
  * The term list must be a foldable non-null array of non-empty strings
  * (a literal blocklist — enforced at construction). Matching is
  * case-sensitive over UTF-16 chars; DuckDB's
  * `list_sort(list_distinct(list_filter(terms, t -> contains(text, t))))`
  * is the oracle-exact mirror (ASCII terms sort identically).
  */
case class BlocklistHits(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_blocklist_hits text must be STRING, got ${left.dataType}")
    else if (!right.foldable || !right.dataType.isInstanceOf[ArrayType] ||
      right.dataType.asInstanceOf[ArrayType].elementType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_blocklist_hits terms must be a literal ARRAY<STRING>")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_blocklist_hits"

  @transient private lazy val terms: Array[String] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    require(arr != null, "graft_blocklist_hits terms must not be null")
    val out = Array.tabulate(arr.numElements()) { i =>
      require(!arr.isNullAt(i), "graft_blocklist_hits terms must not contain nulls")
      arr.getUTF8String(i).toString
    }
    require(out.forall(_.nonEmpty), "graft_blocklist_hits terms must be non-empty")
    out
  }

  @transient private lazy val automaton = BlocklistHits.build(terms)

  /** The codegen entry point: one automaton walk, sorted distinct hits. */
  def run(text: UTF8String): ArrayData = {
    val hits = automaton.matchedTerms(text.toString)
    new GenericArrayData(hits.map(UTF8String.fromString(_)).toArray[Any])
  }

  override protected def nullSafeEval(t: Any, ts: Any): Any =
    run(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("blocklist", this, classOf[BlocklistHits].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $ref.run($t);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BlocklistHits =
    copy(left = newLeft, right = newRight)
}

object BlocklistHits {
  /** Classic Aho-Corasick: goto trie + BFS failure links + merged output
    * sets. Built once per (plan, term set); Serializable so the codegen
    * reference object ships to executors. */
  final class Automaton(gotoMap: Array[Map[Char, Int]], fail: Array[Int],
                        out: Array[List[Int]], terms: Array[String])
    extends Serializable {

    /** Sorted distinct matched terms of one text in O(len + hits). */
    def matchedTerms(text: String): IndexedSeq[String] = {
      val seen = new java.util.BitSet(terms.length)
      var state = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (state != 0 && !gotoMap(state).contains(c)) state = fail(state)
        state = gotoMap(state).getOrElse(c, 0)
        var o = out(state)
        while (o.nonEmpty) { seen.set(o.head); o = o.tail }
        i += 1
      }
      (0 until terms.length).filter(seen.get).map(terms).distinct.sorted
    }
  }

  def build(terms: Array[String]): Automaton = {
    val gotoBuf = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val outBuf = mutable.ArrayBuffer(List.empty[Int])
    terms.zipWithIndex.foreach { case (t, ti) =>
      var state = 0
      t.foreach { c =>
        state = gotoBuf(state).getOrElseUpdate(c, {
          gotoBuf += mutable.Map.empty[Char, Int]
          outBuf += Nil
          gotoBuf.length - 1
        })
      }
      outBuf(state) ::= ti
    }
    val n = gotoBuf.length
    val fail = new Array[Int](n)
    val queue = mutable.Queue.empty[Int]
    gotoBuf(0).values.foreach(queue.enqueue)
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      gotoBuf(s).foreach { case (c, nxt) =>
        queue.enqueue(nxt)
        var f = fail(s)
        while (f != 0 && !gotoBuf(f).contains(c)) f = fail(f)
        fail(nxt) = if (nxt != gotoBuf(f).getOrElse(c, 0)) gotoBuf(f).getOrElse(c, 0) else 0
        outBuf(nxt) = outBuf(nxt) ++ outBuf(fail(nxt))
      }
    }
    new Automaton(gotoBuf.map(_.toMap).toArray, fail, outBuf.toArray, terms)
  }
}

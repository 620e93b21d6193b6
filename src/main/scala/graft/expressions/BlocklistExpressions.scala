package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matcher: ONE O(len) scan per document counts
  * the occurrences of EVERY pattern simultaneously.
  *
  * The naive blocklist-audit shape is documents × patterns with a
  * contains/replace scan per pair — O(patterns) passes over the corpus.
  * Fine for the oracle twin's couple dozen phrases in DuckDB; catastrophic
  * for a production blocklist (NSFW/PII/contamination phrase lists run
  * 10k–1M entries). The automaton makes the corpus pass independent of
  * pattern count: the goto table is precomputed per-node so matching is
  * one array lookup per character with NO fail-chasing, and output links
  * are collapsed at build time so patterns ending inside other patterns
  * ("can" inside "scan") are still counted at every position.
  *
  * Counting contract: ALL occurrences of each pattern, independently per
  * pattern. Construction REJECTS bordered patterns (a proper prefix equal
  * to a suffix, e.g. "table t" or "abxab"): border-free patterns cannot
  * self-overlap, so all-occurrences == leftmost-non-overlapping — exactly
  * what the oracle's replace-trick `(len(s)-len(replace(s,p,'')))/len(p)`
  * measures. That keeps the DuckDB twin linear in corpus size at any SF.
  */
final class AcAutomaton(val patterns: IndexedSeq[String]) extends Serializable {
  require(patterns.nonEmpty, "empty blocklist")
  patterns.foreach { p =>
    require(p.nonEmpty, "empty pattern")
    require(p.forall(_ < 128), s"pattern '$p' must be ASCII (dense goto table)")
    require(!AcAutomaton.hasBorder(p),
      s"pattern '$p' is bordered (a proper prefix equals a suffix): " +
        "occurrences could self-overlap and the replace-trick oracle would undercount")
  }

  private final class Built(val gotoTab: Array[Array[Int]], val outTab: Array[Array[Int]])

  // built lazily (and rebuilt after deserialization — the build is a few
  // hundred nodes for realistic lists, microseconds)
  @transient private lazy val built: Built = {
    val next = scala.collection.mutable.ArrayBuffer(Array.fill(128)(-1))
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var u = 0
      p.foreach { ch =>
        val c = ch.toInt
        if (next(u)(c) == -1) {
          next(u)(c) = next.length
          next += Array.fill(128)(-1)
          ends += Nil
        }
        u = next(u)(c)
      }
      ends(u) ::= pid
    }
    val n = next.length
    val fail = new Array[Int](n)
    val out = new Array[List[Int]](n)
    var i = 0
    while (i < n) { out(i) = ends(i); i += 1 }
    val queue = scala.collection.mutable.Queue.empty[Int]
    var c = 0
    while (c < 128) {
      val v = next(0)(c)
      if (v == -1) next(0)(c) = 0
      else { fail(v) = 0; queue += v }
      c += 1
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      var c = 0
      while (c < 128) {
        val v = next(u)(c)
        if (v == -1) next(u)(c) = next(fail(u))(c)
        else {
          fail(v) = next(fail(u))(c)
          // collapse the output chain: every pattern ending at the fail
          // target also ends here (suffix-of-suffix)
          out(v) = out(v) ++ out(fail(v))
          queue += v
        }
        c += 1
      }
    }
    new Built(next.toArray, out.map(_.toArray))
  }

  def nPatterns: Int = patterns.length

  /** Per-pattern occurrence counts in one pass. Allocates the small
    * counts array per call (pattern count × 4 bytes — dwarfed by the
    * document scan) so the automaton is safely shared across tasks.
    */
  def counts(text: String): Array[Int] = {
    val cnt = new Array[Int](patterns.length)
    val g = built.gotoTab
    val o = built.outTab
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val ch = text.charAt(i).toInt
      // no pattern contains a non-ASCII char, so such a char can only
      // reset the match state to root — exactly AC's fail-to-root
      state = if (ch < 128) g(state)(ch) else 0
      val outs = o(state)
      var j = 0
      while (j < outs.length) { cnt(outs(j)) += 1; j += 1 }
      i += 1
    }
    cnt
  }

  /** (total occurrences across patterns, number of distinct patterns hit). */
  def stats(text: String): (Long, Int) = {
    val cnt = counts(text)
    var hits = 0L
    var pats = 0
    var i = 0
    while (i < cnt.length) {
      hits += cnt(i)
      if (cnt(i) > 0) pats += 1
      i += 1
    }
    (hits, pats)
  }
}

object AcAutomaton {
  /** A border is a PROPER prefix that is also a suffix ("abxab" → "ab"). */
  def hasBorder(p: String): Boolean =
    (1 until p.length).exists(k => p.regionMatches(0, p, p.length - k, k))
}

/** `blocklist_stats(text)` → struct<n_hits: long, n_pats: int> — total
  * pattern occurrences and distinct patterns hit, via one AC scan.
  *
  * Patterns ride as an IndexedSeq (never Array) so case-class
  * equals/hashCode stay semantic — Catalyst canonicalization, common
  * subexpression elimination and exchange reuse all keep working.
  */
case class BlocklistStats(child: Expression, patterns: IndexedSeq[String])
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = StructType(Seq(
    StructField("n_hits", LongType, nullable = false),
    StructField("n_pats", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected STRING, got $other")
  }

  @transient private lazy val automaton = new AcAutomaton(patterns)

  override def nullSafeEval(input: Any): Any = {
    val (hits, pats) = automaton.stats(input.asInstanceOf[UTF8String].toString)
    new GenericInternalRow(Array[Any](hits, pats))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BlocklistExpressions {
  def blocklistStats(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(
      BlocklistStats(ColumnBridge.expression(text), patterns.toIndexedSeq))
}

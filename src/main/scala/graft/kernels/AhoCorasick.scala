package graft.kernels

import scala.collection.mutable

/** Aho–Corasick multi-pattern matcher (Aho & Corasick 1975, CACM 18(6):
  * the classic goto / failure / output construction). One automaton per
  * pattern set; `countAll` walks the text ONCE and returns the number of
  * occurrences of every pattern — ALL occurrences, including ones that
  * overlap each other, overlap other patterns, or nest (a pattern that is
  * a substring of another is reported at every end position via the
  * merged output sets).
  *
  * Scale shape: the automaton is built once from the blocklist (a model
  * artifact of a few thousand phrases) and held in a singleton, so each
  * executor JVM constructs it exactly once at classload; matching is
  * O(|text| + matches) per document INDEPENDENT of the pattern count —
  * the property that makes phrase-blocklist gating affordable over a
  * 10^12-document corpus, where P per-pattern scans (`contains`/`replace`
  * per phrase) would cost P full passes over every byte.
  *
  * Reference scope note: the reference service has no corpus-level
  * gating at all (it processes one uploaded document per request); this
  * is part of the training-data tier the Spark engine adds.
  */
final class AhoCorasick(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty strings")

  // --- build: trie (goto), then BFS failure links with merged outputs.
  // Children maps stay per-node hash maps: blocklists are char-sparse
  // (natural-language phrases), so a dense 64k transition table per node
  // would waste memory for no measurable walk speedup at phrase counts.
  private val children = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
  private val outBuf = mutable.ArrayBuffer(List.empty[Int])

  patterns.zipWithIndex.foreach { case (p, idx) =>
    var node = 0
    p.foreach { c =>
      node = children(node).getOrElseUpdate(c, {
        children += mutable.Map.empty[Char, Int]
        outBuf += Nil
        children.size - 1
      })
    }
    outBuf(node) = idx :: outBuf(node)
  }

  private val fail = new Array[Int](children.size)
  // out(v) = pattern ids ending at v, including every pattern that is a
  // proper suffix of v's path (merged from the failure chain during BFS,
  // so the walk never has to chase failure links to report matches).
  private val out: Array[Array[Int]] = {
    val queue = mutable.Queue.empty[Int]
    children(0).valuesIterator.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(v) = if (children(f).contains(c) && children(f)(c) != v)
          children(f)(c) else 0
        outBuf(v) = outBuf(v) ::: outBuf(fail(v))
        queue += v
      }
    }
    outBuf.map(_.toArray).toArray
  }

  /** Occurrence count per pattern (index-aligned with `patterns`),
    * counting every occurrence — overlapping and nested included.
    */
  def countAll(text: CharSequence): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    var node = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      while (node != 0 && !children(node).contains(c)) node = fail(node)
      node = children(node).getOrElse(c, 0)
      val hits = out(node)
      var j = 0
      while (j < hits.length) { counts(hits(j)) += 1L; j += 1 }
      i += 1
    }
    counts
  }
}

package graft.analysis

/** Aho-Corasick multi-pattern substring counter with per-pattern
  * NON-OVERLAPPING counts — Python `str.count` semantics for every lexicon
  * term in ONE pass over the text.
  *
  * The reference scores sentiment with |lexicon| separate substring scans
  * per document (sentiment.py:94-130 — 453 `count()` calls); SURVEY §2.8
  * names the automaton as the optimization that must keep the count
  * semantics identical. Equivalence of the counting rule: `str.count`
  * takes occurrences greedily left-to-right, restarting after each match's
  * end; the automaton emits every occurrence in increasing end position,
  * and accepting a match iff its start is past the same pattern's last
  * accepted end picks exactly the same greedy set (matches of one pattern
  * all have one length, so increasing end = increasing start). Pinned
  * against the naive scorer by a ScalaCheck property (AhoCorasickProps).
  *
  * Patterns carry group ids (e.g. 0 = positive, 1 = negative) so one
  * automaton pass yields both lexicon sums; a term present in several
  * groups increments each (= the reference's independent scans, which
  * would each count it).
  *
  * Layout: the trie is frozen after construction into CSR arrays (sorted
  * transition chars per node, binary-searched) plus a direct-mapped
  * 64K-entry root table — the matcher does no hashing and no allocation
  * beyond two small per-call arrays. Build is O(Σ|pattern| log fanout);
  * the frozen automaton is immutable, thread-safe, and built once per
  * executor JVM when captured in a UDF closure.
  */
final class AhoCorasick private (patterns: Array[String],
    groupsOf: Array[Array[Int]], val nGroups: Int) extends Serializable {

  private val patLen: Array[Int] = patterns.map(_.length)

  // frozen transition structure (filled by the constructor block below):
  // CSR per-node sorted (char, target) pairs + root fast path
  private var csrStart: Array[Int] = _
  private var csrChar: Array[Char] = _
  private var csrTarget: Array[Int] = _
  private var rootTable: Array[Int] = _ // char → root transition (0 = none)
  private var fail: Array[Int] = _
  private var dict: Array[Int] = _ // node → nearest pattern-terminal suffix (-1 none)
  private var patAt: Array[Int] = _ // node → pattern idx (-1 none)

  locally {
    // --- build the trie with growable maps
    val gotoMaps = scala.collection.mutable.ArrayBuffer(
      new scala.collection.mutable.LongMap[Int]())
    val patAtB = scala.collection.mutable.ArrayBuffer(-1)
    var p = 0
    while (p < patterns.length) {
      val s = patterns(p)
      var node = 0
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i).toLong
        node = gotoMaps(node).getOrElse(c, {
          gotoMaps += new scala.collection.mutable.LongMap[Int]()
          patAtB += -1
          val next = gotoMaps.length - 1
          gotoMaps(node)(c) = next
          next
        })
        i += 1
      }
      patAtB(node) = p // patterns are pre-deduped: one terminal per node
      p += 1
    }
    val n = gotoMaps.length
    patAt = patAtB.toArray
    // --- BFS fail + dictionary links
    fail = new Array[Int](n)
    dict = Array.fill(n)(-1)
    val queue = new java.util.ArrayDeque[Integer]()
    gotoMaps(0).foreach { case (_, child) => fail(child) = 0; queue.add(child) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      dict(u) = if (patAt(fail(u)) >= 0) fail(u) else dict(fail(u))
      gotoMaps(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !gotoMaps(f).contains(c)) f = fail(f)
        fail(v) = gotoMaps(f).getOrElse(c, 0)
        queue.add(v)
      }
    }
    // --- freeze to CSR + root table
    csrStart = new Array[Int](n + 1)
    var total = 0
    var u = 0
    while (u < n) { csrStart(u) = total; total += gotoMaps(u).size; u += 1 }
    csrStart(n) = total
    csrChar = new Array[Char](total)
    csrTarget = new Array[Int](total)
    u = 0
    while (u < n) {
      val sorted = gotoMaps(u).toArray.sortBy(_._1)
      var j = 0
      while (j < sorted.length) {
        csrChar(csrStart(u) + j) = sorted(j)._1.toChar
        csrTarget(csrStart(u) + j) = sorted(j)._2
        j += 1
      }
      u += 1
    }
    rootTable = new Array[Int](65536)
    gotoMaps(0).foreach { case (c, v) => rootTable(c.toInt) = v }
  }

  /** Binary search node u's sorted transitions for c; -1 if absent. */
  @inline private def step(u: Int, c: Char): Int = {
    var lo = csrStart(u)
    var hi = csrStart(u + 1) - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mc = csrChar(mid)
      if (mc == c) return csrTarget(mid)
      else if (mc < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** Per-thread scratch for the non-overlap bookkeeping: epoch-stamped so
    * no O(|patterns|) clear is paid per document (a stamp older than the
    * current call means "no match yet"). Executor task threads reuse it
    * across rows; @transient — rebuilt lazily after deserialization.
    */
  private final class Scratch(n: Int) {
    val lastEnd = new Array[Int](n)
    val stamp = new Array[Long](n) // 0 = never used; epochs start at 1
    var epoch = 0L
  }
  @transient private lazy val scratch: ThreadLocal[Scratch] =
    ThreadLocal.withInitial(() => new Scratch(patterns.length))

  /** Per-group sums of non-overlapping per-pattern occurrence counts. */
  def groupCounts(text: String): Array[Int] = {
    val out = new Array[Int](nGroups)
    if (text == null || text.isEmpty || patterns.isEmpty) return out
    val s = scratch.get()
    s.epoch += 1
    val epoch = s.epoch
    val lastEnd = s.lastEnd
    val stamp = s.stamp
    var node = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var nxt = if (node == 0) rootTable(c) else step(node, c)
      while (node != 0 && nxt < 0) {
        node = fail(node)
        nxt = if (node == 0) rootTable(c) else step(node, c)
      }
      node = if (nxt < 0) 0 else nxt
      // emit every pattern ending at i via the dictionary chain
      var t = if (patAt(node) >= 0) node else dict(node)
      while (t >= 0) {
        val p = patAt(t)
        val start = i - patLen(p) + 1
        if (stamp(p) != epoch || start > lastEnd(p)) {
          val gs = groupsOf(p)
          var j = 0
          while (j < gs.length) { out(gs(j)) += 1; j += 1 }
          lastEnd(p) = i
          stamp(p) = epoch
        }
        t = dict(t)
      }
      i += 1
    }
    out
  }

  /** Total non-overlapping count across all patterns (one-group sum). */
  def totalCount(text: String): Int = groupCounts(text).sum
}

object AhoCorasick {
  /** One-group automaton over a pattern set. */
  def apply(patterns: Iterable[String]): AhoCorasick = build(Seq(patterns))

  /** Two-group automaton (group 0 / group 1) — one pass scores both
    * lexicons.
    */
  def twoGroups(g0: Iterable[String], g1: Iterable[String]): AhoCorasick =
    build(Seq(g0, g1))

  /** N-group automaton; duplicate terms across groups share one trie
    * terminal and increment every group they belong to.
    */
  def build(groups: Seq[Iterable[String]]): AhoCorasick = {
    val byPattern = scala.collection.mutable.LinkedHashMap.empty[String, List[Int]]
    groups.zipWithIndex.foreach { case (g, gi) =>
      g.iterator.filter(_.nonEmpty).toSeq.distinct.foreach { t =>
        byPattern(t) = gi :: byPattern.getOrElse(t, Nil)
      }
    }
    val pats = byPattern.keys.toArray
    val gs = pats.map(p => byPattern(p).reverse.toArray)
    new AhoCorasick(pats, gs, groups.length)
  }
}

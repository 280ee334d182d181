package graft

import graft.analysis.{Issues, Keywords, Relevance, Sentiment}
import graft.core.{CrawlConfig, SeedRecord, UrlCanon}
import graft.fetch.{FetchResponse, Fetcher, HostClock, ScriptedAdapter, SearchManager}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** ScalaCheck port of the reference's Hypothesis property suites
  * (/root/reference/tests/test_*_property.py) — ≥100 generated cases per
  * property (ScalaCheck default), shrinking on failure. Each object
  * mirrors one reference property file; pure-JVM (no SparkSession), like
  * the reference tests exercise the pure algorithm layer.
  */
object Gens {
  val word: Gen[String] = Gen.oneOf(
    Gen.alphaLowerStr.map(_.take(8)).suchThat(_.nonEmpty),
    Gen.oneOf("버그", "좋다", "최악", "게임", "서버", "패치", "업데이트", "렉",
      "점검", "쓰레기", "갓겜", "노잼", "이벤트", "보스"))
  val text: Gen[String] = Gen.listOf(word).map(_.mkString(" "))
  val nonEmptyText: Gen[String] = Gen.nonEmptyListOf(word).map(_.mkString(" "))
  val keywords: Gen[List[String]] = Gen.nonEmptyListOf(word).map(_.take(5))
  val urlish: Gen[String] = for {
    host <- Gen.oneOf(graft.fixtures.Fixtures.Hosts)
    scheme <- Gen.oneOf("http", "https", "HTTP", "HTTPS")
    board <- Gen.choose(0, 5)
    post <- Gen.choose(0, 100000)
    trailing <- Gen.oneOf("", "/")
    frag <- Gen.oneOf("", "#top", "#c3")
    q <- Gen.oneOf("", "?utm_source=x", "?b=2&a=1", "?page=3&utm_medium=y")
  } yield s"$scheme://$host/board/$board/post/$post$trailing$q$frag"
}

/** test_relevance_filter_property.py:35,110 — score range + threshold
  * filtering + frequency-bonus monotonicity.
  */
object RelevanceProps extends Properties("Relevance") {
  property("score in [0,1]") = forAll(Gens.text, Gens.keywords, Gens.text) { (c, k, t) =>
    val s = Relevance.score(c, k, t)
    s >= 0.0 && s <= 1.0
  }
  property("empty keywords score 0") = forAll(Gens.text) { c =>
    Relevance.score(c, Seq.empty, "") == 0.0
  }
  property("threshold filtering keeps only passing rows") =
    forAll(Gen.listOf(Gens.text), Gens.keywords, Gen.choose(0.0, 1.0)) { (cs, k, thr) =>
      cs.map(c => Relevance.score(c, k, "")).filter(_ >= thr).forall(_ >= thr)
    }
  property("adding a keyword occurrence never lowers the score") =
    forAll(Gens.text, Gen.oneOf("버그", "게임", "lag")) { (c, kw) =>
      Relevance.score(s"$c $kw", Seq(kw), "") >= Relevance.score(c, Seq(kw), "")
    }
}

/** test_jitter_range_property.py:34 — effective delay always within
  * [base+min, base+max]; off → exactly base; seeded draws reproducible.
  */
object JitterProps extends Properties("Jitter") {
  val cfg: Gen[(Double, Double, Double, Long)] = for {
    base <- Gen.choose(0.1, 10.0)
    lo <- Gen.choose(0.0, 2.0)
    span <- Gen.choose(0.0, 3.0)
    seed <- Gen.choose(Long.MinValue, Long.MaxValue)
  } yield (base, lo, lo + span, seed)

  property("jittered wait in [base+min, base+max]") = forAll(cfg, Gen.choose(1, 50)) {
    case ((base, lo, hi, seed), n) =>
      val c = new HostClock(base, 3, jitter = Some((lo, hi)), seedKey = seed)
      (0 until n).forall { _ =>
        val d = c.waitOnce()
        d >= base + lo && d <= base + hi
      }
  }
  property("jitter off: wait == base, always") = forAll(Gen.choose(0.1, 10.0), Gen.choose(1, 20)) {
    (base, n) =>
      val c = new HostClock(base, 3)
      (0 until n).forall(_ => c.waitOnce() == base)
  }
  property("same seed → identical draw sequence (resumable determinism)") =
    forAll(cfg, Gen.choose(1, 30)) { case ((base, lo, hi, seed), n) =>
      val a = new HostClock(base, 3, Some((lo, hi)), seed)
      val b = new HostClock(base, 3, Some((lo, hi)), seed)
      (0 until n).forall(_ => a.waitOnce() == b.waitOnce())
    }
}

/** test_rate_limiter_property.py:37 — backoff, suspension and reset
  * behavior of the per-host politeness state machine.
  */
object RateLimiterProps extends Properties("RateLimiter") {
  /** Fetcher failing with 429 the first `n429` attempts, then 200. */
  private def limited(n429: Int): Fetcher = new Fetcher {
    def fetch(url: String, attempt: Int): FetchResponse =
      if (attempt <= n429) FetchResponse(429, "") else FetchResponse(200, "ok")
  }

  property("429s beyond maxRetries suspend the host; fewer succeed") =
    forAll(Gen.choose(0, 8), Gen.choose(1, 5)) { (n429, maxRetries) =>
      val c = new HostClock(1.0, maxRetries)
      val (status, _, _) = c.fetchOne(limited(n429), "u")
      if (n429 > maxRetries) status == "fetch_failed" && c.suspended
      else status == "fetched" && !c.suspended && c.retryCount == 0 // success resets
    }
  property("suspended host fails everything after, with 0 attempts") =
    forAll(Gen.choose(1, 3)) { maxRetries =>
      val c = new HostClock(1.0, maxRetries)
      c.fetchOne(limited(100), "u") // drive to suspension
      val (s, attempts, _) = c.fetchOne(limited(0), "v")
      s == "suspended" && attempts == 0
    }
  property("virtual clock advances delay per attempt + 2^n backoff") =
    forAll(Gen.choose(0, 3), Gen.choose(0.5, 5.0)) { (n429, delay) =>
      val maxRetries = 5
      val c = new HostClock(delay, maxRetries)
      c.fetchOne(limited(n429), "u")
      val attempts = n429 + 1
      val backoff = (1 to n429).map(r => math.pow(2.0, r)).sum
      math.abs(c.virtualTime - (attempts * delay + backoff)) < 1e-9
    }
  property("timeout/5xx fail without retry or counter change") =
    forAll(Gen.oneOf(500, 598)) { code =>
      val c = new HostClock(1.0, 3)
      val f = new Fetcher { def fetch(u: String, a: Int) = FetchResponse(code, "") }
      val (s, attempts, _) = c.fetchOne(f, "u")
      s == "fetch_failed" && attempts == 1 && c.retryCount == 0 && !c.suspended
    }
}

/** url_deduplicator semantics: canonicalization idempotent, first-wins
  * dedup keeps the first discovery (test_data_models_property analogue).
  */
object DedupOrderProps extends Properties("UrlDedup") {
  property("canonicalize is idempotent") = forAll(Gens.urlish) { u =>
    val c = UrlCanon.canonicalize(u)
    UrlCanon.canonicalize(c) == c
  }
  property("canonical form: lowercased, fragment dropped, query KEPT, no trailing slash") =
    forAll(Gens.urlish) { u =>
      val c = UrlCanon.canonicalize(u)
      // reference normalize_url (url_deduplicator.py:14-37): lowercase the
      // whole url, drop only the fragment (query params survive — even
      // utm), rstrip '/' from the path
      val pathEnd = if (c.contains("?")) c.indexOf("?") else c.length
      !c.contains("#") && c == c.toLowerCase && c.startsWith("http") &&
        (pathEnd == 0 || c.charAt(pathEnd - 1) != '/') &&
        (if (u.contains("?")) c.contains("?") else true)
    }
  property("first-wins dedup keeps first occurrence order") =
    forAll(Gen.nonEmptyListOf(Gens.urlish)) { urls =>
      val seen = scala.collection.mutable.LinkedHashMap.empty[String, String]
      urls.foreach { u =>
        val c = UrlCanon.canonicalize(u)
        if (!seen.contains(c)) seen(c) = u
      }
      val expect = seen.values.toList
      // replicate via the same fold the pipeline's window expresses
      val got = urls.zipWithIndex
        .groupBy { case (u, _) => UrlCanon.canonicalize(u) }
        .map { case (_, occ) => occ.minBy(_._2) }
        .toList.sortBy(_._2).map(_._1)
      got == expect
    }
}

/** test_sentiment_property.py — score bounds, label thresholds,
  * confidence bounds, preprocess idempotence.
  */
object SentimentProps extends Properties("Sentiment") {
  property("score in [-1,1]") = forAll(Gens.text) { t =>
    val s = Sentiment.score(t); s >= -1.0 && s <= 1.0
  }
  property("label matches thresholds") = forAll(Gen.choose(-1.0, 1.0)) { s =>
    Sentiment.label(s) == (if (s > 0.1) "positive" else if (s < -0.1) "negative" else "neutral")
  }
  property("confidence in [0,1] (0.5 floor)") = forAll(Gens.text) { t =>
    val c = Sentiment.confidence(t); c >= 0.0 && c <= 1.0
  }
  property("preprocess is idempotent") = forAll(Gens.text) { t =>
    val p = Sentiment.preprocess(t)
    Sentiment.preprocess(p) == p
  }
  property("blend stays in [-1,1]") = forAll(Gens.text, Gens.text, Gen.listOf(Gens.text)) {
    (title, body, comments) =>
      val b = Sentiment.postWithCommentsScore(title, body, comments)
      b >= -1.0 && b <= 1.0
  }
}

/** The Aho-Corasick scorer must count exactly like the reference's
  * per-term str.count scans (sentiment.py:94-130) — including overlapping
  * patterns, patterns that are substrings of each other, and per-pattern
  * non-overlapping greedy restarts. The ab-alphabet generators force dense
  * overlap (e.g. "aa" in "aaaa" counts 2, not 3).
  */
object AhoCorasickProps extends Properties("AhoCorasick") {
  import graft.analysis.AhoCorasick
  private val abStr: Gen[String] = Gen.choose(1, 4)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))
  private val abText: Gen[String] = Gen.choose(0, 60)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString))

  property("totalCount == sum of greedy str.count scans (dense overlap)") =
    forAll(Gen.nonEmptyListOf(abStr), abText) { (pats, text) =>
      AhoCorasick(pats).totalCount(text) ==
        pats.distinct.map(Relevance.countOccurrences(text, _)).sum
    }

  property("two-group counts: each group = its own naive scan, shared terms count in both") =
    forAll(Gen.nonEmptyListOf(abStr), Gen.nonEmptyListOf(abStr), abText) {
      (g0, g1, text) =>
        val c = AhoCorasick.twoGroups(g0, g1).groupCounts(text)
        c(0) == g0.distinct.map(Relevance.countOccurrences(text, _)).sum &&
          c(1) == g1.distinct.map(Relevance.countOccurrences(text, _)).sum
    }

  property("real lexicons: automaton hits == naive hits on generated text") =
    forAll(Gens.text) { t =>
      val p = Sentiment.preprocess(t)
      Sentiment.hits2(p, Sentiment.PositiveLexicon, Sentiment.NegativeLexicon) ==
        ((Sentiment.naiveHits(p, Sentiment.PositiveLexicon),
          Sentiment.naiveHits(p, Sentiment.NegativeLexicon)))
    }
}

/** test_issue_detector_property.py:168 — clustering completeness +
  * similarity function invariants.
  */
object ClusteringProps extends Properties("Clustering") {
  property("similarity symmetric and in [0,1]") = forAll(Gens.word, Gens.word) { (a, b) =>
    val s = Issues.keywordSimilarity(a, b)
    s == Issues.keywordSimilarity(b, a) && s >= 0.0 && s <= 1.0
  }
  property("every keyword lands in exactly one cluster") =
    forAll(Gen.listOf(Gens.word).map(_.distinct)) { kws =>
      val clusters = Issues.clusterKeywords(kws)
      clusters.flatten.sorted == kws.sorted.toVector
    }
  property("cluster members are >= threshold similar to the representative") =
    forAll(Gen.listOf(Gens.word).map(_.distinct), Gen.choose(0.1, 0.9)) { (kws, thr) =>
      val clusters = Issues.clusterKeywords(kws, thr)
      clusters.forall(c => c.tail.forall(k => Issues.keywordSimilarity(k, c.head) >= thr))
    }
  property("clustering is deterministic") = forAll(Gen.listOf(Gens.word)) { kws =>
    Issues.clusterKeywords(kws) == Issues.clusterKeywords(kws)
  }
}

/** test_search_adapter_failover_property.py:72 — sticky index, cooldown
  * skip, aggregate failure.
  */
object FailoverProps extends Properties("Failover") {
  private def seed(i: Int) = SeedRecord(i.toLong, s"https://a.example.org/p/$i", "a", "k", "t", "s")
  private val results = (0 until 5).map(seed)

  property("first success wins and the index sticks") =
    forAll(Gen.choose(0, 3), Gen.choose(1, 4)) { (failFirstN, nAdapters0) =>
      val n = math.max(nAdapters0, failFirstN + 1)
      val adapters = (0 until n).map { i =>
        if (i < failFirstN) new ScriptedAdapter(s"a$i", results, failures = Map(0 -> false))
        else new ScriptedAdapter(s"a$i", results)
      }
      val m = new SearchManager(adapters.toIndexedSeq)
      val r = m.search(Seq("k"), "s", 3)
      r.size == 3 && m.stickyIndex == failFirstN
    }
  property("rate-limited adapter is skipped until cooldown passes") =
    forAll(Gen.choose(1.0, 200.0)) { later =>
      val throttled = new ScriptedAdapter("t", results, failures = Map(0 -> true), cooldown = 300.0)
      val backup = new ScriptedAdapter("b", results)
      val m = new SearchManager(IndexedSeq(throttled, backup))
      m.search(Seq("k"), "s", 1, now = 0.0) // t rate-limits, b serves; sticky -> b
      val r2 = m.search(Seq("k"), "s", 1, now = later)
      // while inside the cooldown window the throttled adapter must not be called again
      throttled.callCount == 1 && r2.nonEmpty && m.stickyIndex == 1
    }
  property("cooldown expiry restores the adapter") = Prop {
    val throttled = new ScriptedAdapter("t", results, failures = Map(0 -> true), cooldown = 300.0)
    val m = new SearchManager(IndexedSeq(throttled))
    val failed = try { m.search(Seq("k"), "s", 1, now = 0.0); false } catch { case _: RuntimeException => true }
    val r = m.search(Seq("k"), "s", 1, now = 301.0)
    failed && r.nonEmpty && throttled.callCount == 2
  }
  property("all adapters failing raises the aggregate error") =
    forAll(Gen.choose(1, 4)) { n =>
      val adapters = (0 until n).map(i =>
        new ScriptedAdapter(s"a$i", results, failures = Map(0 -> false)))
      val m = new SearchManager(adapters.toIndexedSeq)
      try { m.search(Seq("k"), "s", 1); false }
      catch { case e: RuntimeException => e.getMessage.startsWith("all search adapters failed") }
    }
}

/** Keyword extraction invariants (test_trend_analyzer_property /
  * keyword_extractor behavior).
  */
object KeywordProps extends Properties("Keywords") {
  property("tokens have length in [2,20] (with Korean n-gram expansion)") =
    forAll(Gens.text) { t =>
      Keywords.tokenize(Keywords.preprocess(t)).forall(w => w.length >= 2 && w.length <= 20)
    }
  property("stopwords never appear in extracted keywords") = forAll(Gens.text) { t =>
    Keywords.extractFromText(t, 50).forall(k => !Keywords.Stopwords.contains(k))
  }
  property("most_common tie-break = first occurrence") =
    forAll(Gen.nonEmptyListOf(Gens.word)) { toks =>
      val top = Keywords.topByFrequency(toks, toks.size)
      val counts = toks.groupBy(identity).view.mapValues(_.size).toMap
      val firstAt = toks.zipWithIndex.groupBy(_._1).view.mapValues(_.head._2).toMap
      top == top.sortBy(k => (-counts(k), firstAt(k)))
    }
  property("topN returns at most N, ordered by count desc") =
    forAll(Gen.nonEmptyListOf(Gens.word), Gen.choose(1, 10)) { (toks, n) =>
      val top = Keywords.topByFrequency(toks, n)
      val counts = toks.groupBy(identity).view.mapValues(_.size).toMap
      top.size <= n && top.sliding(2).forall {
        case Seq(a, b) => counts(a) >= counts(b)
        case _         => true
      }
    }
}

/** Text-ops pure-layer invariants (TextOps / Dedup.simhash). */
object TextOpsProps extends Properties("TextOps") {
  property("langId script detection dominates (Hangul → ko)") =
    forAll(Gens.text) { t =>
      graft.ops.TextOps.langIdScala(t + " 게임") == "ko"
    }
  property("simhash invariant under token permutation (multiset-based)") =
    forAll(Gen.nonEmptyListOf(Gens.word), Gen.choose(0L, Long.MaxValue)) { (toks, s) =>
      val perm = new scala.util.Random(s).shuffle(toks)
      graft.ops.Dedup.simhash(toks) == graft.ops.Dedup.simhash(perm)
    }
  property("rolling hash deterministic; differs on a changed suffix") =
    forAll(Gens.nonEmptyText) { t =>
      graft.ops.TextOps.rollingHash(t) == graft.ops.TextOps.rollingHash(t) &&
        graft.ops.TextOps.rollingHash(t + "x") != graft.ops.TextOps.rollingHash(t + "y")
    }
  property("simhash128 lo limb equals the 64-bit signature; permutation-invariant") =
    forAll(Gen.nonEmptyListOf(Gens.word), Gen.choose(0L, Long.MaxValue)) { (toks, s) =>
      val (hi, lo) = graft.ops.Dedup.simhash128(toks)
      val perm = new scala.util.Random(s).shuffle(toks)
      lo == graft.ops.Dedup.simhash(toks) &&
        (hi, lo) == graft.ops.Dedup.simhash128(perm)
    }
}

/** Parser invariants over the synthetic grammar corpus
  * (test_parser_content_property analogue): determinism + required-field
  * validation + span offsets dense from 0.
  */
object ParserProps extends Properties("Parser") {
  private val canonUrls: Gen[String] = for {
    host <- Gen.oneOf(graft.fixtures.Fixtures.Hosts)
    board <- Gen.choose(0, 5)
    post <- Gen.choose(0, 50000)
  } yield UrlCanon.canonicalize(graft.fixtures.Fixtures.cleanUrl(host, board, post))

  property("parse is deterministic") = forAll(canonUrls) { u =>
    val html = graft.fixtures.Fixtures.html(u)
    graft.parse.PageParser.parse(html, u) == graft.parse.PageParser.parse(html, u)
  }
  property("parsed docs satisfy required-field validation") = forAll(canonUrls) { u =>
    graft.parse.PageParser.parse(graft.fixtures.Fixtures.html(u), u).forall { p =>
      p.title.nonEmpty || graft.parse.PageParser.bodyText(p).nonEmpty
    }
  }
  property("span offsets are 0..n-1 in order; comment spans equal the side-table") =
    forAll(canonUrls) { u =>
      graft.parse.PageParser.parse(graft.fixtures.Fixtures.html(u), u).forall { p =>
        p.spans.map(_.offset) == p.spans.indices.toVector &&
          p.spans.filter(_.kind == "comment").map(_.text) == p.comments.map(_.content)
      }
    }
}

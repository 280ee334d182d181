package graft.oracle

import graft.core._
import graft.fixtures.Fixtures
import graft.fetch.{Fetcher, SyntheticFetcher}
import graft.parse.PageParser
import graft.analysis.Relevance
import scala.collection.mutable

/** The sequential parity oracle: replays the reference crawler's
  * single-threaded semantics (search → relevance filter → first-wins dedup
  * → sequential fetch with per-domain rate-limiter state → parse), extended
  * with the north rule's frontier rounds and robots budget, over the exact
  * same fixture inputs as the Spark pipeline. The Spark pipeline's
  * committed crawl-order log, URL-seen set, and span-doc table must equal
  * this oracle's output row-for-row (BASELINE.json `north_rule`).
  *
  * Reference call order being replayed:
  *   - relevance filter before dedup
  *     (/root/reference/crawler/search/manager.py:176-203 runs inside search,
  *      orchestrator.py:206-215 dedups after collecting all results);
  *   - first-wins dedup on the canonical URL, original URL kept
  *     (url_deduplicator.py:40-62);
  *   - sequential fetch loop in dedup order (orchestrator.py:221-241), with
  *     per-domain dict state exactly like RateLimiter: retry counts, 2^n
  *     backoff, suspension after max_retries exceeded, reset on success
  *     (rate_limiter.py:213-303, content_crawler.py:110-178);
  *   - parse with domain parser + generic fallback; empty title+body fails
  *     (content_crawler.py:180-238).
  *
  * North-rule extensions, defined here canonically (the reference follows
  * no links and has no robots handling):
  *   - robots disallow prefixes filter candidates before dedup; crawl-delay
  *     comes from the robots fixture (default 3.0);
  *   - round r+1 candidates = outlinks of round-r docs, ordered by
  *     (parent seq, link index); no relevance filter for discovered links
  *     (they carry no search snippet);
  *   - the seen set grows at schedule time (dedup), not fetch time, and
  *     persists across rounds.
  */
object SequentialOracle {

  final case class OracleDoc(seq: Long, doc: Doc, outlinks: Vector[String])
  final case class OracleResult(
      crawlLog: Vector[CrawlLogEntry],
      seen: Vector[String],          // canonical URLs in schedule order
      docs: Vector[OracleDoc],
      virtualSecondsByHost: Map[String, Double])

  def run(
      seeds: IndexedSeq[SeedRecord],
      config: CrawlConfig = CrawlConfig(),
      fetcher: Fetcher = SyntheticFetcher): OracleResult = {

    val robots = Fixtures.robotsMap
    def delayOf(host: String): Double = robots.get(host).map(_.crawlDelay).getOrElse(config.defaultDelay)
    def disallowed(url: String): Boolean = {
      val h = UrlCanon.host(url); val p = UrlCanon.path(url)
      robots.get(h).exists(_.disallow.exists(p.startsWith))
    }

    // per-domain rate-limiter state (mirrors RateLimiter's dicts)
    val lastTime = mutable.Map.empty[String, Double].withDefaultValue(0.0)
    val retries = mutable.Map.empty[String, Int].withDefaultValue(0)
    val susp = mutable.Set.empty[String]
    val clock = mutable.Map.empty[String, Double].withDefaultValue(0.0) // virtual per-host time

    val seen = mutable.LinkedHashSet.empty[String]
    val log = Vector.newBuilder[CrawlLogEntry]
    val docs = Vector.newBuilder[OracleDoc]

    var nextSeq = 0L
    // candidates for the current round: (url, keyword) in canonical order
    var candidates: Vector[(String, String)] =
      seeds.filter(s => Relevance.score(s.snippet, Seq(s.keyword), s.title) >= config.relevanceThreshold)
        .map(s => (s.url, s.keyword)).toVector

    var round = 0
    while (round < config.maxRounds && candidates.nonEmpty) {
      // robots filter, then first-wins dedup vs global seen
      val scheduled = Vector.newBuilder[FrontierEntry]
      candidates.foreach { case (url, kw) =>
        val canon = UrlCanon.canonicalize(url)
        if (!disallowed(canon) && !seen.contains(canon)) {
          seen += canon
          scheduled += FrontierEntry(round, nextSeq, url, canon, UrlCanon.host(canon), kw)
          nextSeq += 1
        }
      }

      val nextCandidates = Vector.newBuilder[(String, String)]
      scheduled.result().foreach { e =>
        if (susp.contains(e.host)) {
          log += CrawlLogEntry(e.round, e.seq, e.url, e.canonUrl, e.host, "suspended", 0)
        } else {
          var attempt = 1
          var done = false
          var status = "fetch_failed"
          var html = ""
          while (!done) {
            clock(e.host) = clock(e.host) + delayOf(e.host) // wait()
            val resp = fetcher.fetch(e.canonUrl, attempt)
            resp.status match {
              case 200 =>
                retries(e.host) = 0; status = "fetched"; html = resp.html; done = true
              case 429 =>
                retries(e.host) = retries(e.host) + 1
                if (retries(e.host) > config.maxRetries) { susp += e.host; done = true }
                else { clock(e.host) = clock(e.host) + math.pow(2.0, retries(e.host)); attempt += 1 }
              case _ => done = true
            }
          }
          if (status == "fetched") {
            PageParser.parse(html, e.canonUrl, config.maxCommentPages) match {
              case Some(p) =>
                log += CrawlLogEntry(e.round, e.seq, e.url, e.canonUrl, e.host, "fetched", attempt)
                docs += OracleDoc(e.seq, Doc(e.canonUrl, p.spans), p.outlinks)
                p.outlinks.foreach(l => nextCandidates += ((l, e.keyword)))
              case None =>
                log += CrawlLogEntry(e.round, e.seq, e.url, e.canonUrl, e.host, "parse_failed", attempt)
            }
          } else {
            log += CrawlLogEntry(e.round, e.seq, e.url, e.canonUrl, e.host, status, attempt)
          }
        }
      }
      candidates = nextCandidates.result()
      round += 1
    }

    OracleResult(log.result(), seen.toVector, docs.result(), clock.toMap)
  }
}

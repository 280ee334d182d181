package graft.fetch

import graft.core.SeedRecord

/** Search-source abstraction with availability state — the reference's
  * SearchAdapter ABC (/root/reference/crawler/search/adapters.py:30-96):
  * an adapter reports itself unavailable while throttled; a rate-limit
  * error puts it on a fixed cooldown (300 s — adapters.py:155-159).
  *
  * Seed acquisition is a driver-side concern (the reference runs it
  * sequentially before crawling; result volume is search-page sized, not
  * corpus sized), so this layer is deliberately plain Scala — the
  * distributed pipeline starts at the seed Dataset it produces.
  */
trait SearchAdapter {
  def name: String
  /** May throw SearchError; successful calls clear any throttle state. */
  def search(keywords: Seq[String], site: String, maxResults: Int,
      now: Double): Seq[SeedRecord]
  def isAvailable(now: Double): Boolean
}

final case class SearchError(adapter: String, message: String, rateLimited: Boolean)
  extends RuntimeException(s"$adapter: $message")

/** Base adapter state machine: throttledUntil cooldown on rate-limit
  * errors (adapters.py:68-96,155-159).
  */
abstract class ThrottlingAdapter(val cooldownSeconds: Double = 300.0) extends SearchAdapter {
  protected var throttledUntil: Double = 0.0
  override def isAvailable(now: Double): Boolean = now >= throttledUntil

  /** Wraps the raw search with the reference's throttle bookkeeping. */
  protected def doSearch(keywords: Seq[String], site: String, maxResults: Int,
      now: Double): Seq[SeedRecord]

  override def search(keywords: Seq[String], site: String, maxResults: Int,
      now: Double): Seq[SeedRecord] =
    try {
      val r = doSearch(keywords, site, maxResults, now)
      throttledUntil = 0.0 // success resets (reset_throttle analogue)
      r
    } catch {
      case e: SearchError =>
        if (e.rateLimited) throttledUntil = now + cooldownSeconds
        throw e
    }
}

/** Failover search manager with the reference SearchManager's exact
  * semantics (/root/reference/crawler/search/manager.py:119-174):
  *
  *   - adapters are tried starting from the STICKY current index
  *     (successes move the index; the next search starts at the adapter
  *     that last worked);
  *   - unavailable (throttled) adapters are skipped without counting as
  *     tried;
  *   - the first success returns immediately and updates the sticky index;
  *   - if every adapter fails, a RuntimeException aggregating the errors
  *     is thrown (manager.py:169-174); if none was even available, the
  *     "no available adapters" error (manager.py:166-167).
  */
final class SearchManager(adapters: IndexedSeq[SearchAdapter]) {
  require(adapters.nonEmpty, "at least one adapter")
  private var currentIndex = 0
  def stickyIndex: Int = currentIndex

  def search(keywords: Seq[String], site: String, maxResults: Int,
      now: Double = 0.0): Seq[SeedRecord] = {
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    var tried = 0
    var i = 0
    while (i < adapters.length) {
      val idx = (currentIndex + i) % adapters.length
      val a = adapters(idx)
      if (a.isAvailable(now)) {
        tried += 1
        try {
          val r = a.search(keywords, site, maxResults, now)
          currentIndex = idx // sticky on success
          return r
        } catch {
          case e: SearchError => errors += s"${a.name}: ${e.message}"
        }
      }
      i += 1
    }
    if (tried == 0) throw new RuntimeException("no available search adapters")
    throw new RuntimeException(s"all search adapters failed: ${errors.mkString("; ")}")
  }
}

/** Seed acquisition through the failover manager — the engine's S1-S3
  * source stage (the reference's orchestrator does search→seed before
  * crawling, orchestrator.py:172-203). Each (site, keyword) query is one
  * manager.search call, preserving the reference's per-query failover
  * granularity; results keep the canonical seed ordering (site order,
  * then adapter result order) via re-assigned seq.
  */
object SeedSource {
  def acquire(manager: SearchManager, sites: Seq[String], keywords: Seq[String],
      maxResultsPerSite: Int, now: Double = 0.0): IndexedSeq[SeedRecord] = {
    val out = IndexedSeq.newBuilder[SeedRecord]
    var seq = 0L
    sites.foreach { site =>
      val rs = manager.search(keywords, site, maxResultsPerSite, now)
      rs.foreach { r => out += r.copy(seq = seq); seq += 1 }
    }
    out.result()
  }
}

/** Fixtures-backed adapter: serves the deterministic seed corpus filtered
  * by site — the sandbox's stand-in for a real search engine (S1-S3),
  * with the same throttle/failover surface.
  */
final class FixtureSearchAdapter(
    val name: String,
    corpus: IndexedSeq[SeedRecord],
    failures: Map[Int, Boolean] = Map.empty,
    cooldown: Double = 300.0) extends ThrottlingAdapter(cooldown) {
  private var calls = 0
  def callCount: Int = calls
  override protected def doSearch(keywords: Seq[String], site: String,
      maxResults: Int, now: Double): Seq[SeedRecord] = {
    val n = calls; calls += 1
    failures.get(n).foreach(rate =>
      throw SearchError(name, if (rate) "HTTP 429 rate limit" else "boom", rate))
    corpus.filter(_.site == site).take(maxResults)
  }
}

/** Deterministic synthetic adapter for tests/benches: optional scripted
  * failures per call ordinal (rate-limited or plain), otherwise `results`.
  */
final class ScriptedAdapter(
    val name: String,
    results: Seq[SeedRecord],
    failures: Map[Int, Boolean] = Map.empty, // call ordinal -> rateLimited?
    cooldown: Double = 300.0) extends ThrottlingAdapter(cooldown) {
  private var calls = 0
  def callCount: Int = calls
  override protected def doSearch(keywords: Seq[String], site: String,
      maxResults: Int, now: Double): Seq[SeedRecord] = {
    val n = calls; calls += 1
    failures.get(n) match {
      case Some(rate) => throw SearchError(name, if (rate) "HTTP 429 rate limit" else "boom", rate)
      case None       => results.take(maxResults)
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fetch.{FixtureSearchAdapter, SearchManager, SeedSource}
import graft.fixtures.Fixtures

/** S1-S3 via the failover manager: seed acquisition survives a flaky
  * primary adapter, preserves canonical ordering (site order then result
  * order, dense seq), and sticks to the adapter that worked.
  */
class SeedSourceSpec extends AnyFunSuite {
  private val corpus = Fixtures.seeds(300)
  private val sites = Fixtures.Hosts.take(4)

  test("acquire with a healthy adapter = per-site corpus slices, dense seq") {
    val m = new SearchManager(IndexedSeq(new FixtureSearchAdapter("a", corpus)))
    val got = SeedSource.acquire(m, sites, Fixtures.Keywords, maxResultsPerSite = 10)
    val want = sites.flatMap(s => corpus.filter(_.site == s).take(10))
    assert(got.map(_.url) == want.map(_.url).toIndexedSeq)
    assert(got.map(_.seq) == got.indices.map(_.toLong))
  }

  test("flaky primary (rate-limited on first call) fails over, results identical") {
    val primary = new FixtureSearchAdapter("p", corpus, failures = Map(0 -> true))
    val backup = new FixtureSearchAdapter("b", corpus)
    val m = new SearchManager(IndexedSeq(primary, backup))
    val got = SeedSource.acquire(m, sites, Fixtures.Keywords, 10)
    val healthy = SeedSource.acquire(
      new SearchManager(IndexedSeq(new FixtureSearchAdapter("h", corpus))),
      sites, Fixtures.Keywords, 10)
    assert(got.map(r => (r.url, r.seq)) == healthy.map(r => (r.url, r.seq)))
    // primary throttled after its one failure: every later query went to b
    assert(m.stickyIndex == 1 && primary.callCount == 1)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse.PageParser
import java.time.LocalDateTime

/** F4 date-string ladder, pinned against the reference parsers run this
  * session (generic.py:210-250 + inven.py:216-244). The ladder is the
  * union of the site ladders with the reference's priority order: ISO
  * (trailing Z / offset tolerated) → YYYY sep M sep D [H:MM] →
  * M sep D sep YYYY → YY sep M sep D (+2000, date-only).
  * One deliberate divergence: the reference generic parser's separator
  * class `[.-/]` is a char RANGE (.-/) that accidentally excludes '-';
  * we treat '-' as a valid separator (the functional spec).
  */
class DateLadderSpec extends AnyFunSuite {
  private def p(s: String) = PageParser.parseDate(s)

  test("ISO datetime attrs incl. trailing Z and offsets (fromisoformat semantics)") {
    assert(p("2024-01-15T10:30:00Z").contains(LocalDateTime.of(2024, 1, 15, 10, 30)))
    assert(p("2024-01-15T10:30:00+09:00").contains(LocalDateTime.of(2024, 1, 15, 10, 30)))
    assert(p("2024-01-15T10:30:45").contains(LocalDateTime.of(2024, 1, 15, 10, 30, 45)))
  }

  test("YYYY sep M sep D with optional time (inven ladder rung 1-2)") {
    assert(p("2024.01.15 10:30").contains(LocalDateTime.of(2024, 1, 15, 10, 30)))
    assert(p("2024-3-7").contains(LocalDateTime.of(2024, 3, 7, 0, 0)))
    assert(p("2024/12/31").contains(LocalDateTime.of(2024, 12, 31, 0, 0)))
  }

  test("M sep D sep YYYY (generic US order)") {
    assert(p("01/15/2024").contains(LocalDateTime.of(2024, 1, 15, 0, 0)))
    assert(p("01-15-2024").contains(LocalDateTime.of(2024, 1, 15, 0, 0)))
  }

  test("2-digit year + 2000, date-only (inven ladder rung 3)") {
    assert(p("24.01.15").contains(LocalDateTime.of(2024, 1, 15, 0, 0)))
    // time is NOT captured by the 2-digit rung (reference pattern has none)
    assert(p("24.1.5 9:05").contains(LocalDateTime.of(2024, 1, 5, 0, 0)))
    assert(p("99.12.31").contains(LocalDateTime.of(2099, 12, 31, 0, 0)))
  }

  test("invalid and empty inputs fall through to None (ValueError continue)") {
    assert(p("no date here").isEmpty)
    assert(p("2024.13.45").isEmpty)
    assert(p("").isEmpty)
  }

  test("ladder priority: 4-digit year wins over a 2-digit-year submatch") {
    // '24.01.15' inside '2024.01.15' must NOT be read as 2044-01-15
    assert(p("2024.01.15").contains(LocalDateTime.of(2024, 1, 15, 0, 0)))
  }

  test("fused MetaScan keeps per-ladder firstMatch semantics under NESTED markup") {
    // author's ONLY occurrence starts inside the title slot's matched span;
    // a scanner resuming at match END would drop it (the pre-round-3 bug
    // shape) — the restart-at-start+1 scan must still find it
    val html =
      """<html><body><h1 class="title">hello <span class="author">bob</span> world</h1>
         <div class="post-content"><p>b</p></div></body></html>"""
    val p = PageParser.parse(html, "https://steam.example.org/board/0/post/3").get
    assert(p.title == """hello <span class="author">bob</span> world""")
    assert(p.author == "bob", "nested author slot must not be swallowed by the title span")
  }

  // ---- comment metadata (generic.py:275-332 semantics) ---------------------

  private def page(comments: String) =
    s"""<html><body><h1 class="title">t</h1><div class="post-content"><p>b</p></div>
        <div class="comments">
        $comments
        </div></body></html>"""

  private def cblock(text: String, date: String = "") =
    s"""<div class="comment"><span class="author">u</span><p class="ctext">$text</p>$date<span class="clike">1</span></div>"""

  test("comment created_at: .date / .time / time[datetime] ladder, reference order") {
    val html = page(
      cblock("c1", """<span class="date">2024-03-07 14:22</span>""") + "\n" +
      cblock("c2", """<span class="time">03-07-2024</span>""") + "\n" +
      cblock("c3", """<time datetime="2024-03-07T14:22:00">x</time>""") + "\n" +
      cblock("c4") + "\n" +
      // .date outranks time[datetime] when both are present
      cblock("c5", """<time datetime="2020-01-01T00:00:00">x</time><span class="date">2024-03-07</span>"""))
    val got = PageParser.parse(html, "https://steam.example.org/board/0/post/1").get.comments
    assert(got.map(_.createdAt) == Vector(
      Some("2024-03-07T14:22:00"), Some("2024-03-07T00:00:00"),
      Some("2024-03-07T14:22:00"), None, Some("2024-03-07T00:00:00")))
  }

  test("comment pagination cap: pages past max_comment_pages are dropped (default 3)") {
    val blocks = (1 to 4).map { pg =>
      val marker = if (pg > 1) s"""<hr class="cpage" data-page="$pg">\n""" else ""
      marker + cblock(s"page$pg")
    }.mkString("\n")
    val url = "https://steam.example.org/board/0/post/2"
    val capped = PageParser.parse(page(blocks), url).get.comments
    assert(capped.map(_.content) == Vector("page1", "page2", "page3"),
      s"page-4 comments must be dropped, got ${capped.map(_.content)}")
    val uncapped = PageParser.parse(page(blocks), url, maxCommentPages = 4).get.comments
    assert(uncapped.map(_.content) == Vector("page1", "page2", "page3", "page4"))
    val one = PageParser.parse(page(blocks), url, maxCommentPages = 1).get.comments
    assert(one.map(_.content) == Vector("page1"))
  }

  test("comment pagination: decreasing markers cannot re-open a passed cap") {
    // malformed marker order ("page 3" then "page 2"): the cap tracks the
    // MAX page seen, so the page-2-labelled trailing block stays dropped
    // once page 3 was passed under maxCommentPages=2
    val blocks = Seq(
      cblock("a1"),
      s"""<hr class="cpage" data-page="3">""", cblock("late3"),
      s"""<hr class="cpage" data-page="2">""", cblock("late2")).mkString("\n")
    val url = "https://steam.example.org/board/0/post/3"
    val got = PageParser.parse(page(blocks), url, maxCommentPages = 2).get.comments
    assert(got.map(_.content) == Vector("a1"),
      s"decreasing marker re-opened the cap: ${got.map(_.content)}")
    // a beyond-Int numeral degrades to past-the-cap, and stays terminal
    val big = Seq(cblock("b1"),
      s"""<hr class="cpage" data-page="99999999999">""", cblock("b2"),
      s"""<hr class="cpage" data-page="2">""", cblock("b3")).mkString("\n")
    val got2 = PageParser.parse(page(big), url, maxCommentPages = 3).get.comments
    assert(got2.map(_.content) == Vector("b1"))
  }

  test("fixture comments carry dates end to end (all four grammars)") {
    val hosts = Seq("steam.example.org", "inven.example.kr",
      "ruliweb.example.kr", "dcinside.example.kr")
    val parsed = hosts.flatMap { h =>
      (0 until 200).flatMap { i =>
        val u = graft.fixtures.Fixtures.cleanUrl(h, 0, i)
        PageParser.parse(graft.fixtures.Fixtures.html(u), u).toSeq.flatMap(_.comments)
      }
    }
    assert(parsed.nonEmpty)
    assert(parsed.forall(_.createdAt.isDefined),
      "every fixture comment block now carries a parsable date")
    assert(parsed.flatMap(_.createdAt).forall(_.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}""")))
  }
}

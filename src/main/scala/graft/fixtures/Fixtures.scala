package graft.fixtures

import graft.core._

/** Deterministic synthetic test inputs (FIXTURES.md; seed = 42, no egress).
  *
  * Every generator is a pure `(seed, index) -> record` function so the
  * sequential parity oracle and the Spark pipeline consume byte-identical
  * inputs. Shapes mirror the reference's world:
  *   - seeds ~ search-adapter results (site order then result order,
  *     /root/reference/crawler/orchestrator.py:289-304), with ~15%
  *     duplicates-after-canonicalization to exercise first-wins dedup
  *     (url_deduplicator.py:40-62);
  *   - host distribution is Zipf-skewed (2 hosts ≈ 50% of URLs — the north
  *     rule's "Steam/Metacritic-style" skew);
  *   - per-host robots/crawl-delay budgets (north-rule extension);
  *   - injected 429/timeout faults driving backoff/suspension
  *     (rate_limiter.py:213-257);
  *   - one deterministic HTML page per URL, in per-site markup grammars
  *     echoing the reference's parser fixtures
  *     (tests/test_site_parsers_unit.py:29-60), with interleaved <img>
  *     media and outlinks for frontier expansion.
  */
object Fixtures {

  val Seed: Long = 42L

  // ---- deterministic RNG -------------------------------------------------
  /** splitmix64 — stateless; mix(seed, streamTag, index) -> 64 bits. */
  def mix(parts: Long*): Long = {
    var h = 0x9e3779b97f4a7c15L
    parts.foreach { p =>
      var z = h ^ (p * 0xbf58476d1ce4e5b9L)
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      h = z ^ (z >>> 31)
    }
    h
  }
  /** uniform [0, n) from a hash */
  def bounded(h: Long, n: Int): Int = { val m = (h % n).toInt; if (m < 0) m + n else m }
  def chance(h: Long, p: Double): Boolean = bounded(h, 1000000) < (p * 1000000).toInt

  // ---- site universe -----------------------------------------------------
  /** (host, grammar, weight‰). Two hot hosts hold ~50% of seed URLs. */
  val SiteTable: IndexedSeq[(String, String, Int)] = IndexedSeq(
    ("steam.example.org", "generic", 270),
    ("metacritic.example.org", "generic", 230),
    ("inven.example.kr", "inven", 110),
    ("ruliweb.example.kr", "ruliweb", 100),
    ("dcinside.example.kr", "dcinside", 90),
    ("board0.example.net", "generic", 40),
    ("board1.example.net", "inven", 35),
    ("board2.example.net", "ruliweb", 30),
    ("board3.example.net", "dcinside", 30),
    ("board4.example.net", "generic", 25),
    ("board5.example.net", "inven", 20),
    ("board6.example.net", "generic", 20),
  )
  val Hosts: IndexedSeq[String] = SiteTable.map(_._1)
  def grammarOf(host: String): String =
    SiteTable.find(_._1 == host).map(_._2).getOrElse("generic")

  def pickSite(h: Long): String = {
    val total = SiteTable.map(_._3).sum
    var r = bounded(h, total)
    SiteTable.find { case (_, _, w) => r -= w; r < 0 }.get._1
  }

  // ---- vocabulary (mixed Korean/English incl. sentiment + bug terms) -----
  val Keywords: IndexedSeq[String] = IndexedSeq("lostark", "7knights", "maplestory")
  val PositiveWords: IndexedSeq[String] =
    IndexedSeq("좋다", "재밌다", "최고", "추천", "행복", "감사", "멋지다", "갓겜", "fun", "great")
  val NegativeWords: IndexedSeq[String] =
    IndexedSeq("나쁘다", "최악", "실망", "짜증", "화나다", "망겜", "불편", "느리다", "bad", "awful")
  val BugWords: IndexedSeq[String] =
    IndexedSeq("버그", "오류", "에러", "크래시", "튕김", "렉", "bug", "error", "crash", "lag")
  val NeutralWords: IndexedSeq[String] = IndexedSeq(
    "게임", "업데이트", "패치", "이벤트", "캐릭터", "아이템", "길드", "서버", "레벨", "스킬",
    "던전", "보스", "퀘스트", "리뷰", "유저", "운영", "밸런스", "콘텐츠", "과금", "뽑기",
    "season", "guild", "raid", "meta", "build", "combo", "rank", "patch", "event", "server")
  private val AllWords = NeutralWords ++ PositiveWords ++ NegativeWords ++ BugWords

  def words(h: Long, n: Int, tag: Long): String = {
    val sb = new java.lang.StringBuilder(n * 8)
    appendWords(sb, h, n, tag)
    sb.toString
  }

  /** Byte-identical to words(), appended in place (the page generator is
    * memory-bandwidth-sensitive at bench scale — no intermediate seqs).
    */
  def appendWords(sb: java.lang.StringBuilder, h: Long, n: Int, tag: Long): Unit = {
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(AllWords(bounded(mix(h, tag, i.toLong), AllWords.length)))
      i += 1
    }
  }

  // ---- robots / politeness fixtures --------------------------------------
  /** Per-host crawl-delay + disallow prefixes. Default delay 3.0 mirrors
    * CrawlerConfig.default_delay (data_models.py:160).
    */
  def robots: Seq[RobotsRule] = SiteTable.map { case (host, _, _) =>
    val delay = host match {
      case "steam.example.org"      => 1.0
      case "metacritic.example.org" => 2.0
      case h if h.startsWith("board") => 0.5
      case _                        => 3.0
    }
    RobotsRule(host, delay, Seq("/admin", "/private", "/board/4"))
  }
  def robotsMap: Map[String, RobotsRule] = robots.map(r => r.host -> r).toMap

  // ---- URL universe -------------------------------------------------------
  /** Canonical page id space: https://{host}/board/{b}/post/{id}
    * b in [0,5) (board 4 is robots-disallowed), id in [0,1000).
    */
  def cleanUrl(host: String, board: Int, post: Int): String =
    s"https://$host/board/$board/post/$post"

  /** Raw-URL variant with case/slash/fragment/query noise (exercises
    * canonicalization — url_deduplicator.py:14-37).
    */
  def noisyUrl(host: String, board: Int, post: Int, h: Long): String = {
    var u = cleanUrl(host, board, post)
    bounded(mix(h, 101L), 4) match {
      case 0 => u = u.replace("https://", "HTTPS://").replace(host, host.toUpperCase)
      case 1 => u = u + "/"
      case 2 => u = u + "#comment_" + bounded(mix(h, 102L), 9)
      case _ => ()
    }
    if (chance(mix(h, 103L), 0.25)) u = u + (if (u.contains("#")) "" else "?ref=search")
    if (chance(mix(h, 104L), 0.15)) u = "  " + u + " "
    u
  }

  // ---- seed list ----------------------------------------------------------
  /** n seeds in canonical order: sites in SiteTable order × per-site result
    * order is NOT what the reference does — it iterates requested sites in
    * input order (orchestrator.py:291) collecting up to max_results each.
    * We model one big multi-site search: seed i picks a Zipf site, so the
    * global order is the adapter emission order. ~15% are noisy duplicates
    * of earlier seeds.
    */
  def seeds(n: Int, seed: Long = Seed): IndexedSeq[SeedRecord] = {
    val out = IndexedSeq.newBuilder[SeedRecord]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var i = 0
    while (i < n) {
      val h = mix(seed, 1L, i.toLong)
      val (host, board, post) =
        if (emitted.nonEmpty && chance(mix(h, 7L), 0.15)) {
          emitted(bounded(mix(h, 8L), emitted.length))
        } else {
          val s = pickSite(mix(h, 2L))
          (s, bounded(mix(h, 3L), 5), bounded(mix(h, 4L), 1000))
        }
      emitted += ((host, board, post))
      val kw = Keywords(bounded(mix(h, 5L), Keywords.length))
      val url = noisyUrl(host, board, post, mix(h, 6L))
      // title/snippet carry the keyword often enough that ~70% pass the
      // relevance threshold 0.5 (relevance_filter.py:107-132)
      val titleHasKw = chance(mix(h, 9L), 0.75)
      val snipHasKw = chance(mix(h, 10L), 0.6)
      val title = (if (titleHasKw) kw + " " else "") + words(h, 4, 11L)
      val snippet = (if (snipHasKw) kw + " " else "") + words(h, 10, 12L)
      out += SeedRecord(i.toLong, url, host, kw, title, snippet)
      i += 1
    }
    out.result()
  }

  /** Pure per-index seed for BENCH-scale frontiers (generated distributed
    * via spark.range — no sequential back-references like seeds()):
    * ~30% of URLs land on the 2 hot hosts (skew axis), the rest spread
    * over `nHosts` synthetic long-tail hosts; duplicates re-derive an
    * earlier index's primary page (one-level chain — dedup still
    * exercised at scale).
    */
  def benchSeed(i: Long, postRange: Int, nHosts: Int, seed: Long = Seed): SeedRecord = {
    val h = mix(seed, 61L, i)
    def primary(j: Long): (String, Int, Int) = {
      val hj = mix(seed, 61L, j)
      val host =
        if (bounded(mix(hj, 1L), 100) < 30)
          (if (bounded(mix(hj, 2L), 2) == 0) "steam.example.org" else "metacritic.example.org")
        else f"host${bounded(mix(hj, 3L), nHosts)}%04d.example.net"
      (host, bounded(mix(hj, 4L), 4), bounded(mix(hj, 5L), postRange))
    }
    val (host, board, post) =
      if (i > 0 && chance(mix(h, 7L), 0.15)) primary(bounded(mix(h, 8L), i.toInt.max(1)).toLong)
      else primary(i)
    val kw = Keywords(bounded(mix(h, 9L), Keywords.length))
    SeedRecord(i, noisyUrl(host, board, post, mix(h, 10L)), host, kw,
      kw + " " + words(h, 4, 11L), kw + " " + words(h, 8, 12L))
  }

  // ---- fetch faults -------------------------------------------------------
  /** Deterministic fault for a canonical URL, or None. ~3% 429 (count 1-2;
    * on long-tail board* hosts sometimes 4 straight → domain suspension
    * after exceeding max_retries=3, without nuking a hot host's corpus),
    * ~1.5% timeout, ~1% http_500.
    */
  def fault(canonUrl: String): Option[FetchFault] = {
    val h = mix(UrlCanon.hash64(canonUrl), 21L)
    val r = bounded(h, 1000)
    val canSuspend = UrlCanon.host(canonUrl).startsWith("board")
    if (r < 24) Some(FetchFault(canonUrl, "http_429",
      if (canSuspend && bounded(mix(h, 22L), 4) == 0) 4 else 1 + bounded(mix(h, 23L), 2)))
    else if (r < 39) Some(FetchFault(canonUrl, "timeout", 1))
    else if (r < 49) Some(FetchFault(canonUrl, "http_500", 1))
    else None
  }

  // ---- synthetic HTML corpus ----------------------------------------------
  /** Deterministic page for a canonical URL. ~2% are malformed (empty
    * title+body → parse-failure path, content_crawler.py:214-238).
    */
  def html(canonUrl: String): String = {
    val h = mix(UrlCanon.hash64(canonUrl), 31L)
    val host = UrlCanon.host(canonUrl)
    val grammar = grammarOf(host)
    if (chance(mix(h, 32L), 0.02)) return malformedPage(h)

    val title = words(h, 5, 33L)
    // bench-scale long-tail hosts (host%04d.example.net, see benchSeed)
    // carry ~8x heavier bodies so fetch+parse cost approximates real review
    // pages; the parity corpus (SiteTable hosts) is unaffected
    val sizeMul = if (host.startsWith("host")) 8 else 1
    val nSegs = (1 + bounded(mix(h, 34L), 3)) * sizeMul // 1..3 (×8 bench) body segments
    val nMedia = nSegs - 1 + (if (chance(mix(h, 35L), 0.3)) 1 else 0) // imgs between/after segs

    val author = "user" + bounded(mix(h, 38L), 5000)
    val y = 2024; val mo = 1 + bounded(mix(h, 39L), 12); val d = 1 + bounded(mix(h, 41L), 28)
    val hh = bounded(mix(h, 42L), 24); val mi = bounded(mix(h, 43L), 60)
    val date = f"$y%04d-$mo%02d-$d%02d $hh%02d:$mi%02d"
    val isoDate = f"$y%04d-$mo%02d-$d%02dT$hh%02d:$mi%02d:00"
    val views = bounded(mix(h, 44L), 50000)
    val likes = bounded(mix(h, 45L), 2000)
    val nComments = bounded(mix(h, 46L), 9)            // 0..8
    val comments = (0 until nComments).map { i =>
      val ch = mix(h, 47L, i.toLong)
      // per-comment date, emitted in the site's own markup below — the
      // reference's Comment carries created_at (data_models.py:17-49) and
      // its comment parsers extract it via the .date/.time/time ladder
      // (generic.py:303-314)
      val cmo = 1 + bounded(mix(ch, 3L), 12); val cd = 1 + bounded(mix(ch, 4L), 28)
      val chh = bounded(mix(ch, 5L), 24); val cmi = bounded(mix(ch, 6L), 60)
      val dateHtml = grammar match {
        case "inven"    => f"""<span class="date">${y % 100}%02d.$cmo%d.$cd%d</span>""" // YY ladder
        case "ruliweb"  => f"""<span class="date">$y%04d-$cmo%02d-$cd%02d $chh%02d:$cmi%02d</span>"""
        case "dcinside" => f"""<span class="time">$cmo%02d-$cd%02d-$y%04d</span>""" // MDY ladder
        case _          => f"""<time datetime="$y%04d-$cmo%02d-$cd%02dT$chh%02d:$cmi%02d:00">$y%04d-$cmo%02d-$cd%02d</time>"""
      }
      ("user" + bounded(ch, 5000), words(ch, 3 + bounded(mix(ch, 1L), 10), 48L),
        bounded(mix(ch, 2L), 100), dateHtml)
    }
    val nLinks = bounded(mix(h, 49L), 5)               // 0..4 outlinks, same host
    val links = (0 until nLinks).map { i =>
      val lh = mix(h, 50L, i.toLong)
      cleanUrl(host, bounded(lh, 5), bounded(mix(lh, 1L), 1000))
    }

    // interleave: seg0 img0 seg1 img1 ... (+ trailing img if nMedia==nSegs)
    // — appended in place, no per-segment intermediate strings
    val bodyFlow = new java.lang.StringBuilder(nSegs * 280 + nMedia * 48)
    (0 until math.max(nSegs, nMedia)).foreach { i =>
      if (i < nSegs) {
        bodyFlow.append("<p>")
        appendWords(bodyFlow, h, 12 + bounded(mix(h, 36L, i.toLong), 20), mix(40L, i.toLong))
        bodyFlow.append("</p>\n")
      }
      if (i < nMedia) {
        // media mix: mostly images, some audio clips and video embeds —
        // exercises all three real decode paths (PPM/WAV/Y4M) downstream
        val mh = mix(h, 37L, i.toLong)
        val ext = bounded(mix(mh, 1L), 6) match {
          case 4 => ".wav"
          case 5 => ".y4m"
          case _ => ".jpg"
        }
        bodyFlow.append("<img src=\"https://cdn.example.org/img/")
          .append(bounded(mh, 100000)).append(ext).append("\">\n")
      }
    }
    // comment pages of 4 blocks: pages ≥2 are announced by a sibling
    // <hr class="cpage"> marker (the fixture analogue of the reference's
    // paginated comment fetches, content_crawler.py:240-296 — one HTML
    // carries all pages; the parser honors the max_comment_pages cap)
    val commentHtml = comments.zipWithIndex.map { case ((a, c, l, dateHtml), i) =>
      val marker =
        if (i > 0 && i % 4 == 0) s"""<hr class="cpage" data-page="${i / 4 + 1}">\n""" else ""
      marker +
        s"""<div class="comment"><span class="author">$a</span><p class="ctext">$c</p>$dateHtml<span class="clike">$l</span></div>"""
    }.mkString("\n")
    val linkHtml = links.map(u => s"""<a href="$u">related</a>""").mkString("\n")

    grammar match {
      case "inven" =>
        s"""<html><head><title>$title - inven</title></head><body>
<div class="articleTitle">$title</div>
<span class="articleWriter">$author</span>
<span class="articleDate">${date.replace("-", ".")}</span>
<span class="articleHit">조회 ${grp(views)}</span>
<span class="articleLike">추천 ${grp(likes)}</span>
<div class="articleContent">
$bodyFlow</div>
<div class="cmtList">
$commentHtml
</div>
<div class="related">$linkHtml</div>
</body></html>"""
      case "ruliweb" =>
        s"""<html><head><title>$title - ruliweb</title></head><body>
<h1 class="subject_text">$title</h1>
<span class="nick">$author</span>
<span class="regdate">$date</span>
<span class="hit">조회 ${grp(views)}</span>
<span class="like_value">추천 ${grp(likes)}</span>
<div class="view_content">
$bodyFlow</div>
<div class="comment_view">
$commentHtml
</div>
<div class="related">$linkHtml</div>
</body></html>"""
      case "dcinside" =>
        s"""<html><head><title>$title - dc</title></head><body>
<span class="title_subject">$title</span>
<span class="nickname">$author</span>
<span class="gall_date">$date</span>
<span class="gall_count">조회 ${grp(views)}</span>
<span class="gall_reply_num">추천 ${grp(likes)}</span>
<div class="write_div">
$bodyFlow</div>
<div class="comment_box">
$commentHtml
</div>
<div class="related">$linkHtml</div>
</body></html>"""
      case _ =>
        s"""<html><head><title>$title</title></head><body>
<h1 class="title">$title</h1>
<span class="author">$author</span>
<time datetime="$isoDate">$date</time>
<span class="view-count">views ${grp(views)}</span>
<span class="like-count">likes ${grp(likes)}</span>
<div class="post-content">
$bodyFlow</div>
<div class="comments">
$commentHtml
</div>
<div class="related">$linkHtml</div>
</body></html>"""
    }
  }

  private def malformedPage(h: Long): String =
    s"""<html><body><div class="nav">${words(h, 3, 60L)}</div></body></html>"""

  /** 1,234-style digit grouping (exercises count extraction —
    * /root/reference/crawler/parsers/inven.py:246-294).
    */
  def grp(n: Int): String = f"$n%,d"
}

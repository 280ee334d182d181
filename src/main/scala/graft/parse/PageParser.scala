package graft.parse

import graft.core._
import scala.util.matching.Regex

/** Parsed page: canonical span flow + metadata + outlinks.
  * flow item kinds: title | body | media | comment (span order — SURVEY §1.5,
  * mirroring the reference parse order title→body→comments,
  * /root/reference/crawler/parsers/generic.py:69-115; media spans
  * interleaved at their discovery position inside the body flow).
  */
final case class ParseOut(
    title: String,
    author: String,
    createdAt: Option[java.time.LocalDateTime],
    viewCount: Int,
    likeCount: Int,
    spans: Vector[Span],
    outlinks: Vector[String],
    /** Comment records with the metadata the reference carries on Comment
      * (author, content, created_at, like_count — data_models.py:17-49);
      * span flow keeps only the text, this side-table keeps the rest.
      */
    comments: Vector[graft.core.ParsedComment])

/** Site-grammar parser registry — the Spark rebuild of the reference's
  * `ContentParser` ABC + `ParserRegistry` domain dispatch with
  * generic-parser fallback (/root/reference/crawler/parsers/base.py:16-163,
  * fallback chain content_crawler.py:180-238). Pure functions over the
  * synthetic HTML grammar: selector-priority ladders become ordered regex
  * attempts (first non-empty wins — generic.py:169-177).
  *
  * Returns None when title AND body are both empty after the generic
  * fallback (required-field validation, content_crawler.py:214-230).
  */
object PageParser {

  /** grammar tag per host — the registry's domain dispatch. */
  def grammarFor(host: String): String = graft.fixtures.Fixtures.grammarOf(host)

  /** `maxCommentPages`: the reference's comment pagination cap
    * (CrawlerConfig.max_comment_pages, default 3 — data_models.py:163);
    * comment blocks on pages beyond it are not collected.
    */
  def parse(html: String, url: String, maxCommentPages: Int = 3): Option[ParseOut] = {
    val host = UrlCanon.host(url)
    val primary = parseGrammar(html, grammarFor(host), maxCommentPages)
    val out = primary match {
      case Some(p) if p.title.nonEmpty || bodyText(p).nonEmpty => Some(p)
      case _ =>
        // fallback to the generic grammar (Requirements 4.4 analogue)
        parseGrammar(html, "generic", maxCommentPages)
          .filter(p => p.title.nonEmpty || bodyText(p).nonEmpty)
    }
    out
  }

  def bodyText(p: ParseOut): String =
    p.spans.collect { case Span("body", t, _, _) => t }.mkString("\n")

  // selector-priority tables per grammar: ordered (regex) attempts
  private val TitleSel: Map[String, Seq[Regex]] = Map(
    "inven" -> Seq("""<div class="articleTitle">(.*?)</div>""".r),
    "ruliweb" -> Seq("""<h1 class="subject_text">(.*?)</h1>""".r),
    "dcinside" -> Seq("""<span class="title_subject">(.*?)</span>""".r),
    "generic" -> Seq("""<h1 class="title">(.*?)</h1>""".r, """<title>(.*?)</title>""".r),
  )
  private val ContentSel: Map[String, Seq[Regex]] = Map(
    "inven" -> Seq("""(?s)<div class="articleContent">(.*?)</div>""".r),
    "ruliweb" -> Seq("""(?s)<div class="view_content">(.*?)</div>""".r),
    "dcinside" -> Seq("""(?s)<div class="write_div">(.*?)</div>""".r),
    "generic" -> Seq("""(?s)<div class="post-content">(.*?)</div>""".r),
  )
  private val AuthorSel: Map[String, Seq[Regex]] = Map(
    "inven" -> Seq("""<span class="articleWriter">(.*?)</span>""".r),
    "ruliweb" -> Seq("""<span class="nick">(.*?)</span>""".r),
    "dcinside" -> Seq("""<span class="nickname">(.*?)</span>""".r),
    "generic" -> Seq("""<span class="author">(.*?)</span>""".r),
  )
  private val DateSel: Map[String, Seq[Regex]] = Map(
    "inven" -> Seq("""<span class="articleDate">(.*?)</span>""".r),
    "ruliweb" -> Seq("""<span class="regdate">(.*?)</span>""".r),
    "dcinside" -> Seq("""<span class="gall_date">(.*?)</span>""".r),
    "generic" -> Seq("""<time datetime="(.*?)"""".r),
  )
  private val ViewSel: Map[String, Seq[Regex]] = Map(
    "inven" -> Seq("""<span class="articleHit">(.*?)</span>""".r),
    "ruliweb" -> Seq("""<span class="hit">(.*?)</span>""".r),
    "dcinside" -> Seq("""<span class="gall_count">(.*?)</span>""".r),
    "generic" -> Seq("""<span class="view-count">(.*?)</span>""".r),
  )
  private val LikeSel: Map[String, Seq[Regex]] = Map(
    "inven" -> Seq("""<span class="articleLike">(.*?)</span>""".r),
    "ruliweb" -> Seq("""<span class="like_value">(.*?)</span>""".r),
    "dcinside" -> Seq("""<span class="gall_reply_num">(.*?)</span>""".r),
    "generic" -> Seq("""<span class="like-count">(.*?)</span>""".r),
  )

  private val PTag = """(?s)<p>(.*?)</p>|<img src="(.*?)">""".r
  /** One alternation over the comment region: page markers and comment
    * blocks in document order (a marker announces the pagination page of
    * the blocks that follow it; unmarked leading blocks are page 1).
    */
  private val CommentOrPage =
    """(?s)<hr class="cpage" data-page="(\d+)">|<div class="comment">(.*?)</div>""".r
  private val CAuthor = """<span class="author">(.*?)</span>""".r
  private val CText = """(?s)<p class="ctext">(.*?)</p>""".r
  private val CLike = """<span class="clike">(\d+)</span>""".r
  // comment-date ladder, in the reference's selector order '.date', '.time',
  // 'time[datetime]' (generic.py:303-314); the datetime attr goes through
  // the same date ladder (IsoPat first = fromisoformat semantics)
  private val CDateSpan = """<span class="date">(.*?)</span>""".r
  private val CTimeSpan = """<span class="time">(.*?)</span>""".r
  private val CTimeAttr = """<time datetime="(.*?)"""".r
  private val IsoOut = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
  private val Outlink = """<a href="(.*?)">""".r
  private val Digits = """\d[\d,]*""".r
  // date-string ladder, tried in the reference's order (F4):
  //   1. ISO datetime attr incl. trailing 'Z' → fromisoformat semantics
  //      (generic.py:215-219, inven.py:203-207)
  //   2. YYYY sep M sep D [H:MM] (generic.py:233, inven.py:221-222)
  //   3. M sep D sep YYYY (generic.py:234 — US order, year last)
  //   4. YY sep M sep D → year + 2000 (inven.py:223,232-240)
  private val IsoPat =
    """(\d{4})-(\d{2})-(\d{2})[tT](\d{2}):(\d{2})(?::(\d{2}))?(?:[zZ]|[+-]\d{2}:\d{2})?""".r
  private val DatePat = """(\d{4})[.\-/](\d{1,2})[.\-/](\d{1,2})(?:[ T](\d{1,2}):(\d{2}))?""".r
  private val MdyPat = """(\d{1,2})[.\-/](\d{1,2})[.\-/](\d{4})""".r
  private val YyPat = """(\d{2})[.\-](\d{1,2})[.\-](\d{1,2})""".r // date-only, like inven.py:223

  private def firstMatch(html: String, sels: Seq[Regex]): String =
    sels.iterator.flatMap(_.findFirstMatchIn(html)).map(_.group(1).trim).find(_.nonEmpty).getOrElse("")

  /** Single-pass metadata scanner: the five selector ladders (title,
    * author, date, views, likes) of one grammar fused into ONE regex
    * alternation, scanned once per page instead of five+ separate
    * full-document scans — the parser is memory-bandwidth-bound at crawl
    * bench scale. Semantics are identical to the per-ladder firstMatch:
    * each slot keeps its FIRST document occurrence (alternatives start
    * with distinct literals, so per-position ambiguity is impossible),
    * and ladder priority + trim/nonEmpty fallback are applied on the
    * collected slots afterwards.
    */
  private final class MetaScan(ladders: Seq[Seq[String]]) {
    private val flat: Array[String] = ladders.flatten.toArray
    private val ladderOffsets: Array[(Int, Int)] = {
      var off = 0
      ladders.map { l => val r = (off, l.length); off += l.length; r }.toArray
    }
    private val pattern = java.util.regex.Pattern.compile(flat.mkString("|"))

    /** found(i) = first occurrence of slot i's capture, or null.
      * The scan resumes ONE CHAR past each match START (not at the match
      * end), so a slot whose only occurrence begins inside another slot's
      * matched span is still seen — semantics identical to running each
      * ladder's firstMatch independently, even for overlapping/nested
      * markup. Cost: each restart re-examines the matched span once; slot
      * count (≤ a dozen) bounds the number of restarts.
      */
    def scan(html: String): Array[String] = {
      val found = new Array[String](flat.length)
      var remaining = flat.length
      val m = pattern.matcher(html)
      var from = 0
      while (remaining > 0 && from < html.length && m.find(from)) {
        var g = 0
        while (g < flat.length) {
          if (found(g) == null && m.group(g + 1) != null) {
            found(g) = m.group(g + 1); remaining -= 1
          }
          g += 1
        }
        from = m.start() + 1
      }
      found
    }

    /** firstMatch semantics over ladder `i`: first ladder entry whose
      * first occurrence trims non-empty.
      */
    def value(found: Array[String], i: Int): String = {
      val (off, len) = ladderOffsets(i)
      var k = 0
      while (k < len) {
        val v = found(off + k)
        if (v != null) { val t = v.trim; if (t.nonEmpty) return t }
        k += 1
      }
      ""
    }
  }

  private val MetaScans: Map[String, MetaScan] =
    Seq("inven", "ruliweb", "dcinside", "generic").map { g =>
      g -> new MetaScan(Seq(
        TitleSel(g).map(_.pattern.pattern), AuthorSel(g).map(_.pattern.pattern),
        DateSel(g).map(_.pattern.pattern), ViewSel(g).map(_.pattern.pattern),
        LikeSel(g).map(_.pattern.pattern)))
    }.toMap

  private def extractCount(s: String): Int =
    Digits.findFirstIn(s).map(_.replace(",", "").toInt).getOrElse(0)

  private def ldt(y: Int, mo: Int, d: Int, hh: Int = 0, mi: Int = 0, ss: Int = 0) =
    try Some(java.time.LocalDateTime.of(y, mo, d, hh, mi, ss))
    catch { case _: Exception => None } // ValueError → fall through, like the reference

  private[graft] def parseDate(s: String): Option[java.time.LocalDateTime] = {
    val iso = IsoPat.findFirstMatchIn(s).flatMap { m =>
      ldt(m.group(1).toInt, m.group(2).toInt, m.group(3).toInt,
        m.group(4).toInt, m.group(5).toInt, Option(m.group(6)).map(_.toInt).getOrElse(0))
    }
    def ymd = DatePat.findFirstMatchIn(s).flatMap { m =>
      ldt(m.group(1).toInt, m.group(2).toInt, m.group(3).toInt,
        Option(m.group(4)).map(_.toInt).getOrElse(0),
        Option(m.group(5)).map(_.toInt).getOrElse(0))
    }
    def mdy = MdyPat.findFirstMatchIn(s).flatMap { m =>
      ldt(m.group(3).toInt, m.group(1).toInt, m.group(2).toInt)
    }
    def yy = YyPat.findFirstMatchIn(s).flatMap { m =>
      ldt(m.group(1).toInt + 2000, m.group(2).toInt, m.group(3).toInt)
    }
    iso.orElse(ymd).orElse(mdy).orElse(yy)
  }

  private def parseGrammar(html: String, grammar: String,
      maxCommentPages: Int = 3): Option[ParseOut] = {
    val meta = MetaScans(grammar)
    val found = meta.scan(html)
    val title = meta.value(found, 0)
    val contentMatch = ContentSel(grammar).iterator
      .flatMap(_.findFirstMatchIn(html)).find(_.group(1).trim.nonEmpty)
    val content = contentMatch.map(_.group(1)).getOrElse("")
    if (title.isEmpty && content.isEmpty) return None

    val spans = Vector.newBuilder[Span]
    var off = 0
    def add(kind: String, text: String, ref: String): Unit = { spans += Span(kind, text, ref, off); off += 1 }
    add("title", title, null)
    PTag.findAllMatchIn(content).foreach { m =>
      if (m.group(1) != null) { val t = m.group(1).trim; if (t.nonEmpty) add("body", t, null) }
      else add("media", null, m.group(2))
    }
    // comments follow the body flow in document order; scan from the
    // content position via a matcher REGION (no 16 KB substring copy).
    // Pagination cap: blocks announced under a page marker > maxCommentPages
    // are NOT collected — the reference fetches at most max_comment_pages
    // comment pages per post (content_crawler.py:240-296, default 3).
    val regionStart = contentMatch.map(_.start(1)).getOrElse(0)
    val cm = CommentOrPage.pattern.matcher(html)
    cm.region(regionStart, html.length)
    val comments = {
      val b = Vector.newBuilder[String]
      var page = 1
      while (page <= maxCommentPages && cm.find()) {
        if (cm.group(1) != null)
          // markers are tracked MONOTONICALLY: arbitrary HTML can carry a
          // decreasing marker sequence ("page 5" … "page 2") and the cap
          // must not re-open once passed. Beyond-Int numerals degrade to
          // "past the cap" (stop collecting), never throw mid-parse.
          page = math.max(page,
            cm.group(1).toIntOption.getOrElse(maxCommentPages + 1))
        else if (page <= maxCommentPages) b += cm.group(2)
      }
      b.result()
    }
    val parsedComments = comments.flatMap { c =>
      val text = CText.findFirstMatchIn(c).map(_.group(1).trim).getOrElse("")
      if (text.isEmpty) None
      else {
        val dateStr = CDateSpan.findFirstMatchIn(c).map(_.group(1))
          .orElse(CTimeSpan.findFirstMatchIn(c).map(_.group(1)))
          .orElse(CTimeAttr.findFirstMatchIn(c).map(_.group(1)))
        Some(graft.core.ParsedComment(
          CAuthor.findFirstMatchIn(c).map(_.group(1)).getOrElse("익명"), text,
          createdAt = dateStr.flatMap(parseDate).map(_.format(IsoOut)),
          CLike.findFirstMatchIn(c).map(_.group(1).toInt).getOrElse(0)))
      }
    }
    parsedComments.foreach(pc => add("comment", pc.content, null))

    val author = meta.value(found, 1)
    val dateStr = meta.value(found, 2)
    val outlinks = Outlink.findAllMatchIn(html).map(_.group(1)).toVector

    Some(ParseOut(
      title = title,
      author = author,
      createdAt = parseDate(dateStr),
      viewCount = extractCount(meta.value(found, 3)),
      likeCount = extractCount(meta.value(found, 4)),
      spans = spans.result(),
      outlinks = outlinks,
      comments = parsedComments))
  }
}

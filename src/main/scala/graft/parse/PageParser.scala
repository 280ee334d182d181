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

  def parse(html: String, url: String): Option[ParseOut] = {
    val host = UrlCanon.host(url)
    val primary = parseGrammar(html, grammarFor(host))
    val out = primary match {
      case Some(p) if p.title.nonEmpty || bodyText(p).nonEmpty => Some(p)
      case _ =>
        // fallback to the generic grammar (Requirements 4.4 analogue)
        parseGrammar(html, "generic").filter(p => p.title.nonEmpty || bodyText(p).nonEmpty)
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
  private val CommentBlock = """(?s)<div class="comment">(.*?)</div>""".r
  private val CAuthor = """<span class="author">(.*?)</span>""".r
  private val CText = """(?s)<p class="ctext">(.*?)</p>""".r
  private val CLike = """<span class="clike">(\d+)</span>""".r
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

  private def parseGrammar(html: String, grammar: String): Option[ParseOut] = {
    val title = firstMatch(html, TitleSel(grammar))
    val content = ContentSel(grammar).iterator
      .flatMap(_.findFirstMatchIn(html)).map(_.group(1)).find(_.trim.nonEmpty).getOrElse("")
    if (title.isEmpty && content.isEmpty) return None

    val spans = Vector.newBuilder[Span]
    var off = 0
    def add(kind: String, text: String, ref: String): Unit = { spans += Span(kind, text, ref, off); off += 1 }
    add("title", title, null)
    PTag.findAllMatchIn(content).foreach { m =>
      if (m.group(1) != null) { val t = m.group(1).trim; if (t.nonEmpty) add("body", t, null) }
      else add("media", null, m.group(2))
    }
    // comments follow the body flow in document order
    val commentRegion = html.substring(html.indexOf(content) match { case -1 => 0; case i => i })
    val comments = CommentBlock.findAllMatchIn(commentRegion).map(_.group(1)).toVector
    val parsedComments = comments.flatMap { c =>
      val text = CText.findFirstMatchIn(c).map(_.group(1).trim).getOrElse("")
      if (text.isEmpty) None
      else Some(graft.core.ParsedComment(
        CAuthor.findFirstMatchIn(c).map(_.group(1)).getOrElse("익명"), text,
        createdAt = None, // fixture comment blocks carry no date (generic.py comments don't either)
        CLike.findFirstMatchIn(c).map(_.group(1).toInt).getOrElse(0)))
    }
    parsedComments.foreach(pc => add("comment", pc.content, null))

    val author = firstMatch(html, AuthorSel(grammar))
    val dateStr = firstMatch(html, DateSel(grammar))
    val outlinks = Outlink.findAllMatchIn(html).map(_.group(1)).toVector

    Some(ParseOut(
      title = title,
      author = author,
      createdAt = parseDate(dateStr),
      viewCount = extractCount(firstMatch(html, ViewSel(grammar))),
      likeCount = extractCount(firstMatch(html, LikeSel(grammar))),
      spans = spans.result(),
      outlinks = outlinks,
      comments = parsedComments))
  }
}

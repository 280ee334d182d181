package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Keyword extraction with the exact semantics of the reference's
  * KeywordExtractor (/root/reference/crawler/analysis/keyword_extractor.py):
  *
  *   - preprocess (:82-106): strip URLs, strip HTML tags, keep only
  *     word chars / whitespace / Hangul (Python \w is Unicode-aware →
  *     Java (?U) flag), collapse whitespace, lowercase;
  *   - tokenize (:108-156): whitespace split, keep length ∈ [2, 20], and
  *     for Korean tokens of length ≥ 4 additionally emit all 2-grams and
  *     3-grams;
  *   - stopword filter (:158-167) over a ~100-term Korean list;
  *   - per-post keywords (:200-217): title×2 + body + comments, top-100 by
  *     frequency with Counter.most_common tie-break = first-occurrence
  *     order (SURVEY §7.4.2);
  *   - corpus keywords (:219-249): per-post top-100 sets accumulated —
  *     i.e. DOCUMENT frequency — top-N with tie-break = global
  *     first-insertion order (first post's seq, then rank within it).
  *
  * Per-post extraction is row-local (a pure Scala function applied once per
  * document); the corpus aggregation is a distributed explode + two-level
  * hash aggregation with an order-preserving min(struct(seq, rank)) key for
  * exact tie parity.
  */
object Keywords {

  /** The reference's DEFAULT_STOPWORDS ported verbatim
    * (keyword_extractor.py:29-55: particles, pronouns,
    * conjunctions/adverbs, verb/adjective endings, common nouns, gaming
    * community fillers, number words); injectable like the reference's
    * constructor arg.
    */
  val Stopwords: Set[String] = Set(
    // particles
    "이", "가", "은", "는", "을", "를", "의", "에", "에서", "로", "으로",
    "와", "과", "도", "만", "까지", "부터", "에게", "한테", "께",
    // pronouns
    "나", "너", "저", "우리", "그", "그녀", "이것", "저것", "그것",
    // conjunctions / adverbs
    "그리고", "그러나", "하지만", "그래서", "따라서", "또한", "또",
    "그런데", "그러면", "그렇지만", "왜냐하면", "즉", "곧",
    // common verb/adjective endings
    "하다", "되다", "있다", "없다", "같다", "보다", "주다", "받다",
    "한다", "된다", "있는", "없는", "같은", "보는", "주는", "받는",
    "했다", "됐다", "있었다", "없었다", "같았다", "봤다", "줬다", "받았다",
    "합니다", "됩니다", "있습니다", "없습니다", "같습니다",
    "해요", "돼요", "있어요", "없어요", "같아요",
    // common words
    "것", "수", "등", "때", "중", "더", "잘", "못", "안", "좀",
    "정말", "진짜", "너무", "매우", "아주", "완전", "엄청",
    "이번", "다음", "지금", "오늘", "어제", "내일",
    "여기", "거기", "저기", "어디",
    // gaming community fillers
    "게임", "유저", "플레이", "플레이어", "캐릭터", "캐릭",
    "ㅋㅋ", "ㅋㅋㅋ", "ㅋㅋㅋㅋ", "ㅎㅎ", "ㅎㅎㅎ",
    "ㅠㅠ", "ㅜㅜ", "ㅠㅠㅠ", "ㅜㅜㅜ",
    // number words
    "하나", "둘", "셋", "넷", "다섯")

  private val UrlRe = "https?://\\S+".r
  private val TagRe = "<[^>]+>".r
  private val NonWordRe = "(?U)[^\\w\\s가-힣]".r
  private val WsRe = "\\s+".r
  private val HangulRe = "[가-힣]".r

  def preprocess(text: String): String = {
    if (text == null || text.isEmpty) return ""
    var t = UrlRe.replaceAllIn(text, "")
    t = TagRe.replaceAllIn(t, "")
    t = NonWordRe.replaceAllIn(t, " ")
    t = WsRe.replaceAllIn(t, " ")
    t.trim.toLowerCase
  }

  def isKorean(s: String): Boolean = HangulRe.findFirstIn(s).isDefined

  def tokenize(processed: String, minLen: Int = 2, maxLen: Int = 20): Vector[String] = {
    if (processed.isEmpty) return Vector.empty
    val out = Vector.newBuilder[String]
    processed.split(" ").foreach { token =>
      if (token.length >= minLen && token.length <= maxLen) {
        out += token
        if (token.length >= 4 && isKorean(token)) {
          var i = 0
          while (i < token.length - 1) { out += token.substring(i, i + 2); i += 1 }
          i = 0
          while (i < token.length - 2) { out += token.substring(i, i + 3); i += 1 }
        }
      }
    }
    out.result()
  }

  /** Counter.most_common semantics: (count desc, first-occurrence asc). */
  def topByFrequency(tokens: Seq[String], topN: Int): Vector[String] = {
    val counts = mutable.LinkedHashMap.empty[String, Int]
    tokens.foreach(t => counts.updateWith(t) { case Some(c) => Some(c + 1); case None => Some(1) })
    counts.toVector.zipWithIndex
      .sortBy { case ((_, c), i) => (-c, i) }
      .take(topN).map(_._1._1)
  }

  /** extract_from_text: preprocess → tokenize → stopword filter → top-N. */
  def extractFromText(text: String, topN: Int = 20,
      stopwords: Set[String] = Stopwords): Vector[String] =
    topByFrequency(tokenize(preprocess(text)).filterNot(stopwords), topN)

  /** extract_from_post: title×2 + body + comments (keyword_extractor.py:200-217). */
  def extractFromPost(title: String, body: String, comments: Seq[String],
      topN: Int = 100): Vector[String] = {
    val t = Option(title).getOrElse(""); val b = Option(body).getOrElse("")
    val combined = (s"$t $t $b" +: Option(comments).getOrElse(Seq.empty)).mkString(" ")
    extractFromText(combined, topN)
  }

  private val postKwU = udf((title: String, body: String, comments: Seq[String]) =>
    extractFromPost(title, body, comments, 100))

  /** Per-doc top-100 keyword arrays (ordered). Input needs title/spans;
    * output adds `post_keywords`.
    */
  def withPostKeywords(docs: DataFrame): DataFrame =
    docs
      .withColumn("post_keywords",
        postKwU(col("title"), Sentiment.bodyCol, Sentiment.commentsCol))

  /** A1 corpus document-frequency top-N with exact tie parity:
    * returns (keyword, cnt, first_seen struct(seq, rank)). `seq` must be
    * the canonical post order (crawl seq).
    */
  def corpusTopKeywords(withKw: DataFrame, topN: Int = 50): DataFrame =
    withKw
      .select(col("seq"), posexplode(col("post_keywords")).as(Seq("rank", "keyword")))
      .groupBy(col("keyword"))
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("seq"), col("rank"))).as("first_seen"))
      .orderBy(col("cnt").desc, col("first_seen"))
      .limit(topN)
}

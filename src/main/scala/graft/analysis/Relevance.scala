package graft.analysis

/** Keyword relevance scoring with the exact semantics of the reference's
  * RelevanceFilter (/root/reference/crawler/utils/relevance_filter.py:30-93):
  *
  *   score = 0.6 * (title keyword-match ratio)
  *         + 0.4 * (content keyword-match ratio)
  *         + min(0.3, 0.3 * (1 - 1/(1 + totalFreq * 0.1)))   [if freq > 0]
  *   clamped to [0, 1]; keywords lowercased+trimmed; frequency counts are
  *   non-overlapping substring occurrences (Python re.findall on the
  *   escaped keyword), over title + content.
  *
  * Pure function, shared by the sequential oracle and (as a UDF) the Spark
  * seed-filter stage. Results below the threshold (default 0.5,
  * data_models.py:162) are dropped (relevance_filter.py:107-132).
  */
object Relevance {

  /** Non-overlapping substring occurrence count (Python re.findall /
    * str.count semantics: scan left-to-right, step past each match).
    */
  def countOccurrences(haystack: String, needle: String): Int = {
    if (needle.isEmpty || haystack.isEmpty) return 0
    var i = 0; var n = 0
    while ({ i = haystack.indexOf(needle, i); i >= 0 }) { n += 1; i += needle.length }
    n
  }

  def score(content: String, keywords: Seq[String], title: String): Double = {
    val kws = keywords.map(_.trim.toLowerCase).filter(_.nonEmpty)
    if (kws.isEmpty) return 0.0
    val c = if (content == null) "" else content.toLowerCase
    val t = if (title == null) "" else title.toLowerCase

    var titleScore = 0.0; var bodyScore = 0.0; var totalFreq = 0
    kws.foreach { kw =>
      if (t.contains(kw)) titleScore += 1.0
      if (c.contains(kw)) bodyScore += 1.0
      totalFreq += countOccurrences(t, kw) + countOccurrences(c, kw)
    }
    val k = kws.length
    val base = (titleScore / k) * 0.6 + (bodyScore / k) * 0.4
    val bonus = if (totalFreq > 0) math.min(0.3, 0.3 * (1.0 - 1.0 / (1.0 + totalFreq * 0.1))) else 0.0
    math.min(1.0, math.max(0.0, base + bonus))
  }
}

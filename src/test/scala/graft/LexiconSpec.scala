package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.{Issues, Keywords, Sentiment}

/** Pins the semantic data tables to the reference's real lists (VERDICT r1
  * item 2): the bundled lexicon files are the reference's own
  * crawler/analysis/lexicon/{positive,negative}.txt (181/289 physical
  * lines → 174/279 distinct words after the loader's blank/comment
  * filtering, sentiment.py:43-72), DEFAULT_STOPWORDS has 123 distinct
  * terms (keyword_extractor.py:29-55) and BUG_KEYWORDS 28 distinct terms
  * (issue_detector.py:40-46).
  */
class LexiconSpec extends AnyFunSuite {

  test("positive lexicon matches the reference file (174 loaded words)") {
    assert(Sentiment.PositiveLexicon.size == 174)
    // spot checks across the file's sections
    Seq("좋다", "갓겜", "꿀잼", "명작", "추천", "최고").foreach(w =>
      assert(Sentiment.PositiveLexicon.contains(w), w))
    assert(!Sentiment.PositiveLexicon.contains("# 일반 긍정 표현"))
  }

  test("negative lexicon matches the reference file (279 loaded words)") {
    assert(Sentiment.NegativeLexicon.size == 279)
    Seq("나쁘다", "최악", "망겜", "버그", "렉", "쓰레기").foreach(w =>
      assert(Sentiment.NegativeLexicon.contains(w), w))
  }

  test("loader skips comments and blank lines (sentiment.py:43-72 parity)") {
    val tmp = java.nio.file.Files.createTempFile("lex", ".txt")
    java.nio.file.Files.writeString(tmp, "# comment\n\n  좋다  \nword\n#x\n")
    assert(Sentiment.loadLexicon(tmp.toString) == Set("좋다", "word"))
  }

  test("stopword list is the reference's full DEFAULT_STOPWORDS (123 terms)") {
    assert(Keywords.Stopwords.size == 123)
    Seq("에게", "한테", "께", "왜냐하면", "플레이어", "ㅋㅋㅋㅋ", "다섯",
      "합니다", "같았다").foreach(w => assert(Keywords.Stopwords.contains(w), w))
  }

  test("bug keyword list is the reference's full BUG_KEYWORDS (28 distinct)") {
    assert(Issues.BugKeywords.size == 28)
    Seq("접속불가", "프리징", "오작동", "작동안함", "실행안됨", "로딩",
      "서버다운", "긴급점검", "안돼").foreach(w =>
      assert(Issues.BugKeywords.contains(w), w))
  }
}

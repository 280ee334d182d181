package graft.tools

import graft.analysis.Sentiment

/** Micro-benchmark of the sentiment scorer's two implementations over a
  * deterministic synthetic corpus: the reference-shaped naive path
  * (453 substring scans per doc, sentiment.py:94-130) vs the one-pass
  * Aho-Corasick automaton the engine runs. Pure JVM (no Spark) — the
  * scorer is a per-row function, so single-thread cost IS the per-core
  * executor cost at 100 TB. Prints one JSON line.
  *
  * Usage: runMain graft.tools.LexiconBench [nDocs] [wordsPerDoc] [lexiconPct]
  */
object LexiconBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toInt).getOrElse(5000)
    val wordsPerDoc = args.lift(1).map(_.toInt).getOrElse(120)
    // fraction of words drawn from the lexicons (default 10% — review text
    // is mostly non-sentiment vocabulary)
    val lexiconPct = args.lift(2).map(_.toInt).getOrElse(10)
    val pos = Sentiment.PositiveLexicon
    val neg = Sentiment.NegativeLexicon
    val lexWords = (pos.toVector ++ neg.toVector).sorted
    val filler = Vector("게임", "서버", "패치", "업데이트", "유저", "플레이",
      "스킬", "아이템", "레벨", "점검", "이벤트", "보스", "던전", "퀘스트",
      "오늘", "어제", "내일", "시간", "친구", "길드", "파티", "랭킹",
      "장비", "강화", "뽑기", "확률", "공지", "채널", "계정", "설정")
    val docs = (0 until nDocs).map { d =>
      val sb = new StringBuilder
      var w = 0
      while (w < wordsPerDoc) {
        val h = graft.fixtures.Fixtures.mix(99L, d.toLong, w.toLong)
        val pick = ((h % 100) + 100) % 100
        val v = if (pick < lexiconPct) lexWords else filler
        val h2 = graft.fixtures.Fixtures.mix(77L, d.toLong, w.toLong)
        sb.append(v((((h2 % v.length) + v.length) % v.length).toInt))
        sb.append(' ')
        w += 1
      }
      Sentiment.preprocess(sb.result())
    }

    def time(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val sum = body
      ((System.nanoTime() - t0) / 1e9, sum)
    }

    // warm both paths (JIT) on a slice, then time full passes
    docs.take(200).foreach { d =>
      Sentiment.hits2(d, pos, neg)
      Sentiment.naiveHits(d, pos) + Sentiment.naiveHits(d, neg)
    }
    val (acSec, acSum) = time {
      var s = 0L
      docs.foreach { d => val (a, b) = Sentiment.hits2(d, pos, neg); s += a + b }
      s
    }
    val (naiveSec, naiveSum) = time {
      var s = 0L
      docs.foreach(d => s += Sentiment.naiveHits(d, pos) + Sentiment.naiveHits(d, neg))
      s
    }
    require(acSum == naiveSum, s"count mismatch: ac=$acSum naive=$naiveSum")
    println(f"""{"metric":"lexicon_scorer_speedup","value":${naiveSec / acSec}%.1f,""" +
      f""""unit":"x","naive_sec":$naiveSec%.3f,"aho_corasick_sec":$acSec%.3f,""" +
      f""""docs":$nDocs,"words_per_doc":$wordsPerDoc,"lexicon_pct":$lexiconPct,"terms":${pos.size + neg.size},""" +
      f""""total_hits":$acSum}""")
  }
}

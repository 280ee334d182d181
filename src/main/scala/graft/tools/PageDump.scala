package graft.tools

/** Fixture-corpus stability check: md5 over a seeded sample of generated
  * pages (used to prove generator refactors stay byte-identical).
  * Usage: runMain graft.tools.PageDump [n] > hashes.txt
  */
object PageDump {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(2000)
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until n).foreach { i =>
      val s = graft.fixtures.Fixtures.benchSeed(i.toLong, postRange = 200000, nHosts = 1024)
      val canon = graft.core.UrlCanon.canonicalize(s.url)
      val h = md.digest(graft.fixtures.Fixtures.html(canon).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      println(s"$canon $h")
    }
    (0 until n).foreach { i =>
      val s = graft.fixtures.Fixtures.seeds(1, seed = 42L + i).head
      val canon = graft.core.UrlCanon.canonicalize(s.url)
      val h = md.digest(graft.fixtures.Fixtures.html(canon).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      println(s"$canon $h")
    }
  }
}

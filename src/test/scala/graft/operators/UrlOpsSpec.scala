package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The URL canonicalizer against hand-picked edge cases — the rules
  * the oracle's closed forms assume, stated one assertion each. */
class UrlOpsSpec extends AnyFunSuite {
  import UrlOps.canonicalize

  test("scheme and host lowercase; path case preserved") {
    assert(canonicalize("HTTPS://WWW.Ex.COM/A/B") == "https://www.ex.com/A/B")
  }

  test("default ports strip per scheme; load-bearing ports stay") {
    assert(canonicalize("http://a.com:80/x") == "http://a.com/x")
    assert(canonicalize("https://a.com:443/x") == "https://a.com/x")
    assert(canonicalize("http://a.com:443/x") == "http://a.com:443/x")
    assert(canonicalize("https://a.com:8080/x") == "https://a.com:8080/x")
  }

  test("fragments drop; tracking params drop; survivors sort by (key, value)") {
    assert(canonicalize("http://a.com/p?utm_source=x&b=2&a=1#frag") ==
      "http://a.com/p?a=1&b=2")
    assert(canonicalize("http://a.com/p?gclid=z&fbclid=y&utm_campaign=c") ==
      "http://a.com/p")
    assert(canonicalize("http://a.com/p?b=2&b=1&a=9") ==
      "http://a.com/p?a=9&b=1&b=2")
    // a bare flag and an explicit empty value are DIFFERENT URLs —
    // the canonical form preserves which one arrived
    assert(canonicalize("http://a.com/p?flag&a=1") ==
      "http://a.com/p?a=1&flag")
    assert(canonicalize("http://a.com/p?flag=&a=1") ==
      "http://a.com/p?a=1&flag=")
  }

  test("one trailing slash strips on non-root paths; root survives") {
    assert(canonicalize("http://a.com/x/") == "http://a.com/x")
    assert(canonicalize("http://a.com/") == "http://a.com/")
    assert(canonicalize("http://a.com") == "http://a.com")
  }

  test("param-permuted and tracking-decorated dupes collide") {
    val a = canonicalize("https://A.com/p?b=2&a=1&utm_source=x")
    val b = canonicalize("HTTPS://a.COM:443/p/?a=1&b=2#top")
    assert(a == b)
  }

  test("unparseable inputs pass through unchanged") {
    assert(canonicalize("not a url") == "not a url")
    assert(canonicalize("mailto:x@y.z") == "mailto:x@y.z")
    assert(canonicalize("://nohost") == "://nohost")
  }

  test("canonicalize is idempotent: a canonical URL is its own fixpoint") {
    // the property every frontier relies on — re-canonicalizing a
    // stored canonical key must never move it (else two crawls of
    // the same frontier disagree with each other)
    val inputs = (0L to 60L).map(UrlOps.messyUrl) ++ Seq(
      "HTTPS://A.com:443/p/?b=2&a=1&utm_source=x#f",
      "http://a.com:8080/X/Y/?z=1",
      "http://a.com/", "http://a.com", "not a url",
      "https://a.com/p?only=1", "http://a.com/p?gclid=x")
    inputs.foreach { u =>
      val once = canonicalize(u)
      assert(canonicalize(once) == once, s"not a fixpoint: $u -> $once")
    }
  }

  test("fuzz: canonicalize never throws and is a fixpoint on arbitrary bytes") {
    // a crawl frontier feeds this function whatever the wild web
    // emits — it must never throw, and its output must be stable
    // under re-canonicalization (explicit seeds: reproducible without
    // the scalatest-scalacheck bridge, the DedupPropertySpec pattern)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val urlish = Gen.frequency(
      3 -> (for {
        scheme <- Gen.oneOf("http", "HTTPS", "ftp", "", "ht tp")
        host <- Gen.oneOf("A.com", "x", "", "a.b.c.d", "[::1]", "a.com:")
        port <- Gen.oneOf("", ":80", ":443", ":0", ":99999", ":x1")
        path <- Gen.oneOf("", "/", "/P/q/", "//", "/%2F", "/a?b")
        q <- Gen.oneOf("", "?", "?&", "?a", "?a=", "?=v", "?a=1&a=1",
          "?utm_source", "?utm_source=&z==x")
        f <- Gen.oneOf("", "#", "#x#y", "#?a=1")
      } yield s"$scheme://$host$port$path$q$f"),
      1 -> Gen.asciiPrintableStr,
      1 -> Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue))
        .map(_.mkString))
    (1L to 400L).foreach { seed =>
      val u = urlish(Gen.Parameters.default, Seed(seed)).getOrElse("")
      val once = UrlOps.canonicalize(u) // must not throw
      assert(UrlOps.canonicalize(once) == once,
        s"seed=$seed not a fixpoint: ${u.take(80)} -> ${once.take(80)}")
    }
  }

  test("fixture closed form: the oracle's construction equals the parser's work") {
    for (id <- 0L to 40L) {
      val scheme = if (id % 2 == 0) "https" else "http"
      val port =
        if (id % 5 == 0 && id % 2 != 0) ":443"
        else if (id % 5 == 1) ":8080" else ""
      val expect = s"$scheme://www.example${id % 7}.com$port" +
        s"/A/b${id % 13}?a=${id % 9}&b=${id % 11}"
      assert(canonicalize(UrlOps.messyUrl(id)) == expect, s"id=$id")
    }
  }
}

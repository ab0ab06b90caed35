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

  test("trailing slashes strip to a fixpoint on non-root paths; root survives") {
    assert(canonicalize("http://a.com/x/") == "http://a.com/x")
    // >=2 trailing slashes in ONE call (r9 advice: a single strip is
    // not idempotent — '/x//' -> '/x/' -> '/x' across two crawls)
    assert(canonicalize("http://a.com/x//") == "http://a.com/x")
    assert(canonicalize("http://a.com/x///") == "http://a.com/x")
    assert(canonicalize("http://a.com/") == "http://a.com/")
    assert(canonicalize("http://a.com//") == "http://a.com/")
    assert(canonicalize("http://a.com") == "http://a.com")
    // INTERIOR empty segments are semantic and survive
    assert(canonicalize("http://a.com/a//b") == "http://a.com/a//b")
  }

  test("dot segments remove per RFC 3986 §5.2.4") {
    assert(canonicalize("http://a.com/a/./b") == "http://a.com/a/b")
    assert(canonicalize("http://a.com/a/../b") == "http://a.com/b")
    assert(canonicalize("http://a.com/a/..") == "http://a.com/")
    assert(canonicalize("http://a.com/a/.") == "http://a.com/a")
    assert(canonicalize("http://a.com/../a") == "http://a.com/a")
    assert(canonicalize("http://a.com/..") == "http://a.com/")
    // percent-normalization happens FIRST, so %2E%2E reads as ".."
    assert(canonicalize("http://a.com/a/%2e%2e/b") == "http://a.com/b")
    // dotted ordinary segments are NOT dot segments
    assert(canonicalize("http://a.com/a./.b/...") == "http://a.com/a./.b/...")
  }

  test("percent-encoding normalizes per RFC 3986 §6.2.2.1-2") {
    // unreserved decodes
    assert(canonicalize("http://a.com/%62ook") == "http://a.com/book")
    assert(canonicalize("http://a.com/x%7Ey") == "http://a.com/x~y")
    // reserved stays encoded, hex uppercased
    assert(canonicalize("http://a.com/x%2fy") == "http://a.com/x%2Fy")
    assert(canonicalize("http://a.com/p?a=x%3db") == "http://a.com/p?a=x%3Db")
    // %25 (the percent itself) is reserved-class: never decoded
    assert(canonicalize("http://a.com/x%25y") == "http://a.com/x%25y")
    // malformed triplets pass through as literal text
    assert(canonicalize("http://a.com/x%zzy") == "http://a.com/x%zzy")
    assert(canonicalize("http://a.com/x%2") == "http://a.com/x%2")
    // a percent-encoded tracking key IS a tracking key
    assert(canonicalize("http://a.com/p?%75tm_source=x&a=1") ==
      "http://a.com/p?a=1")
  }

  test("host trailing dot strips; a lone-dot host survives") {
    assert(canonicalize("http://a.com./x") == "http://a.com/x")
    assert(canonicalize("http://A.COM../x") == "http://a.com/x")
    assert(canonicalize("http://./x") == "http://./x")
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
      "https://a.com/p?only=1", "http://a.com/p?gclid=x",
      "http://a.com/x//", "http://a.com/x///?a=%2f",
      "http://a.com./a/./b/../c/", "http://a.com/%2e%2e/%62%2F//")
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
        path <- Gen.oneOf("", "/", "/P/q/", "//", "/%2F", "/a?b",
          "/x//", "/x///", "/a/../b", "/../..", "/%2e/a",
          "/a/%2E%2E/", "/%6", "/%zz%41")
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
    // 0..167 covers every joint residue class (lcm of 2,3,4,5,6,7,8),
    // so each rule's load-bearing rows are all exercised
    for (id <- 0L to 167L) {
      val scheme = if (id % 2 == 0) "https" else "http"
      val port =
        if (id % 5 == 0 && id % 2 != 0) ":443"
        else if (id % 5 == 1) ":8080" else ""
      val extra = if (id % 4 == 1) "&c=x%2Fy" else ""
      val expect = s"$scheme://www.example${id % 7}.com$port" +
        s"/A/b${id % 13}?a=${id % 9}&b=${id % 11}$extra"
      assert(canonicalize(UrlOps.messyUrl(id)) == expect, s"id=$id")
    }
  }
}

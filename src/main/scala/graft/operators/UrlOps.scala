package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables

/** URL canonicalization — the dedup-BEFORE-fetch step of a crawl
  * pipeline (SURVEY §2.E): the same resource hides behind scheme and
  * host case, default ports, tracking parameters, parameter order,
  * fragments, and trailing slashes, and a crawler that treats those
  * as distinct URLs fetches (and stores, and dedups at content grain,
  * expensively) the same bytes many times over. Canonicalization is
  * string-level, so it runs at the FRONTIER — before any fetch —
  * which is why it is its own operator and not a facet of content
  * dedup. (Reference tie-in: the reference engine's corpus keys are
  * opaque S3 names, s3_utils.go — URL identity is part of this
  * repo's beyond-reference curation surface.)
  *
  * Rules (the conservative, semantics-preserving subset every
  * canonicalizer agrees on — RFC 3986 §6.2.2-6.2.3 plus the tracking
  * strip): lowercase scheme and host; strip the host's trailing
  * dot(s) (`example.com.` is the same DNS name as `example.com`);
  * strip the scheme's default port (http:80, https:443 — a
  * NON-default port like :8080, or :443 on http, is load-bearing and
  * stays); percent-encoding normalization (§6.2.2.1-2: hex digits
  * uppercased, triplets encoding UNRESERVED characters decoded —
  * reserved ones like %2F stay encoded, so path/query STRUCTURE
  * never changes) over the path and each query key/value; dot-
  * segment removal on the path (§5.2.4: `/a/./b` → `/a/b`,
  * `/a/../b` → `/b` — applied after percent normalization, so
  * `%2E%2E` is seen as `..`, the RFC's stated order); drop fragments
  * (client-side only); drop tracking parameters (utm_*, fbclid,
  * gclid); sort the surviving query parameters by (key, value) —
  * order is almost never semantic, and sorting is what makes
  * param-permuted dupes collide; strip trailing slashes from a
  * non-root path TO A FIXPOINT (`/x//` → `/x` — a single strip is
  * not idempotent, and idempotence is the frontier's contract: two
  * crawls must agree on the dedup key of a stored canonical). Path
  * case and parameter values are preserved — they ARE semantic.
  */
object UrlOps {
  import graft.SparkEntry.QueryFn

  private val TrackingParams = Set("fbclid", "gclid")

  private def isTracking(key: String): Boolean =
    key.startsWith("utm_") || TrackingParams.contains(key)

  private def isUnreserved(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** RFC 3986 §6.2.2.1-2 percent-encoding normalization: uppercase
    * the hex digits of every valid triplet; decode triplets that
    * encode an UNRESERVED character. Reserved characters (%2F, %3D,
    * %26, %25…) stay encoded — decoding them would change path/query
    * structure, which is exactly why the RFC calls only the
    * unreserved decode safe. Malformed triplets (`%zz`, a trailing
    * `%2`) pass through as literal text — the frontier never throws.
    * Idempotent: one pass leaves only uppercase-hex reserved
    * triplets, which a second pass reproduces verbatim. */
  private[operators] def pctNormalize(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        val v = hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2))
        val ch = v.toChar
        if (isUnreserved(ch)) sb.append(ch)
        else sb.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over an ABSOLUTE path
    * (canonicalize only ever sees "" or "/..."-shaped paths): `.`
    * segments vanish, `..` pops the previous segment (a `..` at the
    * root is dropped — the RFC's behavior), and a trailing dot
    * segment leaves a trailing slash (`/a/.` → `/a/`), which the
    * caller's trailing-slash fixpoint then strips. Empty segments
    * (`/a//b`) are ordinary segments and survive untouched here —
    * only the TRAILING run of slashes is a dupe-key artifact, and
    * that is the fixpoint strip's job, not this one's. Idempotent:
    * the output contains no `.`/`..` segments. */
  private[operators] def removeDotSegments(path: String): String = {
    if (!path.startsWith("/") ||
        (path.indexOf("/.") < 0)) return path
    val segs = path.split("/", -1).drop(1)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var trailingSlash = false
    segs.foreach {
      case "."  => trailingSlash = true
      case ".." =>
        if (out.nonEmpty) out.remove(out.length - 1)
        trailingSlash = true
      case seg  => out += seg; trailingSlash = false
    }
    if (trailingSlash) out += ""
    "/" + out.mkString("/")
  }

  /** Canonicalize one URL string; inputs that don't parse as
    * scheme://host... come back unchanged (a frontier never drops a
    * URL it can't normalize — it just fails to merge its dupes). */
  def canonicalize(url: String): String = {
    val schemeEnd = url.indexOf("://")
    if (schemeEnd <= 0) return url
    val scheme = url.substring(0, schemeEnd).toLowerCase
    val rest = url.substring(schemeEnd + 3)
    if (rest.isEmpty) return url
    // split off fragment first (never part of the resource), then query
    val (beforeFrag, _) = rest.indexOf('#') match {
      case -1 => (rest, "")
      case i  => (rest.substring(0, i), rest.substring(i + 1))
    }
    val (hostPath, query) = beforeFrag.indexOf('?') match {
      case -1 => (beforeFrag, "")
      case i  => (beforeFrag.substring(0, i), beforeFrag.substring(i + 1))
    }
    val (authority, path) = hostPath.indexOf('/') match {
      case -1 => (hostPath, "")
      case i  => (hostPath.substring(0, i), hostPath.substring(i))
    }
    val (host, port) = authority.lastIndexOf(':') match {
      case -1 => (authority, "")
      case i if authority.substring(i + 1).forall(_.isDigit) &&
                authority.length > i + 1 =>
        (authority.substring(0, i), authority.substring(i + 1))
      case _ => (authority, "") // not a port (e.g. IPv6 literal): leave
    }
    // trailing DNS dot(s) strip to a fixpoint (a single-dot host "."
    // is left alone — stripping it would manufacture an empty host)
    var hostC = host.toLowerCase
    while (hostC.length > 1 && hostC.endsWith(".")) hostC = hostC.dropRight(1)
    val portC = (scheme, port) match {
      case (_, "")          => ""
      case ("http", "80")   => ""
      case ("https", "443") => ""
      case (_, p)           => ":" + p
    }
    // path: percent-normalize FIRST (so %2E%2E reads as ".."), then
    // dot-segment removal, then trailing slashes to a FIXPOINT
    // ("/x//" must land on "/x" in one call — a single strip isn't
    // idempotent and breaks the frontier's re-canonicalize contract)
    var pathC = removeDotSegments(pctNormalize(path))
    while (pathC.length > 1 && pathC.endsWith("/")) pathC = pathC.dropRight(1)
    // (key, value, hadEquals): a bare `?flag` and an explicit
    // `?flag=` are different URLs — the canonical form preserves
    // which one arrived instead of guessing from substring probes.
    // Structure splits on the RAW text (%26/%3D are reserved and
    // never decoded, so splitting before normalization is safe);
    // keys/values percent-normalize individually, and the tracking
    // filter reads the NORMALIZED key (`%75tm_source` IS utm_source).
    val params = query.split("&").toSeq
      .filter(_.nonEmpty)
      .map { kv =>
        kv.indexOf('=') match {
          case -1 => (pctNormalize(kv), "", false)
          case i  => (pctNormalize(kv.substring(0, i)),
                      pctNormalize(kv.substring(i + 1)), true)
        }
      }
      .filterNot { case (k, _, _) => isTracking(k) }
      .sortBy { case (k, v, _) => (k, v) }
    val queryC =
      if (params.isEmpty) ""
      else "?" + params.map { case (k, v, hadEq) =>
        if (hadEq) s"$k=$v" else k
      }.mkString("&")
    scheme + "://" + hostC + portC + pathC + queryC
  }

  /** Deterministic messy URL for a doc — the fixture the oracle's
    * closed forms replay: scheme/host case, a trailing DNS dot
    * (id%8==2), default-vs-load-bearing ports (":443" lands on BOTH
    * schemes by residue, so a strip-443-always shortcut hash-fails
    * the http rows), dot segments (`/./` at id%6==1, `/x/../` at
    * id%6==4), a percent-encoded unreserved path byte (`%62` → `b`
    * at id%6==2), tracking params, permuted order, a reserved
    * lowercase-hex param value (`x%2fy` → `x%2Fy`, which SURVIVES in
    * the canonical string — uppercasing is visible, not collapsed),
    * fragments, and single AND double trailing slashes (id%3==0;
    * doubled when also even — the fixpoint rule's load-bearing row).
    * Every rule flips ≥1 residue class, so dropping any one of them
    * from the engine hash-fails the gate. */
  private[operators] def messyUrl(id: Long): String = {
    val scheme = if (id % 2 == 0) "HTTPS" else "http"
    val hostDot = if (id % 8 == 2) "." else ""
    val host = s"WWW.Example${id % 7}.COM$hostDot"
    val port = (id % 5) match {
      case 0 => ":443"; case 1 => ":8080"; case _ => ""
    }
    val mid = (id % 6) match {
      case 1 => "./b"; case 4 => "x/../b"; case 2 => "%62"; case _ => "b"
    }
    val slash = (id % 3, id % 2) match {
      case (0, 0) => "//"; case (0, _) => "/"; case _ => ""
    }
    val frag = if (id % 4 == 0) "#sec2" else ""
    val extra = if (id % 4 == 1) "&c=x%2fy" else ""
    s"$scheme://$host$port/A/$mid${id % 13}$slash" +
      s"?utm_source=feed&b=${id % 11}&a=${id % 9}$extra$frag"
  }

  /** Frontier URL dedup through the REAL canonicalizer: every doc's
    * messy URL canonicalizes in a map-only pass, duplicates group on
    * the canonical string, and the report carries each canonical's
    * group size + first doc. The oracle CONSTRUCTS the canonical
    * form directly from the fixture's closed forms — any parser slip
    * (a kept fragment, an unsorted param, a stripped :443 on http, a
    * case-folded path) lands on the canonical STRING itself and
    * hash-fails.
    *
    * Scale shape: map-only canonicalize, one partial+final group on
    * the canonical key, one output sort — the frontier-dedup plan at
    * any crawl size. */
  val textUrlCanonicalize: QueryFn = (s, dir) => {
    import s.implicits._
    val canon = udf((id: Long) => canonicalize(messyUrl(id)))
    Tables.documents(s, dir)
      .select($"doc_id", canon($"doc_id").as("canonical_url"))
      .groupBy($"canonical_url")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("first_doc"))
      .orderBy($"canonical_url")
  }
}

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
  * strip): lowercase scheme and host; strip the scheme's default
  * port (http:80, https:443 — a NON-default port like :8080, or :443
  * on http, is load-bearing and stays); drop fragments (client-side
  * only); drop tracking parameters (utm_*, fbclid, gclid); sort the
  * surviving query parameters by (key, value) — order is almost
  * never semantic, and sorting is what makes param-permuted dupes
  * collide; strip ONE trailing slash from a non-root path. Path case
  * and parameter values are preserved — they ARE semantic.
  */
object UrlOps {
  import graft.SparkEntry.QueryFn

  private val TrackingParams = Set("fbclid", "gclid")

  private def isTracking(key: String): Boolean =
    key.startsWith("utm_") || TrackingParams.contains(key)

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
    val hostC = host.toLowerCase
    val portC = (scheme, port) match {
      case (_, "")          => ""
      case ("http", "80")   => ""
      case ("https", "443") => ""
      case (_, p)           => ":" + p
    }
    val pathC =
      if (path.length > 1 && path.endsWith("/")) path.dropRight(1) else path
    // (key, value, hadEquals): a bare `?flag` and an explicit
    // `?flag=` are different URLs — the canonical form preserves
    // which one arrived instead of guessing from substring probes
    val params = query.split("&").toSeq
      .filter(_.nonEmpty)
      .map { kv =>
        kv.indexOf('=') match {
          case -1 => (kv, "", false)
          case i  => (kv.substring(0, i), kv.substring(i + 1), true)
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
    * closed forms replay: scheme/host case, default-vs-load-bearing
    * ports (":443" lands on BOTH schemes by residue, so a
    * strip-443-always shortcut hash-fails the http rows), tracking
    * params, permuted order, fragments, trailing slashes. */
  private[operators] def messyUrl(id: Long): String = {
    val scheme = if (id % 2 == 0) "HTTPS" else "http"
    val host = s"WWW.Example${id % 7}.COM"
    val port = (id % 5) match {
      case 0 => ":443"; case 1 => ":8080"; case _ => ""
    }
    val slash = if (id % 3 == 0) "/" else ""
    val frag = if (id % 4 == 0) "#sec2" else ""
    s"$scheme://$host$port/A/b${id % 13}$slash" +
      s"?utm_source=feed&b=${id % 11}&a=${id % 9}$frag"
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

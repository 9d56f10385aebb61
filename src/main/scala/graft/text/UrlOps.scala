package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus URL hygiene: canonicalization, registrable-domain
  * derivation, and per-domain document caps — the standard first
  * stage of a crawl-derived training-data pipeline (a handful of
  * over-crawled domains otherwise dominate the corpus, and raw URL
  * strings under-dedup because tracking params and case differences
  * hide identical pages).
  *
  * Everything here is a Column cascade over regexes restricted to
  * Java-regex/RE2-identical constructs, so the DuckDB oracle mirrors
  * each step byte-for-byte — the [[TextOps.BpePattern]] discipline. */
object UrlOps {

  /** Query parameters that identify a CLICK, not a page: the common
    * tracker names (utm_*, Google/Facebook/Microsoft click ids,
    * Mailchimp, Instagram, GA) dropped during canonicalization.
    * Anchored name-match against a full `name=value` pair. */
  val TrackingParamPattern: String =
    "^(utm_[a-z0-9]+|gclid|fbclid|msclkid|dclid|mc_eid|mc_cid|igshid|_ga|ref|ref_src)="

  /** Filesystem path of the bundled public-suffix list — the DuckDB
    * oracle mirrors [[Psl]] by `read_text`-ing the SAME data file, so
    * Spark and oracle can never disagree on the rule set.
    *
    * Resolution is ENVIRONMENT-PROOF by construction (the r11 lesson:
    * a cwd-relative fallback baked a path into the generated SQL that
    * the oracle's process resolved differently, silently matching zero
    * rules and failing t62/t87): every candidate is canonicalized to
    * an ABSOLUTE path, the first one that is verifiably readable wins,
    * and if none is readable this `lazy val` THROWS at SQL-generation
    * time — the mirror errors loudly instead of drifting. An explicitly
    * set `GRAFT_PSL_PATH` is AUTHORITATIVE: if it is set but
    * unreadable that is an error, not a fall-through (a silent
    * fallback would mirror a different rule set than the operator
    * intended). Candidates, in order: `GRAFT_PSL_PATH` env override
    * (packaged deployments where the resource lives in a jar DuckDB
    * can't read); the classpath resource's own file URL (sbt runs
    * unpack resources on disk — this is the EXACT file the Spark-side
    * [[Psl]] kernel reads, so it outranks the cwd-relative repo source,
    * which in a multi-checkout setup could be a DIFFERENT file the
    * psl_canary cannot distinguish); the repo source file (absolutized
    * against the generating JVM's cwd) as the last resort for
    * resource-less classloaders. Lazy so a resolution failure can only
    * ever hit oracle-SQL generation, never the Spark-side [[Psl]]
    * kernel, which reads the resource from the classpath directly. */
  lazy val PslSourcePath: String = {
    def abs(p: String) = java.nio.file.Paths.get(p).toAbsolutePath.normalize
    sys.env.get("GRAFT_PSL_PATH") match {
      case Some(p) =>
        val path = abs(p)
        if (!java.nio.file.Files.isReadable(path)) sys.error(
          s"GRAFT_PSL_PATH is set but not readable: $path " +
            "(refusing to fall back to a bundled copy — the oracle " +
            "would mirror a different rule set than intended)")
        path.toString
      case None =>
        val candidates: Seq[(String, java.nio.file.Path)] = Seq(
          Option(getClass.getResource("/graft/public_suffix_list.dat"))
            .filter(_.getProtocol == "file")
            .map(u => "classpath" ->
              java.nio.file.Paths.get(u.toURI).toAbsolutePath.normalize),
          Some("repo source" ->
            abs("src/main/resources/graft/public_suffix_list.dat"))).flatten
        candidates
          .collectFirst {
            case (_, p) if java.nio.file.Files.isReadable(p) => p.toString }
          .getOrElse(sys.error(
            "public_suffix_list.dat is not readable at any candidate path " +
              "(oracle mirrors for URL/domain queries cannot be generated): " +
              candidates.map { case (k, p) => s"$k=$p" }.mkString(", ")))
    }
  }

  /** Registrable domain of an already-lowercased host column via the
    * full bundled public-suffix list — see [[Psl]]. Null when the host
    * has no registrable domain (bare TLD / public suffix / single
    * label). */
  def pslDomain(host: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      PslDomain(org.apache.spark.sql.graftbridge.Bridge.expression(host)))

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val hostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val pathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

  /** Canonical form + registrable domain of a URL column. Steps, in
    * order: trim; lowercase scheme and host (path/query case is
    * significant per RFC 3986 and kept); drop the fragment; drop
    * [[TrackingParamPattern]] query params (others kept in original
    * order); strip the scheme's default port (:80/http, :443/https —
    * explicit non-default ports are identity and stay); empty path
    * becomes "/". Unparseable rows (no scheme://host) yield null
    * url_canon/domain rather than a guess. The registrable domain is
    * derived from the host (minus port) by the full public-suffix-list
    * algorithm ([[Psl]]); hosts that ARE a public suffix (or a single
    * label, e.g. localhost) get a null domain. Returns the input
    * columns plus
    * (url_canon, domain). A pure narrow projection — regex extracts
    * and one bounded array filter per row, no shuffle. */
  def canonicalizeUrls(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    Seq("url_canon", "domain").foreach(c =>
      require(!df.columns.contains(c),
        s"column $c collides with canonicalizeUrls's output columns"))
    val url = trim(col(urlCol))
    val scheme = lower(regexp_extract(url, schemeRe, 1))
    // the authority's userinfo ("user:pass@host") is a credential,
    // never part of the host: strip it BEFORE any host handling so it
    // can neither leak into the canonical URL nor fabricate a domain.
    // Greedy ^.*@ splits at the LAST '@' (WHATWG behavior) — an
    // unencoded '@' inside the password ("user:p@ss@host") must not
    // leave a credential fragment in the host
    val hostPort = regexp_replace(
      lower(regexp_extract(url, hostRe, 1)), "^.*@", "")
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val path = regexp_extract(url, pathRe, 1)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val keptQ = array_join(
      filter(split(query, "&"), p => !p.rlike(TrackingParamPattern)), "&")
    val canon = when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host,
        when(path === "", lit("/")).otherwise(path),
        when(keptQ === "", lit("")).otherwise(concat(lit("?"), keptQ))))
    val hostNoPort = regexp_replace(host, ":[0-9]+$", "")
    val domain = when(canon.isNull, lit(null).cast("string"))
      .otherwise(pslDomain(hostNoPort))
    df.withColumn("url_canon", canon).withColumn("domain", domain)
  }

  /** Domain blocklist filter — the crawl-hygiene companion of
    * [[capPerDomain]]: canonicalize, derive the registrable domain
    * ([[Psl]]), and DROP every document whose domain is blocked.
    * Because matching happens on the REGISTRABLE domain, blocking
    * "example.com" also blocks "cdn.sub.example.com" — the behavior a
    * blocklist consumer expects — while "notexample.com" stays.
    * Unparseable URLs (null domain) are dropped too (fail closed: a
    * URL that can't be attributed to a domain can't be cleared by
    * one). Returns the canonicalized frame minus blocked rows.
    *
    * Scale shape: a narrow canonicalization pass plus one hash-set
    * membership test per row (the blocklist ships as a broadcast
    * literal set — curated blocklists are thousands of entries, driver
    * -sized; for web-scale lists join a blocklist DataFrame on
    * `domain` instead). */
  def filterDomains(df: DataFrame, idCol: String, urlCol: String,
      blockedDomains: Seq[String]): DataFrame = {
    require(blockedDomains.nonEmpty, "empty blocklist — nothing to filter")
    canonicalizeUrls(df, idCol, urlCol)
      .filter(col("domain").isNotNull &&
        !col("domain").isin(blockedDomains: _*))
  }

  /** Deterministic per-domain document cap: canonicalize, derive the
    * registrable domain, and keep at most `maxPerDomain` documents per
    * domain via [[TextOps.stratifiedSample]]'s salted-hash rank —
    * content-independent, reproducible across runs and engines, and
    * never a full sort of a hot domain (the count-derived keep
    * threshold prefilters each domain to ~oversample * cap rows before
    * the rank window). Unparseable URLs are dropped (no domain to cap
    * under). Returns (domain, idCol, rank) for the kept rows.
    *
    * Scale shape: one narrow canonicalization pass, a |domains|-row
    * broadcast count, and the prefiltered per-domain rank — the
    * over-crawled-domain skew this operator exists for is exactly the
    * skew the prefilter bounds. */
  def capPerDomain(df: DataFrame, idCol: String, urlCol: String,
      maxPerDomain: Int, oversample: Double = 8.0): DataFrame = {
    val canon = canonicalizeUrls(df, idCol, urlCol)
      .filter(col("domain").isNotNull)
    TextOps.stratifiedSample(canon, idCol, "domain", maxPerDomain, oversample)
  }
}

package graft.ext

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** robots.txt parsing and rule evaluation (RFC 9309, the Robots
  * Exclusion Protocol) — the compliance front-end of a crawl-scoping
  * pass. [[Curation.urlScope]] takes caller-supplied regex predicates;
  * real pipelines derive those predicates from each host's robots.txt.
  * This object does the derivation: parse the file into user-agent
  * groups driver-side (robots files are KiB-sized, one per host — never
  * data-plane work), select the group for our product token, and
  * compile the allow/disallow rules into a single Spark `Column`
  * predicate that evaluates per-URL inside whole-stage codegen.
  *
  * Matching semantics implemented (the published precedence rules):
  *  - group selection: every group whose user-agent line equals our
  *    product token case-insensitively applies (their rules merge, per
  *    RFC 9309 §2.2.1); otherwise the `*` groups; otherwise no rules
  *    (crawl allowed).
  *  - rule precedence: the most specific match wins — most octets in
  *    the rule's path pattern (RFC 9309 §2.2.2); on a tie, allow wins.
  *  - patterns: `*` matches any octet sequence, a trailing `$` anchors
  *    the end; everything else is literal. An empty pattern (bare
  *    `Disallow:`) is no rule at all.
  *  - keys are case-insensitive; `#` starts a comment; unknown keys
  *    (sitemap, crawl-delay, …) are ignored.
  *
  * Precedence is compiled, not searched: rules sort by (pattern octets
  * desc, allow first) once on the driver, and the `Column` is the
  * corresponding `when` chain — first match in precedence order
  * decides, default allow. Rule counts are spec-bounded (a robots file
  * has tens of rules), so the chain stays small and codegen-friendly;
  * the resulting predicate is a pure stateless expression, equally
  * usable under Structured Streaming.
  *
  * Reference scope note: the reference engine has no crawl module; this
  * belongs to the training-data curation surface
  * (SURVEY.md §2 extensions), beside [[Curation.urlScope]].
  */
object Robots {

  /** One allow/disallow rule; `pattern` as written (after the key). */
  final case class Rule(allow: Boolean, pattern: String)

  /** One RFC 9309 group: the user-agent tokens heading it + its rules
    * in file order. */
  final case class Group(agents: Seq[String], rules: Seq[Rule])

  /** Comment-stripped, trimmed `key: value` lines (keys lowercased) —
    * the shared line grammar of [[parse]] and [[sitemaps]]. */
  private def keyValues(txt: String): Seq[(String, String)] =
    txt.stripPrefix("﻿").split("\n", -1).iterator
      .map(l => l.takeWhile(_ != '#').trim)
      .filter(_.nonEmpty)
      .flatMap { l =>
        val i = l.indexOf(':')
        if (i < 0) None
        else Some((l.substring(0, i).trim.toLowerCase, l.substring(i + 1).trim))
      }
      .toSeq

  /** The `Sitemap:` URLs of a robots.txt body, in file order — the
    * crawl-seeding side of the protocol (RFC 9309 carries them as
    * group-independent records; every real frontier reads them before
    * fetching a host). Same tolerant line handling as [[parse]]. */
  def sitemaps(txt: String): Seq[String] =
    keyValues(txt).collect { case ("sitemap", url) if url.nonEmpty => url }

  /** Parse a robots.txt body into groups. Tolerant of the usual
    * real-world noise: blank lines, comments, BOM, mixed-case keys,
    * rules before any user-agent line (ignored, per spec). */
  def parse(txt: String): Seq[Group] = {
    val lines = keyValues(txt)
    val groups = Seq.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules)
      agents = Vector.empty; rules = Vector.empty; inRules = false
    }
    lines.foreach {
      case ("user-agent", ua) =>
        if (inRules) flush()
        agents :+= ua.toLowerCase
      case ("allow", p) =>
        inRules = true
        if (agents.nonEmpty && p.nonEmpty) rules :+= Rule(allow = true, p)
      case ("disallow", p) =>
        inRules = true
        if (agents.nonEmpty && p.nonEmpty) rules :+= Rule(allow = false, p)
      case _ => // sitemap, crawl-delay, unknown keys: ignored
    }
    flush()
    groups.result()
  }

  /** The rules applying to `agent`, already sorted by precedence
    * (pattern octets desc, allow first): exact-token groups if any
    * match, else the `*` groups, else none. */
  def policyFor(txt: String, agent: String): Seq[Rule] = {
    val groups = parse(txt)
    val tok = agent.toLowerCase
    val exact = groups.filter(_.agents.contains(tok))
    val chosen = if (exact.nonEmpty) exact else groups.filter(_.agents.contains("*"))
    chosen.flatMap(_.rules)
      .sortBy(r => (-patternOctets(r.pattern), !r.allow))
  }

  /** Specificity measure of RFC 9309 §2.2.2: octets of the pattern
    * (the `$` anchor is syntax, not matched octets). */
  private def patternOctets(p: String): Int = {
    val body = if (p.endsWith("$")) p.dropRight(1) else p
    body.getBytes("UTF-8").length
  }

  /** Java regex equivalent of a rule pattern: anchored at the path
    * start, `*` → `.*`, trailing `$` → end anchor, the rest quoted. */
  def ruleRegex(pattern: String): String = {
    val (body, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true)
      else (pattern, false)
    val quoted = body.split("\\*", -1).map {
      case "" => ""
      case chunk => Pattern.quote(chunk)
    }.mkString(".*")
    "^" + quoted + (if (anchored) "$" else "")
  }

  /** Driver-side verdict for one path — the spec/test mirror of
    * [[allowsColumn]]. Default allow when nothing matches. */
  def allows(rules: Seq[Rule], path: String): Boolean =
    rules.find(r => Pattern.compile(ruleRegex(r.pattern)).matcher(path).find())
      .forall(_.allow)

  /** The same precedence chain as a Spark `Column` over a path column:
    * the outermost `when` is the most specific rule, default allow.
    * `rlike` is unanchored at the tail, matching the "prefix with
    * wildcards" semantics of the `^`-anchored [[ruleRegex]]. */
  def allowsColumn(rules: Seq[Rule], path: Column): Column =
    rules.foldRight(lit(true)) { (r, acc) =>
      when(path.rlike(ruleRegex(r.pattern)), lit(r.allow)).otherwise(acc)
    }
}

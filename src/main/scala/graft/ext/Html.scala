package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction: the front door of a web-scale curation
  * pipeline. Every published recipe the repo implements downstream
  * (CCNet's per-shard text, RefinedWeb's Trafilatura stage, C4's
  * line rules, Gopher) starts from crawled HTML; this operator turns
  * an HTML column into the plain-text column those operators consume
  * ([[TextOps.gopherRules]], [[Dedup.stripDuplicateLines]], …).
  *
  * Design: deterministic string surgery as a fixed chain of
  * `regexp_replace` steps — comments out, `<script>`/`<style>`
  * subtrees out, block-level tags become line breaks (so `<p>`/`<li>`
  * structure survives as the LINE structure the line-grain operators
  * key on), every remaining tag drops, the finite named/numeric
  * entity list decodes (amp LAST, the standard single-pass order, so
  * `&amp;lt;` yields the literal text `&lt;` and never a phantom
  * tag), and whitespace normalizes (intra-line runs collapse to one
  * space, blank lines collapse, edges trim). Entity decode runs
  * AFTER tag removal: a `&lt;div&gt;` in the text must never become
  * a strippable tag.
  *
  * This is a whole-column codegen projection — per-row regex over the
  * document bytes, no shuffle, no UDF — so at 100 TB it rides the
  * ingest scan itself (the same narrow-projection shape as
  * [[TextOps.normalizeText]]). Every pattern is in the
  * RE2 ∩ Java subset ((?is) inline flags, non-greedy `.*?`, `\b`, no
  * lookaround — RE2 has none), so a DuckDB oracle replays the chain
  * verbatim; [[oracleSqlExpr]] IS that replay, built from the same
  * pattern constants.
  *
  * Deliberate non-goals (documented, spec-pinned): no full HTML5
  * tree correction (a stray unclosed `<` swallows to the next `>`,
  * exactly what the regex says), no numeric-entity decoding beyond
  * the common list (`&#x2019;`-style rarities pass through as text),
  * no JS/CSS execution. Real crawls carry malformed markup; the
  * extraction is total (never throws) and degrades to "drop what
  * looks like markup".
  */
object Html {

  /** `<!-- … -->`, across lines. */
  val CommentPattern = "(?s)<!--.*?-->"
  /** Whole `<script>` subtree — its text is code, not content. */
  val ScriptPattern = "(?is)<script\\b[^>]*>.*?</script>"
  /** Whole `<style>` subtree. */
  val StylePattern = "(?is)<style\\b[^>]*>.*?</style>"
  /** Block-level / line-breaking elements (open or close, any attrs):
    * these become `\n` so document structure survives as lines.
    */
  val BlockTagPattern = "(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody|tfoot|blockquote|section|article|header|footer|pre|hr|dd|dt|dl|figure|figcaption|form|fieldset|address|main|nav|aside|title|head|body|html)\\b[^>]*>"
  /** Any remaining tag (inline elements, unknown elements, closers). */
  val AnyTagPattern = "<[^>]*>"

  /** The decode list, IN ORDER — `&amp;` last so already-escaped
    * entities decode once, to their literal text. No regex
    * metacharacters appear in any key, so each is safe as a literal
    * pattern in both engines.
    */
  val Entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&apos;" -> "'",
    "&amp;" -> "&")

  /** Plain text of an HTML column (see object doc for the contract). */
  def htmlToText(html: Column): Column = {
    val noComment = regexp_replace(html, CommentPattern, "")
    val noScript = regexp_replace(noComment, ScriptPattern, "")
    val noStyle = regexp_replace(noScript, StylePattern, "")
    val blocked = regexp_replace(noStyle, BlockTagPattern, "\n")
    val stripped = regexp_replace(blocked, AnyTagPattern, "")
    val decoded = Entities.foldLeft(stripped) { case (c, (e, r)) =>
      regexp_replace(c, e, r)
    }
    normalizeWs(decoded)
  }

  /** The whitespace tail of the chain: tabs/CRs and space runs → one
    * space, spaces around breaks absorb, blank lines collapse, edges
    * trim.
    */
  private def normalizeWs(c: Column): Column =
    WsSteps.foldLeft(c) { case (col, (pat, rep)) => regexp_replace(col, pat, rep) }

  /** The normalizeWs replace chain, IN ORDER — one source of truth for
    * the Spark expression and the DuckDB oracle replay.
    */
  val WsSteps: Seq[(String, String)] = Seq(
    "[ \\t\\r]+" -> " ",
    " *\\n *" -> "\n",
    "\\n+" -> "\n",
    "^[ \\n]+" -> "",
    "[ \\n]+$" -> "")

  /** Verbatim-normalized plain text: the whitespace tail ALONE — no
    * tag stripping, no entity decode. This is what a `text/plain`
    * payload (or a WET `conversion` record, already extracted) must
    * get: a plain-text document legitimately contains literal `<`,
    * `>`, and `&amp;`-shaped strings, and running the HTML chain over
    * it would EAT real content.
    */
  def plainText(text: Column): Column = normalizeWs(text)

  /** Content-type routing for a crawl payload column — the dispatch a
    * real chain needs the moment its input is WARC records rather
    * than a curated HTML table:
    *
    *  - HTML-ish (`text/html…`, `application/xhtml…`) → [[htmlToText]];
    *  - absent/empty content type → [[htmlToText]] too (headerless
    *    crawl responses are overwhelmingly HTML, and the HTML chain
    *    degrades gracefully on plain text that carries no markup);
    *  - any other `text/…` (plain, csv, markdown, WET conversion
    *    blocks) → [[plainText]] verbatim-normalization;
    *  - anything else (binary types: images, pdf, octet-stream) →
    *    NULL, for the caller's filter to drop — bytes that are not
    *    text must never masquerade as it.
    *
    * Row-local CASE over two codegen regex chains — still a pure
    * projection riding the ingest scan, and LIKE-dispatched so the
    * DuckDB oracle replays it verbatim ([[routedOracleSqlExpr]]).
    */
  def routedText(payload: Column, contentType: Column): Column = {
    val ct = lower(coalesce(contentType, lit("")))
    when(htmlishContentType(contentType), htmlToText(payload))
      .when(ct.like("text/%"), plainText(payload))
      .otherwise(lit(null).cast("string"))
  }

  /** The content types [[routedText]] sends through the HTML chain
    * (html/xhtml/headerless) — also the gate for HTML-ONLY metadata
    * extraction (canonical links, robots meta): a text/plain payload
    * QUOTING markup must never have directives parsed out of it.
    */
  def htmlishContentType(contentType: Column): Column = {
    val ct = lower(coalesce(contentType, lit("")))
    ct.like("text/html%") || ct.like("application/xhtml%") || ct === ""
  }

  /** [[htmlishContentType]] as a DuckDB boolean over a ct expr. */
  def htmlishCtOracleSqlExpr(ctExpr: String): String = {
    val ct = s"lower(COALESCE($ctExpr, ''))"
    s"($ct LIKE 'text/html%' OR $ct LIKE 'application/xhtml%' OR $ct = '')"
  }

  /** The content types [[routedText]] yields text for — as a bare
    * predicate, so a pipeline can DROP non-text records before paying
    * any dedup/extraction work on them (the streaming ingest sink's
    * shape: binary payloads never even enter the URL index).
    */
  def textishContentType(contentType: Column): Column = {
    val ct = lower(coalesce(contentType, lit("")))
    ct === "" || ct.like("text/%") || ct.like("application/xhtml%")
  }

  /** [[routedText]] as a DuckDB SQL expression over payload/ct exprs. */
  def routedOracleSqlExpr(payloadExpr: String, ctExpr: String): String = {
    val ct = s"lower(COALESCE($ctExpr, ''))"
    s"(CASE WHEN $ct LIKE 'text/html%' OR $ct LIKE 'application/xhtml%' " +
      s"OR $ct = '' THEN ${oracleSqlExpr(payloadExpr)} " +
      s"WHEN $ct LIKE 'text/%' THEN ${plainOracleSqlExpr(payloadExpr)} " +
      s"ELSE NULL END)"
  }

  /** [[plainText]] as a DuckDB SQL expression over `expr`. */
  def plainOracleSqlExpr(expr: String): String =
    WsSteps.foldLeft(expr) { case (sql, (pat, rep)) =>
      val p = pat.replace("'", "''")
      val r = rep.replace("'", "''").replace("\n", "' || chr(10) || '")
      s"regexp_replace($sql, '$p', '$r', 'g')"
    }

  /** `<title>` text (entity-decoded, whitespace-normalized; "" when
    * absent — regexp_extract's no-match value in both engines).
    */
  val TitlePattern = "(?is)<title[^>]*>(.*?)</title>"
  def htmlTitle(html: Column): Column = {
    val raw = regexp_extract(html, TitlePattern, 1)
    val decoded = Entities.foldLeft(raw) { case (c, (e, r)) =>
      regexp_replace(c, e, r)
    }
    trim(regexp_replace(decoded, "[ \\t\\r\\n]+", " "))
  }

  /** Outbound link targets: every double-quoted `href` value, in
    * document order — the input to [[TextOps.canonicalUrlKey]] /
    * [[TextOps.domainStats]] for link-graph and URL-dedup stages.
    */
  val HrefPattern = "(?i)href=\"([^\"]*)\""
  def htmlLinks(html: Column): Column =
    regexp_extract_all(html, lit(HrefPattern), lit(1))

  /** Whole `<a href="…">inner</a>` elements, for anchor-TEXT mining
    * (the what-the-web-calls-this-page signal — aggregated per target
    * by [[LinkGraph.anchorTexts]]). Group 1 is the href, group 2 the
    * raw inner HTML; [[anchorHref]]/[[anchorText]] pull them out of
    * one exploded element ("" on no-match in both engines). Non-greedy
    * inner extent: nested inline markup (`<b>`, spans) stays inside
    * and is stripped by the [[anchorText]] normalization; a nested
    * `</a>` ends the element (malformed nesting degrades, never
    * throws — the [[htmlToText]] totality discipline).
    */
  val AnchorHrefPattern = "(?is)<a\\b[^>]*\\bhref=\"([^\"]*)\"[^>]*>(.*?)</a\\s*>"
  def htmlAnchorElements(html: Column): Column =
    regexp_extract_all(html, lit(AnchorHrefPattern), lit(0))
  def anchorHref(element: Column): Column =
    regexp_extract(element, AnchorHrefPattern, 1)

  /** The element's inner text, normalized like every extracted string
    * (tag strip → entity decode amp-last → whitespace collapse).
    */
  def anchorText(element: Column): Column = {
    val raw = regexp_extract(element, AnchorHrefPattern, 2)
    val stripped = regexp_replace(raw, AnyTagPattern, "")
    val decoded = Entities.foldLeft(stripped) { case (c, (e, r)) =>
      regexp_replace(c, e, r)
    }
    trim(regexp_replace(decoded, "[ \\t\\r\\n]+", " "))
  }

  /** [[anchorHref]]/[[anchorText]] as DuckDB SQL over `expr` (oracle
    * replays; same constants).
    */
  def anchorHrefOracleSqlExpr(expr: String): String =
    s"regexp_extract($expr, '${AnchorHrefPattern.replace("'", "''")}', 1)"
  def anchorTextOracleSqlExpr(expr: String): String = {
    val extracted =
      s"regexp_extract($expr, '${AnchorHrefPattern.replace("'", "''")}', 2)"
    val stripped = s"regexp_replace($extracted, '$AnyTagPattern', '', 'g')"
    val decoded = Entities.foldLeft(stripped) { case (sql, (e, r)) =>
      s"regexp_replace($sql, '$e', '${r.replace("'", "''")}', 'g')"
    }
    s"trim(regexp_replace($decoded, '[ \\t\\r\\n]+', ' ', 'g'))"
  }

  /** The root element's declared language (`<html lang="…">`),
    * lowercased ("" when absent) — the self-declared prior for the
    * n-gram language-ID stage (CCNet keeps both and compares).
    */
  val LangPattern = "(?is)<html\\b[^>]*\\blang=\"([^\"]*)\""
  def htmlLang(html: Column): Column =
    lower(regexp_extract(html, LangPattern, 1))

  /** A named `<meta name="…" content="…">` value, entity-decoded and
    * whitespace-normalized ("" when absent). `name` must be a plain
    * identifier (it is spliced into the pattern); the name-before-
    * content attribute order is the contract (the overwhelmingly
    * common serialization — reversed-attribute pages read as absent,
    * documented).
    */
  def metaPattern(name: String): String = {
    require(name.matches("[A-Za-z0-9_:-]+"),
      s"meta name must be a plain identifier, got '$name'")
    // raw interpolator: the s-interpolator would process \b into a
    // BACKSPACE even in triple quotes; raw leaves the regex escape
    raw"""(?is)<meta\b[^>]*\bname="$name"[^>]*\bcontent="([^"]*)""""
  }
  def htmlMetaContent(html: Column, name: String): Column = {
    val raw = regexp_extract(html, metaPattern(name), 1)
    val decoded = Entities.foldLeft(raw) { case (c, (e, r)) =>
      regexp_replace(c, e, r)
    }
    trim(regexp_replace(decoded, "[ \\t\\r\\n]+", " "))
  }

  /** The page's `<meta name="robots">` directive list, lowercased
    * ("" when absent) — publisher indexing intent. [[robotsNoindex]]
    * is the curation-side compliance cut: a page whose publisher said
    * "don't index me" shouldn't enter a training corpus either (the
    * opt-out signal pipelines are expected to respect). DELIMITED
    * TOKEN match on the lowered directive list ("noindex, follow",
    * "NOINDEX", "none"-style lists all vary in the wild): the token
    * must sit between start/end/comma/whitespace boundaries, so
    * "noindexing" does NOT trip the cut, and the `none` directive —
    * which the robots-meta convention defines as noindex+nofollow —
    * is honored by both predicates.
    */
  val RobotsNoindexPattern = "(^|[\\s,])(noindex|none)($|[\\s,])"
  val RobotsNofollowPattern = "(^|[\\s,])(nofollow|none)($|[\\s,])"
  def robotsDirectives(html: Column): Column =
    lower(htmlMetaContent(html, "robots"))
  def robotsNoindex(html: Column): Column =
    robotsDirectives(html).rlike(RobotsNoindexPattern)
  def robotsNofollow(html: Column): Column =
    robotsDirectives(html).rlike(RobotsNofollowPattern)

  /** The token match as a DuckDB boolean over a (lowered) directive-
    * list expr — the oracle replay of [[robotsNoindex]]/[[robotsNofollow]],
    * same pattern constants.
    */
  def robotsTokenOracleSqlExpr(robotsExpr: String, pattern: String): String =
    s"regexp_matches($robotsExpr, '$pattern')"

  /** [[htmlMetaContent]] as a DuckDB SQL expression over `expr`. */
  def metaOracleSqlExpr(expr: String, name: String): String = {
    val pat = metaPattern(name).replace("'", "''")
    val extracted = s"regexp_extract($expr, '$pat', 1)"
    val decoded = Entities.foldLeft(extracted) { case (sql, (e, r)) =>
      s"regexp_replace($sql, '$e', '${r.replace("'", "''")}', 'g')"
    }
    s"trim(regexp_replace($decoded, '[ \\t\\r\\n]+', ' ', 'g'))"
  }

  /** The page's declared canonical URL
    * (`<link rel="canonical" href="…">`), raw ("" when absent) — the
    * mirror/CDN-copy self-identification RefinedWeb-style URL dedup
    * honors: a page declaring its origin must collapse onto it, or
    * every mirror survives the URL cut as a distinct key. BOTH
    * attribute orders match (`rel` before `href` and the reverse —
    * real-world serializers emit either), with double- OR
    * single-quoted values; within one tag `[^>]*` never crosses the
    * tag close, so the two attributes must share the element. The
    * first rel-first declaration wins; a page carrying ONLY the
    * href-first serialization falls through to its first such match
    * (when a malformed page carries both forms, rel-first is taken —
    * a fixed precedence, not document order, keeping the extraction
    * independent regexes instead of a tag parser; within one
    * attribute order, double-quoted beats single-quoted by the same
    * fixed-precedence rule). Quote types match PAIRWISE — a
    * double-quoted href value may legally contain apostrophes (wiki
    * titles do) and captures whole; only the value's own delimiter
    * and `>` are out of contract (no real URL serializes them
    * unescaped).
    */
  val CanonicalRelFirstDqPattern =
    "(?is)<link\\b[^>]*\\brel=[\"']canonical[\"'][^>]*\\bhref=\"([^\">]*)\""
  val CanonicalRelFirstSqPattern =
    "(?is)<link\\b[^>]*\\brel=[\"']canonical[\"'][^>]*\\bhref='([^'>]*)'"
  val CanonicalHrefFirstDqPattern =
    "(?is)<link\\b[^>]*\\bhref=\"([^\">]*)\"[^>]*\\brel=[\"']canonical[\"']"
  val CanonicalHrefFirstSqPattern =
    "(?is)<link\\b[^>]*\\bhref='([^'>]*)'[^>]*\\brel=[\"']canonical[\"']"
  private val CanonicalPatterns = Seq(
    CanonicalRelFirstDqPattern, CanonicalRelFirstSqPattern,
    CanonicalHrefFirstDqPattern, CanonicalHrefFirstSqPattern)
  def htmlCanonicalUrl(html: Column): Column =
    // cheap prefilter before the four full-pattern scans: every
    // alternative requires the literal `canonical` (case-folded), so a
    // page without that substring — the overwhelming majority — skips
    // all four regex passes (per-row lazy branches; a sound rewrite,
    // no oracle change needed)
    when(html.rlike("(?i)canonical"),
      CanonicalPatterns.map(p => regexp_extract(html, p, 1))
        .reduceRight((c, rest) => when(c =!= "", c).otherwise(rest)))
      .otherwise(lit(""))

  /** Absolute-URL shape: a scheme followed by `://`. */
  val AbsoluteUrlPattern = "^[A-Za-z][A-Za-z0-9+.-]*://"

  /** The EFFECTIVE URL for dedup keying: the page's declared canonical
    * when it is ABSOLUTE, else the fetch URL. Relative canonicals are
    * deliberately ignored — resolving them needs base-URL semantics
    * (path joins, `..` collapse) that turn a row-local regex into a
    * URL resolver; the absolute form is what mirrors declare in
    * practice, and ignoring the rest degrades to today's fetch-URL
    * behavior, never corrupts a key.
    */
  def declaredCanonicalOr(url: Column, html: Column): Column = {
    val c = htmlCanonicalUrl(html)
    when(c.rlike(AbsoluteUrlPattern), c).otherwise(url)
  }

  /** [[declaredCanonicalOr]] as a DuckDB SQL expression (same pattern
    * constants; regexp_extract's no-match "" fails the absolute test
    * in both engines).
    */
  def declaredCanonicalOracleSqlExpr(urlExpr: String, htmlExpr: String): String = {
    val extracts = CanonicalPatterns.map(p =>
      s"regexp_extract($htmlExpr, '${p.replace("'", "''")}', 1)")
    val c = extracts.init.foldRight(extracts.last)((e, rest) =>
      s"(CASE WHEN $e <> '' THEN $e ELSE $rest END)")
    s"(CASE WHEN regexp_matches($c, '$AbsoluteUrlPattern') THEN $c " +
      s"ELSE $urlExpr END)"
  }

  /** Anchor-element boundaries, marked BEFORE tag-stripping so
    * link-text extent survives into the extracted lines (the input to
    * the density rule below).
    */
  val AnchorOpenPattern = "(?is)<a\\b[^>]*>"
  val AnchorClosePattern = "(?is)</a\\s*>"
  /** C0 sentinels — they pass every pattern in the [[htmlToText]]
    * chain untouched. Collision contract: a document whose TEXT
    * already carries U+0001/U+0002 is out of scope here (the
    * encoding gate upstream drops control-char documents anyway).
    */
  val SentinelOpen = "\u0001"
  val SentinelClose = "\u0002"

  /** Main-content extraction: [[htmlToText]] plus the jusText /
    * Trafilatura-style LINE density rule — boilerplate (nav bars,
    * link lists, footers) is short and link-heavy, body prose is long
    * and link-light. Anchor extents are marked with C0 sentinels
    * before tags strip; after extraction each line keeps only if
    *
    *   lineChars >= minLineChars  AND
    *   linkChars <= maxLinkDensity · lineChars
    *
    * (linkChars = characters inside anchor extents on that line).
    * Surviving lines rejoin sentinel-free. Deliberately a LINE rule,
    * not Trafilatura's DOM-subtree scoring: lines are what the
    * downstream line-grain operators key on, and the rule stays a
    * pure column expression (split → filter → transform → join, all
    * replayable in DuckDB list lambdas — [[mainTextOracleSqlExpr]]).
    * Still row-local: no shuffle, no UDF.
    */
  def htmlMainText(html: Column, minLineChars: Int = 25,
                   maxLinkDensity: Double = 0.5): Column = {
    val lines = markedLines(html)
    val kept = filter(lines, l => lineGood(l, minLineChars, maxLinkDensity))
    array_join(transform(kept, stripSentinels(_)), "\n")
  }

  /** Anchor-marked extraction lines — the shared front of both density
    * rules.
    */
  private def markedLines(html: Column): Column = {
    val marked = regexp_replace(
      regexp_replace(html, AnchorOpenPattern, SentinelOpen),
      AnchorClosePattern, SentinelClose)
    split(htmlToText(marked), "\n")
  }

  private def stripSentinels(l: Column): Column =
    regexp_replace(l, s"[$SentinelOpen$SentinelClose]", "")

  private def linkChars(l: Column): Column =
    aggregate(
      regexp_extract_all(l,
        lit(s"$SentinelOpen([^$SentinelOpen$SentinelClose]*)$SentinelClose"),
        lit(1)),
      lit(0), (acc, x) => acc + length(x))

  /** The context-free line verdict both rules share. */
  private def lineGood(l: Column, minLineChars: Int,
                       maxLinkDensity: Double): Column =
    length(stripSentinels(l)) >= minLineChars &&
      linkChars(l) <= lit(maxLinkDensity) * length(stripSentinels(l))

  /** [[htmlMainText]] with jusText's BLOCK-CONTEXT second pass: a line
    * failing the context-free rule is RESCUED when both its immediate
    * neighbors pass it — a short or link-dense line strictly INSIDE a
    * content block (an inline citation, a "see also" link mid-prose)
    * is content, while the same line in a nav bar or footer sits among
    * other failing lines and still falls. Exactly jusText's
    * context-sensitive classification collapsed to the line grain the
    * repo's downstream operators key on: neighbors-of-good become
    * good, everything else keeps its context-free verdict. Still a
    * pure column expression (the indexed `filter` HOF), still
    * row-local, still DuckDB-replayable (the q135 oracle replays it
    * with list lambdas over the same constants).
    */
  def htmlMainTextBlocks(html: Column, minLineChars: Int = 25,
                         maxLinkDensity: Double = 0.5): Column = {
    val lines = markedLines(html)
    val g = transform(lines, l => lineGood(l, minLineChars, maxLinkDensity))
    val n = size(lines)
    // filter's index is 0-based; element_at is 1-based — i+1 is "this
    // line", i / i+2 its neighbors, both in range by the guards
    val kept = filter(lines, (_, i) =>
      element_at(g, i + 1) ||
        (i > 0 && i < n - 1 && element_at(g, i) && element_at(g, i + 2)))
    array_join(transform(kept, stripSentinels(_)), "\n")
  }

  /** [[htmlMainText]] as a DuckDB SQL expression over `expr` — the
    * same mark → extract → per-line density filter → rejoin, with
    * DuckDB's list lambdas standing in for Spark's (COALESCE guards
    * list_sum's NULL-on-empty where Spark's aggregate starts at 0).
    * Control-char sentinels ride chr() concatenation — they cannot
    * appear literally in SQL text.
    */
  private val SoSql = "chr(1)"
  private val ScSql = "chr(2)"

  /** Anchor-marked extraction text as a DuckDB expression — the
    * shared front of both density-rule oracles.
    */
  private[ext] def markedTextOracleSqlExpr(expr: String): String =
    oracleSqlExpr(
      s"regexp_replace(regexp_replace($expr, '(?is)<a\\b[^>]*>', $SoSql, 'g'), " +
        s"'(?is)</a\\s*>', $ScSql, 'g')")

  private[ext] def stripOracleSqlExpr(l: String): String =
    s"regexp_replace($l, '[' || $SoSql || $ScSql || ']', '', 'g')"

  private[ext] def linkOracleSqlExpr(l: String): String =
    s"COALESCE(list_sum(list_transform(regexp_extract_all($l, " +
      s"$SoSql || '([^' || $SoSql || $ScSql || ']*)' || $ScSql, 1), y -> length(y))), 0)"

  /** The context-free line verdict as a DuckDB expression over `l`. */
  private[ext] def goodOracleSqlExpr(l: String, minLineChars: Int,
                                     maxLinkDensity: Double): String =
    s"(length(${stripOracleSqlExpr(l)}) >= $minLineChars AND " +
      s"${linkOracleSqlExpr(l)} <= $maxLinkDensity * length(${stripOracleSqlExpr(l)}))"

  def mainTextOracleSqlExpr(expr: String, minLineChars: Int = 25,
                            maxLinkDensity: Double = 0.5): String = {
    val text = markedTextOracleSqlExpr(expr)
    s"array_to_string(list_transform(list_filter(string_split($text, chr(10)), " +
      s"x -> ${goodOracleSqlExpr("x", minLineChars, maxLinkDensity)}), " +
      s"x -> ${stripOracleSqlExpr("x")}), chr(10))"
  }

  /** [[htmlTitle]] as a DuckDB SQL expression over `expr` — extract,
    * entity-decode (same order), whitespace-collapse, trim.
    */
  def titleOracleSqlExpr(expr: String): String = {
    val extracted = s"regexp_extract($expr, '$TitlePattern', 1)"
    val decoded = Entities.foldLeft(extracted) { case (sql, (e, r)) =>
      s"regexp_replace($sql, '$e', '${r.replace("'", "''")}', 'g')"
    }
    s"trim(regexp_replace($decoded, '[ \\t\\r\\n]+', ' ', 'g'))"
  }

  /** The [[htmlToText]] chain as a DuckDB SQL expression over `expr` —
    * the oracle replay, built from the SAME pattern constants (DuckDB
    * needs the explicit 'g' flag where Spark replaces all matches
    * implicitly). Exposed so registry oracles and tests interpolate
    * one source of truth.
    */
  def oracleSqlExpr(expr: String): String = {
    val steps = Seq(
      CommentPattern -> "",
      ScriptPattern -> "",
      StylePattern -> "",
      BlockTagPattern -> "\n",
      AnyTagPattern -> "") ++ Entities.map { case (e, r) => (e, r) } ++ WsSteps
    steps.foldLeft(expr) { case (sql, (pat, rep)) =>
      val p = pat.replace("'", "''")
      val r = rep.replace("'", "''").replace("\n", "' || chr(10) || '")
      s"regexp_replace($sql, '$p', '$r', 'g')"
    }
  }
}

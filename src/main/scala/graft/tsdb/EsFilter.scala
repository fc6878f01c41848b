package graft.tsdb

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._
import graft.functions.SloppySlot

/** Compiles the Elasticsearch filter DSL subset the reference accepts into a
  * Catalyst [[Column]] predicate.
  *
  * The reference (lib/orestes.js:84, lib/orestes-query.js:167-198) forwards
  * the `query` body of a read verbatim to Elasticsearch as a filtered query;
  * the tag search lives in ES. Spark-first re-expression: tags are ordinary
  * columns, so the same DSL compiles to declarative predicates that Catalyst
  * pushes into the parquet scan (`PushedFilters`) — the "index" is row-group
  * min/max pruning + partition pruning instead of an external ES cluster.
  *
  * Supported: match_all, term (incl. case_insensitive), terms, range
  * (gt/gte/lt/lte), exists, missing, prefix / wildcard / regexp (incl.
  * case_insensitive), ids, fuzzy (OSA distance, the Lucene
  * transpositions=true default, plus transpositions:false and
  * prefix_length), match (incl. per-term fuzziness and
  * minimum_should_match), match_phrase, match_phrase_prefix
  * (sloppy phrases use Lucene's TOTAL move budget incl. out-of-order terms),
  * multi_match (best_fields/most_fields/cross_fields/phrase/phrase_prefix/
  * bool_prefix; fuzziness rejected), constant_score, dis_max, boosting,
  * span_term, span_near (span_term / span_multi / span_or / span_not /
  * field_masking_span clauses), span_first, span_multi
  * (prefix/wildcard/fuzzy inners), field_masking_span,
  * span_containing / span_within, terms_set, combined_fields, intervals
  * (match / any_of / all_of incl. fixed-phrase and nested sub-sources,
  * prefix / wildcard / fuzzy rules, the filter-rule family incl.
  * registered-predicate script), more_like_this,
  * nested, query_string (field:value / AND / OR / wildcards / `~` fuzzy),
  * bool (must/filter/should/must_not/minimum_should_match), and, or, not.
  * `should` requires at least one clause to match (filter-context
  * semantics) unless `minimum_should_match` says otherwise. Scoring-only
  * constructs compile to their filter-context degenerations: dis_max = OR
  * of its queries (tie_breaker shapes scores only), boosting = its positive
  * clause (the negative clause demotes, never excludes), more_like_this =
  * match over the analyzed like-terms.
  *
  * Dotted field names address JSON tag bags: `props.k` compiles to
  * `get_json_object(props, "$.k")` — the Spark answer to the reference's
  * arbitrary per-point tags (any key/value pair is a tag, README "series"),
  * without requiring every tag to be a physical column. Numeric comparisons
  * against JSON-extracted values compare as doubles.
  */
object EsFilter {
  private val mapper = new ObjectMapper()

  private def isJsonPath(f: String): Boolean = f.contains(".")

  /** Columns known to exist in the stored schema, or None for "trust the
    * caller". In Graft's storage model the tag schema is data-dependent (tags
    * are whatever columns were ever written), and ES filter context matches
    * nothing for a never-indexed field rather than erroring — so a filter on
    * an unknown field must compile to a null literal (matches nothing in
    * filter context; negations give TRUE through the existing coalesce
    * handling), not throw AnalysisException.
    */
  private val available = new ThreadLocal[Option[Set[String]]] {
    override def initialValue(): Option[Set[String]] = None
  }

  private def known(c: String): Boolean = available.get().forall(_.contains(c))

  /** What the ES `_id` pseudo-field resolves to. ES assigns every document an
    * `_id`; the relational analog is the table's id column, so callers name
    * it (`event_id` for the events points table). Unset -> `_id` behaves like
    * any other (likely unknown) field.
    */
  private val idField = new ThreadLocal[Option[String]] {
    override def initialValue(): Option[String] = None
  }

  private def resolve(f: String): String =
    if (f == "_id") idField.get().getOrElse(f) else f

  /** Inside a `nested` clause, bare field names resolve relative to the
    * nested path (ES lets inner queries use either the full `path.field` or
    * the relative form; both land on the same JSON tag).
    */
  private val nestedPath = new ThreadLocal[Option[String]] {
    override def initialValue(): Option[String] = None
  }

  private def nest(f: String): String = nestedPath.get() match {
    case Some(p) if f != p && !f.startsWith(p + ".") => p + "." + f
    case _ => f
  }

  /** Column for a possibly-dotted field: `a.b.c` -> json path `$.b.c` in
    * string column `a`. Fields (or JSON roots) absent from the stored schema
    * compile to null, mirroring ES filter-context semantics on an unindexed
    * field (the reference forwards filters verbatim to ES, orestes.js:84).
    */
  private def fieldCol(f0: String): Column = {
    val f = nest(resolve(f0))
    if (isJsonPath(f)) {
      val parts = f.split("\\.")
      if (known(parts.head))
        get_json_object(col(parts.head), "$." + parts.tail.mkString("."))
      else lit(null).cast("string")
    } else if (known(f)) col(f)
    else lit(null).cast("string")
  }

  def compile(json: String): Column = compileNode(mapper.readTree(json))

  /** Compile against a known schema: filters on fields outside `columns`
    * match nothing instead of throwing (the Graft storage path).
    */
  def compile(json: String, columns: Iterable[String]): Column = {
    available.set(Some(columns.toSet))
    try compile(json) finally available.set(None)
  }

  /** Compile with an `_id` mapping: ES `ids` queries (and `_id:` terms)
    * resolve to `idCol`.
    */
  def compile(json: String, columns: Iterable[String], idCol: String): Column = {
    idField.set(Some(idCol))
    try compile(json, columns) finally idField.set(None)
  }

  def compileNode(node: JsonNode): Column = {
    require(node != null && node.isObject && node.size() == 1,
      s"filter clause must be a single-key object, got: $node")
    val name = node.fieldNames().next()
    val body = node.get(name)
    name match {
      case "match_all" => lit(true)
      case "term"      => term(body)
      case "terms"     => terms(body)
      case "range"     => range(body)
      case "exists"    => fieldCol(body.get("field").asText()).isNotNull
      case "missing"   => fieldCol(body.get("field").asText()).isNull
      // term-level queries take ES's `case_insensitive` knob (r12 — was
      // silently dropped by the value unwrap): lowered column + lowered
      // literal for prefix/wildcard, the inline (?i) flag for regexp
      case "prefix" =>
        val (f, v) = fieldValue(body)
        if (caseInsensitive(body)) lower(fieldCol(f)).startsWith(v.asText().toLowerCase)
        else fieldCol(f).startsWith(v.asText())
      case "wildcard" =>
        val (f, v) = fieldValue(body)
        if (caseInsensitive(body))
          lower(fieldCol(f)).rlike(wildcardToRegex(v.asText().toLowerCase))
        else fieldCol(f).rlike(wildcardToRegex(v.asText()))
      case "regexp" =>
        val (f, v) = fieldValue(body)
        val flag = if (caseInsensitive(body)) "(?i)" else ""
        fieldCol(f).rlike(s"^$flag(?:" + v.asText() + ")$$")
      case "ids"       => ids(body)
      case "fuzzy"     => fuzzy(body)
      case "match"     => matchQuery(body)
      case "multi_match" => multiMatch(body)
      case "match_phrase"        => matchPhrase(body, prefix = false)
      case "match_phrase_prefix" => matchPhrase(body, prefix = true)
      // constant_score: scoring is irrelevant in filter context — pass the
      // wrapped filter through (ES accepts `filter` or legacy `query`)
      case "constant_score" =>
        require(body.isObject && (body.has("filter") || body.has("query")),
          s"""constant_score needs a "filter", got $body""")
        compileNode(if (body.has("filter")) body.get("filter") else body.get("query"))
      case "dis_max"   => disMax(body)
      case "boosting"  => boosting(body)
      case "span_term"  => spanTerm(body)
      case "span_near"  => spanNear(body)
      case "span_first" => spanFirst(body)
      case "span_containing" | "span_within" => spanBigLittle(body)
      // a top-level field-masked span is the wrapped span evaluated on the
      // masked field (see the spanClauseSlot case for the contract)
      case "field_masking_span" =>
        val (f, slot) = spanClauseSlot(node)
        sloppyMatch(fieldCol(f), Seq(slot), 0, inOrder = true)
      case "terms_set"       => termsSet(body)
      case "combined_fields" => combinedFields(body)
      case "intervals"  => intervals(body)
      case "more_like_this" => moreLikeThis(body)
      case "nested"    => nested(body)
      case "query_string" => queryString(body)
      case "bool"      => bool(body)
      case "and"       => clauses(body).map(compileNode).reduceOption(_ && _).getOrElse(lit(true))
      case "or"        => clauses(body).map(compileNode).reduceOption(_ || _).getOrElse(lit(false))
      // coalesce: a NULL predicate (e.g. a term on a missing JSON field)
      // must negate to TRUE, matching `bool.must_not` below and ES semantics
      case "not"       => !coalesce(compileNode(body), lit(false))
      case other       => throw new IllegalArgumentException(s"unsupported filter type: $other")
    }
  }

  private def clauses(body: JsonNode): Seq[JsonNode] =
    if (body.isArray) body.elements().asScala.toSeq else Seq(body)

  /** ES `case_insensitive` on term-level queries (object spec form). */
  private def caseInsensitive(body: JsonNode): Boolean = {
    val spec = body.get(body.fieldNames().next())
    spec.isObject && spec.has("case_insensitive") &&
      spec.get("case_insensitive").asBoolean(false)
  }

  private def fieldValue(body: JsonNode): (String, JsonNode) = {
    require(body.isObject && body.size() == 1, s"expected {field: value}, got $body")
    val f = body.fieldNames().next()
    (f, f match {
      case _ if body.get(f).isObject && body.get(f).has("value") => body.get(f).get("value")
      case _ => body.get(f)
    })
  }

  private def jsonLit(v: JsonNode): Column =
    if (v.isIntegralNumber) lit(v.asLong())
    else if (v.isNumber) lit(v.asDouble())
    else if (v.isBoolean) lit(v.asBoolean())
    else lit(v.asText())

  /** Comparable (column, literal) pair: JSON-extracted fields compare as
    * doubles when the query value is numeric.
    */
  private def comparable(f: String, v: JsonNode): (Column, Column) =
    if (isJsonPath(f) && v.isNumber) (fieldCol(f).cast("double"), lit(v.asDouble()))
    else (fieldCol(f), jsonLit(v))

  private def term(body: JsonNode): Column = {
    val (f, v) = fieldValue(body)
    // ES case_insensitive (r12, same sweep as prefix/wildcard/regexp):
    // lowered comparison for textual values; numeric comparisons unchanged
    if (caseInsensitive(body) && v.isTextual)
      lower(fieldCol(f).cast("string")) === lit(v.asText().toLowerCase)
    else {
      val (c, l) = comparable(f, v)
      c === l
    }
  }

  /** ES `fuzzy`: edit-distance match on a keyword field. `fuzziness` is an
    * integer, a numeric string, or "AUTO" (ES's length ladder: 0 for ≤2
    * chars, 1 for 3-5, 2 beyond); anything else is rejected, not silently
    * treated as AUTO. The distance is OSA (Levenshtein + adjacent
    * transpositions) — the Lucene default `transpositions: true`, so
    * 'cilck' matches 'click' at distance 1 — via the codegen'd `graft_osa`
    * expression when [[graft.functions.GraftExtensions]] is installed
    * (plain Levenshtein otherwise: the documented no-transpositions
    * fallback). Evaluates inside the scan stage — no join, and at scale the
    * non-fuzzy residue of a bool query still prunes first.
    */
  /** ES fuzziness: an integer, a numeric string, or "AUTO" (the length
    * ladder on `text`: 0 for ≤2 chars, 1 for 3-5, 2 beyond); anything else
    * rejected, not silently treated as AUTO. Shared by the `fuzzy` query
    * and the intervals `fuzzy` rule.
    */
  private def fuzzinessOf(spec: JsonNode, text: String): Int = {
    def auto: Int = if (text.length <= 2) 0 else if (text.length <= 5) 1 else 2
    if (spec == null || !spec.isObject || !spec.has("fuzziness")) auto
    else {
      val fz = spec.get("fuzziness")
      if (fz.isNumber) fz.asInt()
      else fz.asText() match {
        case s if s.matches("\\d+")          => s.toInt
        case s if s.equalsIgnoreCase("AUTO") => auto
        case other => throw new IllegalArgumentException(
          s"unsupported fuzziness: '$other' (want an integer or AUTO)")
      }
    }
  }

  /** ES `minimum_should_match` over `total` optional clauses, the FULL
    * spec including negative forms (r13 — previously "-1"/"-25%" were
    * silently clamped to 1, a silent divergence from ES's all-but-N rule):
    * "N" requires N; "-N" requires total-N (N clauses may be missing);
    * "P%" requires floor(P% of total); "-P%" lets floor(P% of total) be
    * missing, i.e. requires total minus that floor. Conditional forms
    * ("3<90%") are rejected by name, not approximated. When `floorOne`
    * (match / mlt / terms_set / combined_fields — pure disjunctions) the
    * result is floored at 1; bool keeps 0-or-negative results as "should
    * is optional" (its own contract). Never capped at total: an over-large
    * msm matches nothing, exactly ES.
    */
  private[graft] def msmOf(raw: String, total: Int, floorOne: Boolean = true): Int = {
    require(!raw.contains("<"),
      s"conditional minimum_should_match forms are rejected, not " +
        s"approximated: '$raw'")
    val neg = raw.startsWith("-")
    val mag = if (neg) raw.substring(1) else raw
    val n =
      if (mag.endsWith("%")) {
        val p = mag.dropRight(1).toDouble
        math.floor(p / 100.0 * total).toInt
      } else mag.toInt
    val v = if (neg) total - n else n
    if (floorOne) math.max(1, v) else v
  }

  /** OSA edit distance as a Column: the codegen'd kernel when
    * GraftExtensions is installed, the (documented no-transpositions)
    * builtin fallback otherwise — shared by the fuzzy query and
    * query_string's `~` operator.
    */
  private def editDistCol(lhs: Column, text: String): Column = {
    val active = org.apache.spark.sql.SparkSession.active
    if (active.catalog.functionExists("graft_osa"))
      call_function("graft_osa", lhs, lit(text))
    else levenshtein(lhs, lit(text))
  }

  /** Column-level twin of the kernel's `SloppyMatch.fuzzyMatches`: does a
    * token expression fill a [[graft.functions.FuzzySpec]]? Pinned prefix
    * edit-free, remainders at the distance — OSA via the codegen'd kernel
    * (the documented plain-Levenshtein fallback without extensions).
    */
  private def fuzzyTokenPred(e: Column, fs: graft.functions.FuzzySpec): Column = {
    val pl = math.min(fs.prefixLen, fs.term.length)
    val (lhs, rhs) =
      if (pl == 0) (e, fs.term)
      else (e.substr(lit(pl + 1), length(e)), fs.term.substring(pl))
    val dist =
      if (fs.transpositions) editDistCol(lhs, rhs)
      else levenshtein(lhs, lit(rhs))
    val pfxOk: Column =
      if (pl == 0) lit(true) else e.startsWith(lit(fs.term.substring(0, pl)))
    pfxOk && dist <= fs.dist
  }

  /** ONE fuzzy-source parser for every DSL site (fuzzy-shaped intervals
    * rule, span_multi inner — r12 review dedup): unwraps `value`/`term`,
    * validates a single non-empty token, reads the knob set.
    */
  private def fuzzySpecOf(spec: JsonNode, rawText: String): graft.functions.FuzzySpec = {
    val text = rawText.trim.toLowerCase
    require(text.nonEmpty && !text.exists(_.isWhitespace),
      s"fuzzy term must be a single non-empty token, got: '$rawText'")
    val tr = !(spec != null && spec.isObject && spec.has("transpositions")) ||
      spec.get("transpositions").asBoolean(true)
    val pl = if (spec != null && spec.isObject && spec.has("prefix_length"))
      spec.get("prefix_length").asInt() else 0
    require(pl >= 0, s"prefix_length must be non-negative, got $pl")
    graft.functions.FuzzySpec(text, fuzzinessOf(spec, text), tr, pl)
  }

  private def fuzzy(body: JsonNode): Column = {
    require(body.isObject && body.size() == 1, s"expected {field: spec}, got $body")
    val f = body.fieldNames().next()
    val spec = body.get(f)
    val v = if (spec.isObject && spec.has("value")) spec.get("value") else spec
    val text = v.asText()
    val fuzziness = fuzzinessOf(spec, text)
    // r12: the full ES knob set. `transpositions:false` -> plain
    // Levenshtein (Spark's codegen'd built-in); `prefix_length` pins an
    // edit-free prefix — the field must start with it and only the
    // remainders are compared (Lucene's rule). Both still evaluate inside
    // the scan stage — no join, no UDF.
    val transpositions = !(spec.isObject && spec.has("transpositions")) ||
      spec.get("transpositions").asBoolean(true)
    val plRaw = if (spec.isObject && spec.has("prefix_length"))
      spec.get("prefix_length").asInt() else 0
    require(plRaw >= 0, s"prefix_length must be non-negative, got $plRaw")
    val pl = math.min(plRaw, text.length)
    val fieldStr = fieldCol(f).cast("string")
    val (lhs, rhs) =
      if (pl == 0) (fieldStr, lit(text))
      else (fieldStr.substr(lit(pl + 1), length(fieldStr)), lit(text.substring(pl)))
    val dist: Column = {
      val active = org.apache.spark.sql.SparkSession.active
      if (!transpositions) levenshtein(lhs, rhs)
      else if (active.catalog.functionExists("graft_osa"))
        call_function("graft_osa", lhs, rhs)
      else levenshtein(lhs, rhs)
    }
    val pfxOk: Column =
      if (pl == 0) lit(true) else fieldStr.startsWith(lit(text.substring(0, pl)))
    pfxOk && dist <= fuzziness
  }

  /** ES `multi_match`: the `match` analyzer applied across several fields —
    * a document matches when ANY field matches (best_fields, the ES
    * default; in filter context `most_fields` — scores summed, matching
    * unchanged — degenerates to the same disjunction, and `cross_fields` +
    * AND requires each term to match in SOME field). `phrase` /
    * `phrase_prefix` route through [[phrasePred]] per field (in-order
    * adjacency ± slop), NOT the term disjunction; `bool_prefix` is ES's
    * match_bool_prefix per field (each term must appear as a token, the
    * last as a token prefix, combined per `operator`). Any other `type` is
    * rejected, not silently treated as best_fields — the same convention
    * as fuzziness above.
    */
  private def multiMatch(body: JsonNode): Column = {
    require(body.isObject && body.has("query") && body.has("fields"),
      s"""multi_match needs "query" and "fields", got $body""")
    val qText = body.get("query").asText()
    val fields = body.get("fields").elements().asScala.map(_.asText()).toSeq
    require(fields.nonEmpty, "multi_match needs at least one field")
    val op = if (body.has("operator")) body.get("operator").asText().toLowerCase else "or"
    // fuzziness on multi_match is rejected, not silently dropped (the
    // implement-or-reject convention): wrap per-field fuzzy `match`
    // clauses in a bool instead — same semantics, explicit
    require(!body.has("fuzziness"),
      "multi_match fuzziness is rejected, not approximated: use a bool of " +
        "per-field match clauses with fuzziness")
    val mType = if (body.has("type")) body.get("type").asText() else "best_fields"
    val supported = Set("best_fields", "most_fields", "cross_fields",
      "phrase", "phrase_prefix", "bool_prefix")
    require(supported.contains(mType),
      s"unsupported multi_match type: '$mType' (supported: ${supported.mkString(", ")})")
    if (mType == "phrase" || mType == "phrase_prefix") {
      val slop = if (body.has("slop")) body.get("slop").asInt() else 0
      return fields.map(f =>
        coalesce(phrasePred(f, qText, slop, mType == "phrase_prefix"), lit(false)): Column)
        .reduce(_ || _)
    }
    val terms = qText.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    require(terms.nonEmpty, "multi_match needs a non-empty query")
    def fieldToks(f: String) = split(lower(fieldCol(f)), "\\s+")
    if (mType == "bool_prefix") {
      // ES match_bool_prefix per field: every term a term query except the
      // LAST, which matches as a token PREFIX (the as-you-type shape);
      // clauses combine per `operator` (default OR — ES's should clauses in
      // filter context), fields as a best_fields-style disjunction
      return fields.map { f =>
        val toks = fieldToks(f)
        val preds = terms.init.map(t => array_contains(toks, t): Column) :+
          exists(toks, x => x.startsWith(lit(terms.last)))
        coalesce(if (op == "and") preds.reduce(_ && _) else preds.reduce(_ || _),
          lit(false)): Column
      }.reduce(_ || _)
    }
    if (mType == "cross_fields" && op == "and")
      // every term present in SOME field
      terms.map(t => fields.map(f =>
          coalesce(array_contains(fieldToks(f), t), lit(false)): Column)
        .reduce(_ || _)).reduce(_ && _)
    else {
      // best_fields / most_fields: some field matches the whole
      // (per-operator) query
      fields.map { f =>
        val preds = terms.map(t => array_contains(fieldToks(f), t))
        coalesce(if (op == "and") preds.reduce(_ && _) else preds.reduce(_ || _),
          lit(false)): Column
      }.reduce(_ || _)
    }
  }

  /** ES `match_phrase` (+ `_prefix`): the analyzed query terms must form a
    * phrase in the analyzed field — consistent with [[matchQuery]]'s
    * analyzer (lowercase whitespace tokens). `slop = 0` (the default) means
    * adjacent-in-order and compiles to an anchored regex over the
    * space-rejoined token stream with every term regex-quoted; the
    * `_prefix` form lets the last term match as a prefix (ES's autocomplete
    * shape). `slop > 0` uses Lucene's sloppy-phrase semantics
    * ([[sloppyMatch]]): a TOTAL move budget across the whole phrase that
    * also admits OUT-OF-ORDER terms (a two-term swap costs 2 moves), not a
    * per-consecutive-gap allowance. Evaluates in the scan stage.
    */
  private def matchPhrase(body: JsonNode, prefix: Boolean): Column = {
    require(body.isObject && body.size() == 1, s"expected {field: query}, got $body")
    val f = body.fieldNames().next()
    val spec = body.get(f)
    val qText = if (spec.isObject && spec.has("query")) spec.get("query").asText()
                else spec.asText()
    val slop = if (spec.isObject && spec.has("slop")) spec.get("slop").asInt() else 0
    phrasePred(f, qText, slop, prefix)
  }

  /** The phrase predicate shared by match_phrase(_prefix) and multi_match
    * type=phrase(_prefix): adjacency regex at slop 0, [[sloppyMatch]] above.
    */
  private def phrasePred(f: String, qText: String, slop: Int, prefix: Boolean): Column = {
    val terms = qText.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    require(terms.nonEmpty, "match_phrase needs a non-empty query")
    if (slop <= 0) {
      val quoted = terms.map(java.util.regex.Pattern.quote)
      val phrase =
        if (prefix) (quoted.init :+ (quoted.last + "[^ ]*")).mkString(" ")
        else quoted.mkString(" ")
      val joined = array_join(split(lower(fieldCol(f)), "\\s+"), " ")
      joined.rlike("(^| )" + phrase + "( |$)")
    } else sloppyMatch(fieldCol(f), terms.map(t => SloppySlot(Seq(t), Nil, 0, 0)),
      slop, inOrder = false, prefix = prefix)
  }

  /** ES `dis_max`: in scoring context the best-scoring clause wins and
    * `tie_breaker` blends the rest; matching is unchanged — a document
    * matches when ANY clause matches — so the filter-context compilation is
    * a plain disjunction.
    */
  private def disMax(body: JsonNode): Column = {
    require(body.isObject && body.has("queries"),
      s"""dis_max needs "queries", got $body""")
    clauses(body.get("queries")).map(compileNode)
      .reduceOption(_ || _).getOrElse(lit(false))
  }

  /** ES `boosting`: the `negative` clause DEMOTES scores (by
    * `negative_boost`) but never excludes a document, so filter-context
    * matching is decided by the `positive` clause alone.
    */
  private def boosting(body: JsonNode): Column = {
    require(body.isObject && body.has("positive"),
      s"""boosting needs "positive", got $body""")
    compileNode(body.get("positive"))
  }

  /** ES `span_term`: a single-term span — standalone (no enclosing span
    * combinator) it matches documents whose analyzed field contains the
    * term at any position, i.e. token membership under [[matchQuery]]'s
    * analyzer.
    */
  private def spanTerm(body: JsonNode): Column = {
    val (f, v) = fieldValue(body)
    array_contains(split(lower(fieldCol(f)), "\\s+"), v.asText().toLowerCase)
  }

  /** ES `span_near`: the clause spans — `span_term`, `span_or` over terms,
    * or `span_not` (all on ONE field; any other combinator is rejected,
    * not silently approximated) — must occur within `slop` total
    * intervening unmatched positions, optionally in order. `in_order`
    * defaults to false (the ES SpanNearQueryBuilder default); out-of-order
    * matching uses the same total-move-budget matcher as sloppy phrases.
    */
  /** ES `span_containing` / `span_within` (r12): a `big` span that contains
    * a `little` span match. In FILTER context the two are the same boolean
    * — ∃ (big, little): little ⊆ big — so both compile to the big source
    * with the kernel's `containing` filter rule (the intervals-filter
    * machinery; containment judged per MINIMAL big interval, the
    * adjudicated intervals contract — Lucene's span iterators are
    * near-minimal and differ only on contrived repeated-term shapes).
    * big: span_term/span_or/span_multi or a span_near of them; little: one
    * slot, or a span_near of plain terms (its minimal intervals via the
    * nested filter-slot encoding).
    */
  private def spanBigLittle(body: JsonNode): Column = {
    require(body.isObject && body.has("little") && body.has("big"),
      s"""span_containing/span_within need "little" and "big", got $body""")
    def sourceOf(n: JsonNode): (String, Seq[SloppySlot], Int, Boolean) = {
      require(n.isObject && n.size() == 1,
        s"span source must be a single-key object, got $n")
      if (n.fieldNames().next() == "span_near") parseSpanNear(n.get("span_near"))
      else {
        val (f, sl) = spanClauseSlot(n)
        (f, Seq(sl), 0, true)
      }
    }
    val (bf, bigSlots, bigSlop, bigOrder) = sourceOf(body.get("big"))
    val (lf, littleSlots, lSlop, lOrder) = sourceOf(body.get("little"))
    val littleSlot =
      if (littleSlots.size == 1) {
        val sl = littleSlots.head
        // the filter-slot evaluation tests include/prefix/wildcard/fuzzy
        // alternatives but has NO exclusion window — a span_not little
        // would silently lose its exclude (r12 review fix)
        require(sl.excludes.isEmpty,
          "span_containing/span_within little must not be a span_not " +
            "(the filter slot has no exclusion window; rejected, not " +
            "approximated)")
        sl
      } else {
        require(littleSlots.forall(sl => sl.includes.size == 1 &&
            sl.excludes.isEmpty && sl.prefixes.isEmpty &&
            sl.wildcards.isEmpty && sl.fuzzies.isEmpty),
          "a multi-clause little span must be plain single-term clauses " +
            "(its minimal intervals ride the nested filter-slot encoding)")
        // the nested encoding budgets UNORDERED matches by the intervals
        // covering-width rule, while span_near's own unordered budget is
        // the total-move rule — identical JSON would mean two different
        // things, so only the ordered form (where the two rules agree:
        // total intervening positions) is accepted (r12 review fix)
        require(lOrder,
          "a multi-clause little span_near must set in_order:true (the " +
            "unordered nested budget is the intervals width rule, not " +
            "span_near's move budget; rejected, not approximated)")
        SloppySlot(Nil, Nil, 0, 0,
          phrase = littleSlots.map(_.includes.head),
          subSlop = lSlop, subOrdered = lOrder)
      }
    require(bf == lf,
      s"span_containing/span_within must target a single field, got: $bf, $lf")
    sloppyMatch(fieldCol(bf), bigSlots, bigSlop, inOrder = bigOrder,
      filterMode = "containing", filterSlot = Some(littleSlot))
  }

  /** ONE span_near parse (clauses, single-field, slop/in_order defaults) —
    * shared by the top-level query and span_containing/span_within sources
    * so the contract cannot drift (r12 review dedup).
    */
  private def parseSpanNear(b: JsonNode): (String, Seq[SloppySlot], Int, Boolean) = {
    require(b != null && b.isObject && b.has("clauses"),
      s"""span_near needs "clauses", got $b""")
    val cls = clauses(b.get("clauses")).map(spanClauseSlot)
    require(cls.nonEmpty, "span_near needs at least one clause")
    val fs = cls.map(_._1).distinct
    require(fs.size == 1,
      s"span_near clauses must target a single field, got: ${fs.mkString(", ")}")
    (fs.head, cls.map(_._2),
      if (b.has("slop")) b.get("slop").asInt() else 0,
      b.has("in_order") && b.get("in_order").asBoolean())
  }

  private def spanNear(body: JsonNode): Column = {
    val (f, slots, slop, inOrder) = parseSpanNear(body)
    sloppyMatch(fieldCol(f), slots, slop, inOrder = inOrder)
  }

  /** ES `span_first`: the match span must END within the first `end`
    * positions — for the single-token spans of span_term/span_or/span_not
    * matches, a kept position p (0-based) qualifies iff p + 1 <= end
    * (Lucene SpanFirstQuery = SpanPositionRangeQuery[0, end)). The
    * exclusion window of a span_not match clause may look beyond the
    * boundary — exclusion applies before the position test, as in Lucene's
    * query composition order.
    */
  private def spanFirst(body: JsonNode): Column = {
    require(body.isObject && body.has("match") && body.has("end"),
      s"""span_first needs "match" and "end", got $body""")
    val (f, slot) = spanClauseSlot(body.get("match"))
    val end = body.get("end").asInt()
    if (end <= 0) return lit(false)
    val toks = split(lower(fieldCol(f)), "\\s+")
    val idx = sequence(lit(0), least(lit(end), size(toks)) - 1)
    // every slot alternative kind fills the position (r12 review fix: a
    // span_multi match — or a span_or merging one in — previously crashed
    // on empty includes / silently dropped its alternatives here)
    def incMatch(j: Column): Column = {
      val e = element_at(toks, j + 1)
      val alts: Seq[Column] =
        slot.includes.map(t => e === lit(t): Column) ++
        slot.prefixes.map(p => e.startsWith(lit(p)): Column) ++
        slot.wildcards.map(w =>
          e.rlike(graft.functions.SloppySlot.wildcardRegex(w)): Column) ++
        slot.fuzzies.map(fs => fuzzyTokenPred(e, fs): Column)
      alts.reduce(_ || _)
    }
    val all = sequence(lit(0), size(toks) - 1) // exclusion scans every position
    def kept(p: Column): Column =
      if (slot.excludes.isEmpty) incMatch(p)
      else incMatch(p) && !exists(all, q =>
        q >= p - slot.pre && q <= p + slot.post &&
          slot.excludes.map(t => element_at(toks, q + 1) === lit(t): Column)
            .reduce(_ || _))
    size(toks) > 0 && exists(idx, p => kept(p))
  }

  /** ES `intervals` query, filter-context: the field must contain at least
    * one interval matching the source. Supported sources: `match` (analyzed
    * terms at distinct positions; `ordered` default false, `max_gaps`
    * default -1 = unbounded — ordered intervals budget the total intervening
    * positions, unordered intervals budget the covering interval's gap count
    * `(max - min) - (n - 1)`, Lucene's Ordered/UnorderedIntervalsSource
    * width rules), `any_of` (an interval of ANY sub-source exists — in
    * filter context exactly OR), and `all_of` whose sub-sources each reduce
    * to a single-token alternative set (a one-term `match` or an `any_of`
    * of them — such an all_of IS a slot-assignment search under the same
    * budgets), a fixed PHRASE (a multi-token sub-match marked
    * `ordered:true, max_gaps:0` — Lucene `Intervals.phrase`), or a NESTED
    * sloppy sub-match with its own gap budget (any other (ordered,
    * max_gaps) combination, the ES default included — Lucene's nested
    * Ordered/UnorderedIntervalsSource): the nested slot's candidates are
    * the sub-match's MINIMAL intervals, each occupying its actual width in
    * the enclosing budget, and chosen intervals may not overlap. Sources
    * that need corpus statistics (`wildcard`, `fuzzy`) and `script`
    * filters are rejected, not approximated.
    */
  private def intervals(body: JsonNode): Column = {
    require(body.isObject && body.size() == 1,
      s"intervals expects a single {field: source} object, got $body")
    val f = body.fieldNames().next()
    intervalSource(f, body.get(f))
  }

  /** ES `max_gaps: -1` (the default): the gap budget never binds. */
  private val UnboundedGaps = Int.MaxValue / 4

  private def intervalSource(f: String, src: JsonNode): Column = {
    require(src != null && src.isObject && src.size() == 1,
      s"interval source must be a single-key object, got $src")
    src.fieldNames().next() match {
      case "match" =>
        val b = src.get("match")
        require(b != null && b.isObject && b.has("query"),
          s"""intervals match needs "query", got $b""")
        val terms = b.get("query").asText().trim.toLowerCase
          .split("\\s+").filter(_.nonEmpty).toSeq
        require(terms.nonEmpty, "intervals match needs non-empty query text")
        intervalBudgetMatch(f, terms.map(t => SloppySlot(Seq(t), Nil, 0, 0)), b)
      case "any_of" =>
        val b = src.get("any_of")
        require(b != null && b.isObject && b.has("intervals"),
          s"""any_of needs "intervals", got $b""")
        val subs = clauses(b.get("intervals"))
        require(subs.nonEmpty, "any_of needs at least one source")
        subs.map(intervalSource(f, _)).reduce(_ || _)
      case "all_of" =>
        val b = src.get("all_of")
        require(b != null && b.isObject && b.has("intervals"),
          s"""all_of needs "intervals", got $b""")
        val slots = clauses(b.get("intervals")).map(singleTokenSlot)
        require(slots.nonEmpty, "all_of needs at least one source")
        intervalBudgetMatch(f, slots, b)
      case "prefix" | "wildcard" | "fuzzy" =>
        // standalone term-expansion sources: any token carrying the prefix /
        // matching the wildcard pattern / within the fuzzy edit budget
        // (Lucene expands each against the indexed term set; over an
        // analyzed text field that is exactly a position predicate)
        sloppyMatch(fieldCol(f), Seq(singleTokenSlot(src)), 0, inOrder = false)
      case other => throw new IllegalArgumentException(
        s"unsupported intervals source: $other " +
          "(match, any_of, all_of, prefix, wildcard and fuzzy)")
    }
  }

  private def intervalBudgetMatch(f: String, slots: Seq[SloppySlot],
                                  b: JsonNode): Column = {
    val ordered = b.path("ordered").asBoolean(false)
    val maxGaps = if (b.has("max_gaps")) b.get("max_gaps").asInt() else -1
    val slop = if (maxGaps < 0) UnboundedGaps else maxGaps
    // intervals `filter` rules (Lucene IntervalsSource filters): the
    // source's covering interval must stand in the rule's relation to
    // SOME filter-source interval — containing / contained_by /
    // overlapping (and their not_ absence forms), or start after / end
    // before one. The filter source reduces to one slot — a single token,
    // an any_of of them, a prefix, or an explicit fixed phrase.
    //
    // `script` (r12, closing the last rejected intervals form): a
    // graft-native escape hatch, NOT a Painless engine — the source must
    // be `graft:<name>` naming a Scala predicate registered via
    // [[registerIntervalScript]], which sees each minimal interval's
    // (start, end, gaps) exactly as Lucene's script filter exposes
    // `interval.start/end/gaps`. Arbitrary script text is still rejected
    // with a message pointing at the registry.
    val filterNode = Option(b.get("filter"))
    // single-rule contract FIRST: a filter object combining script with
    // another rule must reject loudly, never silently judge by one of them
    // (review finding r12)
    filterNode.foreach(fn => require(fn.isObject && fn.size() == 1,
      s"intervals filter must be a single-rule object, got $fn"))
    val scriptPred: Option[(Int, Int, Int) => Boolean] = filterNode.flatMap { fn =>
      if (!fn.has("script")) None
      else {
        val sn = fn.get("script")
        require(sn.isObject && sn.has("source"),
          s"""intervals script filter needs "source", got $sn""")
        val src = sn.get("source").asText()
        require(src.startsWith("graft:"),
          "intervals script filters take a registered graft predicate " +
            s"""("graft:<name>", see EsFilter.registerIntervalScript); """ +
            s"arbitrary script text is rejected, not approximated: '$src'")
        val name = src.stripPrefix("graft:")
        val p = scriptRegistry.get(name)
        require(p != null, s"no interval script registered under '$name' " +
          s"(registered: ${scriptNames().mkString(", ")})")
        Some(p)
      }
    }
    val (fMode, fSlot) = filterNode match {
      case _ if scriptPred.isDefined => ("script", None)
      case None => ("", None)
      case Some(fn) =>
        val rule = fn.fieldNames().next()
        require(Set("containing", "not_containing",
          "contained_by", "not_contained_by",
          "overlapping", "not_overlapping", "after", "before")(rule),
          s"unsupported intervals filter rule: $rule (containing, " +
            "not_containing, contained_by, not_contained_by, overlapping, " +
            "not_overlapping, after, before, script)")
        (rule, Some(singleTokenSlot(fn.get(rule))))
    }
    sloppyMatch(fieldCol(f), slots, slop, inOrder = ordered, gaps = !ordered,
      filterMode = fMode, filterSlot = fSlot, script = scriptPred.orNull)
  }

  // ---- interval script predicates (the graft escape hatch) ---------------

  private val scriptRegistry =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Int, Int) => Boolean]()

  /** Register a named interval predicate for the intervals `script` filter
    * rule — the graft-native form of Lucene's script filter: `pred(start,
    * end, gaps)` is evaluated per MINIMAL interval (token positions,
    * inclusive; gaps = interior positions not covered by the matched
    * sub-intervals — Lucene's `interval.gaps`). The predicate object
    * travels inside the compiled expression (codegen reference array), so
    * it serializes to executors with the plan — it must be a pure
    * serializable function.
    */
  def registerIntervalScript(name: String)(pred: (Int, Int, Int) => Boolean): Unit =
    scriptRegistry.put(name, pred)

  /** Registered script names (for error messages and tooling). */
  def scriptNames(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    scriptRegistry.keys.asScala.toSeq.sorted
  }

  /** An `all_of` sub-source reduced to one single-token slot: a one-term
    * `match` or an `any_of` union of them (Lucene's one-position
    * degeneration, the same shape span_or takes under span_near). */
  private def singleTokenSlot(src: JsonNode): SloppySlot = {
    require(src != null && src.isObject && src.size() == 1,
      s"interval source must be a single-key object, got $src")
    src.fieldNames().next() match {
      case "match" =>
        val b = src.get("match")
        require(b != null && b.isObject && b.has("query"),
          s"""intervals match needs "query", got $b""")
        val ts = b.get("query").asText().trim.toLowerCase
          .split("\\s+").filter(_.nonEmpty)
        if (ts.length == 1) SloppySlot(Seq(ts(0)), Nil, 0, 0)
        else {
          // multi-token sub-match: an explicit ordered:true, max_gaps:0 is
          // the fixed-phrase fast path (Lucene Intervals.phrase, a
          // contiguous width-n interval); any OTHER (ordered, max_gaps)
          // combination — including the ES default max_gaps:-1 — becomes a
          // NESTED sub-interval slot: its candidates are the sub-match's
          // minimal intervals under its own budget (Lucene's nested
          // Ordered/UnorderedIntervalsSource), each occupying its actual
          // width in the enclosing budget and the no-overlap rule.
          val ordered = b.path("ordered").asBoolean(false)
          val mg = if (b.has("max_gaps")) b.get("max_gaps").asInt() else -1
          if (ordered && mg == 0) SloppySlot(Nil, Nil, 0, 0, Nil, ts.toSeq)
          else SloppySlot(Nil, Nil, 0, 0, Nil, ts.toSeq,
            subSlop = if (mg < 0) UnboundedGaps else mg, subOrdered = ordered)
        }
      case "any_of" =>
        val b = src.get("any_of")
        require(b != null && b.isObject && b.has("intervals"),
          s"""any_of needs "intervals", got $b""")
        val subs = clauses(b.get("intervals")).map(singleTokenSlot)
        require(subs.nonEmpty, "any_of needs at least one source")
        // the flatten below unions single-POSITION alternatives; a
        // fixed-phrase alternative is a multi-width interval and would be
        // silently discarded by it — rejected, not approximated
        require(subs.forall(_.phrase.isEmpty),
          "any_of alternatives inside all_of must reduce to single-token " +
            "sources; fixed-phrase alternatives are rejected, not approximated")
        SloppySlot(subs.flatMap(_.includes).distinct, Nil, 0, 0,
          subs.flatMap(_.prefixes).distinct,
          wildcards = subs.flatMap(_.wildcards).distinct,
          fuzzies = subs.flatMap(_.fuzzies).distinct)
      case "prefix" =>
        // intervals prefix rule: one slot whose positions are the tokens
        // carrying the prefix — Lucene's indexed-term expansion as a
        // position predicate
        val b = src.get("prefix")
        require(b != null && b.isObject && b.has("prefix"),
          s"""intervals prefix needs "prefix", got $b""")
        val p = b.get("prefix").asText().trim.toLowerCase
        require(p.nonEmpty && !p.exists(_.isWhitespace),
          s"intervals prefix must be a single non-empty term, got: '$p'")
        SloppySlot(Nil, Nil, 0, 0, Seq(p))
      case "wildcard" =>
        // intervals wildcard rule: positions whose token matches the
        // `*`/`?` pattern — the prefix rule's generalization (Lucene
        // expands the pattern against the term dictionary; over an
        // analyzed field that is exactly a full-token pattern test)
        val b = src.get("wildcard")
        require(b != null && b.isObject && b.has("pattern"),
          s"""intervals wildcard needs "pattern", got $b""")
        val p = b.get("pattern").asText().trim.toLowerCase
        require(p.nonEmpty && !p.exists(_.isWhitespace),
          s"intervals wildcard must be a single non-empty pattern, got: '$p'")
        SloppySlot(Nil, Nil, 0, 0, wildcards = Seq(p))
      case "fuzzy" =>
        // intervals fuzzy rule: positions whose token is within the edit
        // budget of the term (Lucene's fuzzy term expansion). r12: the
        // full knob set — `transpositions:false` switches the kernel to
        // plain Levenshtein and `prefix_length` pins an edit-free prefix
        // (graft.functions.FuzzySpec) — closing the last rejected fuzzy
        // forms.
        val b = src.get("fuzzy")
        require(b != null && b.isObject && b.has("term"),
          s"""intervals fuzzy needs "term", got $b""")
        SloppySlot(Nil, Nil, 0, 0,
          fuzzies = Seq(fuzzySpecOf(b, b.get("term").asText())))
      case other => throw new IllegalArgumentException(
        s"all_of sub-sources must reduce to single-token alternatives, got: $other")
    }
  }

  /** Compile one span clause to a position SLOT: `span_term` is a
    * single-token slot; `span_or` over span_terms is the position UNION
    * (Lucene SpanOrQuery on single-token spans); `span_not` keeps the
    * include positions that have no exclude token within `[p - pre,
    * p + post]` — exactly Lucene SpanNotQuery's overlap test when every
    * span is one token wide (`dist` sets both pre and post, the ES
    * builder's shorthand; explicit `pre`/`post` win).
    */
  private def spanClauseSlot(c: JsonNode): (String, SloppySlot) = {
    require(c.isObject && c.size() == 1,
      s"span clause must be a single-key object, got $c")
    c.fieldNames().next() match {
      case "span_term" =>
        val (f, v) = fieldValue(c.get("span_term"))
        (f, SloppySlot(Seq(v.asText().toLowerCase), Nil, 0, 0))
      case "span_multi" =>
        // Lucene SpanMultiTermQueryWrapper (r12): a prefix / wildcard /
        // fuzzy query as a span clause — its positions are the tokens the
        // wrapped query's term expansion matches, exactly the slot
        // alternative kinds the kernel already evaluates. regexp inners
        // are rejected (slots carry ES wildcard patterns, not raw regex).
        val b = c.get("span_multi")
        require(b != null && b.isObject && b.has("match"),
          s"""span_multi needs "match", got $b""")
        val inner = b.get("match")
        require(inner.isObject && inner.size() == 1,
          s"span_multi match must be a single-query object, got $inner")
        inner.fieldNames().next() match {
          case "prefix" =>
            val (f, v) = fieldValue(inner.get("prefix"))
            val p = v.asText().trim.toLowerCase
            require(p.nonEmpty && !p.exists(_.isWhitespace),
              s"span_multi prefix must be a single non-empty term, got: '$p'")
            (f, SloppySlot(Nil, Nil, 0, 0, prefixes = Seq(p)))
          case "wildcard" =>
            val (f, v) = fieldValue(inner.get("wildcard"))
            val p = v.asText().trim.toLowerCase
            require(p.nonEmpty && !p.exists(_.isWhitespace),
              s"span_multi wildcard must be a single non-empty pattern, got: '$p'")
            (f, SloppySlot(Nil, Nil, 0, 0, wildcards = Seq(p)))
          case "fuzzy" =>
            val fb = inner.get("fuzzy")
            require(fb.isObject && fb.size() == 1,
              s"expected {field: spec}, got $fb")
            val f = fb.fieldNames().next()
            val spec = fb.get(f)
            val v = if (spec.isObject && spec.has("value")) spec.get("value") else spec
            (f, SloppySlot(Nil, Nil, 0, 0,
              fuzzies = Seq(fuzzySpecOf(spec, v.asText()))))
          case other => throw new IllegalArgumentException(
            s"span_multi supports prefix, wildcard and fuzzy inners, got: $other")
        }
      case "span_or" =>
        val b = c.get("span_or")
        require(b != null && b.isObject && b.has("clauses"),
          s"""span_or needs "clauses", got $b""")
        val sub = clauses(b.get("clauses")).map(spanClauseSlot)
        require(sub.nonEmpty, "span_or needs at least one clause")
        require(sub.forall(_._2.excludes.isEmpty),
          "span_or supports span_term and span_multi clauses only")
        val fs = sub.map(_._1).distinct
        require(fs.size == 1,
          s"span_or clauses must target a single field, got: ${fs.mkString(", ")}")
        // position UNION across every alternative kind — span_multi
        // children contribute prefixes/wildcards/fuzzies, not just terms
        (fs.head, SloppySlot(sub.flatMap(_._2.includes).distinct, Nil, 0, 0,
          prefixes = sub.flatMap(_._2.prefixes).distinct,
          wildcards = sub.flatMap(_._2.wildcards).distinct,
          fuzzies = sub.flatMap(_._2.fuzzies).distinct))
      case "span_not" =>
        val b = c.get("span_not")
        require(b != null && b.isObject && b.has("include") && b.has("exclude"),
          s"""span_not needs "include" and "exclude", got $b""")
        val (fi, inc) = spanClauseSlot(b.get("include"))
        val (fe, exc) = spanClauseSlot(b.get("exclude"))
        require(inc.excludes.isEmpty && exc.excludes.isEmpty,
          "span_not include/exclude must be span_term or span_or")
        // the kernel's exclusion window tests tokens by EQUALITY — a
        // span_multi exclude (prefix/wildcard/fuzzy positions) would
        // silently exclude nothing, so reject it
        require(exc.prefixes.isEmpty && exc.wildcards.isEmpty &&
            exc.fuzzies.isEmpty,
          "span_not exclude must be plain span_term/span_or tokens " +
            "(span_multi excludes are rejected, not approximated)")
        require(fi == fe,
          s"span_not include/exclude must target a single field, got: $fi, $fe")
        val dist = if (b.has("dist")) b.get("dist").asInt() else 0
        val pre = if (b.has("pre")) b.get("pre").asInt() else dist
        val post = if (b.has("post")) b.get("post").asInt() else dist
        // the include keeps its full alternative set (span_multi inners)
        (fi, SloppySlot(inc.includes, exc.includes, pre, post,
          prefixes = inc.prefixes, wildcards = inc.wildcards,
          fuzzies = inc.fuzzies))
      case "field_masking_span" =>
        // Lucene FieldMaskingSpanQuery (r13): runs the wrapped span and
        // REPORTS it as being on `field` so it can compose with spans on
        // that field. Lucene's documented use is parallel, differently-
        // analyzed copies of one source text; graft analyzes every field
        // with the one whitespace analyzer, so the masked composition is
        // exactly the wrapped span's slot evaluated on the masked field's
        // token stream — a field rename around the slot, composing under
        // span_near / span_first / span_or / span_not like any clause.
        val b = c.get("field_masking_span")
        require(b != null && b.isObject && b.has("query") && b.has("field"),
          s"""field_masking_span needs "query" and "field", got $b""")
        val (_, slot) = spanClauseSlot(b.get("query"))
        (b.get("field").asText(), slot)
      case other => throw new IllegalArgumentException(
        s"span_near supports span_term, span_multi, span_or, span_not and " +
          s"field_masking_span clauses, got: $other")
    }
  }

  /** ES `terms_set` (r13): at least N of the supplied terms must appear
    * among the field's analyzed tokens, where N comes from another field
    * of the SAME document (`minimum_should_match_field` — a per-row
    * threshold, the form the msm machinery generalizes to) or a constant
    * (`minimum_should_match`, the ES 8.13+ shorthand; full msm grammar
    * incl. negative forms). A null/missing threshold field matches
    * nothing: the `matched >= threshold` comparison is NULL and filter
    * context drops the row, exactly ES's skip. Dotted threshold fields
    * address JSON tag bags like any other field.
    * `minimum_should_match_script` needs a scripting engine and is
    * rejected by name, not approximated.
    */
  private def termsSet(body: JsonNode): Column = {
    require(body.isObject && body.size() == 1, s"expected {field: spec}, got $body")
    val f = body.fieldNames().next()
    val spec = body.get(f)
    require(spec != null && spec.isObject && spec.has("terms"),
      s"""terms_set needs "terms", got $spec""")
    require(!spec.has("minimum_should_match_script"),
      "terms_set minimum_should_match_script needs a scripting engine: " +
        "rejected, not approximated (use minimum_should_match_field or a " +
        "constant minimum_should_match)")
    val terms = spec.get("terms").elements().asScala
      .map(_.asText().toLowerCase).toSeq.distinct
    require(terms.nonEmpty, "terms_set needs at least one term")
    val toks = split(lower(fieldCol(f)), "\\s+")
    val matched = terms
      .map(t => when(coalesce(array_contains(toks, t), lit(false)), 1)
        .otherwise(0): Column)
      .reduce(_ + _)
    val required: Column =
      if (spec.has("minimum_should_match_field"))
        fieldCol(spec.get("minimum_should_match_field").asText()).cast("long")
      else if (spec.has("minimum_should_match"))
        lit(msmOf(spec.get("minimum_should_match").asText(), terms.size))
      else throw new IllegalArgumentException(
        "terms_set needs minimum_should_match_field or minimum_should_match")
    matched >= required
  }

  /** ES `combined_fields` (r13), filter-context degeneration: term-centric
    * match over multiple identically-analyzed fields — the modern
    * cross_fields successor. Each analyzed query term matches when it
    * appears in ANY of the fields (the fields act as one combined token
    * stream), and terms combine per `operator` (default "or") with
    * `minimum_should_match` counted over the terms — the same shape
    * multi_match cross_fields takes here, plus the msm grammar. Per-field
    * `^boost` suffixes are parsed off (boosts shape scores, never the
    * filter answer).
    */
  private def combinedFields(body: JsonNode): Column = {
    require(body.isObject && body.has("query") && body.has("fields"),
      s"""combined_fields needs "query" and "fields", got $body""")
    val fields = body.get("fields").elements().asScala
      .map(_.asText().split("\\^")(0)).toSeq
    require(fields.nonEmpty, "combined_fields needs at least one field")
    val terms = body.get("query").asText().trim.toLowerCase
      .split("\\s+").toSeq.filter(_.nonEmpty)
    require(terms.nonEmpty, "combined_fields needs a non-empty query")
    val op = if (body.has("operator")) body.get("operator").asText().toLowerCase
             else "or"
    def inAnyField(t: String): Column = fields
      .map(f => coalesce(
        array_contains(split(lower(fieldCol(f)), "\\s+"), t), lit(false)): Column)
      .reduce(_ || _)
    val preds = terms.map(inAnyField)
    if (op == "and") preds.reduce(_ && _)
    else if (body.has("minimum_should_match")) {
      val msm = msmOf(body.get("minimum_should_match").asText(), terms.size)
      preds.map(p => when(p, 1).otherwise(0): Column).reduce(_ + _) >= msm
    } else preds.reduce(_ || _)
  }

  /** ES `more_like_this`, filter-context degeneration: the `like` text is
    * analyzed into distinct terms and a document matches when at least
    * `minimum_should_match` of them (default "30%", the ES mlt default;
    * floored like bool's msm, min 1) appear across the given fields —
    * match-over-the-query-terms. The tf/idf TERM SELECTION knobs
    * (max_query_terms, min_term_freq, min_doc_freq) rank terms by corpus
    * statistics a row-local predicate cannot consult, so every analyzed
    * like-term counts toward the threshold.
    */
  private def moreLikeThis(body: JsonNode): Column = {
    require(body.isObject && body.has("fields") && body.has("like"),
      s"""more_like_this needs "fields" and "like", got $body""")
    val fields = body.get("fields").elements().asScala.map(_.asText()).toSeq
    require(fields.nonEmpty, "more_like_this needs at least one field")
    val terms = clauses(body.get("like")).map(_.asText())
      .flatMap(_.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty).distinct
    require(terms.nonEmpty, "more_like_this needs non-empty like text")
    val msmRaw =
      if (body.has("minimum_should_match")) body.get("minimum_should_match").asText()
      else "30%"
    val msm = msmOf(msmRaw, terms.size)
    def has(t: String): Column = fields.map(f =>
      coalesce(array_contains(split(lower(fieldCol(f)), "\\s+"), t), lit(false)): Column)
      .reduce(_ || _)
    terms.map(t => when(has(t), 1).otherwise(0): Column).reduce(_ + _) >= msm
  }

  /** Lucene sloppy-phrase matcher: the query terms must map to DISTINCT
    * token positions p_0..p_{n-1} (term i matching the token at p_i; with
    * `prefix`, the last term matches as a token prefix) such that the match
    * width `max_i(p_i - i) - min_i(p_i - i) <= slop` — one "move" shifts
    * one term by one position, so a two-term swap costs 2 and "a x b x c"
    * needs slop 2 for "a b c" (not 1 per gap). With `inOrder` (the
    * span_near form) positions must additionally be strictly increasing and
    * the budget is the TOTAL number of intervening unmatched positions,
    * `sum_i(p_{i+1} - p_i - 1) = (p_{n-1} - p_0) - (n - 1) <= slop`. With
    * `gaps` (the unordered `intervals` form) order is free and the budget is
    * the covering interval's gap count,
    * `(max_i(p_i) - min_i(p_i)) - (n - 1) <= slop`.
    *
    * Compiled as nested `exists` higher-order functions over each term's
    * position list — an assignment search whose cost is the product of the
    * terms' occurrence counts, evaluated in the scan stage on short
    * tag-like fields (no join, no UDF); the non-phrase residue of a bool
    * query still prunes first at scale.
    */
  private def sloppyMatch(field: Column, slots: Seq[SloppySlot], slop: Int,
                          inOrder: Boolean, prefix: Boolean = false,
                          gaps: Boolean = false,
                          filterMode: String = "",
                          filterSlot: Option[SloppySlot] = None,
                          script: (Int, Int, Int) => Boolean = null): Column = {
    // a script predicate is a function object — it cannot ride the SQL
    // function registry's literal args, so build the kernel expression
    // directly (the predicate serializes in the codegen reference array)
    if (script != null)
      return org.apache.spark.sql.GraftSqlBridge.columnOf(
        graft.functions.SloppyMatch(
          org.apache.spark.sql.GraftSqlBridge.expressionOf(field.cast("string")),
          SloppySlot.encode(slots), slop, inOrder, prefix, gaps,
          "script", "", script))
    // the codegen'd native kernel when GraftExtensions is installed (the
    // graft_osa pattern — one JVM call per row instead of an interpreted
    // HOF tree); the HOF formulation below stays as the documented
    // extension-less fallback and the semantics spec
    val active = org.apache.spark.sql.SparkSession.active
    if (active.catalog.functionExists("graft_sloppy"))
      return call_function("graft_sloppy", field.cast("string"),
        lit(SloppySlot.encode(slots)), lit(slop), lit(inOrder), lit(prefix),
        lit(gaps), lit(filterMode),
        lit(filterSlot.map(sl => SloppySlot.encode(Seq(sl))).getOrElse("")))
    // the HOF formulation keeps fixed slot widths and builtin predicates;
    // nested sub-match budgets (variable-width candidates) and fuzzy
    // alternatives (the OSA kernel) are kernel-only — rejected, not
    // approximated. Wildcard alternatives ride on the builtin rlike.
    require(slots.forall(sl => !sl.nested && sl.fuzzies.isEmpty) &&
        filterSlot.forall(sl => !sl.nested && sl.fuzzies.isEmpty),
      "nested sub-match gap budgets and fuzzy alternatives need the " +
        "graft_sloppy kernel (install graft.functions.GraftExtensions)")
    val toks = split(lower(field), "\\s+")
    // interval widths: 1 for token slots, phrase length for phrase slots
    val ws = slots.map(_.width)
    val wTot = ws.sum
    val cumW = ws.scanLeft(0)(_ + _)
    // conjunctive guard: every slot must have SOME include term present
    // before the assignment search runs (exclusion only removes positions,
    // so presence stays a necessary condition) — `array_contains` is
    // codegen'd and And short-circuits, so the interpreted nested-`exists`
    // position search below only ever evaluates on rows that pass (the
    // all-terms-must-match precondition Lucene's phrase scorer gets from
    // its postings-list conjunction). On a selective phrase this turns a
    // per-row O(prod of occurrence counts) search into a per-CANDIDATE one.
    val guard: Column = slots.zipWithIndex.map { case (sl, i) =>
      if (sl.phrase.nonEmpty)
        sl.phrase.map(t => array_contains(toks, t): Column).reduce(_ && _)
      else
        (sl.includes.map(t =>
          if (prefix && i == slots.size - 1) exists(toks, x => x.startsWith(lit(t)))
          else array_contains(toks, t): Column
        ) ++ sl.prefixes.map(t =>
          exists(toks, x => x.startsWith(lit(t))): Column
        ) ++ sl.wildcards.map(w =>
          exists(toks, x => x.rlike(SloppySlot.wildcardRegex(w))): Column))
          .reduce(_ || _)
    }.reduce(_ && _)
    val idx = sequence(lit(0), size(toks) - 1)
    val posLists: Seq[Column] = slots.zipWithIndex.map { case (sl, i) =>
      if (sl.phrase.nonEmpty) {
        // start positions where the fixed phrase matches token for token
        val w = sl.phrase.length
        val starts = filter(sequence(lit(0), size(toks) - lit(w)),
          j => sl.phrase.zipWithIndex.map { case (t, o) =>
            element_at(toks, j + lit(o + 1)) === lit(t): Column }.reduce(_ && _))
        when(size(toks) >= w, starts).otherwise(array().cast("array<int>"))
      } else {
        def incMatch(j: Column): Column = (sl.includes.map(t =>
          if (prefix && i == slots.size - 1) element_at(toks, j + 1).startsWith(lit(t))
          else element_at(toks, j + 1) === lit(t): Column) ++
          sl.prefixes.map(t =>
            element_at(toks, j + 1).startsWith(lit(t)): Column) ++
          sl.wildcards.map(w =>
            element_at(toks, j + 1).rlike(SloppySlot.wildcardRegex(w)): Column))
          .reduce(_ || _)
        val base = filter(idx, j => incMatch(j))
        if (sl.excludes.isEmpty) base
        else filter(base, p => !exists(idx, q =>
          q >= p - sl.pre && q <= p + sl.post &&
            sl.excludes.map(t => element_at(toks, q + 1) === lit(t): Column)
              .reduce(_ || _)))
      }
    }
    // intervals filter rule: position list of the single filter slot
    // (token alternatives / prefixes or a fixed phrase)
    val filterPos: Option[(Column, Int)] = filterSlot.map { fsl =>
      if (fsl.phrase.nonEmpty) {
        val w = fsl.phrase.length
        val starts = filter(sequence(lit(0), size(toks) - lit(w)),
          j => fsl.phrase.zipWithIndex.map { case (t, o) =>
            element_at(toks, j + lit(o + 1)) === lit(t): Column }.reduce(_ && _))
        (when(size(toks) >= w, starts).otherwise(array().cast("array<int>")), w)
      } else {
        (filter(idx, j => (fsl.includes.map(t =>
          element_at(toks, j + 1) === lit(t): Column) ++
          fsl.prefixes.map(t =>
            element_at(toks, j + 1).startsWith(lit(t)): Column) ++
          fsl.wildcards.map(w =>
            element_at(toks, j + 1).rlike(SloppySlot.wildcardRegex(w)): Column))
          .reduce(_ || _)), 1)
      }
    }
    def endOf(ps: Seq[Column], k: Int): Column = ps(k) + lit(ws(k) - 1)
    def coverOf(ps: Seq[Column]): (Column, Column) = {
      val cs = if (ps.size == 1) ps.head else least(ps: _*)
      val ce = if (ps.size == 1) endOf(ps, 0)
               else greatest(ps.indices.map(endOf(ps, _)): _*)
      (cs, ce)
    }
    // non-overlap + budget — the assignment-validity core, shared by the
    // outer search and the minimality probe
    def baseOk(ps: Seq[Column]): Column = {
      // chosen intervals must not overlap — for width-1 slots exactly the
      // distinct-positions rule
      val distinctOk = (for { a <- ps.indices; b <- a + 1 until ps.size }
        yield ((endOf(ps, a) < ps(b)) || (endOf(ps, b) < ps(a))): Column)
        .reduceOption(_ && _).getOrElse(lit(true))
      val widthOk =
        if (ps.size == 1) lit(true)
        else if (inOrder) {
          val ordered = ps.indices.sliding(2).map { case Seq(a, b) =>
            (ps(b) > endOf(ps, a)): Column }.reduce(_ && _)
          // total intervening positions: last start − first start − the
          // widths of everything before the last interval
          ordered && (ps.last - ps.head - lit(cumW(ps.size - 1)) <= lit(slop))
        } else if (gaps) {
          // unordered intervals: the covering interval's gap count
          // (maxEnd − minStart + 1) − Σwidths
          val ends = array(ps.indices.map(endOf(ps, _)): _*)
          val starts = array(ps: _*)
          array_max(ends) - array_min(starts) + lit(1) - lit(wTot) <= lit(slop)
        } else {
          val adjusted = array(ps.zipWithIndex.map { case (p, k) => p - lit(cumW(k)) }: _*)
          array_max(adjusted) - array_min(adjusted) <= lit(slop)
        }
      distinctOk && widthOk
    }
    // a valid assignment whose cover sits STRICTLY inside [bs, be] — the
    // minimality probe behind Lucene's minimal-interval filter semantics
    // (the kernel's search(cs, ce, strictWithin) twin)
    def searchWithin(bs: Column, be: Column): Column = {
      def go(i: Int, bound: List[Column]): Column =
        if (i == slots.size) {
          val ps = bound.reverse
          val (cs, ce) = coverOf(ps)
          baseOk(ps) && (cs > bs || ce < be)
        } else exists(posLists(i), p =>
          p >= bs && p + lit(ws(i) - 1) <= be && go(i + 1, p :: bound))
      go(0, Nil)
    }
    def accept(ps: Seq[Column]): Column = {
      // the covering interval must stand in the filter's relation to SOME
      // filter interval (absence for the not_ forms) — and, positive rules
      // firing per MINIMAL interval, no valid cover may sit strictly inside
      val filterOk: Column = filterPos match {
        case None => lit(true)
        case Some((fpl, fw)) =>
          val (cs, ce) = coverOf(ps)
          val ex = exists(fpl, j => filterMode match {
            case "containing" | "not_containing" =>
              j >= cs && j + lit(fw - 1) <= ce
            case "contained_by" | "not_contained_by" =>
              j <= cs && j + lit(fw - 1) >= ce
            case "overlapping" | "not_overlapping" =>
              j <= ce && j + lit(fw - 1) >= cs
            case "after"  => cs > j + lit(fw - 1)
            case "before" => ce < j
            case other => throw new IllegalArgumentException(
              s"unknown intervals filter mode: $other")
          })
          if (filterMode.startsWith("not_")) !ex
          else ex && !searchWithin(cs, ce)
      }
      baseOk(ps) && filterOk
    }
    def search(i: Int, bound: List[Column]): Column =
      if (i == slots.size) accept(bound.reverse)
      else exists(posLists(i), p => search(i + 1, p :: bound))
    // positive filter rules demand the filter terms exist at all — extend
    // the cheap conjunctive guard so non-candidates skip the search
    val fullGuard = filterSlot match {
      case Some(fsl) if !filterMode.startsWith("not_") =>
        val pres =
          if (fsl.phrase.nonEmpty)
            fsl.phrase.map(t => array_contains(toks, t): Column).reduce(_ && _)
          else (fsl.includes.map(t => array_contains(toks, t): Column) ++
            fsl.prefixes.map(t =>
              exists(toks, x => x.startsWith(lit(t))): Column) ++
            fsl.wildcards.map(w =>
              exists(toks, x => x.rlike(SloppySlot.wildcardRegex(w))): Column))
            .reduce(_ || _)
        guard && pres
      case _ => guard
    }
    fullGuard && search(0, Nil)
  }

  private def terms(body: JsonNode): Column = {
    require(body.isObject && body.size() == 1, s"expected {field: [values]}, got $body")
    val f = body.fieldNames().next()
    val vs = body.get(f).elements().asScala.toSeq
    // empty list = match nothing (valid ES, common from query builders)
    vs.map { v => val (c, l) = comparable(f, v); c === l }
      .reduceOption(_ || _).getOrElse(lit(false))
  }

  private def range(body: JsonNode): Column = {
    require(body.isObject && body.size() == 1, s"expected {field: {bounds}}, got $body")
    val f = body.fieldNames().next()
    val bounds = body.get(f)
    val preds = bounds.fieldNames().asScala.map { b =>
      val (c, l) = comparable(f, bounds.get(b))
      b match {
        case "gt"  => c > l
        case "gte" => c >= l
        case "lt"  => c < l
        case "lte" => c <= l
        case other => throw new IllegalArgumentException(s"unsupported range bound: $other")
      }
    }.toSeq
    require(preds.nonEmpty, "range filter needs at least one bound")
    preds.reduce(_ && _)
  }

  /** ES `ids` query: documents whose `_id` is in `values` — the saved-filter
    * form porting users hit first (the reference forwards it verbatim to ES,
    * lib/orestes.js:84). `_id` resolves through the caller-named id column.
    */
  private def ids(body: JsonNode): Column = {
    require(body.isObject && body.has("values"), s"""expected {"values": [...]}, got $body""")
    val vs = body.get("values").elements().asScala.toSeq
    val c = fieldCol("_id")
    vs.map(v => c === jsonLit(v)).reduceOption(_ || _).getOrElse(lit(false))
  }

  /** ES `match`: the query text is whitespace-analyzed into lowercase terms
    * and a document matches if its analyzed field shares ANY term (OR — the
    * ES default operator) or ALL terms (`{"operator": "and"}`). The analyzed
    * field is the lowercase whitespace token set of the stored value — the
    * minimal standard-analyzer model for tag-like fields (the reference
    * forwards `match` verbatim to ES, lib/orestes.js:84).
    *
    * r12: `fuzziness` (ES supports it on match — previously silently
    * ignored, violating the implement-or-reject convention): each analyzed
    * term expands to its fuzzy token test, AUTO judged PER TERM (the ES
    * rule), with the full `transpositions`/`prefix_length` knob set riding
    * the same kernel slots the fuzzy query and intervals rule use.
    */
  private def matchQuery(body: JsonNode): Column = {
    require(body.isObject && body.size() == 1, s"expected {field: query}, got $body")
    val f = body.fieldNames().next()
    val spec = body.get(f)
    val (qText, op) =
      if (spec.isObject && spec.has("query"))
        (spec.get("query").asText(),
         if (spec.has("operator")) spec.get("operator").asText().toLowerCase else "or")
      else (spec.asText(), "or")
    val terms = qText.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    require(terms.nonEmpty, "match needs a non-empty query")
    val preds: Seq[Column] =
      if (spec.isObject && spec.has("fuzziness")) {
        // validate analyzed terms HERE, not deep in the slot encoder (r13
        // review fix): 'c++'-style terms previously surfaced the kernel's
        // internal "unsupported characters" error while the same query
        // without fuzziness matched them as literals — name the query and
        // the way out at the parse site instead
        terms.foreach(t => require(!t.exists(c => "|~*+^".contains(c)),
          s"match with fuzziness cannot fuzzy-expand term '$t': the " +
            "characters | ~ * + ^ are reserved by the fuzzy kernel " +
            "encoding (drop fuzziness to match them as literal tokens)"))
        val tr = !spec.has("transpositions") ||
          spec.get("transpositions").asBoolean(true)
        val pl = if (spec.has("prefix_length")) spec.get("prefix_length").asInt() else 0
        require(pl >= 0, s"prefix_length must be non-negative, got $pl")
        terms.map(t => sloppyMatch(fieldCol(f),
          Seq(graft.functions.SloppySlot(Nil, Nil, 0, 0,
            fuzzies = Seq(graft.functions.FuzzySpec(t, fuzzinessOf(spec, t), tr, pl)))),
          0, inOrder = false))
      } else {
        val toks = split(lower(fieldCol(f)), "\\s+")
        terms.map(t => array_contains(toks, t))
      }
    // minimum_should_match on match (r12, same implement-or-reject sweep as
    // fuzziness): at least N of the analyzed terms must match — integer or
    // percentage (floored, min 1, the mlt/bool parse). Only meaningful with
    // the OR operator (ES ignores it under "and"; we follow).
    if (op == "and") preds.reduce(_ && _)
    else if (spec.isObject && spec.has("minimum_should_match")) {
      val msm = msmOf(spec.get("minimum_should_match").asText(), terms.size)
      preds.map(p => when(p, 1).otherwise(0): Column).reduce(_ + _) >= msm
    } else preds.reduce(_ || _)
  }

  /** ES `nested`: scopes the inner query to `path` — inner fields may be
    * written relative (`k`) or absolute (`path.k`); both compile to the same
    * JSON-path tag access. The relational model stores the nested object as
    * a JSON tag bag column, so nesting is name resolution, not a separate
    * index (the reference forwards `nested` verbatim, lib/orestes.js:84).
    */
  private def nested(body: JsonNode): Column = {
    require(body.isObject && body.has("path") && body.has("query"),
      s"""expected {"path": ..., "query": ...}, got $body""")
    val outer = nestedPath.get()
    nestedPath.set(Some(nest(body.get("path").asText())))
    try compileNode(body.get("query")) finally nestedPath.set(outer)
  }

  /** Basic ES `query_string` support: whitespace-separated `field:value`
    * terms, explicit `AND`/`OR` connectives (AND binds tighter, adjacency
    * defaults to OR — ES's default_operator), `*`/`?` wildcards in values.
    * Values that parse as numbers compare numerically.
    */
  private def queryString(body: JsonNode): Column = {
    val q = (if (body.isObject) body.get("query").asText() else body.asText()).trim
    require(q.nonEmpty, "query_string needs a non-empty query")
    // multi-field form: bare (colon-free) tokens match ANY of `fields`
    val defaultFields: Seq[String] =
      if (body.isObject && body.has("fields"))
        body.get("fields").elements().asScala.map(_.asText()).toSeq
      else Seq.empty
    def valueMatch(f: String, v: String): Column =
      if (v.exists(c => c == '*' || c == '?')) fieldCol(f).rlike(wildcardToRegex(v))
      // the `~` fuzzy operator (r12 — previously a silent literal match):
      // `term~N` = within N edits, bare `term~` = AUTO ladder, the Lucene
      // query-syntax form; same OSA kernel as the fuzzy query
      else if (v.length > 1 && v.matches(".+~\\d*")) {
        val cut = v.lastIndexOf('~')
        val text = v.substring(0, cut)
        val dd = v.substring(cut + 1)
        val dist = if (dd.isEmpty) fuzzinessOf(null, text) else dd.toInt
        editDistCol(fieldCol(f).cast("string"), text) <= dist
      }
      else if (v.matches("-?\\d+")) fieldCol(f) === lit(v.toLong)
      else if (v.matches("-?\\d*\\.\\d+")) fieldCol(f) === lit(v.toDouble)
      else fieldCol(f) === lit(v)
    def termOf(tok: String): Column = {
      val sep = tok.indexOf(':')
      if (sep <= 0) {
        require(defaultFields.nonEmpty,
          s"query_string term must be field:value (or set `fields`), got '$tok'")
        defaultFields.map(f => valueMatch(f, tok)).reduce(_ || _)
      } else valueMatch(tok.substring(0, sep), tok.substring(sep + 1))
    }
    // left-to-right with AND binding tighter than OR: fold AND-runs into
    // groups, then OR the groups
    val groups = scala.collection.mutable.ListBuffer.empty[Column]
    var nextOp = "OR"
    q.split("\\s+").foreach {
      case "AND" => nextOp = "AND"
      case "OR"  => nextOp = "OR"
      case tok =>
        val c = termOf(tok)
        if (groups.isEmpty || nextOp == "OR") groups += c
        else groups(groups.size - 1) = groups.last && c
        nextOp = "OR"
    }
    require(groups.nonEmpty, "query_string needs at least one field:value term")
    groups.reduce(_ || _)
  }

  private def bool(body: JsonNode): Column = {
    def sub(key: String): Seq[Column] =
      if (body.has(key)) clauses(body.get(key)).map(compileNode) else Nil
    val must    = sub("must") ++ sub("filter")
    val should  = sub("should")
    val mustNot = sub("must_not")
    // ES default: should is REQUIRED (>=1) in a pure should bool, OPTIONAL
    // (>=0) once must/filter is present; explicit minimum_should_match
    // overrides either way and accepts "N" or "P%" (percent of clauses,
    // rounded down, per the ES spec)
    val msm: Int =
      if (!body.has("minimum_should_match")) { if (must.nonEmpty) 0 else 1 }
      // full ES msm grammar incl. negative all-but-N forms (r13); bool
      // keeps computed <=0 as "should is optional" rather than flooring
      else msmOf(body.get("minimum_should_match").asText(), should.size,
        floorOne = false)
    val shouldPred =
      if (should.isEmpty || msm <= 0) None
      else if (msm == 1) Some(should.reduce(_ || _))
      else Some(should.map(c => when(coalesce(c, lit(false)), 1).otherwise(0): Column)
        .reduce(_ + _) >= msm)
    val parts =
      (if (must.nonEmpty) Seq(must.reduce(_ && _)) else Nil) ++
      shouldPred.toSeq ++
      (if (mustNot.nonEmpty) Seq(!mustNot.map(c => coalesce(c, lit(false))).reduce(_ || _)) else Nil)
    if (parts.isEmpty) lit(true) else parts.reduce(_ && _)
  }

  /** ES wildcard pattern (`*`, `?`) -> anchored Java regex — one
    * conversion for the wildcard QUERY and the intervals wildcard RULE
    * (owned by the kernel's slot module so the two can never drift).
    */
  private[graft] def wildcardToRegex(pat: String): String =
    SloppySlot.wildcardRegex(pat)
}

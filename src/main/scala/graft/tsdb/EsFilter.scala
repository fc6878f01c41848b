package graft.tsdb

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

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
  * Supported: match_all, term, terms, range (gt/gte/lt/lte), exists, missing,
  * prefix, wildcard, regexp, ids, fuzzy (OSA distance, the Lucene
  * transpositions=true default), match, match_phrase, match_phrase_prefix,
  * constant_score, nested, query_string (field:value / AND / OR /
  * wildcards), bool (must/filter/should/must_not/minimum_should_match),
  * and, or, not. `should` requires at least one clause to match
  * (filter-context semantics) unless `minimum_should_match` says otherwise.
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
      case "prefix"    => { val (f, v) = fieldValue(body); fieldCol(f).startsWith(v.asText()) }
      case "wildcard"  => { val (f, v) = fieldValue(body); fieldCol(f).rlike(wildcardToRegex(v.asText())) }
      case "regexp"    => { val (f, v) = fieldValue(body); fieldCol(f).rlike("^(?:" + v.asText() + ")$") }
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
    val (c, l) = comparable(f, v)
    c === l
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
  private def fuzzy(body: JsonNode): Column = {
    require(body.isObject && body.size() == 1, s"expected {field: spec}, got $body")
    val f = body.fieldNames().next()
    val spec = body.get(f)
    val v = if (spec.isObject && spec.has("value")) spec.get("value") else spec
    val text = v.asText()
    def auto: Int = if (text.length <= 2) 0 else if (text.length <= 5) 1 else 2
    val fuzziness: Int =
      if (!spec.isObject || !spec.has("fuzziness")) auto
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
    val dist: Column = {
      val active = org.apache.spark.sql.SparkSession.active
      if (active.catalog.functionExists("graft_osa"))
        call_function("graft_osa", fieldCol(f).cast("string"), lit(text))
      else levenshtein(fieldCol(f).cast("string"), lit(text))
    }
    dist <= fuzziness
  }

  /** ES `multi_match`: the `match` analyzer applied across several fields —
    * a document matches when ANY field matches (best_fields, the ES
    * default; in filter context every scoring type degenerates to this
    * disjunction except `cross_fields`+AND, where each term may match in
    * any field but all terms must appear somewhere). `operator` applies
    * per field for best_fields and per term for cross_fields.
    */
  private def multiMatch(body: JsonNode): Column = {
    require(body.isObject && body.has("query") && body.has("fields"),
      s"""multi_match needs "query" and "fields", got $body""")
    val qText = body.get("query").asText()
    val fields = body.get("fields").elements().asScala.map(_.asText()).toSeq
    require(fields.nonEmpty, "multi_match needs at least one field")
    val op = if (body.has("operator")) body.get("operator").asText().toLowerCase else "or"
    val mType = if (body.has("type")) body.get("type").asText() else "best_fields"
    val terms = qText.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    require(terms.nonEmpty, "multi_match needs a non-empty query")
    def fieldToks(f: String) = split(lower(fieldCol(f)), "\\s+")
    if (mType == "cross_fields" && op == "and")
      // every term present in SOME field
      terms.map(t => fields.map(f =>
          coalesce(array_contains(fieldToks(f), t), lit(false)): Column)
        .reduce(_ || _)).reduce(_ && _)
    else {
      // best_fields: some field matches the whole (per-operator) query
      fields.map { f =>
        val preds = terms.map(t => array_contains(fieldToks(f), t))
        coalesce(if (op == "and") preds.reduce(_ && _) else preds.reduce(_ || _),
          lit(false)): Column
      }.reduce(_ || _)
    }
  }

  /** ES `match_phrase` (+ `_prefix`): the analyzed query terms must appear
    * IN ORDER in the analyzed field, adjacent by default or with up to
    * `slop` intervening tokens between consecutive terms — consistent with
    * [[matchQuery]]'s analyzer (lowercase whitespace tokens). Compiled as an
    * anchored regex over the space-rejoined token stream, with every term
    * regex-quoted; the `_prefix` form lets the last term match as a prefix
    * (ES's autocomplete shape). Documented deviation: Lucene's sloppy
    * phrase also permits OUT-OF-ORDER terms at move cost 2; this compiles
    * the in-order interpretation only. Evaluates in the scan stage.
    */
  private def matchPhrase(body: JsonNode, prefix: Boolean): Column = {
    require(body.isObject && body.size() == 1, s"expected {field: query}, got $body")
    val f = body.fieldNames().next()
    val spec = body.get(f)
    val qText = if (spec.isObject && spec.has("query")) spec.get("query").asText()
                else spec.asText()
    val slop = if (spec.isObject && spec.has("slop")) spec.get("slop").asInt() else 0
    val terms = qText.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    require(terms.nonEmpty, "match_phrase needs a non-empty query")
    val quoted = terms.map(java.util.regex.Pattern.quote)
    val sep = if (slop <= 0) " " else s"( [^ ]+){0,$slop} "
    val phrase =
      if (prefix) (quoted.init :+ (quoted.last + "[^ ]*")).mkString(sep)
      else quoted.mkString(sep)
    val joined = array_join(split(lower(fieldCol(f)), "\\s+"), " ")
    joined.rlike("(^| )" + phrase + "( |$)")
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
    val toks = split(lower(fieldCol(f)), "\\s+")
    val preds = terms.map(t => array_contains(toks, t))
    if (op == "and") preds.reduce(_ && _) else preds.reduce(_ || _)
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
      else {
        val raw = body.get("minimum_should_match").asText()
        if (raw.endsWith("%"))
          math.floor(raw.dropRight(1).toDouble / 100.0 * should.size).toInt
        else body.get("minimum_should_match").asInt()
      }
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

  /** ES wildcard pattern (`*`, `?`) -> anchored Java regex. */
  private[graft] def wildcardToRegex(pat: String): String = {
    val sb = new StringBuilder("^")
    pat.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append('.')
      case c if "\\.[]{}()<>+-=!$^|,#&~".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    sb.append('$').toString()
  }
}

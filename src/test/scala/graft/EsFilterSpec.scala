package graft

import org.apache.spark.sql.functions._
import graft.tsdb.EsFilter

class EsFilterSpec extends SparkTestBase {
  private lazy val df = {
    import spark.implicits._
    Seq(
      (1L, "purchase", 10.0), (2L, "click", 50.0), (3L, "error", 99.5),
      (4L, "signup", 0.0), (5L, "purchase", 75.0))
      .toDF("user_id", "event_type", "value")
  }

  private def ids(json: String): Seq[Long] =
    df.where(EsFilter.compile(json)).select("user_id").collect().map(_.getLong(0)).sorted.toSeq

  test("match_all") { assert(ids("""{"match_all":{}}""") == Seq(1L, 2L, 3L, 4L, 5L)) }

  test("term on string and numeric fields") {
    assert(ids("""{"term":{"event_type":"purchase"}}""") == Seq(1L, 5L))
    assert(ids("""{"term":{"user_id":3}}""") == Seq(3L))
  }

  test("terms list") {
    assert(ids("""{"terms":{"event_type":["click","error"]}}""") == Seq(2L, 3L))
  }

  test("range bounds combine") {
    assert(ids("""{"range":{"value":{"gte":10,"lt":75}}}""") == Seq(1L, 2L))
    assert(ids("""{"range":{"value":{"gt":50}}}""") == Seq(3L, 5L))
  }

  test("bool must / should / must_not") {
    val json =
      """{"bool":{
           "must":[{"range":{"value":{"gte":10}}}],
           "must_not":[{"term":{"event_type":"error"}}]}}"""
    assert(ids(json) == Seq(1L, 2L, 5L))
    // should-only bool = OR (filter-context: at least one must match)
    assert(ids("""{"bool":{"should":[{"term":{"user_id":1}},{"term":{"user_id":4}}]}}""")
      == Seq(1L, 4L))
  }

  test("and / or / not combinators") {
    assert(ids("""{"and":[{"range":{"user_id":{"gte":2}}},{"range":{"user_id":{"lte":3}}}]}""")
      == Seq(2L, 3L))
    assert(ids("""{"not":{"term":{"event_type":"purchase"}}}""") == Seq(2L, 3L, 4L))
  }

  test("prefix, wildcard, regexp, exists") {
    assert(ids("""{"prefix":{"event_type":"cl"}}""") == Seq(2L))
    assert(ids("""{"wildcard":{"event_type":"*rror"}}""") == Seq(3L))
    assert(ids("""{"wildcard":{"event_type":"s?gnup"}}""") == Seq(4L))
    assert(ids("""{"regexp":{"event_type":"(purchase|click)"}}""") == Seq(1L, 2L, 5L))
    assert(ids("""{"exists":{"field":"event_type"}}""") == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("match: analyzed terms OR by default, AND with operator") {
    import spark.implicits._
    val md = Seq((1L, "big red fox"), (2L, "red"), (3L, "blue sky"), (4L, "Red Fox"))
      .toDF("user_id", "title")
    def mids(json: String): Seq[Long] =
      md.where(EsFilter.compile(json)).select("user_id").collect().map(_.getLong(0)).sorted.toSeq
    // any term matches (OR, the ES default operator); analysis lowercases
    assert(mids("""{"match":{"title":"red sky"}}""") == Seq(1L, 2L, 3L, 4L))
    assert(mids("""{"match":{"title":"RED"}}""") == Seq(1L, 2L, 4L))
    // operator and: all terms must appear
    assert(mids("""{"match":{"title":{"query":"red fox","operator":"and"}}}""")
      == Seq(1L, 4L))
    // single-token fields degrade to term-like equality
    assert(ids("""{"match":{"event_type":"purchase click"}}""") == Seq(1L, 2L, 5L))
  }

  test("nested: inner fields resolve relative to the path") {
    import spark.implicits._
    val nd = Seq(
      (1L, """{"k": 10, "tag": "a"}"""),
      (2L, """{"k": 60, "tag": "b"}"""),
      (3L, """{"tag": "c"}"""))
      .toDF("user_id", "props")
    def nids(json: String): Seq[Long] =
      nd.where(EsFilter.compile(json)).select("user_id").collect().map(_.getLong(0)).sorted.toSeq
    // relative field form
    assert(nids("""{"nested":{"path":"props","query":{"range":{"k":{"gte":50}}}}}""")
      == Seq(2L))
    // absolute (already-prefixed) form is equivalent
    assert(nids("""{"nested":{"path":"props","query":{"range":{"props.k":{"gte":50}}}}}""")
      == Seq(2L))
    // bool inside nested; missing key in the bag = no match (filter context)
    assert(nids(
      """{"nested":{"path":"props","query":{"bool":{
           "must":[{"term":{"tag":"a"}}]}}}}""") == Seq(1L))
    assert(nids("""{"nested":{"path":"props","query":{"exists":{"field":"k"}}}}""")
      == Seq(1L, 2L))
  }

  test("dotted fields address the JSON tag bag") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 87, "env": "prod"}"""),
      (2L, """{"k": 3}"""),
      (3L, """{"env": "dev"}"""))
      .toDF("user_id", "props")
    def ids2(json: String) =
      df.where(EsFilter.compile(json)).select("user_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids2("""{"range":{"props.k":{"gte":50}}}""") == Seq(1L))
    assert(ids2("""{"term":{"props.k":87}}""") == Seq(1L))
    assert(ids2("""{"term":{"props.env":"dev"}}""") == Seq(3L))
    assert(ids2("""{"exists":{"field":"props.k"}}""") == Seq(1L, 2L))
    assert(ids2("""{"missing":{"field":"props.env"}}""") == Seq(2L))
    // negating a predicate that is NULL on missing fields keeps those rows
    // (three-valued logic must not silently drop them; matches must_not)
    assert(ids2("""{"not":{"term":{"props.k":87}}}""") == Seq(2L, 3L))
  }

  test("empty terms/and/or compile to match-nothing/all instead of crashing") {
    assert(ids("""{"terms":{"event_type":[]}}""") == Seq())
    assert(ids("""{"and":[]}""") == Seq(1L, 2L, 3L, 4L, 5L))
    assert(ids("""{"or":[]}""") == Seq())
  }

  test("wildcard escapes regex metacharacters") {
    assert(EsFilter.wildcardToRegex("a.b*c?") == "^a\\.b.*c.$")
  }

  test("fuzzy: explicit and AUTO fuzziness ladders") {
    // explicit distance 1: "clickz" ~ click
    assert(ids("""{"fuzzy":{"event_type":{"value":"clickz","fuzziness":1}}}""") == Seq(2L))
    // AUTO: 6 chars -> distance 2; "errors" ~ error (1)
    assert(ids("""{"fuzzy":{"event_type":"errors"}}""") == Seq(3L))
    // AUTO: <=2 chars -> exact only
    assert(ids("""{"fuzzy":{"event_type":"cl"}}""") == Seq())
    // distance 0 degenerates to term
    assert(ids("""{"fuzzy":{"event_type":{"value":"signup","fuzziness":0}}}""") == Seq(4L))
  }

  test("fuzzy counts transpositions as one edit (OSA) and parses string fuzziness") {
    // adjacent transposition = 1 edit: "cilck" ~ click at AUTO (5 chars -> 1)
    assert(ids("""{"fuzzy":{"event_type":"cilck"}}""") == Seq(2L))
    // string-valued fuzziness: numeric strings and explicit AUTO
    assert(ids("""{"fuzzy":{"event_type":{"value":"clickz","fuzziness":"1"}}}""") == Seq(2L))
    assert(ids("""{"fuzzy":{"event_type":{"value":"cilck","fuzziness":"AUTO"}}}""") == Seq(2L))
    // unknown fuzziness values are rejected, not silently treated as AUTO
    intercept[IllegalArgumentException] {
      ids("""{"fuzzy":{"event_type":{"value":"click","fuzziness":"three"}}}""")
    }
  }

  test("match_phrase: adjacent in-order terms; _prefix autocompletes the last") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "quick the brown fox"),
      (3L, "the quick red brown fox"),
      (4L, "THE QUICK BROWN dog")).toDF("id", "text")
    def pids(json: String): Seq[Long] =
      docs.where(EsFilter.compile(json)).select("id").collect().map(_.getLong(0)).sorted.toSeq
    // adjacent and in order (case-insensitive through the analyzer)
    assert(pids("""{"match_phrase":{"text":"quick brown"}}""") == Seq(1L, 4L))
    // order matters
    assert(pids("""{"match_phrase":{"text":"brown quick"}}""") == Seq())
    // a gap breaks the phrase (doc 3 has quick RED brown)
    assert(pids("""{"match_phrase":{"text":{"query":"quick brown fox"}}}""") == Seq(1L))
    // the prefix form lets the final term autocomplete
    assert(pids("""{"match_phrase_prefix":{"text":"brown fo"}}""") == Seq(1L, 2L, 3L))
    // a single-term phrase degenerates to exact token membership
    assert(pids("""{"match_phrase":{"text":"fox"}}""") == Seq(1L, 2L, 3L))
    // slop: up to N intervening tokens between consecutive terms (in order)
    assert(pids("""{"match_phrase":{"text":{"query":"quick fox","slop":1}}}""")
      == Seq(1L))
    assert(pids("""{"match_phrase":{"text":{"query":"quick fox","slop":2}}}""")
      == Seq(1L, 2L, 3L))
  }

  test("multi_match spans fields; cross_fields AND needs every term somewhere") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark engine", "fast analytics"),
      (2L, "flink engine", "stream analytics"),
      (3L, "duck db", "fast sql")).toDF("id", "title", "body")
    def mids(json: String): Seq[Long] =
      docs.where(EsFilter.compile(json)).select("id").collect().map(_.getLong(0)).sorted.toSeq
    // best_fields (default), OR: any field matches any term
    assert(mids("""{"multi_match":{"query":"spark sql","fields":["title","body"]}}""")
      == Seq(1L, 3L))
    // best_fields AND: ONE field must hold all terms
    assert(mids("""{"multi_match":{"query":"fast analytics",
      "fields":["title","body"],"operator":"and"}}""") == Seq(1L))
    // cross_fields AND: terms may split across fields, all must appear
    assert(mids("""{"multi_match":{"query":"spark fast",
      "fields":["title","body"],"type":"cross_fields","operator":"and"}}""") == Seq(1L))
    // with a known schema, unknown fields contribute nothing (filter context)
    val lenient = docs.where(EsFilter.compile(
      """{"multi_match":{"query":"spark","fields":["title","nope"]}}""",
      docs.columns.toSeq)).select("id").collect().map(_.getLong(0)).toSeq
    assert(lenient == Seq(1L))
  }

  test("constant_score passes its filter through") {
    assert(ids("""{"constant_score":{"filter":{"term":{"event_type":"click"}}}}""")
      == Seq(2L))
    intercept[IllegalArgumentException] { ids("""{"constant_score":{}}""") }
  }

  test("query_string multi-field: bare tokens match any listed field") {
    assert(ids("""{"query_string":{"query":"click error","fields":["event_type"]}}""")
      == Seq(2L, 3L))
    // AND still binds tighter than OR across bare and field:value terms
    assert(ids("""{"query_string":{"query":"purchase AND user_id:5 OR signup",
                   "fields":["event_type"]}}""") == Seq(4L, 5L))
    // bare token without fields stays an error
    intercept[IllegalArgumentException] {
      EsFilter.compile("""{"query_string":{"query":"bare"}}""")
    }
  }

  test("unsupported filter type throws") {
    intercept[IllegalArgumentException] {
      EsFilter.compile("""{"percolate":{"field":"query","document":{}}}""")
    }
  }

  test("ids query resolves _id through the caller-named id column") {
    val got = df.where(EsFilter.compile("""{"ids":{"values":[2, 5]}}""",
        df.columns, "user_id"))
      .select("user_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(2L, 5L))
    // without an id mapping, _id is an unknown field: matches nothing
    val none = df.where(EsFilter.compile("""{"ids":{"values":[2]}}""", df.columns))
    assert(none.count() == 0)
    // empty values list is valid ES and matches nothing
    assert(df.where(EsFilter.compile("""{"ids":{"values":[]}}""",
      df.columns, "user_id")).count() == 0)
  }

  test("query_string: field:value, AND binds tighter than OR, wildcards, numbers") {
    assert(ids("""{"query_string":{"query":"event_type:click"}}""") == Seq(2L))
    // OR of two terms
    assert(ids("""{"query_string":{"query":"event_type:click event_type:error"}}""")
      == Seq(2L, 3L))
    // AND binds tighter: signup OR (purchase AND value-like user 5)
    assert(ids(
      """{"query_string":{"query":"event_type:signup OR event_type:purchase AND user_id:5"}}""")
      == Seq(4L, 5L))
    // wildcard values
    assert(ids("""{"query_string":{"query":"event_type:p*"}}""") == Seq(1L, 5L))
    // numeric values compare numerically
    assert(ids("""{"query_string":{"query":"value:99.5"}}""") == Seq(3L))
    intercept[IllegalArgumentException] {
      EsFilter.compile("""{"query_string":{"query":"no-colon-term"}}""")
    }
  }

  test("bool minimum_should_match") {
    val json =
      """{"bool":{"should":[{"term":{"event_type":"purchase"}},
                            {"range":{"value":{"gte":50}}},
                            {"range":{"user_id":{"lte":2}}}],
                  "minimum_should_match":2}}"""
    // 1:purchase+id<=2, 2:value>=50+id<=2, 3:value>=50 only(=1), 5:purchase+value>=75
    assert(ids(json) == Seq(1L, 2L, 5L))
    // msm=1 degrades to plain OR
    assert(ids(json.replace("\"minimum_should_match\":2", "\"minimum_should_match\":1"))
      == Seq(1L, 2L, 3L, 5L))
    // percentage form: "67%" of 3 clauses = floor(2.01) = 2
    assert(ids(json.replace("\"minimum_should_match\":2", "\"minimum_should_match\":\"67%\""))
      == Seq(1L, 2L, 5L))
  }

  test("should is optional when must is present (ES filter-context default)") {
    // ES: a bool with must + should defaults minimum_should_match to 0 —
    // the should clauses stop constraining unless made explicit
    val json =
      """{"bool":{"must":[{"range":{"value":{"gte":50}}}],
                  "should":[{"term":{"event_type":"nomatch"}}]}}"""
    assert(ids(json) == Seq(2L, 3L, 5L), "should must not filter here")
    // explicit msm=1 restores the requirement
    val strict = json.replace(""""should"""", """"minimum_should_match":1,"should"""")
    assert(ids(strict) == Seq())
  }

  test("filters push down to the parquet scan") {
    val plan = graft.core.Tables.events(spark, Sf)
      .where(EsFilter.compile("""{"term":{"event_type":"purchase"}}"""))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(event_type,purchase)"), s"no pushdown in plan:\n$plan")
  }

  private lazy val slopDocs = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma"),
      (2L, "beta alpha gamma"),     // alpha/beta swapped
      (3L, "alpha x beta y gamma"), // two gaps of one => TOTAL distance 2
      (4L, "alpha x y beta gamma"), // one gap of two
      (5L, "alpha beta alpha")).toDF("id", "text")
  }
  private def sids(json: String): Seq[Long] =
    slopDocs.where(EsFilter.compile(json))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("sloppy phrase: TOTAL move budget, not per-gap (Lucene semantics)") {
    // per-gap reading would admit doc 3 ("alpha x beta y gamma") at slop 1;
    // Lucene's budget is total across the phrase, so doc 3 needs slop 2
    assert(sids("""{"match_phrase":{"text":{"query":"alpha beta gamma","slop":1}}}""")
      == Seq(1L))
    assert(sids("""{"match_phrase":{"text":{"query":"alpha beta gamma","slop":2}}}""")
      == Seq(1L, 2L, 3L, 4L))
  }

  test("sloppy phrase admits out-of-order terms: a swap costs two moves") {
    // doc 2 has "beta alpha": matching "alpha beta" needs 2 moves
    assert(sids("""{"match_phrase":{"text":{"query":"alpha beta","slop":1}}}""")
      == Seq(1L, 3L, 5L))
    assert(sids("""{"match_phrase":{"text":{"query":"alpha beta","slop":2}}}""")
      == Seq(1L, 2L, 3L, 4L, 5L))
    // repeated query terms need DISTINCT positions: only doc 5 has two alphas
    assert(sids("""{"match_phrase":{"text":{"query":"alpha alpha","slop":3}}}""")
      == Seq(5L))
    // sloppy _prefix: the last term still matches as a prefix
    assert(sids("""{"match_phrase_prefix":{"text":{"query":"alpha gam","slop":1}}}""")
      == Seq(1L, 2L))
  }

  test("span_near: span_term clauses, total slop, optional in_order") {
    val near =
      """{"span_near":{"clauses":[{"span_term":{"text":"alpha"}},
                                  {"span_term":{"text":"gamma"}}],
                       "slop":1,"in_order":true}}"""
    // doc1 alpha@0 gamma@2 (1 intervening), doc2 alpha@1 gamma@2 (0)
    assert(sids(near) == Seq(1L, 2L))
    // out-of-order (the ES default): doc 2 holds "alpha gamma" adjacent,
    // which the reversed query [gamma, alpha] reaches in 2 moves; doc 1's
    // "alpha beta gamma" would need 3
    val unordered =
      """{"span_near":{"clauses":[{"span_term":{"text":"gamma"}},
                                  {"span_term":{"text":"alpha"}}],"slop":2}}"""
    assert(sids(unordered) == Seq(2L))
    // in_order rejects the reversed occurrence outright
    val ordered =
      """{"span_near":{"clauses":[{"span_term":{"text":"gamma"}},
                                  {"span_term":{"text":"alpha"}}],
                       "slop":5,"in_order":true}}"""
    assert(sids(ordered) == Seq())
    // bare span_term = token membership
    assert(sids("""{"span_term":{"text":"gamma"}}""") == Seq(1L, 2L, 3L, 4L))
    // nested span combinators and multi-field clauses are rejected
    intercept[IllegalArgumentException] {
      sids("""{"span_near":{"clauses":[{"span_near":{"clauses":[]}}],"slop":0}}""")
    }
  }

  test("dis_max ORs its queries; boosting keeps only the positive clause") {
    assert(ids(
      """{"dis_max":{"queries":[{"term":{"event_type":"click"}},
                                {"term":{"user_id":4}}],"tie_breaker":0.7}}""")
      == Seq(2L, 4L))
    assert(ids("""{"dis_max":{"queries":[]}}""") == Seq())
    // boosting: negative demotes scores, never excludes
    assert(ids(
      """{"boosting":{"positive":{"term":{"event_type":"purchase"}},
                      "negative":{"range":{"value":{"gte":50}}},
                      "negative_boost":0.2}}""")
      == Seq(1L, 5L))
    intercept[IllegalArgumentException] { ids("""{"boosting":{}}""") }
  }

  test("more_like_this matches enough analyzed like-terms across fields") {
    // 4 distinct terms, default 30% => floor(1.2)=1 term suffices
    assert(sids(
      """{"more_like_this":{"fields":["text"],"like":"alpha nope zilch nada"}}""")
      == Seq(1L, 2L, 3L, 4L, 5L))
    // explicit 50% of 2 terms => 1; of 4 terms => 2
    assert(sids(
      """{"more_like_this":{"fields":["text"],"like":"beta gamma nope nada",
          "minimum_should_match":"50%"}}""")
      == Seq(1L, 2L, 3L, 4L))
    assert(sids(
      """{"more_like_this":{"fields":["text"],"like":"x y",
          "minimum_should_match":2}}""")
      == Seq(3L, 4L))
  }

  test("sloppy phrase matches a brute-force assignment oracle on every short doc") {
    import spark.implicits._
    // EXHAUSTIVE: all token sequences of length 1..5 over {a, b, c} (363
    // docs), two query shapes, slops 0..3 — the compiled predicate (regex
    // path at slop 0, nested-exists matcher beyond) must agree with a
    // direct implementation of the assignment semantics on every one
    val alpha = Seq("a", "b", "c")
    val docs = (1 to 5).flatMap(n =>
      Seq.fill(n)(alpha).foldLeft(Seq(Seq.empty[String]))((acc, as) =>
        acc.flatMap(pre => as.map(pre :+ _))))
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }
      .toDF("id", "text")
    def bruteSloppy(toks: Seq[String], terms: Seq[String], slop: Int): Boolean = {
      val posLists = terms.map(t => toks.zipWithIndex.filter(_._1 == t).map(_._2))
      def rec(i: Int, acc: List[Int]): Boolean =
        if (i == terms.size) {
          val ps = acc.reverse
          ps.distinct.size == ps.size && {
            val adj = ps.zipWithIndex.map { case (p, k) => p - k }
            adj.max - adj.min <= slop
          }
        } else posLists(i).exists(p => rec(i + 1, p :: acc))
      rec(0, Nil)
    }
    for (terms <- Seq(Seq("a", "b"), Seq("a", "b", "c"), Seq("a", "a")); slop <- 0 to 3) {
      val json =
        s"""{"match_phrase":{"text":{"query":"${terms.mkString(" ")}","slop":$slop}}}"""
      val got = df.where(EsFilter.compile(json))
        .select("id").collect().map(_.getLong(0)).toSet
      val want = docs.zipWithIndex
        .collect { case (t, i) if bruteSloppy(t, terms, slop) => i.toLong }.toSet
      assert(got == want,
        s"terms=$terms slop=$slop: got ${got.size} docs, brute oracle ${want.size}")
    }
  }

  test("multi_match phrase types route to the phrase matcher; unknown types throw") {
    import spark.implicits._
    val two = Seq((1L, "alpha beta", "gamma delta"),
                  (2L, "beta alpha", "delta gamma")).toDF("id", "a", "b")
    def mids(json: String): Seq[Long] =
      two.where(EsFilter.compile(json)).select("id").collect().map(_.getLong(0)).sorted.toSeq
    // type=phrase needs in-order adjacency in SOME field
    assert(mids("""{"multi_match":{"query":"gamma delta","fields":["a","b"],
      "type":"phrase"}}""") == Seq(1L))
    // with slop 2 the swapped field matches too
    assert(mids("""{"multi_match":{"query":"gamma delta","fields":["a","b"],
      "type":"phrase","slop":2}}""") == Seq(1L, 2L))
    assert(mids("""{"multi_match":{"query":"alpha be","fields":["a","b"],
      "type":"phrase_prefix"}}""") == Seq(1L))
    // most_fields matches like best_fields in filter context
    assert(mids("""{"multi_match":{"query":"alpha","fields":["a","b"],
      "type":"most_fields"}}""") == Seq(1L, 2L))
    // unknown types are rejected, not silently treated as best_fields
    intercept[IllegalArgumentException] {
      mids("""{"multi_match":{"query":"alpha","fields":["a"],"type":"phrase_middle"}}""")
    }
  }

  test("multi_match bool_prefix: exact terms plus a last-term token prefix") {
    import spark.implicits._
    val df = Seq((1L, "signup flow"), (2L, "error page"), (3L, "sign up"),
      (4L, "errand list"), (5L, "signup error")).toDF("id", "a")
    def bids(json: String): Seq[Long] =
      df.where(EsFilter.compile(json)).select("id").collect().map(_.getLong(0)).sorted.toSeq
    // OR (the ES default): 'signup' as a token, or any token starting 'err'.
    // Doc 3 proves non-last terms match EXACTLY ('sign' != 'signup').
    assert(bids("""{"multi_match":{"query":"signup err","fields":["a"],
      "type":"bool_prefix"}}""") == Seq(1L, 2L, 4L, 5L))
    // AND: both clauses in one field
    assert(bids("""{"multi_match":{"query":"signup err","fields":["a"],
      "type":"bool_prefix","operator":"and"}}""") == Seq(5L))
  }

  test("field_masking_span: masked clause composes, evaluated on the masked field") {
    // under span_near: identical to the plain span on the masked field
    // (graft's single analyzer — the Lucene parallel-fields scenario)
    val masked =
      """{"span_near":{"clauses":[
           {"span_term":{"text":"alpha"}},
           {"field_masking_span":{"query":{"span_term":{"other":"gamma"}},
                                  "field":"text"}}],
          "slop":1,"in_order":true}}"""
    val plain =
      """{"span_near":{"clauses":[{"span_term":{"text":"alpha"}},
                                  {"span_term":{"text":"gamma"}}],
          "slop":1,"in_order":true}}"""
    assert(sids(masked) == sids(plain))
    // top-level form: the wrapped span on the masked field
    assert(sids("""{"field_masking_span":{
        "query":{"span_term":{"other":"gamma"}},"field":"text"}}""")
      == Seq(1L, 2L, 3L, 4L))
    // malformed: missing "field"
    intercept[IllegalArgumentException] {
      sids("""{"field_masking_span":{"query":{"span_term":{"text":"alpha"}}}}""")
    }
    // the generic span-clause error names field_masking_span as supported
    val err = intercept[IllegalArgumentException] {
      sids("""{"span_near":{"clauses":[{"span_gap":{"text":3}}],"slop":0}}""")
    }
    assert(err.getMessage.contains("field_masking_span"))
  }

  test("terms_set: per-row threshold field, constant msm, null threshold") {
    import spark.implicits._
    val df = Seq(
      (1L, "red green blue", 2L), (2L, "red yellow x", 2L),
      (3L, "red green", 3L), (4L, "red green blue", 3L))
      .toDF("id", "tags", "required")
    def tids(json: String): Seq[Long] =
      df.where(EsFilter.compile(json)).select("id").collect().map(_.getLong(0)).sorted.toSeq
    // per-row threshold: doc 1 matches 2>=2, doc 2 has 1<2, doc 3 has
    // 2<3, doc 4 has 3>=3
    assert(tids("""{"terms_set":{"tags":{"terms":["red","green","blue"],
      "minimum_should_match_field":"required"}}}""") == Seq(1L, 4L))
    // constant form (ES 8.13+ minimum_should_match)
    assert(tids("""{"terms_set":{"tags":{"terms":["red","green","blue"],
      "minimum_should_match":2}}}""") == Seq(1L, 3L, 4L))
    // a NULL/missing threshold field matches nothing (the ES skip)
    val withNull = Seq((1L, "red green", Option.empty[Long]),
      (2L, "red green", Some(1L))).toDF("id", "tags", "required")
    assert(withNull.where(EsFilter.compile(
      """{"terms_set":{"tags":{"terms":["red"],
           "minimum_should_match_field":"required"}}}"""))
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    // scripts need an engine: rejected by name
    val err = intercept[IllegalArgumentException] {
      tids("""{"terms_set":{"tags":{"terms":["red"],
        "minimum_should_match_script":{"source":"doc.size"}}}}""")
    }
    assert(err.getMessage.contains("scripting engine"))
    // no threshold at all: rejected
    intercept[IllegalArgumentException] {
      tids("""{"terms_set":{"tags":{"terms":["red"]}}}""")
    }
  }

  test("combined_fields: term-centric any-field match, msm grammar, boosts") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta", "gamma"), (2L, "alpha x", "y"),
      (3L, "x y", "beta"), (4L, "x y", "z"))
      .toDF("id", "title", "body")
    def cids(json: String): Seq[Long] =
      df.where(EsFilter.compile(json)).select("id").collect().map(_.getLong(0)).sorted.toSeq
    // OR default: any term in any field
    assert(cids("""{"combined_fields":{"query":"alpha beta",
      "fields":["title","body"]}}""") == Seq(1L, 2L, 3L))
    // AND: every term in SOME field (doc 1: alpha+beta in title, gamma n/a)
    assert(cids("""{"combined_fields":{"query":"alpha beta",
      "fields":["title","body"],"operator":"and"}}""") == Seq(1L))
    // negative msm: -1 of 3 terms = at least 2; boost suffix parsed off
    assert(cids("""{"combined_fields":{"query":"alpha beta gamma",
      "fields":["title^2","body"],"minimum_should_match":"-1"}}""") == Seq(1L))
  }

  test("minimum_should_match negative and conditional forms (ES all-but-N)") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "a b x y"), (3L, "a x y z"))
      .toDF("id", "text")
    def mids(json: String): Seq[Long] =
      df.where(EsFilter.compile(json)).select("id").collect().map(_.getLong(0)).sorted.toSeq
    // "-25%" of 4 terms: floor(1) may be missing -> 3 required (the ES
    // rule; the old clamp silently required just 1)
    assert(mids("""{"match":{"text":{"query":"a b c d",
      "minimum_should_match":"-25%"}}}""") == Seq(1L))
    // "-1" of 4 terms -> 3 required
    assert(mids("""{"match":{"text":{"query":"a b c d",
      "minimum_should_match":"-1"}}}""") == Seq(1L))
    // positive percent unchanged: 50% of 4 -> 2
    assert(mids("""{"match":{"text":{"query":"a b c d",
      "minimum_should_match":"50%"}}}""") == Seq(1L, 2L))
    // bool with negative msm over should clauses
    assert(mids("""{"bool":{"should":[{"term":{"text":{"value":"a b c d"}}},
      {"match":{"text":"a"}},{"match":{"text":"b"}}],
      "minimum_should_match":"-1"}}""") == Seq(1L, 2L))
    // conditional forms are rejected by name, not approximated
    val err = intercept[IllegalArgumentException] {
      mids("""{"match":{"text":{"query":"a b","minimum_should_match":"2<90%"}}}""")
    }
    assert(err.getMessage.contains("conditional"))
  }

  test("match fuzziness rejects reserved-char terms at the parse site") {
    import spark.implicits._
    val df = Seq((1L, "c++ rocks"), (2L, "c rocks")).toDF("id", "text")
    // without fuzziness 'c++' is a literal token
    assert(df.where(EsFilter.compile("""{"match":{"text":"c++"}}"""))
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // with fuzziness: a query-level error naming the match query and the
    // way out — not the kernel's internal encoding error
    val err = intercept[IllegalArgumentException] {
      df.where(EsFilter.compile("""{"match":{"text":{"query":"c++",
        "fuzziness":"AUTO"}}}""")).collect()
    }
    assert(err.getMessage.contains("match with fuzziness"))
    assert(err.getMessage.contains("drop fuzziness"))
  }

  test("span_or unions positions; span_not windows out excluded positions") {
    // span_or widens slot 0 from {alpha} to {alpha, beta}
    val orNear =
      """{"span_near":{"clauses":[
           {"span_or":{"clauses":[{"span_term":{"text":"alpha"}},
                                  {"span_term":{"text":"beta"}}]}},
           {"span_term":{"text":"gamma"}}],
          "slop":0,"in_order":true}}"""
    assert(sids(orNear) == Seq(1L, 2L, 4L))
    val plainNear =
      """{"span_near":{"clauses":[{"span_term":{"text":"alpha"}},
                                  {"span_term":{"text":"gamma"}}],
          "slop":0,"in_order":true}}"""
    assert(sids(plainNear) == Seq(2L)) // without the union, only doc 2
    // span_not pre=1: beta occurrences immediately preceded by alpha drop
    // (docs 1 and 5); the survivors still need gamma within slop 1
    def notNear(window: String) =
      s"""{"span_near":{"clauses":[
            {"span_not":{"include":{"span_term":{"text":"beta"}},
                         "exclude":{"span_term":{"text":"alpha"}},$window}},
            {"span_term":{"text":"gamma"}}],
           "slop":1,"in_order":true}}"""
    assert(sids(notNear(""""pre":1""")) == Seq(2L, 3L, 4L))
    // dist=1 also looks AFTER the include position: doc 2's beta@0 now
    // sees alpha@1 inside [-1, 1] and drops too
    assert(sids(notNear(""""dist":1""")) == Seq(3L, 4L))
    // exclusion never ADDS matches: a span_not whose exclude term is
    // absent behaves exactly like its include
    assert(sids(notNear(""""pre":0,"post":0""")) ==
      sids(s"""{"span_near":{"clauses":[
            {"span_not":{"include":{"span_term":{"text":"beta"}},
                         "exclude":{"span_term":{"text":"zilch"}},"pre":9,"post":9}},
            {"span_term":{"text":"gamma"}}],
           "slop":1,"in_order":true}}"""))
  }

  test("span_first bounds the match to the first `end` positions") {
    // gamma sits at position 2 in docs 1-2 but position 4 in docs 3-4
    assert(sids("""{"span_first":{"match":{"span_term":{"text":"gamma"}},"end":3}}""")
      == Seq(1L, 2L))
    assert(sids("""{"span_first":{"match":{"span_term":{"text":"gamma"}},"end":5}}""")
      == Seq(1L, 2L, 3L, 4L))
    assert(sids("""{"span_first":{"match":{"span_term":{"text":"gamma"}},"end":0}}""")
      == Seq())
    // composes with span_not: doc 2's beta@0 is the only alpha-free beta
    // inside the first position
    assert(sids(
      """{"span_first":{"match":{"span_not":{"include":{"span_term":{"text":"beta"}},
          "exclude":{"span_term":{"text":"alpha"}},"pre":1}},"end":1}}""")
      == Seq(2L))
    intercept[IllegalArgumentException] { sids("""{"span_first":{"end":3}}""") }
  }

  test("intervals: unordered gap budget is the covering-interval width") {
    // alpha..gamma covering width: doc1 gap 1, doc2 gap 0, docs 3-4 gap 3
    assert(sids("""{"intervals":{"text":{"match":
        {"query":"gamma alpha","max_gaps":1}}}}""") == Seq(1L, 2L))
    assert(sids("""{"intervals":{"text":{"match":
        {"query":"gamma alpha","max_gaps":0}}}}""") == Seq(2L))
    // default max_gaps -1: unbounded, any doc holding both terms
    assert(sids("""{"intervals":{"text":{"match":
        {"query":"gamma alpha"}}}}""") == Seq(1L, 2L, 3L, 4L))
    // repeated query terms need DISTINCT positions
    assert(sids("""{"intervals":{"text":{"match":
        {"query":"alpha alpha"}}}}""") == Seq(5L))
  }

  test("intervals: ordered honors term order; all_of composes any_of slots") {
    // no doc has gamma BEFORE alpha, so ordered finds nothing where the
    // unordered form above found 4 docs
    assert(sids("""{"intervals":{"text":{"match":
        {"query":"gamma alpha","ordered":true}}}}""") == Seq())
    assert(sids("""{"intervals":{"text":{"match":
        {"query":"alpha gamma","ordered":true,"max_gaps":1}}}}""")
      == Seq(1L, 2L))
    // gamma adjacent (max_gaps 0) to beta-or-x: doc1 (b@1,g@2), doc4 (b@3,g@4)
    assert(sids(
      """{"intervals":{"text":{"all_of":{"max_gaps":0,"intervals":[
           {"match":{"query":"gamma"}},
           {"any_of":{"intervals":[{"match":{"query":"beta"}},
                                   {"match":{"query":"x"}}]}}]}}}}""")
      == Seq(1L, 4L))
    // unknown sources stay rejected
    intercept[IllegalArgumentException] {
      sids("""{"intervals":{"text":{"regexp":{"pattern":"al.*"}}}}""")
    }
    // a bare multi-token sub-match inside all_of is a NESTED sloppy
    // interval under its own budget (the ES default): adjacent
    // alpha/beta in either order — docs 1, 2, 5; 3 and 4 have gaps
    assert(sids("""{"intervals":{"text":{"all_of":{"intervals":[
             {"match":{"query":"alpha beta","max_gaps":0}}]}}}}""")
      == Seq(1L, 2L, 5L))
  }

  test("intervals: nested sub-match gap budgets (all_of inside all_of)") {
    // nested unordered 'alpha y' within 1 gap: only doc 4 ([0,2] via x@1);
    // doc 3's alpha..y cover [0,3] has 2 gaps. The nested interval then
    // combines with gamma under the OUTER budget: cover [0,4] minus
    // widths (3 + 1) = 1 gap -> max_gaps 1 passes, max_gaps 0 does not.
    assert(sids("""{"intervals":{"text":{"all_of":{"max_gaps":1,"intervals":[
             {"match":{"query":"alpha y","max_gaps":1}},
             {"match":{"query":"gamma"}}]}}}}""")
      == Seq(4L))
    assert(sids("""{"intervals":{"text":{"all_of":{"max_gaps":0,"intervals":[
             {"match":{"query":"alpha y","max_gaps":1}},
             {"match":{"query":"gamma"}}]}}}}""")
      == Seq())
    // ordered outer budgets count from the nested interval's END, and a
    // token INSIDE the nested cover overlaps it (no-overlap rule): doc 3's
    // nested ordered alpha..beta cover is [0,2] (1 gap <= 2) with y@3
    // adjacent after it; doc 4's y@2 sits inside its [0,3] cover
    assert(sids("""{"intervals":{"text":{"all_of":{"ordered":true,"max_gaps":0,
             "intervals":[{"match":{"query":"alpha beta","ordered":true,"max_gaps":2}},
                          {"match":{"query":"y"}}]}}}}""")
      == Seq(3L))
    // the nested budget itself binds: max_gaps 1 excludes doc 4's 2-gap
    // alpha..beta and doc 3 keeps its 1-gap one
    assert(sids("""{"intervals":{"text":{"all_of":{"ordered":true,"max_gaps":0,
             "intervals":[{"match":{"query":"alpha beta","ordered":true,"max_gaps":1}},
                          {"match":{"query":"y"}}]}}}}""")
      == Seq(3L))
  }

  test("intervals: fixed-phrase all_of subs occupy their width in the budget") {
    def phrase(q: String) =
      s"""{"match":{"query":"$q","ordered":true,"max_gaps":0}}"""
    // the contiguous phrase "alpha beta" exists only in docs 1 and 5
    assert(sids(s"""{"intervals":{"text":{"all_of":{"intervals":[
             ${phrase("alpha beta")}]}}}}""") == Seq(1L, 5L))
    // ordered: phrase then gamma ADJACENT (max_gaps 0) -> doc 1 only
    // ("alpha beta gamma"); doc 5 has no gamma at all
    assert(sids(s"""{"intervals":{"text":{"all_of":{"ordered":true,"max_gaps":0,
             "intervals":[${phrase("alpha beta")},
                          {"match":{"query":"gamma"}}]}}}}""") == Seq(1L))
    // unordered covering budget subtracts the phrase's full width: doc 2
    // "beta alpha gamma" holds phrase "beta alpha" (w=2) and gamma with
    // cover 3 -> gaps 0
    assert(sids(s"""{"intervals":{"text":{"all_of":{"max_gaps":0,
             "intervals":[${phrase("beta alpha")},
                          {"match":{"query":"gamma"}}]}}}}""") == Seq(2L))
    // intervals may not overlap: "alpha beta" + "beta alpha" would need the
    // shared beta in doc 2 -> no match anywhere (doc 5 lacks "beta alpha")
    assert(sids(s"""{"intervals":{"text":{"all_of":{"intervals":[
             ${phrase("alpha beta")}, ${phrase("beta alpha")}]}}}}""") == Seq())
    // gap budgets count from the phrase END: doc 4 "alpha x y beta gamma"
    // has phrase "beta gamma" 3 after alpha's end -> ordered max_gaps 2
    assert(sids(s"""{"intervals":{"text":{"all_of":{"ordered":true,"max_gaps":2,
             "intervals":[{"match":{"query":"alpha"}},
                          ${phrase("beta gamma")}]}}}}""") == Seq(1L, 4L))
    assert(sids(s"""{"intervals":{"text":{"all_of":{"ordered":true,"max_gaps":1,
             "intervals":[{"match":{"query":"alpha"}},
                          ${phrase("beta gamma")}]}}}}""") == Seq(1L))
    // a sub-match with its own nonzero gap budget is a nested interval
    // (not a phrase): ordered alpha..beta within 1 gap — docs 1, 3, 5
    assert(sids("""{"intervals":{"text":{"all_of":{"intervals":[
             {"match":{"query":"alpha beta","ordered":true,"max_gaps":1}}]}}}}""")
      == Seq(1L, 3L, 5L))
  }

  test("intervals: prefix rule is a startsWith position slot") {
    // standalone prefix: any doc holding an 'al'-prefixed token
    assert(sids("""{"intervals":{"text":{"prefix":{"prefix":"al"}}}}""")
      == Seq(1L, 2L, 3L, 4L, 5L))
    assert(sids("""{"intervals":{"text":{"prefix":{"prefix":"zz"}}}}""") == Seq())
    // ordered all_of with a prefix slot: beta ADJACENT to a gam- token —
    // docs 1 (beta@1 gamma@2) and 4 (beta@3 gamma@4) only
    assert(sids(
      """{"intervals":{"text":{"all_of":{"ordered":true,"max_gaps":0,"intervals":[
           {"match":{"query":"beta"}},
           {"prefix":{"prefix":"gam"}}]}}}}""")
      == Seq(1L, 4L))
    // prefix inside any_of unions its positions with the exact terms
    assert(sids(
      """{"intervals":{"text":{"all_of":{"max_gaps":0,"intervals":[
           {"match":{"query":"gamma"}},
           {"any_of":{"intervals":[{"match":{"query":"x"}},
                                   {"prefix":{"prefix":"bet"}}]}}]}}}}""")
      == Seq(1L, 4L))
  }

  test("intervals: filter rules relate the cover to a filter interval") {
    // containing: the alpha..gamma cover must hold a beta inside it.
    // doc1 [0,2]∋beta@1, doc3 [0,4]∋beta@2, doc4 [0,4]∋beta@3; doc2's only
    // cover [1,2] (alpha@1, gamma@2) excludes beta@0
    assert(sids("""{"intervals":{"text":{"match":{"query":"alpha gamma",
        "max_gaps":3,"filter":{"containing":{"match":{"query":"beta"}}}}}}}""")
      == Seq(1L, 3L, 4L))
    // not_containing: only doc2 has a beta-free alpha..gamma assignment
    assert(sids("""{"intervals":{"text":{"match":{"query":"alpha gamma",
        "max_gaps":3,"filter":{"not_containing":{"match":{"query":"beta"}}}}}}}""")
      == Seq(2L))
    // contained_by a fixed phrase: beta inside an "alpha beta" bigram —
    // docs 1 and 5 only (2/3/4 hold beta but no contiguous "alpha beta")
    assert(sids("""{"intervals":{"text":{"match":{"query":"beta",
        "filter":{"contained_by":{"match":
          {"query":"alpha beta","ordered":true,"max_gaps":0}}}}}}}""")
      == Seq(1L, 5L))
    assert(sids("""{"intervals":{"text":{"match":{"query":"beta",
        "filter":{"not_contained_by":{"match":
          {"query":"alpha beta","ordered":true,"max_gaps":0}}}}}}}""")
      == Seq(2L, 3L, 4L))
    // after: an alpha strictly past some beta's end — docs 2 and 5 only
    assert(sids("""{"intervals":{"text":{"match":{"query":"alpha",
        "filter":{"after":{"match":{"query":"beta"}}}}}}}""")
      == Seq(2L, 5L))
    // before: an alpha ending before some beta starts
    assert(sids("""{"intervals":{"text":{"match":{"query":"alpha",
        "filter":{"before":{"match":{"query":"beta"}}}}}}}""")
      == Seq(1L, 3L, 4L, 5L))
    // overlapping a fixed phrase: only doc 3 holds "x beta", and its
    // alpha..gamma cover [0,4] overlaps it
    assert(sids("""{"intervals":{"text":{"match":{"query":"alpha gamma",
        "filter":{"overlapping":{"match":
          {"query":"x beta","ordered":true,"max_gaps":0}}}}}}}""")
      == Seq(3L))
    // not_overlapping: doc 2's [1,2] cover is the only one avoiding beta
    assert(sids("""{"intervals":{"text":{"match":{"query":"alpha gamma",
        "filter":{"not_overlapping":{"match":{"query":"beta"}}}}}}}""")
      == Seq(2L))
    // filter sources may themselves be NESTED sub-matches with a gap
    // budget: an 'x beta' interval within 1 gap must sit inside the
    // alpha..gamma cover — docs 3 (x@1 beta@2) and 4 (x@1..beta@3, 1 gap)
    assert(sids("""{"intervals":{"text":{"match":{"query":"alpha gamma",
        "max_gaps":4,"filter":{"containing":{"match":{"query":"x beta","max_gaps":1}}}}}}}""")
      == Seq(3L, 4L))
    // script filters stay rejected
    intercept[IllegalArgumentException] {
      sids("""{"intervals":{"text":{"match":{"query":"alpha",
          "filter":{"script":{"source":"true"}}}}}}""")
    }
  }

  test("intervals: wildcard and fuzzy rules are position predicates") {
    // wildcard standalone: any token matching the `*`/`?` pattern
    assert(sids("""{"intervals":{"text":{"wildcard":{"pattern":"?lpha"}}}}""")
      == Seq(1L, 2L, 3L, 4L, 5L))
    assert(sids("""{"intervals":{"text":{"wildcard":{"pattern":"z*"}}}}""") == Seq())
    // wildcard slot under an ordered all_of: beta ADJACENT to a '*amma'
    // token — docs 1 (beta@1 gamma@2) and 4 (beta@3 gamma@4)
    assert(sids(
      """{"intervals":{"text":{"all_of":{"ordered":true,"max_gaps":0,"intervals":[
           {"match":{"query":"beta"}},
           {"wildcard":{"pattern":"*amma"}}]}}}}""")
      == Seq(1L, 4L))
    // fuzzy standalone: 'algha' (substitution) and 'aplha' (transposition,
    // ONE edit under OSA) both reach alpha at fuzziness 1
    assert(sids("""{"intervals":{"text":{"fuzzy":{"term":"algha","fuzziness":1}}}}""")
      == Seq(1L, 2L, 3L, 4L, 5L))
    assert(sids("""{"intervals":{"text":{"fuzzy":{"term":"aplha","fuzziness":1}}}}""")
      == Seq(1L, 2L, 3L, 4L, 5L))
    assert(sids("""{"intervals":{"text":{"fuzzy":{"term":"zzzzz","fuzziness":1}}}}""")
      == Seq())
    // fuzzy slot under an unordered all_of budget: a near-'beta' token and
    // gamma within one covering gap — every gamma doc qualifies (doc 3's
    // beta@2..gamma@4 cover has exactly 1 interior position); doc 5 has no
    // gamma. Tightening to max_gaps 0 drops doc 3 and keeps the adjacent
    // pairs only.
    assert(sids(
      """{"intervals":{"text":{"all_of":{"max_gaps":1,"intervals":[
           {"fuzzy":{"term":"beda","fuzziness":1}},
           {"match":{"query":"gamma"}}]}}}}""")
      == Seq(1L, 2L, 3L, 4L))
    assert(sids(
      """{"intervals":{"text":{"all_of":{"max_gaps":0,"intervals":[
           {"fuzzy":{"term":"beda","fuzziness":1}},
           {"match":{"query":"gamma"}}]}}}}""")
      == Seq(1L, 4L))
    // non-default knobs implemented r12 (previously rejected): the
    // transposed 'aplha'~'alpha' is ONE edit under OSA (matches everywhere
    // above) but TWO under plain Levenshtein — transpositions:false drops it
    assert(sids(
      """{"intervals":{"text":{"fuzzy":{"term":"aplha","fuzziness":1,
           "transpositions":false}}}}""")
      == Seq())
    // prefix pinning: 'algha' reaches 'alpha' at distance 1, but a pinned
    // 'alg' prefix can never match 'alp...'; pinning only 'al' leaves the
    // one edit on the remainder and matches again
    assert(sids(
      """{"intervals":{"text":{"fuzzy":{"term":"algha","fuzziness":1,
           "prefix_length":3}}}}""")
      == Seq())
    assert(sids(
      """{"intervals":{"text":{"fuzzy":{"term":"algha","fuzziness":1,
           "prefix_length":2}}}}""")
      == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("positive filter rules fire per MINIMAL interval (Lucene semantics)") {
    import spark.implicits._
    // the ADVICE r10 witness: in 'alpha beta alpha gamma' the alpha..gamma
    // source has covers [0,3] and [2,3]; Lucene suppresses [0,3] (it
    // contains the valid [2,3]) BEFORE filtering, so `containing beta`
    // finds no beta inside the surviving [2,3] and the doc must NOT match
    val md = Seq((1L, "alpha beta alpha gamma"),
                 (2L, "alpha beta gamma"),      // unique cover [0,2] holds beta
                 (3L, "beta alpha gamma alpha") // minimal [1,2] excludes beta
      ).toDF("id", "text")
    def mids(json: String): Seq[Long] =
      md.where(EsFilter.compile(json)).select("id")
        .collect().map(_.getLong(0)).sorted.toSeq
    assert(mids("""{"intervals":{"text":{"match":{"query":"alpha gamma",
        "max_gaps":3,"filter":{"containing":{"match":{"query":"beta"}}}}}}}""")
      == Seq(2L))
    // the not_ form is unaffected by minimality (shrinking a cover only
    // removes containments): docs 1 and 3 have a beta-free assignment
    assert(mids("""{"intervals":{"text":{"match":{"query":"alpha gamma",
        "max_gaps":3,"filter":{"not_containing":{"match":{"query":"beta"}}}}}}}""")
      == Seq(1L, 3L))
    // positive control on doc 1: beta..gamma has ONE cover [1,3], minimal
    // by uniqueness, and it contains alpha@2
    assert(mids("""{"intervals":{"text":{"match":{"query":"beta gamma",
        "max_gaps":3,"filter":{"containing":{"match":{"query":"alpha"}}}}}}}""")
      == Seq(1L, 3L))
  }

  test("HOF fallback (no graft_sloppy function) agrees with the native kernel") {
    // the test session registers graft_sloppy, so every other test runs the
    // kernel; this one DROPS the function to force the extension-less HOF
    // path — "the documented fallback and the semantics spec" — and checks
    // both paths answer identically across phrase, prefix, span_or and
    // span_not shapes
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("graft_sloppy")
    val queries = Seq(
      """{"match_phrase":{"text":{"query":"alpha beta gamma","slop":2}}}""",
      """{"match_phrase":{"text":{"query":"alpha alpha","slop":3}}}""",
      """{"match_phrase_prefix":{"text":{"query":"alpha gam","slop":1}}}""",
      """{"span_near":{"clauses":[
           {"span_or":{"clauses":[{"span_term":{"text":"alpha"}},
                                  {"span_term":{"text":"beta"}}]}},
           {"span_term":{"text":"gamma"}}],"slop":0,"in_order":true}}""",
      """{"span_near":{"clauses":[
           {"span_not":{"include":{"span_term":{"text":"beta"}},
                        "exclude":{"span_term":{"text":"alpha"}},"dist":1}},
           {"span_term":{"text":"gamma"}}],"slop":1,"in_order":true}}""",
      """{"intervals":{"text":{"match":{"query":"gamma alpha","max_gaps":1}}}}""",
      """{"intervals":{"text":{"all_of":{"max_gaps":0,"intervals":[
           {"match":{"query":"gamma"}},
           {"any_of":{"intervals":[{"match":{"query":"beta"}},
                                   {"match":{"query":"x"}}]}}]}}}}""",
      """{"intervals":{"text":{"prefix":{"prefix":"al"}}}}""",
      """{"intervals":{"text":{"all_of":{"ordered":true,"max_gaps":0,"intervals":[
           {"match":{"query":"beta"}},
           {"prefix":{"prefix":"gam"}}]}}}}""",
      """{"intervals":{"text":{"all_of":{"ordered":true,"max_gaps":2,"intervals":[
           {"match":{"query":"alpha"}},
           {"match":{"query":"beta gamma","ordered":true,"max_gaps":0}}]}}}}""",
      """{"intervals":{"text":{"all_of":{"max_gaps":0,"intervals":[
           {"match":{"query":"beta alpha","ordered":true,"max_gaps":0}},
           {"match":{"query":"gamma"}}]}}}}""",
      """{"intervals":{"text":{"match":{"query":"alpha gamma",
           "max_gaps":3,"filter":{"containing":{"match":{"query":"beta"}}}}}}}""",
      """{"intervals":{"text":{"match":{"query":"beta",
           "filter":{"not_contained_by":{"match":
             {"query":"alpha beta","ordered":true,"max_gaps":0}}}}}}}""",
      """{"intervals":{"text":{"match":{"query":"alpha",
           "filter":{"after":{"match":{"query":"beta"}}}}}}}""",
      """{"intervals":{"text":{"match":{"query":"alpha gamma",
           "filter":{"not_overlapping":{"match":{"query":"beta"}}}}}}}""",
      """{"intervals":{"text":{"wildcard":{"pattern":"?lph*"}}}}""",
      """{"intervals":{"text":{"all_of":{"ordered":true,"max_gaps":1,"intervals":[
           {"wildcard":{"pattern":"*eta"}},
           {"match":{"query":"gamma"}}]}}}}""",
      """{"intervals":{"text":{"all_of":{"max_gaps":0,"intervals":[
           {"match":{"query":"gamma"}},
           {"any_of":{"intervals":[{"wildcard":{"pattern":"bet?"}},
                                   {"match":{"query":"x"}}]}}]}}}}""")
    val native = queries.map(sids)
    assert(spark.catalog.functionExists("graft_sloppy"))
    reg.dropFunction(id)
    try {
      assert(!spark.catalog.functionExists("graft_sloppy"))
      assert(queries.map(sids) == native)
    } finally reg.registerFunction(id,
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.SloppyMatch].getName, "graft_sloppy"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.SloppyMatch(
          children.head,
          children(1).eval(null).asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
          children(2).eval(null).asInstanceOf[Int],
          children(3).eval(null).asInstanceOf[Boolean],
          children(4).eval(null).asInstanceOf[Boolean],
          children.length > 5 && children(5).eval(null)
            .asInstanceOf[Boolean],
          if (children.length > 7)
            children(6).eval(null).asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
          else "",
          if (children.length > 7)
            children(7).eval(null).asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
          else ""))
  }
}

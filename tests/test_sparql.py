"""SPARQL SELECT subset engine (operators/sparql.py) — each test runs one
of the query shapes the reference actually issues against Blazegraph."""

import pytest

from sophox_spark.operators import sparql


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        # relations, one already located (updateRelLoc shape)
        ("osmrel:1", "osmm:type", '"r"'),
        ("osmrel:2", "osmm:type", '"r"'),
        ("osmrel:3", "osmm:type", '"r"'),
        ("osmrel:1", "osmm:loc", '"Point(1 1)"^^geo:wktLiteral'),
        # membership + member locations
        ("osmrel:1", "osmm:has", "osmnode:10"),
        ("osmrel:2", "osmm:has", "osmnode:11"),
        ("osmrel:2", "osmm:has", "osmway:12"),
        ("osmnode:10", "osmm:loc", '"Point(2 2)"^^geo:wktLiteral'),
        ("osmway:12", "osmm:loc", '"Point(3 3)"^^geo:wktLiteral'),
        # taginfo key→item resolution (updateUsageStats shape)
        ("osmd:Q103", "osmdt:P16", '"highway"'),
        ("osmd:Q104", "osmdt:P16", '"building"'),
        ("osmd:Q105", "osmdt:P16", '"landuse"'),
        # nodes for FILTER tests
        ("osmnode:10", "osmm:type", '"n"'),
        ("osmnode:11", "osmm:type", '"n"'),
        ("osmnode:10", "osmt:name", '"alpha"'),
        ("osmnode:11", "osmt:name", '"beta"'),
    ]
    return spark.createDataFrame(rows, "s string, p string, o string")


def _run(triples, q):
    return sparql.SparqlEngine(triples).select(q)


def test_bgp_filter_not_exists(triples):
    # updateRelLoc.py:69 — relations without osmm:loc
    out = _run(triples, """
# Get relations without osmm:loc
SELECT ?rel WHERE {
  ?rel osmm:type 'r' .
  FILTER NOT EXISTS { ?rel osmm:loc ?relLoc . }
}""")
    assert sorted(r.rel for r in out.collect()) == ["osmrel:2", "osmrel:3"]


def test_values_and_optional(triples):
    # updateRelLoc.py:112 — member locations with OPTIONAL loc
    out = _run(triples, """
SELECT ?rel ?member ?loc WHERE {
  VALUES ?rel { osmrel:1 osmrel:2 }
  ?rel osmm:has ?member .
  OPTIONAL { ?member osmm:loc ?loc . }
}""")
    got = {(r.rel, r.member): r.loc for r in out.collect()}
    assert got == {
        ("osmrel:1", "osmnode:10"): '"Point(2 2)"^^geo:wktLiteral',
        ("osmrel:2", "osmnode:11"): None,
        ("osmrel:2", "osmway:12"): '"Point(3 3)"^^geo:wktLiteral',
    }


def test_values_key_resolution(triples):
    # updateUsageStats.py:98 — VALUES-bound key→item join
    out = _run(triples, """
SELECT ?key ?id WHERE {
  VALUES ?key { 'highway' 'landuse' 'nosuchkey' }
  ?id osmdt:P16 ?key .
}""")
    got = {r.key: r.id for r in out.collect()}
    assert got == {'"highway"': "osmd:Q103", '"landuse"': "osmd:Q105"}


def test_filter_comparison_distinct_limit(triples):
    out = _run(triples, """
SELECT DISTINCT ?s ?name WHERE {
  ?s osmm:type 'n' .
  ?s osmt:name ?name .
  FILTER (?name != 'beta')
}""")
    assert [(r.s, r.name) for r in out.collect()] == [("osmnode:10", '"alpha"')]

    out2 = _run(triples, "SELECT ?s WHERE { ?s osmm:type 'r' . } LIMIT 2")
    assert out2.count() == 2


def test_exists_and_repeated_var(triples, spark):
    out = _run(triples, """
SELECT ?rel WHERE {
  ?rel osmm:type 'r' .
  FILTER EXISTS { ?rel osmm:has ?m . }
}""")
    assert sorted(r.rel for r in out.collect()) == ["osmrel:1", "osmrel:2"]

    # ?x ?p ?x self-reference
    tr = spark.createDataFrame(
        [("a", "p:self", "a"), ("a", "p:self", "b")], "s string, p string, o string"
    )
    out2 = sparql.SparqlEngine(tr).select("SELECT ?x WHERE { ?x p:self ?x . }")
    assert [r.x for r in out2.collect()] == ["a"]


def test_triples_from_statements(spark):
    rows = spark.createDataFrame(
        [("osmnode:5", 0, 'osmt:name "node 5"'),
         ("osmnode:5", 2000001, 'osmm:loc "Point(1 2)"^^geo:wktLiteral')],
        "subject string, ord long, stmt string",
    )
    got = {(r.s, r.p): r.o for r in sparql.triples_from_statements(rows).collect()}
    assert got == {
        ("osmnode:5", "osmt:name"): '"node 5"',
        ("osmnode:5", "osmm:loc"): '"Point(1 2)"^^geo:wktLiteral',
    }


def test_parse_errors(triples):
    with pytest.raises(ValueError):
        _run(triples, "ASK { ?s ?p ?o }")
    with pytest.raises(ValueError):
        _run(triples, "SELECT ?s WHERE { OPTIONAL { ?s ?p ?o . } }")


class TestSparqlUpdate:
    def test_subject_merge_preserving_task(self, spark):
        # RdfUpdateHandler.py:42-57 — replace all statements of the
        # pending subjects EXCEPT osmm:task, then insert the new ones
        tr = spark.createDataFrame(
            [
                ("osmnode:1", "osmt:name", '"old"'),
                ("osmnode:1", "osmm:task", '"keepme"'),
                ("osmnode:2", "osmt:name", '"other"'),
            ],
            "s string, p string, o string",
        )
        new = sparql.SparqlUpdateEngine(tr).update("""
DELETE { ?s ?p ?o . }
WHERE {
  VALUES ?s { osmnode:1 }
  ?s ?p ?o .
  FILTER (osmm:task != ?p)
};
INSERT { osmnode:1 osmt:name 'new' . osmnode:1 osmm:version '2' . } WHERE {};
""")
        got = {(r.s, r.p): r.o for r in new.collect()}
        assert got == {
            ("osmnode:1", "osmm:task"): '"keepme"',
            ("osmnode:1", "osmt:name"): '"new"',
            ("osmnode:1", "osmm:version"): '"2"',
            ("osmnode:2", "osmt:name"): '"other"',
        }

    def test_delete_by_predicate_values(self, spark):
        # updateUsageStats.py:111 — drop all usage counters
        tr = spark.createDataFrame(
            [
                ("osmd:Q1", "osmm:count_all", '"5"'),
                ("osmd:Q1", "osmm:count_nodes", '"2"'),
                ("osmd:Q1", "osmdt:P16", '"highway"'),
            ],
            "s string, p string, o string",
        )
        new = sparql.SparqlUpdateEngine(tr).update("""
DELETE { ?s ?p ?o } WHERE {
  VALUES ?p { osmm:count_all osmm:count_nodes }
         ?s ?p ?o .
}""")
        assert [(r.s, r.p) for r in new.collect()] == [("osmd:Q1", "osmdt:P16")]

    def test_insert_template_with_bindings(self, spark):
        # updateUsageStats.py:119 — INSERT { ?id osmm:k ?v } WHERE {...}
        tr = spark.createDataFrame(
            [("osmd:Q1", "osmdt:P16", '"highway"'),
             ("osmd:Q2", "osmdt:P16", '"building"')],
            "s string, p string, o string",
        )
        new = sparql.SparqlUpdateEngine(tr).update("""
INSERT { ?id osmm:seen 'yes' . } WHERE { ?id osmdt:P16 ?key . }
""")
        got = {(r.s, r.p): r.o for r in new.collect()}
        assert got[("osmd:Q1", "osmm:seen")] == '"yes"'
        assert got[("osmd:Q2", "osmm:seen")] == '"yes"'
        assert len(got) == 4

    def test_idempotent_set_semantics(self, spark):
        tr = spark.createDataFrame(
            [("x:a", "p:x", '"1"')], "s string, p string, o string"
        )
        eng = sparql.SparqlUpdateEngine(tr)
        q = "INSERT { x:a p:x '1' . x:b p:y '2' . } WHERE {}"
        once = eng.update(q)
        twice = sparql.SparqlUpdateEngine(once).update(q)
        assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
        assert once.count() == 2


def test_sparql_plan_pushes_constants_to_scan(spark, tmp_path):
    """Scale shape: triple-pattern constants must reach the parquet scan
    as pushed filters (each pattern reads only its predicate's rows),
    and BGP joins must be hash joins on the shared variable."""
    rows = [(f"osmnode:{i}", "osmm:type", '"n"') for i in range(200)]
    rows += [(f"osmnode:{i}", "osmt:name", f'"n{i}"') for i in range(200)]
    path = str(tmp_path / "triples.parquet")
    spark.createDataFrame(rows, "s string, p string, o string").write.parquet(path)
    triples = spark.read.parquet(path)

    out = sparql.SparqlEngine(triples).select(
        "SELECT ?s ?name WHERE { ?s osmm:type 'n' . ?s osmt:name ?name . }"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "osmm:type" in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    assert out.count() == 200


def test_tuple_values_insert(spark):
    # updateUsageStats.py:119-127 — INSERT counter triples from a
    # tuple-VALUES binding (the 5000-key chunk shape), verbatim
    tr = spark.createDataFrame(
        [("osmd:Q1", "osmdt:P16", '"highway"')], "s string, p string, o string"
    )
    new = sparql.SparqlUpdateEngine(tr).update("""
INSERT {
?id osmm:count_all ?count_all.
?id osmm:count_nodes ?count_nodes.
} WHERE {
VALUES (?id ?count_all ?count_nodes) {
(osmd:Q1 900 500)
(osmd:Q2 80 3)
} }""")
    got = {(r.s, r.p): r.o for r in new.collect()}
    assert got[("osmd:Q1", "osmm:count_all")] == "900"
    assert got[("osmd:Q2", "osmm:count_nodes")] == "3"
    assert len(got) == 5


class TestSemanticFixes:
    """Pins for review-found semantic gaps (silent-wrong-result cases)."""

    def test_optional_empty_group_keeps_left_rows(self, triples):
        out = _run(triples, """
SELECT ?rel ?z WHERE {
  ?rel osmm:type 'r' .
  OPTIONAL { ?q nosuch:pred ?z . }
}""")
        rows = out.collect()
        assert len(rows) == 3 and all(r.z is None for r in rows)

    def test_update_zero_solutions_is_noop(self, spark):
        tr = spark.createDataFrame(
            [("osmrel:1", "osmm:type", '"r"'), ("x:a", "p:x", '"1"')],
            "s string, p string, o string",
        )
        new = sparql.SparqlUpdateEngine(tr).update(
            "DELETE { osmrel:1 osmm:type 'r' . } WHERE { ?s nosuch:pred ?o . }"
        )
        assert new.count() == 2  # template never instantiates

    def test_numeric_filter_comparison(self, spark):
        tr = spark.createDataFrame(
            [("x:a", "p:v", "10"), ("x:b", "p:v", "9")],
            "s string, p string, o string",
        )
        out = sparql.SparqlEngine(tr).select(
            "SELECT ?s WHERE { ?s p:v ?v . FILTER (?v > 9) }"
        )
        assert [r.s for r in out.collect()] == ["x:a"]

    def test_filter_before_binding_triple(self, spark):
        """SPARQL filters scope over the whole group — a FILTER textually
        preceding the triple that binds its variable must still apply
        (previously raised AnalysisException)."""
        tr = spark.createDataFrame(
            [("x:a", "p:v", "10"), ("x:b", "p:v", "9")],
            "s string, p string, o string",
        )
        out = sparql.SparqlEngine(tr).select(
            "SELECT ?s WHERE { FILTER (?v > 9) ?s p:v ?v . }"
        )
        assert [r.s for r in out.collect()] == ["x:a"]

    def test_numeric_filter_typed_literal(self, spark):
        """Typed literals like '"10"^^xsd:integer' compare by VALUE: the
        column side strips quotes/^^datatype before the double cast
        (previously cast to NULL and silently never matched)."""
        tr = spark.createDataFrame(
            [
                ("x:a", "p:v", '"10"^^xsd:integer'),
                ("x:b", "p:v", '"9"^^xsd:integer'),
                ("x:c", "p:v", '"junk"'),
            ],
            "s string, p string, o string",
        )
        out = sparql.SparqlEngine(tr).select(
            "SELECT ?s WHERE { ?s p:v ?v . FILTER (?v > 9) }"
        )
        assert [r.s for r in out.collect()] == ["x:a"]
        # numeric literal may itself be typed
        out2 = sparql.SparqlEngine(tr).select(
            'SELECT ?s WHERE { ?s p:v ?v . FILTER (?v >= "10"^^xsd:integer) }'
        )
        assert [r.s for r in out2.collect()] == ["x:a"]

    def test_order_by_and_trailing_syntax(self, triples):
        out = _run(triples, """
SELECT ?rel WHERE { ?rel osmm:type 'r' . } ORDER BY DESC(?rel) LIMIT 2""")
        assert [r.rel for r in out.collect()] == ["osmrel:3", "osmrel:2"]
        # OFFSET became a real feature in round 4 — HAVING is the
        # remaining unsupported trailing clause that must fail loudly
        with pytest.raises(ValueError):
            _run(triples,
                 "SELECT ?s WHERE { ?s osmm:type 'r' . } HAVING (?s > 1)")

    def test_group_by_count(self, triples):
        out = _run(triples, """
SELECT ?type (COUNT(?x) AS ?n) WHERE { ?x osmm:type ?type . }
GROUP BY ?type ORDER BY ?type""")
        assert [(r.type, r.n) for r in out.collect()] == [('"n"', 2), ('"r"', 3)]

    def test_global_aggregates(self, spark):
        tr = spark.createDataFrame(
            [
                ("x:a", "p:v", '"10"^^xsd:integer'),
                ("x:b", "p:v", '"4"^^xsd:integer'),
                ("x:c", "p:v", "2"),
                ("x:c", "p:other", '"zzz"'),
            ],
            "s string, p string, o string",
        )
        out = sparql.SparqlEngine(tr).select("""
SELECT (COUNT(*) AS ?rows) (COUNT(DISTINCT ?s) AS ?subs)
       (SUM(?v) AS ?total) (AVG(?v) AS ?mean)
       (MIN(?v) AS ?lo) (MAX(?v) AS ?hi)
WHERE { ?s p:v ?v . }""")
        r = out.collect()[0]
        assert (r.rows, r.subs, r.total, r.mean, r.lo, r.hi) == (
            3, 3, 16.0, 16.0 / 3, 2.0, 10.0)

    def test_union_branches(self, triples):
        out = _run(triples, """
SELECT ?x WHERE {
  { ?x osmm:type 'r' . } UNION { ?x osmm:type 'n' . }
} ORDER BY ?x""")
        assert [r.x for r in out.collect()] == [
            "osmnode:10", "osmnode:11", "osmrel:1", "osmrel:2", "osmrel:3"]

    def test_union_disjoint_vars_null(self, triples):
        out = _run(triples, """
SELECT ?a ?b WHERE {
  { ?a osmm:type 'r' . } UNION { ?b osmt:name 'alpha' . }
}""")
        rows = out.collect()
        assert sum(r.a is None for r in rows) == 1  # the name branch
        assert sum(r.b is None for r in rows) == 3  # the rel branch

    def test_union_joins_with_rest_of_group(self, triples):
        # UNION result participates in the surrounding BGP join
        out = _run(triples, """
SELECT ?rel ?m WHERE {
  ?rel osmm:has ?m .
  { ?m osmm:type 'n' . } UNION { ?m osmm:loc ?l . }
} ORDER BY ?rel ?m""")
        got = [(r.rel, r.m) for r in out.collect()]
        # node 10 matches both branches (type n AND has loc) → DISTINCT
        # not requested, so duplicate solution survives (SPARQL union
        # is a bag)
        assert got == [
            ("osmrel:1", "osmnode:10"), ("osmrel:1", "osmnode:10"),
            ("osmrel:2", "osmnode:11"), ("osmrel:2", "osmway:12"),
        ]

    def test_group_by_errors(self, triples):
        with pytest.raises(ValueError, match="neither grouped"):
            _run(triples, """
SELECT ?x (COUNT(?t) AS ?n) WHERE { ?x osmm:type ?t . } GROUP BY ?t""")
        with pytest.raises(ValueError, match="not valid SPARQL"):
            _run(triples, "SELECT (SUM(*) AS ?n) WHERE { ?x osmm:type ?t . }")

    def test_path_sequence_and_inverse(self, triples):
        out = _run(triples, """
SELECT ?rel ?loc WHERE { ?rel osmm:has/osmm:loc ?loc . } ORDER BY ?rel""")
        assert [(r.rel, r.loc) for r in out.collect()] == [
            ("osmrel:1", '"Point(2 2)"^^geo:wktLiteral'),
            ("osmrel:2", '"Point(3 3)"^^geo:wktLiteral'),
        ]
        inv = _run(triples, """
SELECT ?m WHERE { ?m ^osmm:has osmrel:2 . } ORDER BY ?m""")
        assert [r.m for r in inv.collect()] == ["osmnode:11", "osmway:12"]

    def test_path_alternative(self, triples):
        out = _run(triples, """
SELECT ?v WHERE { osmnode:10 osmm:type|osmt:name ?v . } ORDER BY ?v""")
        assert [r.v for r in out.collect()] == ['"alpha"', '"n"']

    def test_path_closure_with_cycle(self, spark):
        tr = spark.createDataFrame(
            [("x:a", "p:next", "x:b"), ("x:b", "p:next", "x:c"),
             ("x:c", "p:next", "x:d"),
             ("x:e", "p:next", "x:f"), ("x:f", "p:next", "x:e")],
            "s string, p string, o string",
        )
        eng = sparql.SparqlEngine(tr)
        plus = eng.select("SELECT ?x ?y WHERE { ?x p:next+ ?y . }")
        got = {(r.x, r.y) for r in plus.collect()}
        assert got == {
            ("x:a", "x:b"), ("x:a", "x:c"), ("x:a", "x:d"),
            ("x:b", "x:c"), ("x:b", "x:d"), ("x:c", "x:d"),
            # cycle closes onto itself without divergence
            ("x:e", "x:f"), ("x:f", "x:e"), ("x:e", "x:e"), ("x:f", "x:f"),
        }
        star = eng.select("SELECT ?y WHERE { x:a p:next* ?y . }")
        assert {r.y for r in star.collect()} == {"x:a", "x:b", "x:c", "x:d"}

    def test_path_errors(self, triples):
        with pytest.raises(ValueError, match="variable inside a property path"):
            _run(triples, "SELECT ?s WHERE { ?s ?p+ ?o . }")
        with pytest.raises(ValueError, match="paths are not allowed"):
            sparql.parse_update(
                "DELETE { ?s osmm:a/osmm:b ?o . } WHERE { ?s osmm:a ?o . }"
            )

    def test_bind_concat_str(self, triples):
        out = _run(triples, """
SELECT ?rel ?label WHERE {
  ?rel osmm:has ?m .
  ?m osmt:name ?n .
  BIND(CONCAT('member: ', STR(?n)) AS ?label)
}""")
        rows = {(r.rel, r.label) for r in out.collect()}
        assert rows == {
            ("osmrel:1", "member: alpha"),  # node10 is rel1's member
            ("osmrel:2", "member: beta"),   # node11 is rel2's member
        }

    def test_bind_rebind_raises(self, triples):
        with pytest.raises(ValueError, match="re-binds"):
            _run(triples, """
SELECT ?x WHERE { ?x osmm:type 'r' . BIND('y' AS ?x) }""")

    def test_string_filter_functions(self, triples):
        out = _run(triples, """
SELECT ?s WHERE { ?s osmt:name ?n . FILTER STRSTARTS(?n, 'al') }""")
        assert [r.s for r in out.collect()] == ["osmnode:10"]
        out2 = _run(triples, """
SELECT ?s WHERE { ?s osmm:loc ?l . FILTER CONTAINS(?l, 'Point(3') }""")
        assert [r.s for r in out2.collect()] == ["osmway:12"]
        out3 = _run(triples, """
SELECT ?s WHERE { ?s osmt:name ?n . FILTER REGEX(?n, '^b.t.$') }""")
        assert [r.s for r in out3.collect()] == ["osmnode:11"]
        out4 = _run(triples, """
SELECT ?s WHERE { ?s osmt:name ?n . FILTER STRENDS(?n, 'ta') }""")
        assert [r.s for r in out4.collect()] == ["osmnode:11"]

    def test_pname_flush_against_dot(self, triples):
        # 'osmnode:10.' must tokenize as pname + triple terminator
        out = _run(triples, "SELECT ?rel WHERE { ?rel osmm:has osmnode:10. }")
        assert [r.rel for r in out.collect()] == ["osmrel:1"]


def test_sparql_update_commits_as_subject_delta(spark, tmp_path):
    """S9 end-to-end: a SPARQL UPDATE's outcome lands in the
    PartitionedSnapshotTable as a SUBJECT-keyed delta commit (the
    RdfUpdateHandler per-subject MERGE), rewriting only the buckets the
    touched subjects hash to."""
    from sophox_spark.manifest import Manifest
    from sophox_spark.streaming import incremental

    man = Manifest(spark, str(tmp_path / "man"))
    tbl = incremental.PartitionedSnapshotTable(
        spark, str(tmp_path / "triples"), man, "triples",
        keys=("s",), n_buckets=8,
    )
    base = spark.createDataFrame(
        [("osmnode:1", "osmt:name", '"old"'),
         ("osmnode:1", "osmm:task", '"keepme"'),
         ("osmnode:2", "osmt:name", '"two"'),
         ("osmnode:3", "osmt:name", '"three"')],
        "s string, p string, o string",
    )
    tbl.commit_batch(base, seqid=1)

    new = sparql.SparqlUpdateEngine(tbl.read().select("s", "p", "o")).update("""
DELETE { ?s ?p ?o . }
WHERE { VALUES ?s { osmnode:1 } ?s ?p ?o . FILTER (osmm:task != ?p) };
INSERT { osmnode:1 osmt:name 'new' . } WHERE {};
""")
    old = tbl.read().select("s", "p", "o")
    # touched subjects = symmetric difference of the triple sets; at
    # replication scale the update handler knows them upfront (the
    # pending-subject list), this is the generic recomputation
    touched = (
        old.exceptAll(new).select("s")
        .union(new.exceptAll(old).select("s"))
        .distinct()
    )
    batch = new.join(touched, "s", "left_semi").withColumn(
        "__del", sparql.F.lit(False)
    )
    tbl.commit_batch(batch, seqid=2, delete_col="__del")

    got = {(r.s, r.p): r.o for r in tbl.read().select("s", "p", "o").collect()}
    assert got == {
        ("osmnode:1", "osmm:task"): '"keepme"',
        ("osmnode:1", "osmt:name"): '"new"',
        ("osmnode:2", "osmt:name"): '"two"',
        ("osmnode:3", "osmt:name"): '"three"',
    }


class TestSparqlSurfaceSyntax:
    """Round-4 surface extensions: predicate lists (';'), object lists
    (','), MINUS, IRI()/URI() — the syntax the reference's own shipped
    maintenance artifact (osm2rdf/maintenance/add_osmt_to_meta.sparql)
    uses, and which virtually every hand-written SPARQL query uses."""

    def test_predicate_and_object_lists_expand(self, triples):
        # ';' shares the subject, ',' shares subject+predicate
        out = _run(triples, """
SELECT ?rel ?m WHERE {
  ?rel osmm:type 'r' ;
       osmm:has ?m .
}""")
        got = sorted((r.rel, r.m) for r in out.collect())
        assert got == [("osmrel:1", "osmnode:10"), ("osmrel:2", "osmnode:11"),
                       ("osmrel:2", "osmway:12")]

        out2 = _run(triples, """
SELECT ?rel WHERE { ?rel osmm:has osmnode:11, osmway:12 . }""")
        assert [r.rel for r in out2.collect()] == ["osmrel:2"]

    def test_trailing_semicolon(self, triples):
        out = _run(triples, "SELECT ?s WHERE { ?s osmm:type 'n' ; . }")
        assert sorted(r.s for r in out.collect()) == ["osmnode:10", "osmnode:11"]

    def test_minus_shared_var(self, triples):
        # MINUS with a shared var behaves like the anti-join: relations
        # minus the located ones
        out = _run(triples, """
SELECT ?rel WHERE {
  ?rel osmm:type 'r' .
  MINUS { ?rel osmm:loc ?l }
}""")
        assert sorted(r.rel for r in out.collect()) == ["osmrel:2", "osmrel:3"]

    def test_minus_disjoint_domain_removes_nothing(self, triples):
        # spec §8.3.3: MINUS over disjoint variable domains is a no-op
        # (the defining difference from FILTER NOT EXISTS, which wipes
        # the left side whenever the inner pattern matches anything)
        out = _run(triples, """
SELECT ?rel WHERE {
  ?rel osmm:type 'r' .
  MINUS { ?x osmm:loc ?l }
}""")
        assert out.count() == 3
        out2 = _run(triples, """
SELECT ?rel WHERE {
  ?rel osmm:type 'r' .
  FILTER NOT EXISTS { ?x osmm:loc ?l }
}""")
        assert out2.count() == 0

    def test_bind_iri_and_str_of_iri(self, triples):
        out = _run(triples, """
SELECT ?id ?u WHERE {
  ?id osmdt:P16 'highway' .
  BIND (iri(concat("https://wiki.openstreetmap.org/wiki/Key:", 'highway')) as ?u)
}""")
        rows = out.collect()
        assert [(r.id, r.u) for r in rows] == [
            ("osmd:Q103", "<https://wiki.openstreetmap.org/wiki/Key:highway>")
        ]
        # STR(<iri>) strips the angle brackets
        out2 = _run(triples, """
SELECT ?s2 WHERE {
  ?id osmdt:P16 'highway' .
  BIND (URI('http://x/y') AS ?u)
  BIND (STR(?u) AS ?s2)
}""")
        assert [r.s2 for r in out2.collect()] == ["http://x/y"]


REFERENCE_MAINTENANCE = "/root/reference/osm2rdf/maintenance"


def _key_fixture(spark):
    """OSM-wiki metadata shape the maintenance artifact operates on:
    key items (osmdt:P2 osmd:Q7) with their key id (osmdt:P16), one
    already linked (osmm:key), one with a regex-invalid key id, one
    non-key item."""
    rows = [
        ("osmd:Q103", "osmdt:P2", "osmd:Q7"),
        ("osmd:Q103", "osmdt:P16", '"highway"'),
        ("osmd:Q104", "osmdt:P2", "osmd:Q7"),
        ("osmd:Q104", "osmdt:P16", '"building"'),
        ("osmd:Q104", "osmm:key",
         "<https://wiki.openstreetmap.org/wiki/Key:building>"),
        ("osmd:Q105", "osmdt:P2", "osmd:Q7"),
        ("osmd:Q105", "osmdt:P16", '"bad key!"'),
        ("osmd:Q200", "osmdt:P16", '"landuse"'),
    ]
    return spark.createDataFrame(rows, "s string, p string, o string")


@pytest.mark.skipif(
    not __import__("os").path.isdir(REFERENCE_MAINTENANCE),
    reason="reference checkout not present",
)
def test_reference_maintenance_artifact_end_to_end(spark):
    """The reference's one shipped SPARQL artifact
    (add_osmt_to_meta.sparql:1-18 — VALUES + ';' predicate list + MINUS
    + FILTER REGEX + BIND(iri(concat(...)))) parses and executes
    through SparqlUpdateEngine: exactly the unlinked, valid-key items
    gain osmm:key."""
    import os

    with open(os.path.join(REFERENCE_MAINTENANCE,
                           "add_osmt_to_meta.sparql")) as f:
        q = f.read()
    triples = _key_fixture(spark)
    new = sparql.SparqlUpdateEngine(triples).update(q)
    added = sorted(
        (r.s, r.p, r.o) for r in new.subtract(triples).collect()
    )
    assert added == [
        ("osmd:Q103", "osmm:key",
         "<https://wiki.openstreetmap.org/wiki/Key:highway>")
    ]
    # idempotent: a second pass (the 600 s loop) adds nothing
    again = sparql.SparqlUpdateEngine(new).update(q)
    assert again.subtract(new).count() == 0


def test_run_maintenance_sparql_guarded(spark, tmp_path):
    """runMaintenanceScripts.py:44-68 semantics on .sparql files:
    guard empty → skip; guard non-empty → mutate; scripts chain in
    sorted order; orphan guards reported."""
    from sophox_spark.plans.maintenance import run_maintenance_sparql

    d = tmp_path / "scripts"
    d.mkdir()
    # a_add: no guard — always runs
    (d / "a_add.sparql").write_text(
        "INSERT { osmd:Q1 osmm:flag 'a' . } WHERE {}"
    )
    # b_guarded: guard matches only after a_add ran (chaining)
    (d / "b_guarded.sparql").write_text(
        "INSERT { osmd:Q1 osmm:flag 'b' . } WHERE {}"
    )
    (d / "b_guarded-test.sparql").write_text(
        "SELECT ?s WHERE { ?s osmm:flag 'a' . }"
    )
    # c_skipped: guard never matches
    (d / "c_skipped.sparql").write_text(
        "INSERT { osmd:Q1 osmm:flag 'c' . } WHERE {}"
    )
    (d / "c_skipped-test.sparql").write_text(
        "SELECT ?s WHERE { ?s osmm:flag 'nope' . }"
    )
    (d / "zz_orphan-test.sparql").write_text(
        "SELECT ?s WHERE { ?s ?p ?o . }"
    )
    base = spark.createDataFrame(
        [("osmd:Q0", "osmm:type", '"seed"')], "s string, p string, o string"
    )
    out, final = run_maintenance_sparql(base, str(d))
    assert out == {
        "a_add": "no-guard-ran",
        "b_guarded": "ran",
        "c_skipped": "skipped(guard-empty)",
        "zz_orphan-test": "orphan-test",
    }
    flags = sorted(
        r.o for r in final.filter(sparql.F.col("p") == "osmm:flag").collect()
    )
    assert flags == ['"a"', '"b"']


class TestSparqlStretchFeatures:
    """Round-4 endpoint-surface extensions: GROUP_CONCAT/SAMPLE,
    subqueries, ASK, CONSTRUCT."""

    def test_group_concat_and_sample(self, triples):
        out = _run(triples, """
SELECT ?rel (GROUP_CONCAT(?m; SEPARATOR=",") AS ?members)
       (SAMPLE(?m) AS ?one)
WHERE { ?rel osmm:has ?m . }
GROUP BY ?rel
""")
        got = {r.rel: (r.members, r.one) for r in out.collect()}
        assert got == {
            "osmrel:1": ("osmnode:10", "osmnode:10"),
            "osmrel:2": ("osmnode:11,osmway:12", "osmnode:11"),
        }

    def test_group_concat_default_separator_and_distinct(self, spark):
        tr = spark.createDataFrame(
            [("a", "p:v", "x"), ("a", "p:v", "x"), ("a", "p:v", "y")],
            "s string, p string, o string",
        )
        eng = sparql.SparqlEngine(tr)
        out = eng.select(
            "SELECT (GROUP_CONCAT(DISTINCT ?o) AS ?all) WHERE { ?s p:v ?o . }"
        )
        assert out.collect()[0].all == "x y"

    def test_subquery(self, triples):
        # inner aggregation feeding the outer BGP: relations with ≥2
        # members, joined back to their type
        out = _run(triples, """
SELECT ?rel ?n WHERE {
  ?rel osmm:type 'r' .
  { SELECT ?rel (COUNT(?m) AS ?n) WHERE { ?rel osmm:has ?m . }
    GROUP BY ?rel }
  FILTER (?n >= 2)
}""")
        assert [(r.rel, r.n) for r in out.collect()] == [("osmrel:2", 2)]

    def test_ask(self, triples):
        eng = sparql.SparqlEngine(triples)
        assert eng.ask("ASK { osmrel:1 osmm:loc ?l . }") is True
        assert eng.ask("ASK { osmrel:3 osmm:loc ?l . }") is False

    def test_construct(self, triples):
        eng = sparql.SparqlEngine(triples)
        out = eng.construct("""
CONSTRUCT { ?rel osmm:memberOf ?m . ?rel osmm:kind 'relation' . }
WHERE { ?rel osmm:has ?m . }""")
        got = sorted((r.s, r.p, r.o) for r in out.collect())
        assert got == [
            ("osmrel:1", "osmm:kind", '"relation"'),
            ("osmrel:1", "osmm:memberOf", "osmnode:10"),
            ("osmrel:2", "osmm:kind", '"relation"'),
            ("osmrel:2", "osmm:memberOf", "osmnode:11"),
            ("osmrel:2", "osmm:memberOf", "osmway:12"),
        ]

    def test_construct_optional_unbound_drops_triple(self, triples):
        eng = sparql.SparqlEngine(triples)
        out = eng.construct("""
CONSTRUCT { ?rel osmm:locOf ?loc . ?rel osmm:seen 'y' . }
WHERE { ?rel osmm:type 'r' . OPTIONAL { ?rel osmm:loc ?loc . } }""")
        got = sorted((r.s, r.p, r.o) for r in out.collect())
        # every relation gets the ground-ish triple; only located ones
        # get the loc triple
        assert ("osmrel:1", "osmm:locOf", '"Point(1 1)"^^geo:wktLiteral') in got
        assert [t for t in got if t[1] == "osmm:seen"] == [
            ("osmrel:1", "osmm:seen", '"y"'),
            ("osmrel:2", "osmm:seen", '"y"'),
            ("osmrel:3", "osmm:seen", '"y"'),
        ]


class TestFilterExpressionsAndOffset:
    def test_or_and_not_bound(self, triples):
        # ||, !, BOUND over the OPTIONAL loc binding
        out = _run(triples, """
SELECT ?rel WHERE {
  ?rel osmm:type 'r' .
  OPTIONAL { ?rel osmm:loc ?loc . }
  FILTER (BOUND(?loc) || ?rel = osmrel:3)
}""")
        assert sorted(r.rel for r in out.collect()) == ["osmrel:1", "osmrel:3"]

        out2 = _run(triples, """
SELECT ?rel WHERE {
  ?rel osmm:type 'r' .
  OPTIONAL { ?rel osmm:loc ?loc . }
  FILTER (!BOUND(?loc) && !(?rel = osmrel:3))
}""")
        assert [r.rel for r in out2.collect()] == ["osmrel:2"]

    def test_nested_parens_precedence(self, spark):
        tr = spark.createDataFrame(
            [(f"n:{i}", "p:v", str(i)) for i in range(10)],
            "s string, p string, o string",
        )
        out = sparql.SparqlEngine(tr).select("""
SELECT ?s WHERE {
  ?s p:v ?o .
  FILTER ((?o < 3 || ?o > 7) && !(?o = 1))
}""")
        got = sorted(r.s for r in out.collect())
        assert got == ["n:0", "n:2", "n:8", "n:9"]

    def test_offset_paging(self, spark):
        tr = spark.createDataFrame(
            [(f"n:{i:02d}", "p:v", str(i)) for i in range(10)],
            "s string, p string, o string",
        )
        eng = sparql.SparqlEngine(tr)
        page2 = eng.select(
            "SELECT ?s WHERE { ?s p:v ?o . } ORDER BY ?s LIMIT 3 OFFSET 3"
        )
        assert [r.s for r in page2.collect()] == ["n:03", "n:04", "n:05"]
        # OFFSET before LIMIT also accepted
        page3 = eng.select(
            "SELECT ?s WHERE { ?s p:v ?o . } ORDER BY ?s OFFSET 8 LIMIT 5"
        )
        assert [r.s for r in page3.collect()] == ["n:08", "n:09"]


class TestHavingInAndOptPath:
    def test_having_aggregate_call(self, triples):
        out = _run(triples, """
SELECT ?rel (COUNT(?m) AS ?n) WHERE { ?rel osmm:has ?m . }
GROUP BY ?rel
HAVING (COUNT(?m) >= 2)
""")
        assert [(r.rel, r.n) for r in out.collect()] == [("osmrel:2", 2)]

    def test_having_alias_and_boolean(self, triples):
        out = _run(triples, """
SELECT ?rel (COUNT(?m) AS ?n) WHERE { ?rel osmm:has ?m . }
GROUP BY ?rel
HAVING (?n >= 2 || COUNT(?m) = 1)
""")
        got = {r.rel: r.n for r in out.collect()}
        assert got == {"osmrel:1": 1, "osmrel:2": 2}

    def test_having_without_aggregation_raises(self, triples):
        with pytest.raises(ValueError):
            _run(triples,
                 "SELECT ?s WHERE { ?s osmm:type 'r' . } HAVING (?s > 1)")

    def test_aggregate_in_plain_filter_raises(self, triples):
        with pytest.raises(ValueError):
            _run(triples, """
SELECT ?rel WHERE { ?rel osmm:has ?m . FILTER (COUNT(?m) > 1) }""")

    def test_filter_in_not_in(self, triples):
        out = _run(triples, """
SELECT ?rel WHERE {
  ?rel osmm:type 'r' .
  FILTER (?rel IN (osmrel:1, osmrel:3))
}""")
        assert sorted(r.rel for r in out.collect()) == ["osmrel:1", "osmrel:3"]
        out2 = _run(triples, """
SELECT ?rel WHERE {
  ?rel osmm:type 'r' .
  FILTER (?rel NOT IN (osmrel:1, osmrel:3))
}""")
        assert [r.rel for r in out2.collect()] == ["osmrel:2"]

    def test_zero_or_one_path(self, spark):
        tr = spark.createDataFrame(
            [("a", "p:n", "b"), ("b", "p:n", "c")],
            "s string, p string, o string",
        )
        out = sparql.SparqlEngine(tr).select(
            "SELECT ?x ?y WHERE { ?x p:n? ?y . }"
        )
        got = sorted((r.x, r.y) for r in out.collect())
        # one step ∪ identity on every graph term
        assert got == [("a", "a"), ("a", "b"), ("b", "b"), ("b", "c"),
                       ("c", "c")]


class TestOptionalFilterScoping:
    def test_filter_on_outer_var_keeps_left_rows(self, spark):
        # spec 8.3.2 LeftJoin(expr): the classic example — prices only
        # attach when below a threshold THAT REFERENCES THE OUTER ROW;
        # non-matching rows stay, unbound
        tr = spark.createDataFrame(
            [("b:1", "p:limit", "20"), ("b:2", "p:limit", "05"),
             ("b:1", "p:price", "10"), ("b:2", "p:price", "10")],
            "s string, p string, o string",
        )
        out = sparql.SparqlEngine(tr).select("""
SELECT ?b ?price WHERE {
  ?b p:limit ?lim .
  OPTIONAL { ?b p:price ?price . FILTER (?price < ?lim) }
}""")
        got = {r.b: r.price for r in out.collect()}
        # b:1 price 10 < limit 20 -> bound; b:2 price 10 >= 05 -> UNBOUND
        # (var-vs-var compares lexically - documented subset; values chosen
        # so string and numeric order agree)
        # row kept (a post-join filter would have dropped b:2 entirely)
        assert got == {"b:1": "10", "b:2": None}

    def test_inner_only_filter_same_as_before(self, triples):
        out = _run(triples, """
SELECT ?rel ?m WHERE {
  ?rel osmm:type 'r' .
  OPTIONAL { ?rel osmm:has ?m . FILTER (?m != osmnode:11) }
}""")
        got = {(r.rel, r.m) for r in out.collect()}
        assert got == {("osmrel:1", "osmnode:10"), ("osmrel:2", "osmway:12"),
                       ("osmrel:3", None)}


class TestValuesClauseDescribeAndA:
    def test_trailing_values_clause(self, triples):
        out = _run(triples, """
SELECT ?rel ?m WHERE { ?rel osmm:has ?m . }
VALUES ?rel { osmrel:2 }
""")
        got = sorted((r.rel, r.m) for r in out.collect())
        assert got == [("osmrel:2", "osmnode:11"), ("osmrel:2", "osmway:12")]

    def test_trailing_values_joins_before_aggregation(self, triples):
        out = _run(triples, """
SELECT ?rel (COUNT(?m) AS ?n) WHERE { ?rel osmm:has ?m . }
GROUP BY ?rel
VALUES ?rel { osmrel:2 osmrel:3 }
""")
        # the values join restricts the PATTERN (osmrel:3 has no
        # members, so no group forms for it)
        assert [(r.rel, r.n) for r in out.collect()] == [("osmrel:2", 2)]

    def test_describe(self, triples):
        eng = sparql.SparqlEngine(triples)
        out = eng.describe("DESCRIBE osmrel:1")
        assert out.count() == 3  # type + loc + has
        out2 = eng.describe("""
DESCRIBE ?rel WHERE { ?rel osmm:type 'r' .
  FILTER NOT EXISTS { ?rel osmm:has ?m . } }""")
        got = sorted((r.s, r.p) for r in out2.collect())
        assert got == [("osmrel:3", "osmm:type")]

    def test_a_rdf_type_shorthand(self, spark):
        tr = spark.createDataFrame(
            [("x:1", "rdf:type", "c:Road"), ("x:2", "rdf:type", "c:City"),
             ("x:1", "p:name", '"r1"')],
            "s string, p string, o string",
        )
        out = sparql.SparqlEngine(tr).select(
            "SELECT ?x WHERE { ?x a c:Road . }"
        )
        assert [r.x for r in out.collect()] == ["x:1"]


def test_expression_projection(triples):
    out = _run(triples, """
SELECT ?id (CONCAT('key=', STR(?key)) AS ?label) WHERE {
  ?id osmdt:P16 ?key .
}""")
    got = {r.id: r.label for r in out.collect()}
    assert got == {"osmd:Q103": "key=highway", "osmd:Q104": "key=building",
                   "osmd:Q105": "key=landuse"}
    with pytest.raises(ValueError):
        _run(triples, """
SELECT (STR(?key) AS ?k) (COUNT(*) AS ?n) WHERE { ?id osmdt:P16 ?key . }
GROUP BY ?key""")


class TestStringFunctions:
    def test_bind_string_functions(self, triples):
        out = _run(triples, """
SELECT ?s ?up ?l ?sub ?rep WHERE {
  ?s osmt:name ?n .
  BIND (UCASE(?n) AS ?up)
  BIND (STRLEN(?n) AS ?l)
  BIND (SUBSTR(?n, 2, 3) AS ?sub)
  BIND (REPLACE(?n, 'a', 'X') AS ?rep)
}""")
        got = {r.s: (r.up, r.l, r.sub, r.rep) for r in out.collect()}
        assert got == {
            "osmnode:10": ("ALPHA", "5", "lph", "XlphX"),
            "osmnode:11": ("BETA", "4", "eta", "betX"),
        }

    def test_strbefore_strafter(self, spark):
        tr = spark.createDataFrame(
            [("d:1", "p:host", '"www.example.org"'),
             ("d:2", "p:host", '"nodots"')],
            "s string, p string, o string",
        )
        out = sparql.SparqlEngine(tr).select("""
SELECT ?s ?b ?a WHERE {
  ?s p:host ?h .
  BIND (STRBEFORE(?h, '.') AS ?b)
  BIND (STRAFTER(?h, '.') AS ?a)
}""")
        got = {r.s: (r.b, r.a) for r in out.collect()}
        # spec: '' when the separator does not occur
        assert got == {"d:1": ("www", "example.org"), "d:2": ("", "")}

    def test_function_in_filter_comparison(self, triples):
        out = _run(triples, """
SELECT ?s WHERE { ?s osmt:name ?n . FILTER (STRLEN(?n) > 4) }""")
        assert [r.s for r in out.collect()] == ["osmnode:10"]  # 'alpha'
        out2 = _run(triples, """
SELECT ?s WHERE { ?s osmt:name ?n . FILTER (UCASE(?n) = 'BETA') }""")
        assert [r.s for r in out2.collect()] == ["osmnode:11"]

    def test_lcase_of_iri_and_nested(self, triples):
        out = _run(triples, """
SELECT ?s ?x WHERE {
  ?s osmt:name ?n .
  BIND (LCASE(CONCAT('N:', UCASE(?n))) AS ?x)
}""")
        got = {r.s: r.x for r in out.collect()}
        assert got == {"osmnode:10": "n:alpha", "osmnode:11": "n:beta"}


class TestLanguageTaggedLiterals:
    @pytest.fixture(scope="class")
    def lang_triples(self, spark):
        return spark.createDataFrame(
            [("x:1", "p:label", '"Vienna"@en'),
             ("x:1", "p:label", '"Wien"@de'),
             ("x:1", "p:pop", '"1900000"^^xsd:integer'),
             ("x:1", "p:note", '"plain"')],
            "s string, p string, o string",
        )

    def test_lang_and_str_strip_tag(self, lang_triples):
        out = sparql.SparqlEngine(lang_triples).select("""
SELECT ?l ?tag ?lex WHERE {
  x:1 p:label ?l .
  BIND (LANG(?l) AS ?tag)
  BIND (STR(?l) AS ?lex)
}""")
        got = {r.tag: (r.l, r.lex) for r in out.collect()}
        assert got == {"en": ('"Vienna"@en', "Vienna"),
                       "de": ('"Wien"@de', "Wien")}

    def test_lang_empty_for_untagged(self, lang_triples):
        out = sparql.SparqlEngine(lang_triples).select("""
SELECT ?tag WHERE { x:1 p:note ?n . BIND (LANG(?n) AS ?tag) }""")
        assert [r.tag for r in out.collect()] == [""]

    def test_filter_by_lang(self, lang_triples):
        out = sparql.SparqlEngine(lang_triples).select("""
SELECT ?l WHERE { x:1 p:label ?l . FILTER (LANG(?l) = 'de') }""")
        assert [r.l for r in out.collect()] == ['"Wien"@de']

    def test_datatype(self, lang_triples):
        out = sparql.SparqlEngine(lang_triples).select("""
SELECT ?p ?dt WHERE { x:1 ?p ?o . BIND (DATATYPE(?o) AS ?dt) }""")
        got = {(r.p, r.dt) for r in out.collect()}
        assert got == {("p:label", "rdf:langString"),
                       ("p:pop", "xsd:integer"),
                       ("p:note", "xsd:string")}

    def test_strlang_strdt_and_lang_literal_terms(self, lang_triples):
        eng = sparql.SparqlEngine(lang_triples)
        out = eng.select("""
SELECT ?x ?y WHERE {
  x:1 p:note ?n .
  BIND (STRLANG(STR(?n), 'fr') AS ?x)
  BIND (STRDT('5', xsd:integer) AS ?y)
}""")
        r = out.collect()[0]
        assert r.x == '"plain"@fr' and r.y == '"5"^^xsd:integer'
        # language-tagged literal as a query TERM matches by surface form
        out2 = eng.select("SELECT ?s WHERE { ?s p:label 'Wien'@de . }")
        assert [r.s for r in out2.collect()] == ["x:1"]


class TestRound5AdviceFixes:
    """MINUS §8.3.3 unbound-var compatibility + function calls on the
    left of IN/NOT IN."""

    def test_minus_unbound_shared_var_removes(self, triples):
        # left: rels with OPTIONAL loc (?l NULL for rel2/rel3); right:
        # member locations binding (?rel, ?l). rel2's left ?l is
        # unbound -> per spec still COMPATIBLE with the right solution
        # (rel2, l=Point(3 3)) because compatibility only constrains
        # mutually bound vars and dom-intersection {rel} is non-empty,
        # so rel2 must be removed (a null-rejecting equi-join would
        # keep it).
        out = _run(triples, """
SELECT ?rel WHERE {
  ?rel osmm:type 'r' .
  OPTIONAL { ?rel osmm:loc ?l }
  MINUS { ?rel osmm:has ?m . ?m osmm:loc ?l }
}""")
        assert sorted(r.rel for r in out.collect()) == ["osmrel:1", "osmrel:3"]

    def test_filter_fn_call_in_list(self, triples):
        # function call on the left of IN compares lexical values
        out = _run(triples, """
SELECT ?s WHERE {
  ?s osmt:name ?n .
  FILTER (UCASE(?n) IN ("ALPHA", "GAMMA"))
}""")
        assert [r.s for r in out.collect()] == ["osmnode:10"]

    def test_filter_fn_call_not_in_list(self, triples):
        out = _run(triples, """
SELECT ?s WHERE {
  ?s osmt:name ?n .
  FILTER (STRLEN(?n) NOT IN ("5"))
}""")
        # beta has 4 chars; alpha has 5
        assert [r.s for r in out.collect()] == ["osmnode:11"]

    def test_filter_var_in_var_list(self, triples):
        # a Var on the right side of IN compares against the column
        out = _run(triples, """
SELECT ?a ?b WHERE {
  ?a osmt:name ?n .
  ?b osmt:name ?n2 .
  FILTER (?n IN (?n2))
  FILTER (?a != ?b)
}""")
        assert out.count() == 0


class TestNegatedPropertySets:
    """SPARQL 1.1 §9.1 negated property sets: !iri, !(a|b), !^iri."""

    def test_single_negated_predicate(self, triples):
        out = _run(triples, "SELECT ?s ?o WHERE { ?s !osmm:type ?o }")
        assert out.count() == 11  # 16 triples - 5 osmm:type

    def test_negated_set(self, triples):
        out = _run(triples, """
SELECT ?s ?o WHERE { ?s !(osmm:type|osmm:loc|osmm:has|osmt:name) ?o }""")
        got = sorted((r.s, r.o) for r in out.collect())
        assert got == [("osmd:Q103", '"highway"'), ("osmd:Q104", '"building"'),
                       ("osmd:Q105", '"landuse"')]

    def test_negated_inverse_member(self, triples):
        # !(^p): ONLY reversed edges, predicate != p
        out = _run(triples, "SELECT ?x ?y WHERE { ?x !(^osmm:type) ?y }")
        got = {(r.x, r.y) for r in out.collect()}
        assert ('"alpha"', "osmnode:10") in got  # reversed osmt:name
        assert out.count() == 11
        # forward pairs must NOT appear
        assert ("osmnode:10", '"alpha"') not in got

    def test_negated_mixed_directions(self, triples):
        out = _run(triples, """
SELECT ?x ?y WHERE { ?x !(osmm:type|^osmm:type) ?y }""")
        assert out.count() == 22  # 11 forward + 11 reversed

    def test_negated_in_sequence_path(self, triples):
        # rel --has--> member --(anything but type)--> value
        out = _run(triples, """
SELECT ?rel ?v WHERE { ?rel osmm:has/!osmm:type ?v }""")
        got = sorted((r.rel, r.v) for r in out.collect())
        assert got == [
            ("osmrel:1", '"Point(2 2)"^^geo:wktLiteral'),  # node10 loc
            ("osmrel:1", '"alpha"'),                        # node10 name
            ("osmrel:2", '"Point(3 3)"^^geo:wktLiteral'),  # way12 loc
            ("osmrel:2", '"beta"'),                         # node11 name
        ]


class TestGraphClause:
    """GRAPH <iri> / GRAPH ?var over a quads (s, p, o, g) store."""

    @pytest.fixture(scope="class")
    def quads(self, spark):
        rows = [
            ("x:1", "p:t", '"a"', "g:1"),
            ("x:2", "p:t", '"b"', "g:2"),
            ("x:1", "p:u", '"c"', "g:2"),
            ("x:1", "p:t", '"a"', "g:2"),  # same triple in two graphs
        ]
        return spark.createDataFrame(
            rows, "s string, p string, o string, g string")

    def test_default_graph_is_distinct_union(self, quads):
        out = sparql.SparqlEngine(quads).select(
            "SELECT ?s ?o WHERE { ?s p:t ?o }")
        assert sorted((r.s, r.o) for r in out.collect()) == [
            ("x:1", '"a"'), ("x:2", '"b"')]

    def test_graph_iri_restricts(self, quads):
        out = sparql.SparqlEngine(quads).select(
            "SELECT ?s WHERE { GRAPH g:1 { ?s p:t ?o } }")
        assert [r.s for r in out.collect()] == ["x:1"]

    def test_graph_var_binds(self, quads):
        out = sparql.SparqlEngine(quads).select(
            "SELECT ?g ?s WHERE { GRAPH ?g { ?s p:t ?o } }")
        got = sorted((r.g, r.s) for r in out.collect())
        assert got == [("g:1", "x:1"), ("g:2", "x:1"), ("g:2", "x:2")]

    def test_graph_var_joins_outer_pattern(self, quads):
        out = sparql.SparqlEngine(quads).select("""
SELECT ?g WHERE { ?s p:u ?c . GRAPH ?g { ?s p:t ?o } }""")
        assert sorted(r.g for r in out.collect()) == ["g:1", "g:2"]

    def test_graph_without_quads_fails_loud(self, triples):
        with pytest.raises(ValueError, match="quads"):
            _run(triples, "SELECT ?s WHERE { GRAPH ?g { ?s ?p ?o } }")

    def test_graph_iri_nested_in_graph_var(self, quads):
        # the inner fixed IRI pins the scanned graph (never the full
        # quads store), while ?g still ranges over every named graph
        # because the inner pattern is independent of the active graph
        out = sparql.SparqlEngine(quads).select(
            "SELECT ?g ?s WHERE { GRAPH ?g { GRAPH g:1 { ?s p:t ?o } } }")
        got = sorted((r.g, r.s) for r in out.collect())
        # x:2 only exists in g:2 — must NOT leak through the g:1 scan
        assert got == [("g:1", "x:1"), ("g:2", "x:1")]

    def test_graph_var_same_as_pattern_var(self, quads):
        # repeated var across positions: g must equal o's binding —
        # no row has o == g here
        out = sparql.SparqlEngine(quads).select(
            "SELECT ?g WHERE { GRAPH ?g { ?s p:t ?g } }")
        assert out.count() == 0


class TestService:
    """SPARQL 1.1 Federated Query (SERVICE) — the endpoint registry
    maps IRIs to other datasets; transport is out of scope."""

    @pytest.fixture()
    def fed(self, spark, triples):
        remote = spark.createDataFrame(
            [
                ("osmd:Q103", "wdt:pop", '"100"'),
                ("osmd:Q104", "wdt:pop", '"200"'),
                ("osmd:Q999", "wdt:pop", '"300"'),
            ],
            "s string, p string, o string",
        )
        return sparql.SparqlEngine(
            triples, endpoints={"http://remote/sparql": remote}
        )

    def test_service_joins_remote_bindings(self, fed):
        out = fed.select("""
SELECT ?item ?key ?pop WHERE {
  ?item osmdt:P16 ?key .
  SERVICE <http://remote/sparql> { ?item wdt:pop ?pop . }
}""").collect()
        got = {(r["key"], r["pop"]) for r in out}
        # Q105/Q999 drop: present on only one side of the federation
        assert got == {('"highway"', '"100"'), ('"building"', '"200"')}

    def test_service_silent_unknown_endpoint(self, fed):
        out = fed.select("""
SELECT ?key WHERE {
  osmd:Q103 osmdt:P16 ?key .
  SERVICE SILENT <http://gone/sparql> { ?x wdt:nope ?y . }
}""").collect()
        # SILENT failure = single empty solution: outer rows survive
        assert [r["key"] for r in out] == ['"highway"']

    def test_service_unknown_endpoint_raises(self, fed):
        with pytest.raises(ValueError, match="unknown SERVICE endpoint"):
            fed.select(
                "SELECT ?x WHERE { SERVICE <http://gone/> { ?x ?p ?o . } }"
            ).collect()

    def test_service_variable_endpoint_refused(self, fed):
        with pytest.raises(ValueError, match="variable endpoint"):
            fed.select(
                "SELECT ?x WHERE { SERVICE ?ep { ?x ?p ?o . } }"
            ).collect()

"""LUBM golden-answer suite (crux-test/test/crux/lubm_test.clj, data +
expected answers from crux-test/test/lubm/): University0_0 + univ-bench
ontology loaded through the N-Triples pivot path, all 14 queries ported to
the Datalog surface with the reference's asserted results.

Class-hierarchy reasoning (`sub-class-of?`) is expressed per-root as a
recursive rule grounded in `identity`-bindings — the same shape the
reference uses for `person?` in its query 5 (lubm_test.clj:121-137); the
reference's two-var `(= type root-type)` base case needs top-down arg
flow, which the bottom-up fixpoint replaces with root specialization.
"""

import os

import pytest

from crux_spark import Catalog
from crux_spark.datalog import q
from crux_spark.sources.loaders import pivot_triples, read_ntriples

LUBM_DIR = "/root/reference/crux-test/test/lubm"
UB = "http://swat.cse.lehigh.edu/onto/univ-bench.owl#"
D0 = "http://www.Department0.University0.edu"
U0 = "http://www.University0.edu"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(LUBM_DIR), reason="reference LUBM fixtures not present"
)


def subclass_rules(name: str, *root_iris: str) -> list:
    """Recursive class-hierarchy rule specialized to given roots."""
    rules = [
        [[name, "?t"], [["identity", iri], "?t"]] for iri in root_iris
    ]
    rules.append(
        [[name, "?t"], ["?t", ":subClassOf", "?s"], [name, "?s"]]
    )
    return rules


def type_or(var: str, *classes: str) -> list:
    return ["or", *[[var, ":type", UB + c] for c in classes]]


@pytest.fixture(scope="module")
def lubm(spark):
    tri = read_ntriples(spark, f"{LUBM_DIR}/univ-bench.ntriples").unionByName(
        read_ntriples(spark, f"{LUBM_DIR}/University0_0.ntriples")
    )
    wide = pivot_triples(tri).localCheckpoint()
    cat = Catalog(spark)
    cat.add_documents("entities", wide, id_col="_id")
    return cat


def ids(df):
    return {r[0] for r in df.collect()}


def test_lubm_q1(lubm):
    res = q(
        lubm,
        {
            "find": ["?x"],
            "where": [
                ["?x", ":type", UB + "GraduateStudent"],
                ["?x", ":takesCourse", D0 + "/GraduateCourse0"],
            ],
        },
    )
    assert ids(res) == {
        f"{D0}/GraduateStudent{n}" for n in (101, 124, 142, 44)
    }


def test_lubm_q2_triangular_empty(lubm):
    res = q(
        lubm,
        {
            "find": ["?x", "?y", "?z"],
            "where": [
                ["?x", ":type", UB + "GraduateStudent"],
                ["?y", ":type", UB + "University"],
                ["?z", ":type", UB + "Department"],
                ["?x", ":memberOf", "?z"],
                ["?z", ":subOrganizationOf", "?y"],
                ["?x", ":undergraduateDegreeFrom", "?y"],
            ],
        },
    )
    assert res.count() == 0


def test_lubm_q3_publication_hierarchy(lubm):
    res = q(
        lubm,
        {
            "find": ["?x"],
            "rules": subclass_rules("pub-class", UB + "Publication"),
            "where": [
                ["?x", ":type", "?t"],
                ["pub-class", "?t"],
                ["?x", ":publicationAuthor", D0 + "/AssistantProfessor0"],
            ],
        },
    )
    assert ids(res) == {
        f"{D0}/AssistantProfessor0/Publication{n}" for n in range(6)
    }


def test_lubm_q4_professor_hierarchy(lubm):
    res = q(
        lubm,
        {
            "find": ["?x", "?y1", "?y2", "?y3"],
            "rules": subclass_rules("prof-class", UB + "Professor"),
            "where": [
                ["?x", ":type", "?t"],
                ["prof-class", "?t"],
                ["?x", ":worksFor", D0],
                ["?x", ":name", "?y1"],
                ["?x", ":emailAddress", "?y2"],
                ["?x", ":telephone", "?y3"],
            ],
        },
    )
    assert res.count() == 34


def test_lubm_q5_person_hierarchy(lubm):
    res = q(
        lubm,
        {
            "find": ["?x"],
            "rules": subclass_rules(
                "person-class", UB + "Person", UB + "Student", UB + "Employee"
            ),
            "where": [
                ["?x", ":type", "?t"],
                ["person-class", "?t"],
                ["or", ["?x", ":memberOf", D0], ["?x", ":worksFor", D0]],
            ],
        },
    )
    assert res.count() == 719


def test_lubm_q6_students(lubm):
    res = q(
        lubm,
        {
            "find": ["?x"],
            "where": [
                type_or("?x", "Student", "UndergraduateStudent", "GraduateStudent")
            ],
        },
    )
    assert res.count() == 678


def test_lubm_q7_courses_taught(lubm):
    res = q(
        lubm,
        {
            "find": ["?x", "?y"],
            "where": [
                type_or("?x", "Student", "UndergraduateStudent", "GraduateStudent"),
                type_or("?y", "Course", "GraduateCourse"),
                ["?x", ":takesCourse", "?y"],
                [D0 + "/AssociateProfessor0", ":teacherOf", "?y"],
            ],
        },
    )
    assert res.count() == 67


def test_lubm_q8_department_members(lubm):
    res = q(
        lubm,
        {
            "find": ["?x", "?y", "?z"],
            "where": [
                type_or("?x", "Student", "UndergraduateStudent", "GraduateStudent"),
                ["?y", ":type", UB + "Department"],
                ["?x", ":memberOf", "?y"],
                ["?y", ":subOrganizationOf", U0],
                ["?x", ":emailAddress", "?z"],
            ],
        },
    )
    assert res.count() == 678


def test_lubm_q9_advisor_triangle(lubm):
    res = q(
        lubm,
        {
            "find": ["?x", "?y", "?z"],
            "where": [
                type_or("?x", "Student", "UndergraduateStudent", "GraduateStudent"),
                type_or(
                    "?y",
                    "Faculty",
                    "PostDoc",
                    "Lecturer",
                    "Professor",
                    "AssistantProfessor",
                    "AssociateProfessor",
                    "Chair",
                    "Dean",
                    "FullProfessor",
                    "VisitingProfessor",
                ),
                type_or("?z", "Course", "GraduateCourse"),
                ["?x", ":advisor", "?y"],
                ["?y", ":teacherOf", "?z"],
                ["?x", ":takesCourse", "?z"],
            ],
        },
    )
    assert res.count() == 13


def test_lubm_q10_graduate_course_takers(lubm):
    res = q(
        lubm,
        {
            "find": ["?x"],
            "where": [
                type_or("?x", "Student", "UndergraduateStudent", "GraduateStudent"),
                ["?x", ":takesCourse", D0 + "/GraduateCourse0"],
            ],
        },
    )
    assert res.count() == 4


def test_lubm_q11_research_groups(lubm):
    res = q(
        lubm,
        {
            "find": ["?x"],
            "where": [
                ["?x", ":type", UB + "ResearchGroup"],
                ["?x", ":subOrganizationOf", "?d"],
                ["?d", ":type", UB + "Department"],
                ["?d", ":subOrganizationOf", U0],
            ],
        },
    )
    assert res.count() == 10


def test_lubm_q12_full_professors(lubm):
    res = q(
        lubm,
        {
            "find": ["?x", "?y"],
            "where": [
                ["?x", ":type", UB + "FullProfessor"],
                ["?y", ":type", UB + "Department"],
                ["?x", ":worksFor", "?y"],
                ["?y", ":subOrganizationOf", U0],
            ],
        },
    )
    assert res.count() == 10


def test_lubm_q13_alumni(lubm):
    res = q(
        lubm,
        {
            "find": ["?x"],
            "where": [
                type_or(
                    "?x",
                    "Person",
                    "Employee",
                    "AdministrativeStaff",
                    "Faculty",
                    "PostDoc",
                    "Lecturer",
                    "Professor",
                    "AssistantProfessor",
                    "AssociateProfessor",
                    "Chair",
                    "Dean",
                    "FullProfessor",
                    "VisitingProfessor",
                    "Student",
                    "UndergraduateStudent",
                    "GraduateStudent",
                    "Director",
                    "TeachingAssistant",
                    "ResearchAssistant",
                ),
                [
                    "or",
                    ["?x", ":undergraduateDegreeFrom", U0],
                    ["?x", ":mastersDegreeFrom", U0],
                    ["?x", ":doctoralDegreeFrom", U0],
                ],
            ],
        },
    )
    assert ids(res) == {f"{D0}/AssistantProfessor2"}


def test_lubm_q14_undergrads(lubm):
    res = q(
        lubm,
        {"find": ["?x"], "where": [["?x", ":type", UB + "UndergraduateStudent"]]},
    )
    assert res.count() == 532


def test_dbpedia_picasso(spark):
    """dbpedia_test.clj test-can-transact-and-query-dbpedia-entities:
    real dbpedia N-Triples (multi-KB language-tagged literals, typed
    literals, IRI objects) through the loader -> pivot -> Datalog.
    This data found two loader bugs: the per-char-alternation literal
    regex StackOverflowed java.util.regex, and suffix-named pivot
    columns collided (rdf-syntax-ns#type vs schema.org type)."""
    from crux_spark import Catalog
    from crux_spark.datalog import q
    from crux_spark.sources.loaders import pivot_triples, read_ntriples

    base = "/root/reference/crux-test/test/crux"
    tri = read_ntriples(spark, f"{base}/Pablo_Picasso.ntriples").unionByName(
        read_ntriples(spark, f"{base}/Guernica_(Picasso).ntriples")
    )
    docs = pivot_triples(tri)
    c = Catalog(spark)
    c.add_documents("dbpedia", docs, id_col="_id")

    got = q(
        c,
        {
            "find": ["?e"],
            "where": [["?e", ":givenName", "Pablo"]],
        },
    ).collect()
    assert {r.e for r in got} == {"http://dbpedia.org/resource/Pablo_Picasso"}

    got = q(
        c,
        {
            "find": ["?g"],
            "where": [
                ["?p", ":givenName", "Pablo"],
                ["?g", ":author", "?p"],
            ],
        },
    ).collect()
    assert {r.g for r in got} == {
        "http://dbpedia.org/resource/Guernica_(Picasso)"
    }


def test_rdf_artists_blank_nodes(spark):
    """rdf_test.clj:8-28 test-can-parse-ntriples-into-maps: the artists
    example with a blank-node home address — 7 entities, creatorOf
    resolves through to the painting's technique, the bnode address
    carries street/city/country."""
    from pyspark.sql import functions as F

    from crux_spark.sources.loaders import read_ntriples

    tri = read_ntriples(
        spark, "/root/reference/labs/crux-rdf/test/crux/example-data-artists.nt"
    )
    assert tri.select("e").distinct().count() == 7
    by = {
        (r.e, r.a): r.v
        for r in tri.collect()
    }
    painting = by[("http://example.org/Picasso", "http://example.org/creatorOf")]
    assert painting == "http://example.org/guernica"
    assert by[(painting, "http://example.org/technique")] == "oil on canvas"
    addr = by[("http://example.org/Picasso", "http://example.org/homeAddress")]
    assert addr.startswith("_:")
    assert by[(addr, "http://example.org/street")] == "31 Art Gallery"
    assert by[(addr, "http://example.org/city")] == "Madrid"
    assert by[(addr, "http://example.org/country")] == "Spain"


def test_rdf_picasso_attribute_count(spark):
    """rdf_test.clj:30-47: the dbpedia Picasso entity carries 47
    predicates (the reference's 48 map keys include :crux.db/id)."""
    from pyspark.sql import functions as F

    from crux_spark.sources.loaders import read_ntriples

    tri = read_ntriples(
        spark, "/root/reference/crux-test/test/crux/Pablo_Picasso.ntriples"
    )
    pic = tri.filter(F.col("e") == "http://dbpedia.org/resource/Pablo_Picasso")
    assert pic.select("a").distinct().count() == 47
    given = {
        r.v
        for r in pic.filter(
            F.col("a") == "http://xmlns.com/foaf/0.1/givenName"
        ).collect()
    }
    assert given == {"Pablo"}

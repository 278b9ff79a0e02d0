"""DBpedia-style RDF ingestion into the bitemporal store
(crux-test/test/crux/dbpedia_test.clj + labs/crux-rdf rdf.clj:
language-tagged literal selection, subject-grouped docs, tx-op
ingestion, datalog over the indexed entities). The fixture data is
self-authored in the same shape as the reference's Picasso files —
no reference data files are copied."""

import datetime as dt

import pytest

from crux_spark.bitemporal.store import TxStore
from crux_spark.sources.loaders import (
    ingest_triples,
    pivot_triples,
    read_ntriples,
    select_default_language,
)

NT = """\
<http://dbpedia.org/resource/Pablo_Picasso> <http://xmlns.com/foaf/0.1/givenName> "Pablo"@en .
<http://dbpedia.org/resource/Pablo_Picasso> <http://xmlns.com/foaf/0.1/surname> "Picasso"@en .
<http://dbpedia.org/resource/Pablo_Picasso> <http://dbpedia.org/ontology/abstract> "Pablo Picasso was a Spanish painter."@en .
<http://dbpedia.org/resource/Pablo_Picasso> <http://dbpedia.org/ontology/abstract> "Pablo Picasso est un peintre espagnol."@fr .
<http://dbpedia.org/resource/Pablo_Picasso> <http://dbpedia.org/ontology/birthYear> "1881"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://dbpedia.org/resource/Guernica_(Picasso)> <http://dbpedia.org/ontology/author> <http://dbpedia.org/resource/Pablo_Picasso> .
<http://dbpedia.org/resource/Guernica_(Picasso)> <http://xmlns.com/foaf/0.1/name> "Guernica"@es .
<http://dbpedia.org/resource/Guernica_(Picasso)> <http://xmlns.com/foaf/0.1/name> "Guernica (Bild)"@de .
"""

PICASSO = "http://dbpedia.org/resource/Pablo_Picasso"
GUERNICA = "http://dbpedia.org/resource/Guernica_(Picasso)"


@pytest.fixture(scope="module")
def triples(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("dbp") / "picasso.nt"
    p.write_text(NT)
    return read_ntriples(spark, str(p)).localCheckpoint()


def test_language_tag_capture(triples):
    langs = {
        (r.v, r.lang)
        for r in triples.filter(
            triples.a == "http://dbpedia.org/ontology/abstract"
        ).collect()
    }
    assert langs == {
        ("Pablo Picasso was a Spanish painter.", "en"),
        ("Pablo Picasso est un peintre espagnol.", "fr"),
    }


def test_default_language_selection(triples):
    sel = select_default_language(triples, "en")
    # en variant wins where present
    abstracts = [
        r.v
        for r in sel.filter(
            sel.a == "http://dbpedia.org/ontology/abstract"
        ).collect()
    ]
    assert abstracts == ["Pablo Picasso was a Spanish painter."]
    # no en variant -> lexically-first language (de before es)
    names = [
        r.v
        for r in sel.filter(
            (sel.e == GUERNICA)
            & (sel.a == "http://xmlns.com/foaf/0.1/name")
        ).collect()
    ]
    assert names == ["Guernica (Bild)"]
    # untagged (typed/IRI) rows always pass
    assert sel.filter(sel.a.endswith("birthYear")).count() == 1
    assert sel.filter(sel.a.endswith("author")).count() == 1


def test_ingest_and_query_dbpedia_entities(spark, triples):
    """dbpedia_test.clj test-can-transact-and-query-dbpedia-entities:
    ingest both entities, query by foaf attr and by the author edge —
    via the store's datalog snapshot."""
    from crux_spark import Catalog
    from crux_spark.datalog import q

    store = TxStore(spark)
    ingest_triples(
        store, triples, valid_from=dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    )
    doc = store.entity(PICASSO)
    assert doc["givenName"] == "Pablo"
    assert doc["birthYear"] == 1881  # typed literal cast to long
    assert doc["abstract"] == "Pablo Picasso was a Spanish painter."

    # datalog over the indexed snapshot (the reference queries the node)
    snap = store.db()
    cat = Catalog(spark)
    wide = pivot_triples(select_default_language(triples))
    cat.add_documents("dbpedia", wide)
    res = {
        tuple(r)
        for r in q(
            cat,
            {
                "find": ["?e"],
                "where": [["?e", ":givenName", "Pablo"]],
            },
        ).collect()
    }
    assert res == {(PICASSO,)}
    res2 = {
        tuple(r)
        for r in q(
            cat,
            {
                "find": ["?g"],
                "where": [
                    ["?p", ":givenName", "Pablo"],
                    ["?g", ":author", "?p"],
                ],
            },
        ).collect()
    }
    assert res2 == {(GUERNICA,)}
    # bitemporal: the ingested docs sit at the given valid-from
    assert store.entity(PICASSO, valid_time=dt.datetime(2023, 1, 1)) is None

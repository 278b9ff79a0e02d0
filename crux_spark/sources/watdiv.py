"""Deterministic WatDiv-like RDF stress-corpus generator.

The reference's SPARQL breadth signal is the WatDiv bench: it loads the
generated e-commerce dataset and runs the stress-query workload,
comparing result counts across engines
(crux-bench/src/crux/bench/watdiv_crux.clj:22-27).

This module regenerates that SHAPE from the published schema alone: the
WatDiv paper (G. Aluç, O. Hartig, M. T. Özsu, K. Daudjee,
"Diversified Stress Testing of RDF Data Management Systems", ISWC 2014)
describes an e-commerce graph over the wsdbm vocabulary — users,
products, reviews, offers, retailers, purchases, websites, cities —
with skewed association degrees and deliberately INCOMPLETE attributes
(not every user has an age; not every product has a caption), which is
what makes star/linear/snowflake query templates selective in
interesting ways. No WatDiv code, query files, or data files are used
or vendored; entities and predicates follow the paper's public schema,
values come from a seeded PRNG so every run of a given scale is
byte-identical.

Output is an (e, a, v, v_type) triple DataFrame — the same shape
read_ntriples produces — so it feeds pivot_triples + Catalog +
sparql_to_datalog unchanged.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

WSDBM = "http://db.uwaterloo.ca/~galuc/wsdbm/"
SORG = "http://schema.org/"
FOAF = "http://xmlns.com/foaf/"
REV = "http://purl.org/stuff/rev#"
GR = "http://purl.org/goodrelations/"
OG = "http://ogp.me/ns#"
DC = "http://purl.org/dc/terms/"
GN = "http://www.geonames.org/ontology#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_GIVEN = ["alice", "bob", "carol", "dave", "erin", "frank", "grace",
          "heidi", "ivan", "judy", "mallory", "oscar", "peggy", "sybil"]
_FAMILY = ["smith", "jones", "chen", "garcia", "mueller", "tanaka",
           "okafor", "rossi", "novak", "larsen"]
_LANGS = ["en", "de", "fr", "ja", "pt"]
_RATINGS_CR = ["G", "PG", "PG-13", "R"]
_WORDS = ["quantum", "river", "garden", "silver", "rapid", "ancient",
          "bright", "cloud", "ember", "forest", "granite", "harbor",
          "island", "jade", "copper", "lunar", "meadow", "north",
          "orchid", "prairie"]


def _skew(rng: random.Random, n: int) -> int:
    """Skewed index in [0, n): quadratic bias toward low ids — the
    paper's zipfian association-degree stand-in (hubs get most edges)."""
    return int(n * rng.random() ** 2)


def watdiv_triples(n_users: int = 300, seed: int = 7) -> list[tuple]:
    """Deterministic triple list (e, a, v, v_type) at a user-count scale
    knob; all other entity counts derive from it (paper Table 2
    proportions, rounded for small scales)."""
    rng = random.Random(seed)
    n_products = max(4, n_users // 2)
    n_reviews = max(4, (3 * n_users) // 2)
    n_offers = n_users
    n_retailers = max(2, n_users // 40)
    n_websites = max(2, n_users // 10)
    n_purchases = n_users
    n_countries, n_cities = 10, 40
    n_categories, n_topics = 12, 20

    def user(i):
        return f"{WSDBM}User{i}"

    def product(i):
        return f"{WSDBM}Product{i}"

    def review(i):
        return f"{WSDBM}Review{i}"

    def offer(i):
        return f"{WSDBM}Offer{i}"

    def retailer(i):
        return f"{WSDBM}Retailer{i}"

    def website(i):
        return f"{WSDBM}Website{i}"

    def purchase(i):
        return f"{WSDBM}Purchase{i}"

    def country(i):
        return f"{WSDBM}Country{i}"

    def city(i):
        return f"{WSDBM}City{i}"

    def category(i):
        return f"{WSDBM}ProductCategory{i}"

    def topic(i):
        return f"{WSDBM}Topic{i}"

    out: list[tuple] = []

    def t(e, a, v, vt="iri"):
        out.append((e, a, v, vt))

    for i in range(n_cities):
        t(city(i), f"{GN}parentCountry", country(i % n_countries))

    for i in range(n_users):
        u = user(i)
        t(u, RDF_TYPE, f"{WSDBM}User")
        t(u, f"{WSDBM}gender", rng.choice(["male", "female"]), "string")
        t(u, f"{SORG}nationality", country(_skew(rng, n_countries)))
        t(u, f"{FOAF}givenName", rng.choice(_GIVEN), "string")
        t(u, f"{FOAF}familyName", rng.choice(_FAMILY), "string")
        if rng.random() < 0.7:  # attribute incompleteness (paper §3.1)
            t(u, f"{FOAF}age", str(rng.randint(18, 80)), "long")
        if rng.random() < 0.5:
            t(u, f"{FOAF}homepage", f"http://example.org/u{i}")
        for _ in range(rng.randint(0, 8)):
            t(u, f"{WSDBM}follows", user(_skew(rng, n_users)))
        for _ in range(rng.randint(0, 4)):
            t(u, f"{WSDBM}friendOf", user(rng.randrange(n_users)))
        for _ in range(rng.randint(0, 6)):
            t(u, f"{WSDBM}likes", product(_skew(rng, n_products)))
        for _ in range(rng.randint(0, 2)):
            t(u, f"{WSDBM}subscribes", website(rng.randrange(n_websites)))

    for i in range(n_products):
        p = product(i)
        t(p, RDF_TYPE, category(_skew(rng, n_categories)))
        t(p, f"{DC}title",
          f"{rng.choice(_WORDS)} {rng.choice(_WORDS)} {i}", "string")
        t(p, f"{SORG}language", rng.choice(_LANGS), "string")
        if rng.random() < 0.6:
            t(p, f"{SORG}caption", f"caption {rng.choice(_WORDS)}", "string")
        if rng.random() < 0.4:
            t(p, f"{SORG}description",
              f"{rng.choice(_WORDS)} {rng.choice(_WORDS)} product", "string")
        if rng.random() < 0.3:
            t(p, f"{SORG}contentRating", rng.choice(_RATINGS_CR), "string")
        for _ in range(rng.randint(0, 3)):
            t(p, f"{OG}tag", topic(_skew(rng, n_topics)))

    for i in range(n_reviews):
        r = review(i)
        p = product(_skew(rng, n_products))
        t(p, f"{REV}hasReview", r)
        t(r, f"{REV}reviewer", user(rng.randrange(n_users)))
        t(r, f"{REV}ratingValue", str(rng.randint(1, 10)), "long")
        t(r, f"{REV}text",
          f"{rng.choice(_WORDS)} review {rng.choice(_WORDS)}", "string")

    for i in range(n_offers):
        o = offer(i)
        t(retailer(rng.randrange(n_retailers)), f"{GR}offers", o)
        t(o, f"{GR}includes", product(_skew(rng, n_products)))
        t(o, f"{SORG}price", f"{rng.uniform(1, 100):.2f}", "double")
        t(o, f"{GR}validThrough",
          f"2024-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}", "string")

    for i in range(n_websites):
        w = website(i)
        t(w, f"{WSDBM}hits", str(rng.randint(10, 100000)), "long")
        t(w, f"{FOAF}homepage", f"http://example.org/site{i}")

    for i in range(n_purchases):
        pu = purchase(i)
        t(user(_skew(rng, n_users)), f"{WSDBM}makesPurchase", pu)
        t(pu, f"{WSDBM}purchaseFor", product(_skew(rng, n_products)))
        t(pu, f"{WSDBM}purchaseDate",
          f"2024-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}", "string")

    return out


def watdiv_df(spark: SparkSession, n_users: int = 300,
              seed: int = 7) -> DataFrame:
    """The generated corpus as an (e, a, v, v_type) DataFrame ready for
    pivot_triples. Generation is driver-side (the corpus is a test/bench
    fixture; a 100 TB ingest would read real ntriples via
    read_ntriples' distributed scan instead)."""
    return spark.createDataFrame(
        watdiv_triples(n_users, seed),
        "e string, a string, v string, v_type string",
    )

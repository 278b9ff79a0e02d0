"""Focused pins for the r16 optimization-round internals changes:

- ``parse_byte_size`` must accept every Spark-style size form (plain
  bytes, "128b", "128m", "64MB", "1g") — the r15 form silently disabled
  the skip-repartition optimization under human-readable configs.
- ``input_size_bytes`` must size a path through the Hadoop FileSystem
  API (cluster-safe) and agree with the local-disk walk for file:// /
  bare local paths; a missing path degrades to 0, never raises.
- ``gateway_token`` must be stable while the gateway object is alive
  (expression caches keep hitting) and must NOT alias a different
  gateway object even if CPython reuses the old object's id.
- ``TxStore._tx_id`` lazy seeding: a versions frame handed WHOLESALE to
  the public constructor must not let a subsequent ``submit_tx`` reuse
  existing tx ids (bulk_ingest no longer self-heals this with a
  post-merge max aggregate).
"""

import os

from pyspark.sql import functions as F


def test_parse_byte_size_forms():
    from crux_spark._conf import parse_byte_size

    d = 128 << 20
    assert parse_byte_size(None, d) == d
    assert parse_byte_size("134217728", d) == 134217728
    assert parse_byte_size("134217728b", d) == 134217728
    assert parse_byte_size("128m", d) == 128 << 20
    assert parse_byte_size("128MB", d) == 128 << 20
    assert parse_byte_size("64k", d) == 64 << 10
    assert parse_byte_size("1g", d) == 1 << 30
    assert parse_byte_size("2t", d) == 2 << 40
    assert parse_byte_size(" 256 m ", d) == 256 << 20
    assert parse_byte_size(134217728, d) == 134217728
    # malformed -> default, never raises
    assert parse_byte_size("lots", d) == d
    assert parse_byte_size("12.5m", d) == d
    assert parse_byte_size("", d) == d


def test_input_size_bytes_local_and_scheme(spark, tmp_path):
    from crux_spark._conf import input_size_bytes

    p = tmp_path / "data"
    p.mkdir()
    (p / "a.bin").write_bytes(b"x" * 1000)
    sub = p / "sub"
    sub.mkdir()
    (sub / "b.bin").write_bytes(b"y" * 2345)
    walk = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(p)
        for f in fs
    )
    assert walk == 3345
    # bare local path and an explicit scheme (the non-local form the
    # Hadoop FS resolves itself) must both agree with the walk
    assert input_size_bytes(spark, str(p)) == walk
    assert input_size_bytes(spark, "file://" + str(p)) == walk
    # missing path -> 0, never raises (callers floor at source splits)
    assert input_size_bytes(spark, str(p / "nope")) == 0


def test_gateway_token_stable_and_alias_proof(spark):
    from crux_spark import _jvmcache
    from crux_spark._jvmcache import gateway_token

    t1 = gateway_token()
    t2 = gateway_token()
    assert t1 == t2  # stable while the gateway lives -> caches hit

    # simulate an id()-reusing gateway swap: point the weakref at a
    # DIFFERENT object and confirm the token bumps even though the
    # id of the real gateway never changed
    class _Fake:
        pass

    fake = _Fake()
    import weakref

    old_ref, old_tok = _jvmcache._GW_REF, _jvmcache._GW_TOKEN
    try:
        _jvmcache._GW_REF = weakref.ref(fake)
        t3 = gateway_token()
        assert t3 > t2
        assert gateway_token() == t3
    finally:
        _jvmcache._GW_REF, _jvmcache._GW_TOKEN = old_ref, old_tok


def test_txstore_constructor_seeds_tx_id_lazily(spark):
    from crux_spark.bitemporal.store import TxStore

    base = TxStore(spark)
    base.submit_tx([("put", {"id": "e1", "v": 1}), ("put", {"id": "e2", "v": 2})])
    base.submit_tx([("put", {"id": "e1", "v": 3})])
    base.commit()
    versions = base.versions
    max_tx = versions.agg(F.max("tx_from")).first()[0]
    assert max_tx >= 2

    # hand the versions frame WHOLESALE to the public constructor
    st = TxStore(spark, versions=versions)
    assert not st._tx_seeded  # no aggregate ran at construction
    tx_id = st.submit_tx([("put", {"id": "e3", "v": 9})])
    # the new tx id must be strictly past every existing tx_from
    assert tx_id > max_tx
    st.commit()
    n = st.versions.where(F.col("tx_from") == tx_id).count()
    assert n >= 1
    # and the lazy seed ran (seeded flag set, counter past the max)
    assert st._tx_seeded
    assert st._tx_id >= tx_id

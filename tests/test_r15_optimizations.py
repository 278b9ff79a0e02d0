"""Focused pins for the r15 optimization-round internals changes:

- ts-suite CSV single-pass read: the declared raw schemas must equal
  what inferSchema derives from the generated files (so dropping the
  inference scan cannot change a single ingested value).
- Incremental index listeners: the lazy-checkpoint cadence and the
  handed-down ``max_tx`` watermark must leave state and results
  identical to the per-batch-eager / self-aggregated form.
- The listener dispatch helper must hand ``max_tx`` only to callables
  that can take it.
"""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/tools")


def test_ts_csv_schema_matches_inference(spark, tmp_path):
    from ts_bench import (
        _RAW_CONDITIONS,
        _RAW_DEVICE_INFO,
        _RAW_LOCATIONS,
        _RAW_READINGS,
        gen_devices_csvs,
        gen_weather_csvs,
    )

    from crux_spark.sources.loaders import read_csv_documents

    ddir = os.path.join(str(tmp_path), "dev")
    wdir = os.path.join(str(tmp_path), "wx")
    gen_devices_csvs(spark, ddir, n_devices=6, n_times=5, step_s=120)
    gen_weather_csvs(spark, wdir, n_locations=4, n_times=5, step_s=90)
    for sub, base, ddl in [
        ("device_info", ddir, _RAW_DEVICE_INFO),
        ("readings", ddir, _RAW_READINGS),
        ("locations", wdir, _RAW_LOCATIONS),
        ("conditions", wdir, _RAW_CONDITIONS),
    ]:
        path = os.path.join(base, sub)
        inferred = read_csv_documents(spark, path, id_col="device_id")
        declared = read_csv_documents(
            spark, path, id_col="device_id", schema=ddl
        )
        assert inferred.schema == declared.schema, (
            sub, inferred.schema.simpleString(), declared.schema.simpleString()
        )
        cols = sorted(inferred.columns)
        a = sorted(map(tuple, inferred.select(cols).collect()))
        b = sorted(map(tuple, declared.select(cols).collect()))
        assert a == b, sub


def _ops_batch(spark, rows):
    """rows: (eid, tx_id, op, doc_json)."""
    return spark.createDataFrame(
        [(e, t, 0, op, t, dj, None, t, None) for e, t, op, dj in rows],
        "eid string, tx_id long, seq long, op string, tx_time long, "
        "doc_json string, expected_json string, valid_from long, "
        "valid_to long",
    )


def test_vector_index_cadence_and_max_tx_identical_results(spark):
    import numpy as np

    from crux_spark.operators.similarity import IncrementalVectorIndex

    cents = np.asarray([[1.0, 0.0], [0.0, 1.0]])
    batches = [
        [("a", 1, "put", '{"embedding": [1.0, 0.1]}'),
         ("b", 2, "put", '{"embedding": [0.1, 1.0]}')],
        [("a", 3, "put", '{"embedding": [0.9, 0.2]}'),
         ("c", 4, "put", '{"embedding": [0.5, 0.5]}')],
        [("b", 5, "delete", None)],
    ]
    # eager-every-batch (the old behavior), watermark self-aggregated
    ref = IncrementalVectorIndex(spark, cents, checkpoint_every=1)
    for i, rows in enumerate(batches):
        ref.listener(i, _ops_batch(spark, rows))
    # lazy with cadence, watermark handed down
    idx = IncrementalVectorIndex(spark, cents, checkpoint_every=8)
    for i, rows in enumerate(batches):
        idx.listener(i, _ops_batch(spark, rows),
                     max_tx=max(t for _, t, _, _ in rows))
    assert idx.last_tx_id == ref.last_tx_id == 5
    want = sorted(map(tuple, ref.search([1.0, 0.0], k=3, nprobe=2).collect()))
    got = sorted(map(tuple, idx.search([1.0, 0.0], k=3, nprobe=2).collect()))
    assert got == want
    assert sorted(map(tuple, idx.cells.select("eid", "cell_id").collect())) \
        == sorted(map(tuple, ref.cells.select("eid", "cell_id").collect()))


def test_text_index_cadence_and_max_tx_identical_results(spark):
    from crux_spark.functions.text_search import IncrementalTextIndex

    batches = [
        [("d1", 1, "put", '{"text": "red fox jumps"}'),
         ("d2", 2, "put", '{"text": "red dog sleeps"}')],
        [("d1", 3, "put", '{"text": "blue fox runs"}'),
         ("d3", 4, "put", '{"text": "red red red"}')],
        [("d2", 5, "delete", None)],
    ]
    ref = IncrementalTextIndex(spark, checkpoint_every=1)
    for i, rows in enumerate(batches):
        ref.listener(i, _ops_batch(spark, rows))
    idx = IncrementalTextIndex(spark, checkpoint_every=8)
    for i, rows in enumerate(batches):
        idx.listener(i, _ops_batch(spark, rows),
                     max_tx=max(t for _, t, _, _ in rows))
    assert idx.last_tx_id == ref.last_tx_id == 5
    cols = ["term", "eid", "tf"]
    assert sorted(map(tuple, idx.postings.select(cols).collect())) \
        == sorted(map(tuple, ref.postings.select(cols).collect()))


def test_call_listener_signature_dispatch(spark):
    from crux_spark.bitemporal.store import _call_listener

    seen = []

    def plain(epoch, batch):
        seen.append(("plain", epoch))

    def with_max(epoch, batch, max_tx=None):
        seen.append(("with_max", epoch, max_tx))

    df = spark.range(1)
    _call_listener(plain, 1, df, 42)
    _call_listener(with_max, 2, df, 42)
    _call_listener(with_max, 3, df, None)
    assert seen == [("plain", 1), ("with_max", 2, 42), ("with_max", 3, None)]


def test_commit_hands_max_tx_to_index_listeners(spark):
    from crux_spark.bitemporal.store import TxStore

    store = TxStore(spark)
    calls = []

    def listener(epoch, batch, max_tx=None):
        calls.append(max_tx)

    store.index_listeners.append(listener)
    t1 = store.submit_tx([("put", {"id": "e1", "v": 1})])
    t2 = store.submit_tx([("put", {"id": "e2", "v": 2})])
    store.commit()
    assert calls == [max(t1, t2)]
    # an aborted trailing match tx must not advance the handed-down max
    t3 = store.submit_tx([("put", {"id": "e3", "v": 3})])
    t4 = store.submit_tx(
        [("match", "e1", {"id": "e1", "v": 999}),
         ("put", {"id": "e1", "v": 10})]
    )
    aborted = store.commit()
    assert t4 in aborted
    assert calls[-1] == t3

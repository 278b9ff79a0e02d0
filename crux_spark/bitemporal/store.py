"""Distributed bitemporal document store.

The reference's write path (SURVEY.md §3.4): submit-tx appends events to a
totally-ordered log; every node's ingester indexes each tx serially
(tx.clj:424-479). The Spark recast keeps the *serial-per-entity* part —
which is all the splice algebra needs — and distributes across entities:

    tx batch (ordered ops)  ──┐
    versions table (by eid) ──┴─ cogroup on eid ─ applyInPandas(splice) ─ new versions

Per-entity histories are small; entities shard across executors. At 100 TB
the versions table is partitioned/bucketed by eid so the cogroup is a
single co-located shuffle, and a tx batch touches only the entities it
writes (join-pruned).

Match/CAS atomicity across entities is two-phase: a distributed evaluation
pass computes per-tx match verdicts (only tx_ids come back to the driver),
aborted txs are excluded, then the apply pass runs. Iterated to fixpoint
because an abort can change a later tx's match input (rare; capped).

Transaction functions (tx.clj:178-227) run on the driver at submit time via
a registered deterministic Python fn that returns ops — the analogue of the
serial tx-fn evaluation in the reference's single-threaded ingester.
"""

from __future__ import annotations

import datetime as dt
import functools
import hashlib
import json
import logging
import os
import threading
from typing import Any, Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crux_spark.bitemporal import docjson as _docjson
from crux_spark.bitemporal import splice
from crux_spark.bitemporal.splice import END_OF_TIME, END_OF_TX, Version, to_us

# SQL table-registry attribute (the reference's Calcite schema docs,
# crux-sql/src/crux/calcite.clj:459-466). Registry docs are TRACKED AT
# WRITE TIME (r9 verdict: sql.register_tables full-scanned doc_json per
# registration — a contains() on a wide string column prunes nothing at
# 100 TB): the attribute is a known key at put time, so the store keeps
# the tiny eid side-set incrementally and register_tables reads the
# registry through a pushed-down eid IN-filter instead.
SCHEMA_DOC_ATTR = "crux.sql.table/name"
_SCHEMA_NEEDLE = f'"{SCHEMA_DOC_ATTR}"'


def _call_listener(fn: Callable, epoch: int, batch: DataFrame,
                   max_tx: int | None) -> Any:
    """Invoke an indexed-tx listener, handing down the batch's max tx id
    when the callable can take it (saves watermark-keeping indexes a full
    extra aggregate pass over the batch). Arbitrary two-arg listeners are
    still called with the original (epoch, batch) signature — feature
    detection via the signature, NOT try/except TypeError, so a TypeError
    raised INSIDE a listener is never masked by a silent re-call."""
    import inspect

    if max_tx is not None:
        try:
            params = inspect.signature(fn).parameters
            if "max_tx" in params or any(
                p.kind == p.VAR_KEYWORD for p in params.values()
            ):
                return fn(epoch, batch, max_tx=max_tx)
        except (TypeError, ValueError):
            pass
    return fn(epoch, batch)

VERSIONS_SCHEMA = T.StructType(
    [
        T.StructField("eid", T.StringType(), False),
        T.StructField("valid_from", T.LongType(), False),  # micros
        T.StructField("valid_to", T.LongType(), False),
        T.StructField("tx_from", T.LongType(), False),
        T.StructField("tx_to", T.LongType(), False),
        T.StructField("tx_time", T.LongType(), False),
        T.StructField("doc_json", T.StringType(), True),
        T.StructField("deleted", T.BooleanType(), False),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("asserted", T.BooleanType(), False),
        T.StructField("origin_tx", T.LongType(), False),
        # hash back-computed from a hash-less (pre-typed-upgrade) WAL
        # row — the only rows where match may use the legacy-hash
        # fallback (splice.matches). Nullable: rows from checkpoints
        # written before this column default to True (tolerant — the
        # fallback's original r12/r13 purpose) on load.
        T.StructField("legacy_hash", T.BooleanType(), True),
    ]
)

OPS_SCHEMA = T.StructType(
    [
        T.StructField("eid", T.StringType(), False),
        T.StructField("tx_id", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("tx_time", T.LongType(), False),
        T.StructField("doc_json", T.StringType(), True),
        T.StructField("expected_json", T.StringType(), True),
        # submit-time content hashes: the log's immutable identity for
        # doc / expected (the reference's content-addressed tx-events) —
        # evict redaction rewrites the *_json bodies but never these, so
        # replayed match verdicts are stable. Null on legacy WAL rows
        # (replay falls back to hashing the json bodies).
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("expected_hash", T.StringType(), True),
        T.StructField("valid_from", T.LongType(), True),
        T.StructField("valid_to", T.LongType(), True),
    ]
)

MATCH_SCHEMA = T.StructType(
    [
        T.StructField("tx_id", T.LongType(), False),
        T.StructField("ok", T.BooleanType(), False),
    ]
)


def _row_to_version(r) -> Version:
    return Version(
        valid_from=int(r.valid_from),
        valid_to=int(r.valid_to),
        tx_from=int(r.tx_from),
        tx_to=int(r.tx_to),
        tx_time=int(r.tx_time),
        doc_json=r.doc_json if isinstance(r.doc_json, str) else None,
        deleted=bool(r.deleted),
        content_hash=r.content_hash if isinstance(r.content_hash, str) else None,
        asserted=bool(r.asserted),
        origin_tx=int(getattr(r, "origin_tx", 0) or 0),
        legacy_hash=_tolerant_bool(getattr(r, "legacy_hash", None)),
    )


def _tolerant_bool(v) -> bool:
    """Missing/NULL/NaN (pre-column state rows of unknown provenance)
    reads as True — the tolerant legacy-fallback default; real booleans
    pass through."""
    if v is None or (isinstance(v, float) and v != v):
        return True
    return bool(v)


def _history_cols(eid: str, history: list[Version]) -> dict[str, list]:
    return {
        "eid": [eid] * len(history),
        "valid_from": [v.valid_from for v in history],
        "valid_to": [v.valid_to for v in history],
        "tx_from": [v.tx_from for v in history],
        "tx_to": [v.tx_to for v in history],
        "tx_time": [v.tx_time for v in history],
        "doc_json": [v.doc_json for v in history],
        "deleted": [v.deleted for v in history],
        "content_hash": [v.content_hash for v in history],
        "asserted": [v.asserted for v in history],
        "origin_tx": [v.origin_tx for v in history],
        "legacy_hash": [v.legacy_hash for v in history],
    }


def _bucketed_cogroup(
    versions: DataFrame, ops_df: DataFrame, per_eid, out_schema, nbuckets: int
):
    """Cogroup versions and ops on a HASH BUCKET of eid (not eid itself)
    and loop entities inside each bucket in plain python.

    Rationale: pyspark's cogrouped applyInPandas pays per-GROUP Arrow +
    Python-call overhead; with one group per entity that overhead is
    ~10x the splice work itself (measured: 1,500 per-eid groups = 11.4s
    vs 32 buckets = 1.1s on the same 20k ops). Bucketing keeps the
    shuffle key stable (hash(eid) pmod N — co-partitioned with a
    bucketed-by-eid versions layout at scale). Inside a bucket, ONE
    pandas sort + itertuples pass builds per-entity op/history lists —
    no per-entity DataFrame slicing, which measured as the next 2x.

    ``per_eid(eid, history_list, op_rows)`` returns a dict-of-lists in
    out_schema's columns; op_rows arrive sorted by (tx_id, seq)."""
    b = F.pmod(F.hash("eid"), F.lit(nbuckets))

    def bucket_fn(key, vpdf: pd.DataFrame, opdf: pd.DataFrame) -> pd.DataFrame:
        hist_by: dict[str, list[Version]] = {}
        for r in vpdf.itertuples():
            hist_by.setdefault(r.eid, []).append(_row_to_version(r))
        ops_by: dict[str, list] = {}
        if len(opdf):
            for r in opdf.sort_values(["eid", "tx_id", "seq"]).itertuples():
                ops_by.setdefault(r.eid, []).append(r)
        cols: dict[str, list] = {f.name: [] for f in out_schema.fields}
        for eid in sorted(set(hist_by) | set(ops_by)):
            out = per_eid(eid, hist_by.get(eid, []), ops_by.get(eid, []))
            for k, v in out.items():
                cols[k].extend(v)
        return pd.DataFrame(cols)

    return (
        versions.withColumn("__b", b)
        .groupBy("__b")
        .cogroup(ops_df.withColumn("__b", b).groupBy("__b"))
        .applyInPandas(bucket_fn, out_schema)
    )


def _bulk_put_versions(ops: DataFrame) -> DataFrame:
    """Closed-form version rows for a fresh-entity, strictly-ordered,
    unranged put stream (bulk_ingest's fast path). Per entity with puts
    at v_1 < ... < v_n (tx t_1 < ... < t_n), the per-op splice yields
    exactly:

      i < n:  ([v_i, inf)  tx [t_i, t_{i+1})  asserted)     — closed
              ([v_i, v_{i+1})  tx [t_{i+1}, inf)  unasserted) — remainder
      i = n:  ([v_n, inf)  tx [t_n, inf)  asserted)          — active

    with tx_time/origin_tx/doc/content-hash all from op i. Two lead()
    windows + a vectorized doc-normalization UDF (stored doc_json is the
    sorted-keys Python re-dump and content_hash its sha1, byte-identical
    to splice.py's) — no per-op Python splice, which is O(n^2) in an
    entity's version count."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<doc_json:string, content_hash:string>")
    def norm(doc: pd.Series) -> pd.DataFrame:
        import hashlib

        outs, hs = [], []
        for s in doc:
            d = json.dumps(json.loads(s), sort_keys=True, default=str)
            outs.append(d)
            hs.append(hashlib.sha1(d.encode()).hexdigest())
        return pd.DataFrame({"doc_json": outs, "content_hash": hs})

    # Hash/provenance parity with the per-op splice (splice.py:203-218):
    # an explicitly-passed submit-time hash (a content_hash column, the
    # WAL's immutable identity — stable across evict redaction) wins
    # over recomputation, and a NULL cell marks the hash as BACK-
    # COMPUTED (legacy_hash=True -> tolerant CAS fallback). When the
    # column is ABSENT the caller asserts the docs are born typed and
    # canonical at ingest (bulk_ingest builds doc_json itself), so the
    # computed hash IS the submit-time hash: legacy_hash=False.
    has_hash_col = "content_hash" in ops.columns
    w = Window.partitionBy("eid").orderBy("tx_id", "seq")
    base = ops.select(
        "eid", "tx_id", "tx_time", "valid_from",
        norm(F.col("doc_json")).alias("__n"),
        (F.col("content_hash") if has_hash_col
         else F.lit(None).cast("string")).alias("__ch"),
        F.lead("tx_id").over(w).alias("__nt"),
        F.lead("valid_from").over(w).alias("__nv"),
    )
    chash = F.coalesce(F.col("__ch"), F.col("__n.content_hash"))
    legacy = F.col("__ch").isNull() if has_hash_col else F.lit(False)

    # ONE pass (r15 optimization): the asserted row and the remainder row
    # derive from the same base projection — as a union of two selects,
    # Catalyst executed the scan + eid-window + norm UDF once per BRANCH
    # (two shuffles, two ArrowEvalPython nodes over the full ops).
    # Emitting both rows per input row with an inline explode keeps a
    # single window shuffle and a single UDF evaluation; row content is
    # identical (versions is an unordered relation downstream).
    def _ver(valid_to, tx_from, tx_to, is_asserted):
        return F.struct(
            F.col("valid_from").alias("valid_from"),
            valid_to.alias("valid_to"),
            tx_from.alias("tx_from"),
            tx_to.alias("tx_to"),
            F.col("tx_time").alias("tx_time"),
            F.col("__n.doc_json").alias("doc_json"),
            F.lit(False).alias("deleted"),
            chash.alias("content_hash"),
            F.lit(is_asserted).alias("asserted"),
            F.col("tx_id").alias("origin_tx"),
            legacy.alias("legacy_hash"),
        )

    asserted = _ver(
        F.lit(END_OF_TIME),
        F.col("tx_id"),
        F.coalesce("__nt", F.lit(END_OF_TX)),
        True,
    )
    remainder = _ver(
        F.col("__nv"), F.col("__nt"), F.lit(END_OF_TX), False
    )
    return base.select(
        "eid",
        F.explode(
            F.when(
                F.col("__nt").isNotNull(), F.array(asserted, remainder)
            ).otherwise(F.array(asserted))
        ).alias("__v"),
    ).select("eid", "__v.*")


def _apply_ops(history: list[Version], op_rows: list, aborted: set[int]):
    """Apply op rows (pre-sorted by tx_id, seq) to one entity's history;
    returns (new_history, [(tx_id, match_ok)])."""
    verdicts = []
    for r in op_rows:
        if int(r.tx_id) in aborted:
            continue
        op = r.op
        vf = None if pd.isna(r.valid_from) else int(r.valid_from)
        vt = None if pd.isna(r.valid_to) else int(r.valid_to)
        if op == "put":
            stored_hash = getattr(r, "content_hash", None)
            if not isinstance(stored_hash, str):
                stored_hash = None  # legacy rows / NaN from pandas
            history = splice.put(
                history, json.loads(r.doc_json), int(r.tx_id), int(r.tx_time),
                vf, vt, chash=stored_hash,
            )
        elif op == "delete":
            history = splice.delete(history, int(r.tx_id), int(r.tx_time), vf, vt)
        elif op == "evict":
            history = splice.evict(history)
        elif op == "match":
            expected = None if r.expected_json is None or (
                not isinstance(r.expected_json, str)
            ) else json.loads(r.expected_json)
            expected_hash = getattr(r, "expected_hash", None)
            if not isinstance(expected_hash, str):
                expected_hash = None
            at = vf if vf is not None else int(r.tx_time)
            # evaluate at tx_id (not tx_id - 1): ops are applied in
            # (tx_id, seq) order, so `history` already carries THIS tx's
            # earlier splices and the match sees the in-flight state
            # (query_test.clj:1912 "match sees interim state through the
            # transaction"); for a match with no prior in-tx ops the two
            # views are identical
            ok = splice.matches(
                history, expected, at, tx=int(r.tx_id),
                expected_hash=expected_hash,
            )
            verdicts.append((int(r.tx_id), ok))
        else:
            raise ValueError(f"unknown op {op!r}")
    return history, verdicts



# Bound on the driver-side tx→eid map used to parallelize match-abort
# finalization across independent entity groups (collected once per
# match-carrying batch; ~50 B/pair → a few MB at the cap).
_MAX_TX_EID_PAIRS = 200_000


def _is_evict_tombstone(doc_json: str) -> bool:
    """True iff the json body IS a compact_wal evict tombstone — checked
    structurally (exact tombstone shape), not by substring, so a user doc
    that merely CONTAINS a "crux.db/evicted" key is still redacted by a
    later evict (retention would otherwise silently skip it)."""
    try:
        d = json.loads(doc_json)
    except ValueError:
        return False
    return (
        isinstance(d, dict)
        and d.get("crux.db/evicted") is True
        and set(d) <= {"crux.db/evicted", "crux.db/content-hash"}
    )


def _locked(fn):
    """Serialize store mutations against checkpoint snapshots: a
    Checkpointer tick racing submit_tx/commit could otherwise record a
    versions table containing txs newer than its tx_id watermark, which
    restore_latest's WAL-tail replay would then re-apply (duplicate
    version rows). RLock: commit() may run nested under submit_tx paths."""

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        with self._mutex:
            return fn(self, *args, **kwargs)

    return wrapper


def canon_eid(x) -> str:
    """Canonical string form of an entity id. Map (and collection) ids
    hash by VALUE, independent of key order (tx_test.clj
    map-ordering-362; api_test test-can-write-entity-using-map-as-id) —
    JSON with sorted keys; scalars stringify directly."""
    if isinstance(x, (dict, list, tuple)):
        return json.dumps(x, sort_keys=True, default=str)
    return str(x)

class TxStore:
    """In-session bitemporal store over a versions DataFrame.

    ``path``-backed persistence writes parquet partitioned by eid-hash
    bucket; in-memory mode keeps a localCheckpointed DataFrame.
    """

    def __init__(
        self,
        spark: SparkSession,
        versions: DataFrame | None = None,
        wal_path: str | None = None,
        doc_store=None,
    ):
        self.spark = spark
        self.versions = versions or spark.createDataFrame([], VERSIONS_SCHEMA)
        # True only while the store PROVABLY holds zero version rows: set
        # at construction-without-versions, cleared on every write path.
        # Lets commit() route an all-fresh all-put first batch through the
        # closed-form bulk splice with NO probe job (the driver can verify
        # every other precondition from _pending itself).
        self._versions_empty = versions is None
        self._mutex = threading.RLock()  # see _locked / snapshot()
        # tx-id counter. A versions frame passed WHOLESALE to the public
        # constructor may already hold tx ids, and bulk_ingest no longer
        # runs a post-merge max(tx_from) aggregate to self-heal that
        # case (r15 advice) — so the counter is seeded LAZILY from
        # max(tx_from) on first read (one aggregate, once); every other
        # construction path (load/recover/fork/checkpoint) assigns
        # _tx_id directly, which marks it seeded with no probe.
        self._tx_id_v = 0
        self._tx_seeded = versions is None
        self._pending: list[dict] = []
        self._pending_aborted: set[int] = set()  # fn-returned-false txs
        self._tx_fns: dict[str, Callable] = {}
        # secondary-index listeners fed one committed-rows OPS_SCHEMA
        # batch per commit() (register-index! analogue; see commit())
        self.index_listeners: list[Callable] = []
        self._index_epoch: int = 0
        # eids of SQL table-registry docs (SCHEMA_DOC_ATTR). None =
        # unknown (versions arrived wholesale — load()/fork with
        # pre-existing data); schema_doc_eids() re-seeds with ONE
        # discovery scan, after which maintenance is incremental.
        self._schema_eids: set[str] | None = (
            set() if versions is None else None
        )
        self.aborted_txs: set[int] = set()
        # write-ahead log: submitted txs are appended (already fn-expanded,
        # so replay is deterministic without re-registering tx fns) before
        # they are applied — the durable totally-ordered tx-log of the
        # reference (crux-core/src/crux/kv/tx_log.clj). Transport is
        # pluggable (txlog.py): a plain path = JSONL file/object-store
        # key; 'sqlite:<path>' = the crux-jdbc analogue (one tx_log SQL
        # table, jdbc.clj); or any TxLogBackend instance.
        self.wal_path = wal_path
        # content-addressed doc store (db.clj DocumentStore): same
        # pluggable-transport seam as the WAL — a plain path = JSONL
        # (S3/blob analogue), 'sqlite:<path>' = crux-jdbc analogue, or
        # any backend object. When configured, submitted docs are
        # persisted there at submit time (the reference writes docs to
        # the doc store BEFORE the tx log) and `documents()` reads it.
        self.doc_store = doc_store

    @property
    def _tx_id(self) -> int:
        if not self._tx_seeded:
            self._tx_seeded = True
            row = self.versions.agg(F.max("tx_from").alias("m")).first()
            self._tx_id_v = max(self._tx_id_v, int(row["m"] or 0))
        return self._tx_id_v

    @_tx_id.setter
    def _tx_id(self, v: int) -> None:
        self._tx_seeded = True
        self._tx_id_v = int(v)

    @property
    def doc_store(self):
        return self._doc_store_spec

    @doc_store.setter
    def doc_store(self, spec) -> None:
        from crux_spark.bitemporal.docstore import open_doc_store

        self._doc_store_spec = spec
        self._docs = open_doc_store(spec)

    @property
    def wal_path(self):
        return self._wal_spec

    @wal_path.setter
    def wal_path(self, spec) -> None:
        from crux_spark.bitemporal.txlog import open_tx_log

        self._wal_spec = spec
        self._wal = open_tx_log(spec)

    # ------------------------------------------------------------- write API

    def register_tx_fn(self, name: str, fn: Callable) -> None:
        """Store a transaction function (tx.clj:178-227): fn(db, *args) ->
        list of ops, evaluated deterministically at submit time."""
        self._tx_fns[name] = fn

    @_locked
    def submit_tx(self, ops: Iterable[Any], tx_time: dt.datetime | None = None) -> int:
        """Queue one transaction. Ops (python analogue of the EDN tx ops):
            ("put", doc, valid_from?, valid_to?)         doc must carry "id"
            ("delete", eid, valid_from?, valid_to?)
            ("match", eid, expected_doc_or_None, at_vt?)
            ("evict", eid)
            ("fn", name, *args)
        Returns the tx_id (valid after commit()).
        """
        self._tx_id += 1
        tx_id = self._tx_id
        tx_us = to_us(tx_time) if tx_time else to_us(dt.datetime.now(dt.timezone.utc))
        seq = 0
        expanded: list[tuple] = []
        aborted_by_fn = False
        # worklist so a tx fn may emit FURTHER fn ops (replay_test.clj
        # "nested tx-fn": put-bob-and-ivan emits [:crux.tx/fn :put-ivan]) —
        # emitted ops splice in place of the fn op, in order
        queue: list = list(ops)
        while queue:
            op = queue.pop(0)
            if op[0] == "fn":
                fn = self._tx_fns.get(op[1])
                if fn is None:
                    # the reference resolves tx fns at INDEX time; an
                    # unknown fn fails the tx, it does not fail submit
                    # (replay_test.clj "failed tx-fn": [:crux.tx/fn
                    # :put-petr ...] -> aborted tx, later txs fine)
                    aborted_by_fn = True
                    break
                # the fn sees earlier ops of THIS tx applied
                # (tx_test.clj:713 tx-fn-sees-in-tx-query-results):
                # speculative fork carrying the expansion so far
                ctx = self.with_tx(expanded, tx_time) if expanded else self
                try:
                    res = fn(ctx, *op[2:])
                except Exception:
                    # a throwing tx fn aborts the tx (tx.clj:218-227
                    # logs and fails the tx), never the submit
                    aborted_by_fn = True
                    break
                if res is None:
                    # nil return = no-op, tx continues (tx_test.clj:760)
                    continue
                if res is False:
                    # false return aborts the WHOLE tx (tx_test.clj:760)
                    aborted_by_fn = True
                    break
                queue = list(res) + queue
            elif op[0] == "cas":
                # legacy compare-and-swap (tx.clj:113-130) = match + put
                _, eid, old_doc, new_doc = op[0], op[1], op[2], op[3]
                at = op[4] if len(op) > 4 else None
                expanded.append(("match", eid, old_doc, at))
                expanded.append(("put", new_doc) if at is None else ("put", new_doc, at))
            else:
                expanded.append(op)
        if aborted_by_fn:
            self.aborted_txs.add(tx_id)
            self._pending_aborted.add(tx_id)
            if self._wal is not None:
                # the submitted-but-failed tx still occupies its slot in
                # the durable log (the reference's log is written before
                # indexing decides the verdict) so replay reproduces the
                # abort and the id sequence (replay_test.clj failed-tx-fn)
                self._wal.append({"tx_id": tx_id, "rows": [], "aborted": True})
            return tx_id
        tx_rows: list[dict] = []  # this tx's rows — avoids rescanning the
        # whole _pending backlog per submit (O(n^2) for long-running
        # write-only clients that never commit/drain)
        for op in expanded:
            kind = op[0]
            row = {
                "tx_id": tx_id,
                "seq": seq,
                "op": kind,
                "tx_time": tx_us,
                "doc_json": None,
                "expected_json": None,
                "content_hash": None,
                "expected_hash": None,
                "valid_from": None,
                "valid_to": None,
            }
            if kind == "put":
                doc = op[1]
                if "id" not in doc:
                    raise ValueError("put doc must carry an 'id' (:crux.db/id)")
                row["eid"] = canon_eid(doc["id"])
                # typed-encode (docjson sidecar): datetimes/Decimals/
                # codec wrapper classes survive the entity() round trip
                # like the reference's EDN docs; value bytes stay the
                # legacy stringified forms for from_json DDL consumers
                # content_hash(doc) IS sha1(doc_dumps(doc)) — hash the
                # string just built instead of re-serializing the doc
                # (r16: doc_dumps was the dominant submit cost and ran
                # twice per put; ~35% off a 25k-doc submit phase)
                row["doc_json"] = _docjson.doc_dumps(doc)
                row["content_hash"] = hashlib.sha1(
                    row["doc_json"].encode()
                ).hexdigest()
                if len(op) > 2 and op[2] is not None:
                    row["valid_from"] = to_us(op[2])
                if len(op) > 3 and op[3] is not None:
                    row["valid_to"] = to_us(op[3])
            elif kind in ("delete", "evict"):
                row["eid"] = canon_eid(op[1])
                if kind == "delete":
                    if len(op) > 2 and op[2] is not None:
                        row["valid_from"] = to_us(op[2])
                    if len(op) > 3 and op[3] is not None:
                        row["valid_to"] = to_us(op[3])
            elif kind == "match":
                row["eid"] = canon_eid(op[1])
                if op[2] is not None:
                    row["expected_json"] = _docjson.doc_dumps(op[2])
                    row["expected_hash"] = hashlib.sha1(
                        row["expected_json"].encode()
                    ).hexdigest()
                if len(op) > 3 and op[3] is not None:
                    row["valid_from"] = to_us(op[3])
            else:
                raise ValueError(f"unknown op {kind!r}")
            self._pending.append(row)
            tx_rows.append(row)
            seq += 1
        if self._docs is not None:
            # docs (incl. match-expected docs — they're content-addressed
            # args too) reach the doc store at submit time, before the
            # log entry, mirroring the reference's write order
            batch: dict[str, tuple] = {}
            for r in tx_rows:
                if r["content_hash"] and r["doc_json"]:
                    batch[r["content_hash"]] = (
                        r["eid"], json.loads(r["doc_json"])
                    )
                if r["expected_hash"] and r["expected_json"]:
                    batch[r["expected_hash"]] = (
                        r["eid"], json.loads(r["expected_json"])
                    )
            self._docs.submit_docs(batch)
        if self._wal is not None:
            self._wal.append({"tx_id": tx_id, "rows": tx_rows})
        return tx_id

    @_locked
    def commit(self) -> set[int]:
        """Apply all pending txs; returns the set of aborted tx_ids
        (match failures and fn-returned-false aborts alike)."""
        fn_aborted, self._pending_aborted = self._pending_aborted, set()
        if not self._pending:
            return fn_aborted
        # SQL registry docs are visible driver-side here (cheap string
        # check per pending op) — track them so apply_ops_df's blanket
        # invalidation can be undone for this fully-observed batch.
        # This also covers recover(), which splices WAL rows straight
        # into _pending. Superset on purpose: an aborted tx's eid in
        # the side-set just means one extra pruned-read candidate.
        schema_adds = {
            r["eid"] for r in self._pending
            if r.get("doc_json") and _SCHEMA_NEEDLE in r["doc_json"]
        }
        prev_schema = self._schema_eids
        # Arrow path (r15 optimization, guide §4/§6): a pandas frame
        # crosses the Python->JVM boundary as Arrow batches; the
        # list-of-tuples form pickles row by row (measured 2-5x slower
        # for a 25k-op commit). Column-wise dict avoids a per-row tuple
        # pass; object dtype keeps None as a real null for Arrow.
        ops_df = self.spark.createDataFrame(
            pd.DataFrame(
                {
                    f.name: [r.get(f.name) for r in self._pending]
                    for f in OPS_SCHEMA.fields
                },
                dtype=object,
            ),
            OPS_SCHEMA,
        )
        has_match = any(r["op"] == "match" for r in self._pending)
        applied_fast = False
        if self._commit_fast_path_ok():
            # FAST PATH (guide §1.2 — the distributed algorithm): a
            # commit whose batch is all unranged puts with strictly
            # increasing per-entity (tx, effective-valid-from) has the
            # same closed form as bulk_ingest's initial load — two
            # lead() windows + the norm UDF instead of the per-entity
            # Python splice cogroup (row-identical:
            # test_commit_fast_path_equivalence /
            # test_commit_append_splice_equivalence, plus the canonical
            # splice batteries which ride these paths). The batch shape
            # is checked driver-side from _pending (the rows are already
            # on the driver); into a provably-empty store no probe job
            # runs at all, and into a NON-empty store one aggregate
            # probe verifies each touched entity's current belief can
            # only overlap its single open tail row (_append_splice, r16
            # — the §4 fix for the per-entity Python cogroup on
            # append-style incremental ingest). Ineligible batches —
            # matches, deletes, evicts, ranged puts, valid-time ties,
            # overlap-heavy histories — take the cogroup exactly as
            # before. The splice stores vf=None puts at
            # valid_from=tx_time; the coalesce below feeds the closed
            # form that same effective value.
            ops_eff = ops_df.withColumn(
                "valid_from", F.coalesce("valid_from", "tx_time")
            )
            if self._versions_empty:
                self.versions = _bulk_put_versions(ops_eff).localCheckpoint()
                applied_fast = True
            elif self._append_splice_worthwhile():
                spliced = self._append_splice(ops_eff)
                if spliced is not None:
                    self.versions = spliced.localCheckpoint()
                    applied_fast = True
            if applied_fast:
                aborted = set()
                self._versions_empty = False
        if not applied_fast:
            aborted = self.apply_ops_df(ops_df, has_match=has_match)
        # fully-observed batch: restore the registry side-set (the fast
        # path never nulled it — the same assignment is a no-op + adds)
        if prev_schema is not None:
            self._schema_eids = prev_schema | schema_adds
        if self._docs is not None:
            # COMMITTED evicts tombstone the entity's docs in the doc
            # store (an evict inside an aborted tx never happened). Docs
            # referenced at-or-after the evict position in THIS batch
            # survive — a recover() replays the whole history as one
            # batch and must preserve post-evict re-puts exactly like
            # the live incremental run did (the reference keys eviction
            # on the content hashes referenced BEFORE the evict).
            evict_pos: dict[str, tuple[int, int]] = {}
            for r in self._pending:
                if r["op"] == "evict" and r["tx_id"] not in aborted:
                    p = (r["tx_id"], r["seq"])
                    if p > evict_pos.get(r["eid"], (-1, -1)):
                        evict_pos[r["eid"]] = p
            if evict_pos:
                keep: dict[str, set] = {e: set() for e in evict_pos}
                for r in self._pending:
                    e = r.get("eid")
                    if (
                        e in evict_pos
                        and r["tx_id"] not in aborted
                        and (r["tx_id"], r["seq"]) > evict_pos[e]
                    ):
                        for k in ("content_hash", "expected_hash"):
                            if r.get(k):
                                keep[e].add(r[k])
                for e in evict_pos:
                    self._docs.evict_eid(e, keep_hashes=keep[e])
        pending_rows, self._pending = self._pending, []
        all_aborted = aborted | fn_aborted
        # registered secondary indexes (the reference's register-index!
        # seam, crux-core/src/crux/tx.clj:400-410) get ONE committed-rows
        # batch per commit — aborted txs index nothing. Same listener
        # contract as TxLogStream, so IncrementalTextIndex /
        # IncrementalVectorIndex plug into either path unchanged.
        if self.index_listeners:
            committed = ops_df
            if aborted:
                committed = ops_df.filter(
                    ~F.col("tx_id").isin(sorted(int(a) for a in aborted))
                )
            # the committed batch's max tx id is known DRIVER-side here —
            # handing it down saves every watermark-keeping listener a
            # full extra pass over the batch (listeners that don't take
            # the kwarg keep the old two-arg call)
            mx_committed = max(
                (
                    int(r["tx_id"]) for r in pending_rows
                    if r["tx_id"] is not None and int(r["tx_id"]) not in aborted
                ),
                default=None,
            )
            self._index_epoch += 1
            for fn in list(self.index_listeners):
                _call_listener(fn, self._index_epoch, committed, mx_committed)
        return all_aborted

    def _commit_fast_path_ok(self) -> bool:
        """Driver-side eligibility of the pending batch for the closed-
        form first-commit splice: every row an unranged put (no match /
        delete / evict / valid_to / expected), and per entity the
        (tx_id, effective valid_from) sequence strictly increasing in
        (tx_id, seq) order — the exact precondition bulk_ingest's probe
        verifies distributively, checkable here for free because
        _pending is already driver-resident."""
        last: dict[str, tuple[int, int]] = {}
        try:
            rows = sorted(
                self._pending,
                key=lambda r: (int(r["tx_id"]), int(r.get("seq") or 0)),
            )
        except (KeyError, TypeError, ValueError):
            return False  # malformed/legacy rows -> cogroup handles them
        for r in rows:
            # .get() throughout: recover() splices raw WAL dicts into
            # _pending, which may omit optional keys entirely
            if (
                r.get("op") != "put"
                or r.get("valid_to") is not None
                or r.get("expected_json") is not None
                or r.get("doc_json") is None
                or r.get("tx_time") is None
                or r.get("eid") is None
            ):
                return False
            vf = r.get("valid_from")
            vf = int(vf) if vf is not None else int(r["tx_time"])
            prev = last.get(r["eid"])
            if prev is not None and (int(r["tx_id"]) <= prev[0] or vf <= prev[1]):
                return False
            last[r["eid"]] = (int(r["tx_id"]), vf)
        return True

    def _append_splice_worthwhile(self) -> bool:
        """Size-aware routing for the append splice (guide §1.2: measure
        first). The cogroup ships the WHOLE store through Arrow+Python
        per commit — O(store bytes) — while the append splice pays a
        fixed probe job + an ops-side window; measured at sf0.1
        (25k-entity store, ~2.5 MB) the cogroup wins by ~1.7s because
        the Python splice over tiny histories is cheaper than the probe
        + window overhead, and the trade inverts once the store's
        Python-shipping cost exceeds those ~2 fixed seconds. Threshold
        on the store's Catalyst size estimate (localCheckpoint preserves
        real stats through LogicalRDD), default 64 MB, env-overridable:
        CRUX_SPARK_APPEND_SPLICE=always|never|auto and
        CRUX_SPARK_APPEND_SPLICE_MIN_BYTES (Spark size forms)."""
        import os

        from crux_spark._conf import parse_byte_size

        mode = os.environ.get("CRUX_SPARK_APPEND_SPLICE", "auto")
        if mode == "always":
            return True
        if mode == "never":
            return False
        try:
            est = int(
                self.versions._jdf.queryExecution()
                .optimizedPlan().stats().sizeInBytes()
            )
        except Exception:
            return False  # unknown size -> the status-quo cogroup
        thr = parse_byte_size(
            os.environ.get("CRUX_SPARK_APPEND_SPLICE_MIN_BYTES"), 64 << 20
        )
        return est >= thr

    def _append_splice(self, ops_eff: DataFrame) -> DataFrame | None:
        """Closed-form splice of a shape-eligible batch (all unranged
        puts, strictly increasing per entity — _commit_fast_path_ok)
        onto a NON-empty store, for the append-style ingest shape where
        each touched entity's first new put (t1, v1) can only overlap
        its single open tail row. Per the per-op splice (_splice), a put
        at (t1, v1) against such a history does exactly: close the tail
        row at tx t1, keep its [tail_vf, v1) remainder unasserted, and
        assert [v1, inf) — after which ops 2..n of the same entity see
        the bulk closed form (_bulk_put_versions). Every other existing
        row passes through the JVM UNTOUCHED — previously the whole
        store crossed the Arrow/Python boundary per commit.

        Per-entity eligibility (ONE aggregate probe over the
        checkpointed store joined to the driver-built firsts frame):
        among the entity's current rows (tx_to = END_OF_TX), at most ONE
        may overlap [v1, inf) in valid time, and that row must be the
        open tail: valid_to = END_OF_TIME, valid_from < v1, tx_from <
        t1. With NO overlapping row (e.g. history ends in a ranged put
        before v1) the splice appends [v1, inf) with no close/remainder
        — also closed-form. Any ineligible touched entity returns None
        and the whole batch takes the cogroup exactly as before
        (row-identical either way:
        test_commit_append_splice_equivalence)."""
        firsts_by: dict[str, tuple[int, int]] = {}
        for r in sorted(
            self._pending,
            key=lambda r: (int(r["tx_id"]), int(r.get("seq") or 0)),
        ):
            e = r["eid"]
            if e not in firsts_by:
                vf = r.get("valid_from")
                firsts_by[e] = (
                    int(r["tx_id"]),
                    int(vf) if vf is not None else int(r["tx_time"]),
                )
        firsts = self.spark.createDataFrame(
            pd.DataFrame(
                {
                    "eid": list(firsts_by),
                    "__t1": [t for t, _ in firsts_by.values()],
                    "__v1": [v for _, v in firsts_by.values()],
                }
            ),
            "eid string, __t1 long, __v1 long",
        )
        v = self.versions.join(F.broadcast(firsts), "eid", "left")
        cur = F.col("tx_to") == END_OF_TX
        overlap = (
            F.col("__t1").isNotNull() & cur & (F.col("valid_to") > F.col("__v1"))
        )
        open_ok = (
            (F.col("valid_to") == END_OF_TIME)
            & (F.col("valid_from") < F.col("__v1"))
            & (F.col("tx_from") < F.col("__t1"))
        )
        stats = v.agg(
            F.count(F.when(overlap & ~open_ok, 1)).alias("bad"),
            F.count(F.when(overlap, 1)).alias("n_ov"),
            F.count_distinct(F.when(overlap, F.col("eid"))).alias("n_ov_e"),
        ).first()
        if int(stats["bad"] or 0) or (
            int(stats["n_ov"] or 0) != int(stats["n_ov_e"] or 0)
        ):
            return None
        ver_cols = [f.name for f in VERSIONS_SCHEMA.fields if f.name != "eid"]

        def _row(**over):
            return F.struct(
                *[
                    (over[c] if c in over else F.col(c)).alias(c)
                    for c in ver_cols
                ]
            )

        existing = v.select(
            "eid",
            F.explode(
                F.when(
                    overlap,
                    F.array(
                        _row(tx_to=F.col("__t1")),
                        _row(
                            valid_to=F.col("__v1"),
                            tx_from=F.col("__t1"),
                            tx_to=F.lit(END_OF_TX),
                            asserted=F.lit(False),
                        ),
                    ),
                ).otherwise(F.array(_row()))
            ).alias("__v"),
        ).select("eid", "__v.*")
        return existing.unionByName(_bulk_put_versions(ops_eff))

    def apply_ops_df(self, ops_df: DataFrame, has_match: bool | None = None) -> set[int]:
        """Apply a whole ops DataFrame (OPS_SCHEMA) through the cogrouped
        splice — the distributed write path. Nothing but per-tx match
        verdicts (tx_ids) ever reaches the driver, so a 10^8-op batch is
        fine; this is what the streaming ingester feeds micro-batches into
        (tx.clj:424-479's serial ingest, distributed across entities)."""
        if has_match is None:
            has_match = bool(ops_df.filter(F.col("op") == "match").head(1))
        aborted: set[int] = set()
        def make_eval_fn(ab: frozenset):
            def eval_fn(eid, hist, op_rows):
                _, verdicts = _apply_ops(list(hist), op_rows, set(ab))
                bad = sorted({t for t, ok in verdicts if not ok})
                return {"tx_id": bad, "ok": [False] * len(bad)}

            return eval_fn

        if has_match:
            # SERIAL abort semantics (the reference ingests tx-by-tx,
            # tx.clj:424-479): a tx's verdict must be computed with the
            # abort set of all EARLIER txs final. Abort influence flows
            # strictly forward — skipping an aborted tx's ops can only
            # flip verdicts of LATER txs — so each round the EARLIEST
            # not-yet-finalized failing tx is definitively aborted, while
            # later failures are provisional (they may pass once the
            # earlier abort's ops are skipped) and are recomputed next
            # round. This makes batch composition semantically invisible:
            # commit(A;B) == commit(A);commit(B) — the former monotone
            # "once aborted, stays aborted" accumulation wrongly kept a
            # provisional abort whose cause was itself aborted (found by
            # test_durability_op_soup: live-vs-replay batching diverged).
            # Abort influence travels only through SHARED entities: a tx's
            # match verdict depends solely on ops against the eids it
            # touches, so txs in disjoint connected entity groups cannot
            # affect each other (even transitively). The earliest
            # unresolved failing tx of EACH group is therefore definitive
            # every round — rounds = (aborts in the largest dependent
            # group) + 1 instead of (total aborts) + 1, which matters for
            # WAL replays with many independent aborts. The tx→eid map is
            # one bounded distinct-collect; past the bound we fall back to
            # the strictly-serial single-finalize (still correct).
            comp_of: dict[int, object] | None = None
            pairs = (
                ops_df.select("tx_id", "eid")
                .distinct()
                .limit(_MAX_TX_EID_PAIRS + 1)
                .collect()
            )
            if len(pairs) > _MAX_TX_EID_PAIRS:
                # the fallback is CORRECT but strictly serial: one
                # finalized abort per fixpoint round instead of one per
                # independent entity group — surface it instead of
                # silently degrading (N aborts -> N+1 rounds)
                logging.getLogger(__name__).warning(
                    "match finalization: > %d distinct (tx, eid) pairs in "
                    "batch; falling back to serial per-round abort "
                    "finalization (correct, but one round per abort — "
                    "split the batch or raise _MAX_TX_EID_PAIRS)",
                    _MAX_TX_EID_PAIRS,
                )
            else:
                parent: dict = {}

                def find(x):
                    parent.setdefault(x, x)
                    while parent[x] != x:
                        parent[x] = parent[parent[x]]
                        x = parent[x]
                    return x

                for r in pairs:
                    rt, re_ = find(("t", int(r.tx_id))), find(("e", r.eid))
                    if rt != re_:
                        parent[rt] = re_
                comp_of = {
                    int(r.tx_id): find(("t", int(r.tx_id))) for r in pairs
                }
            for _ in range(100_000):
                bad_rows = _bucketed_cogroup(
                    self.versions,
                    ops_df,
                    make_eval_fn(frozenset(aborted)),
                    MATCH_SCHEMA,
                    self._nbuckets(),
                ).collect()
                new = sorted({r.tx_id for r in bad_rows} - aborted)
                if not new:
                    break
                if comp_of is None:
                    aborted.add(new[0])
                else:
                    # ascending order → first hit per group is its earliest
                    seen_groups: set = set()
                    for t in new:
                        g = comp_of.get(t)
                        if g not in seen_groups:
                            seen_groups.add(g)
                            aborted.add(t)
            else:
                raise RuntimeError("match-abort fixpoint did not converge")

        final_aborted = frozenset(aborted)

        def apply_fn(eid, hist, op_rows):
            hist, _ = _apply_ops(list(hist), op_rows, set(final_aborted))
            return _history_cols(eid, hist)

        self.versions = _bucketed_cogroup(
            self.versions, ops_df, apply_fn, VERSIONS_SCHEMA, self._nbuckets()
        ).localCheckpoint()
        self._versions_empty = False
        self.aborted_txs |= aborted
        # a distributed ops frame may carry registry docs this driver
        # never saw — invalidate the side-set (commit(), which DOES see
        # its ops, restores it); schema_doc_eids() re-seeds on demand
        self._schema_eids = None
        return aborted

    def _nbuckets(self) -> int:
        try:
            return int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        except Exception:
            return 32

    def bulk_ingest(
        self,
        df: DataFrame,
        id_expr: str,
        doc_cols: list[str],
        valid_from_col: str,
        tx_id_expr: str | None = None,
    ) -> None:
        """Distributed bulk put-ingest: every input row becomes a put op,
        built entirely as DataFrame expressions (no driver collect — the
        100 TB path). ``tx_id_expr`` must be monotone with event order per
        entity (defaults to the valid-from micros, which is exactly the
        'valid-time = tx-time' ingestion of the reference's ts-weather
        bench, ts_weather.clj:23).

        Routing: ops for entities with no existing history and strictly
        increasing (tx, valid-from) take the closed-form fast path
        (_bulk_put_versions, no per-op splice); the rest run the splice
        cogroup. The routing probe is a distinct+anti/semi join against
        the current versions' eids — O(store) per call, irrelevant for
        the initial-load case it accelerates (versions empty) and minor
        against the cogroup it replaces otherwise."""
        vf_type = df.schema[valid_from_col].dataType.typeName()
        if vf_type.startswith("timestamp"):
            # ANSI (Spark 4 default) forbids timestamp→numeric casts, and a
            # vanilla driver session can surface parquet nanos as NTZ;
            # NTZ→LTZ is identity under the catalog-enforced UTC session tz.
            vf_us = F.unix_micros(F.col(valid_from_col).cast("timestamp_ltz"))
        else:
            vf_us = (F.col(valid_from_col).cast("double") * 1_000_000).cast("long")
        tx_id = F.expr(tx_id_expr) if tx_id_expr else vf_us
        # typed-doc sidecar (docjson.py): the tag set is a pure function
        # of the SCHEMA, so it is one constant JSON fragment appended to
        # every row's to_json output — bulk-ingested entities round-trip
        # datetimes/dates/decimals from entity() exactly like op-path
        # puts, with zero per-row Python. Value bytes are to_json's (ISO
        # 'T'/'Z' timestamps — decode normalizes to the store's naive-
        # UTC convention); the canonical sorted re-dump happens in the
        # splice/norm paths as before. Durations are skipped (their
        # sidecar entry carries per-row microseconds).
        type_tags = []
        for c in doc_cols:
            cdt = df.schema[c].dataType
            if isinstance(cdt, (T.TimestampType, T.TimestampNTZType)):
                type_tags.append([[c], "inst"])
            elif isinstance(cdt, T.DateType):
                type_tags.append([[c], "date"])
            elif isinstance(cdt, T.DecimalType):
                type_tags.append([[c], "dec"])
        base = df.withColumn(
            "__dj", F.to_json(F.struct(*[F.col(c) for c in doc_cols]))
        )
        if type_tags:
            type_tags.sort(key=lambda e: json.dumps(e[0]))
            sidecar = f'"{_docjson.TYPES_KEY}": ' + json.dumps(type_tags) + "}"
            # A row whose doc_cols are ALL null serializes as '{}'
            # (to_json ignoreNullFields default) — the comma form would
            # produce malformed '{,"crux.json/types": ...}', crashing
            # the norm UDF / entity() on json.loads. Guard on length.
            doc_json_col = F.when(
                F.length("__dj") > 2,
                F.concat(
                    F.expr("substring(__dj, 1, length(__dj) - 1)"),
                    F.lit("," + sidecar),
                ),
            ).otherwise(F.concat(F.lit("{"), F.lit(sidecar)))
        else:
            doc_json_col = F.col("__dj")
        ops_df = base.select(
            F.expr(id_expr).cast("string").alias("eid"),
            tx_id.alias("tx_id"),
            F.lit(0).alias("seq").cast("long"),
            F.lit("put").alias("op"),
            vf_us.alias("tx_time"),
            doc_json_col.alias("doc_json"),
            F.lit(None).cast("string").alias("expected_json"),
            vf_us.alias("valid_from"),
            F.lit(None).cast("long").alias("valid_to"),
        )

        # FAST PATH — the actual 100 TB initial-load shape. For an
        # entity with NO existing history receiving unranged puts whose
        # tx order equals a strictly increasing valid_from order, the
        # splice result has a CLOSED FORM (each put i closes the open
        # assertion at tx_{i+1} and re-asserts its [v_i, v_{i+1})
        # remainder unasserted): two window functions produce the exact
        # rows the per-op Python splice would — which is O(n^2) per
        # entity (every put rebuilds the history list), measured as the
        # dominant cost of dense-history ingest. Entities with existing
        # history, and any out-of-order/duplicate valid times, fall back
        # to the splice cogroup; the two paths are row-identical
        # (test_bulk_ingest_fast_path_equivalence).
        # ONE probe job (r15 optimization): the ordering check, the
        # slow-side emptiness check and the ops-side max tx (which
        # advances the tx counter below) previously ran as three
        # separate jobs plus a post-merge max aggregate over the whole
        # store. All three are computable in a single pass over the ops
        # left-joined against the existing-eid set: a left join keeps
        # every ops row, so the per-eid lag window sees exactly the rows
        # the old anti-join probe saw for fresh entities (existing is
        # keyed by eid — anti-join removed whole entities, never
        # individual rows).
        # r16: a provably-empty store (the _versions_empty flag the
        # commit fast path maintains) has NO existing eids — every op is
        # fresh by construction, so the probe drops the join against the
        # (empty) eid set and the fresh/slow splits below are closed-form.
        # This removes the empty-side distinct+broadcast from the FIRST
        # ingest of every store (the initial-load shape).
        w = Window.partitionBy("eid").orderBy("tx_id", "seq")
        if self._versions_empty:
            existing = None
            probe = ops_df.select(
                "tx_id", "valid_from", F.lit(None).cast("int").alias("__ex"),
                F.lag("tx_id").over(w).alias("__pt"),
                F.lag("valid_from").over(w).alias("__pv"),
            )
        else:
            existing = self.versions.select("eid").distinct()
            probe = ops_df.join(
                existing.withColumn("__ex", F.lit(1)), "eid", "left"
            ).select(
                "tx_id", "valid_from", "__ex",
                F.lag("tx_id").over(w).alias("__pt"),
                F.lag("valid_from").over(w).alias("__pv"),
            )
        stats = probe.agg(
            F.count(
                F.when(
                    F.col("__ex").isNull()
                    & F.col("__pt").isNotNull()
                    & (
                        (F.col("tx_id") <= F.col("__pt"))
                        | (F.col("valid_from") <= F.col("__pv"))
                    ),
                    1,
                )
            ).alias("bad"),
            F.count("__ex").alias("n_slow"),
            F.max("tx_id").alias("max_tx"),
        ).first()
        bad = int(stats["bad"] or 0)
        slow_has_rows = int(stats["n_slow"] or 0) > 0
        ops_max_tx = int(stats["max_tx"] or 0)
        if existing is None:
            fresh, slow = ops_df, None
        else:
            fresh = ops_df.join(existing, "eid", "left_anti")
            slow = ops_df.join(existing, "eid", "left_semi")
        if bad:
            slow, fresh, slow_has_rows = ops_df, None, True

        parts = []
        if fresh is not None:
            parts.append(_bulk_put_versions(fresh))
        if slow_has_rows:

            def apply_fn(eid, hist, op_rows):
                hist, _ = _apply_ops(list(hist), op_rows, set())
                return _history_cols(eid, hist)

            parts.append(
                _bucketed_cogroup(
                    self.versions, slow, apply_fn, VERSIONS_SCHEMA,
                    self._nbuckets(),
                )
            )
        elif fresh is not None and not self._versions_empty:
            # no slow ops: existing entities pass through untouched
            parts.append(self.versions)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        self.versions = out.localCheckpoint()
        self._versions_empty = False
        # post-merge max(tx_from) == max(existing max, ops max): new
        # version rows only carry tx ids from the ops stream, and every
        # construction/load/restore path seeds _tx_id to >= the existing
        # store's max — so the probe job's ops-side max advances the
        # counter without a second aggregate over the full store.
        self._tx_id = max(self._tx_id, ops_max_tx)
        # bulk rows never pass the driver; re-seed lazily on first use
        self._schema_eids = None

    # -------------------------------------------------------------- read API

    def db(self, valid_time: dt.datetime | None = None, tx: int | None = None) -> DataFrame:
        """Snapshot DataFrame (eid, doc_json, interval cols) visible at
        (valid-time, tx) — the reference's `db` value (SURVEY.md §3.1).
        Pure partition-prunable filters, no window needed."""
        vt = to_us(valid_time) if valid_time else to_us(
            dt.datetime.now(dt.timezone.utc)
        )
        tx = tx if tx is not None else END_OF_TX - 1
        return self.versions.filter(
            (F.col("valid_from") <= vt)
            & (F.col("valid_to") > vt)
            & (F.col("tx_from") <= tx)
            & (F.col("tx_to") > tx)
            & (~F.col("deleted"))
        ).select("eid", "doc_json", "valid_from", "valid_to", "tx_from", "content_hash")

    def schema_doc_eids(self) -> list[str]:
        """Sorted eids of SQL table-registry docs (docs whose json carries
        SCHEMA_DOC_ATTR). Maintained INCREMENTALLY at write time — the
        attribute is a known key when the put is built — so
        sql.register_tables reads the registry through a pushed-down eid
        IN-filter instead of full-scanning doc_json per registration
        (r9 verdict). After a write that bypasses the driver-side op
        stream (bulk_ingest, a raw apply_ops_df batch, load()), ONE
        discovery scan over the versions store re-seeds the set and
        maintenance goes back to incremental."""
        if self._schema_eids is None:
            rows = (
                self.versions.filter(
                    F.col("doc_json").contains(_SCHEMA_NEEDLE)
                )
                .select("eid")
                .distinct()
                .collect()
            )
            self._schema_eids = {r.eid for r in rows}
        pending = {
            r["eid"] for r in self._pending
            if r.get("doc_json") and _SCHEMA_NEEDLE in r["doc_json"]
        }
        return sorted(self._schema_eids | pending)

    def entity(self, eid: str, valid_time: dt.datetime | None = None, tx: int | None = None) -> dict | None:
        rows = self.db(valid_time, tx).filter(F.col("eid") == canon_eid(eid)).collect()
        if not rows:
            return None
        return _docjson.doc_loads(rows[0].doc_json)

    def entity_tx(
        self, eid: str, valid_time: dt.datetime | None = None, tx: int | None = None
    ) -> dict | None:
        """Transaction metadata of the visible version — the reference's
        `entity-tx` (api.clj entity-tx; index_store.clj:774-795 seek)."""
        rows = (
            self.db(valid_time, tx).filter(F.col("eid") == canon_eid(eid)).collect()
        )
        if not rows:
            return None
        r = rows[0]
        return {
            "eid": r.eid,
            "tx_id": r.tx_from,
            "valid_from": r.valid_from,
            "valid_to": r.valid_to,
            "content_hash": r.content_hash,
        }

    def tx_at(self, tx_time: dt.datetime) -> int:
        """Highest tx id whose tx-time is <= the instant (the reference
        resolves tx-time -> tx-id through the log; tx ids are totally
        ordered here so max over the pruned tx_time filter serves)."""
        row = (
            # only asserted rows carry their own tx's tx_time; clipped
            # remainders (asserted=False) inherit the ORIGINAL version's
            # tx_time under the splicing tx's tx_from and would lie here
            self.versions.filter(
                F.col("asserted") & (F.col("tx_time") <= to_us(tx_time))
            )
            .agg(F.max("tx_from").alias("m"))
            .first()
        )
        return int(row.m) if row.m is not None else 0

    def max_tx_time(self) -> dt.datetime | None:
        """Wall-clock tx-time of the latest committed tx (None if empty)."""
        row = (
            self.versions.filter(F.col("asserted"))
            .agg(F.max("tx_time").alias("m"))
            .first()
        )
        return splice.from_us(int(row.m)) if row.m is not None else None

    def tx_committed(self, tx_id: int) -> bool:
        """Whether a submitted tx committed (api.clj tx-committed?):
        raises if the tx is unknown or still pending. Tx ids are dense
        (one counter), so ids outside [1, latest-submitted] were never
        handed out by submit_tx — the reference raises NodeOutOfSync /
        unknown-tx for those rather than vacuously answering."""
        if tx_id < 1 or tx_id > self._tx_id:
            raise ValueError(f"tx {tx_id} unknown (never submitted)")
        if tx_id in self.aborted_txs:
            return False
        if self._pending and tx_id >= min(r["tx_id"] for r in self._pending):
            raise ValueError(f"tx {tx_id} not yet indexed")
        return True

    def documents(self, content_hashes: list[str]) -> dict[str, dict]:
        """Fetch docs by content hash (api.clj `documents`; the
        reference's content-addressed doc-store fetch,
        document_store.clj:1-121). With a doc store configured, that
        transport answers (point lookups — the reference's path);
        hashes it doesn't know fall back to the pruned versions scan."""
        out: dict[str, dict] = {}
        missing = list(content_hashes)
        if self._docs is not None:
            out = self._docs.fetch_docs(missing)
            missing = [h for h in missing if h not in out]
        if missing:
            rows = (
                self.versions.filter(F.col("content_hash").isin(missing))
                .select("content_hash", "doc_json")
                .dropDuplicates(["content_hash"])
                .collect()
            )
            out.update(
                {r.content_hash: _docjson.doc_loads(r.doc_json) for r in rows}
            )
        return {h: _docjson.decode_doc(d) for h, d in out.items()}

    def completed_watermark(self) -> int:
        """Highest tx id already applied to the versions table, computed
        driver-side (no Spark job): everything submitted is applied except
        the still-pending tail. Used to pin a Db's tx basis at creation
        (snapshot isolation, query_test.clj:3312 — a db value taken
        before a put never sees it)."""
        if self._pending:
            return min(r["tx_id"] for r in self._pending) - 1
        return self._tx_id

    @_locked
    def snapshot(self) -> tuple[DataFrame, int, set[int], set | None]:
        """Atomic (versions, watermark, aborted-ids<=watermark,
        schema_eids) snapshot under the store mutex. DataFrames are
        immutable, so once the reference is captured the caller can
        write it out lock-free while commits continue — the checkpoint
        then cannot contain txs newer than its recorded tx_id (whose
        WAL-tail replay on restore would duplicate version rows)."""
        tx_id = self.completed_watermark()
        return (
            self.versions,
            tx_id,
            {int(a) for a in self.aborted_txs if a <= tx_id},
            None if self._schema_eids is None else set(self._schema_eids),
        )

    def latest_completed_tx(self) -> int | None:
        """Highest tx id applied to the versions table (api.clj
        latest-completed-tx)."""
        row = self.versions.agg(F.max("tx_from").alias("m")).first()
        return int(row.m) if row.m is not None else None

    def latest_submitted_tx(self) -> int | None:
        """Highest tx id handed out by submit_tx (api.clj
        latest-submitted-tx); may exceed latest_completed_tx while txs
        are pending commit()."""
        return self._tx_id or None

    def tx_log(self, after_tx_id: int | None = None, with_ops: bool = False) -> DataFrame:
        """Committed transactions in tx order (api.clj open-tx-log).

        Without ops: derived from the versions table (one row per tx:
        tx_id, tx_time, n_versions) — a pure distributed aggregation.
        With ops: requires a WAL (``wal_path``); replays the durable log
        the same way recover() does."""
        if with_ops:
            if self._wal is None:
                raise ValueError("tx_log(with_ops=True) needs a wal_path")
            log = self._wal.to_df(self.spark)
            log = log.select("tx_id", F.explode("rows").alias("op"))
            # the op struct carries its own tx_id copy — keep the outer one
            op_fields = [
                f.name
                for f in log.schema["op"].dataType.fields
                if f.name != "tx_id"
            ]
            log = log.select(
                "tx_id", *[F.col(f"op.{n}").alias(n) for n in op_fields]
            )
            # eviction redacts document CONTENT from the log (tx_test.clj
            # tx-log-evict-454: prior put/cas docs of an evicted eid read
            # back as {:evicted? true}); op structure and eids remain.
            # Only COMMITTED evicts redact (an evict inside a tx aborted
            # by a failed match never happened), and only ops strictly
            # BEFORE the evict in (tx_id, seq) order — the reference keys
            # on the evicted content-hashes, so a doc put AFTER the evict
            # (re-created entity) reads back normally.
            not_applied = sorted(
                self.aborted_txs | {r["tx_id"] for r in self._pending}
            )
            evict_ops = log.filter(F.col("op") == "evict")
            if not_applied:
                evict_ops = evict_ops.filter(~F.col("tx_id").isin(not_applied))
            pos = F.struct(
                F.col("tx_id").alias("t"), F.col("seq").alias("s")
            )
            evicted = evict_ops.groupBy("eid").agg(
                F.max(pos).alias("__evict_pos")
            )
            log = log.join(F.broadcast(evicted), "eid", "left")
            before_evict = F.col("__evict_pos").isNotNull() & (
                pos < F.col("__evict_pos")
            )
            redact = lambda c: F.when(
                before_evict & F.col(c).isNotNull(),
                F.lit('{"crux.db/evicted": true}'),
            ).otherwise(F.col(c))
            log = log.withColumn("doc_json", redact("doc_json"))
            if "expected_json" in log.columns:
                log = log.withColumn("expected_json", redact("expected_json"))
            log = log.drop("__evict_pos")
        else:
            log = (
                self.versions.filter(F.col("asserted"))
                .groupBy(F.col("tx_from").alias("tx_id"))
                .agg(
                    F.min("tx_time").alias("tx_time"),
                    F.count("*").alias("n_versions"),
                )
            )
        if after_tx_id is not None:
            log = log.filter(F.col("tx_id") > after_tx_id)
        return log.orderBy("tx_id")

    def entity_history(
        self,
        eid: str,
        ascending: bool = True,
        with_corrections: bool = False,
        start_valid_time: dt.datetime | None = None,
        end_valid_time: dt.datetime | None = None,
        start_tx_id: int | None = None,
        end_tx_id: int | None = None,
    ) -> list[dict]:
        """Bounded history scan (index_store.clj:524-554 opts;
        query.clj:1740-1758 bound clamping is the caller's concern via a
        snapshot store). Bounds are pushed into the versions scan — at
        scale these are partition-prunable predicates, so a narrow vt/tx
        window reads a sliver of the table, not the entity's whole history.
        `start` = iteration origin (low end asc, high end desc, inclusive);
        `end` exclusive; vt bounds compare valid_from, tx bounds tx_from."""
        scan = self.versions.filter(F.col("eid") == canon_eid(eid))
        svt, evt = to_us(start_valid_time), to_us(end_valid_time)
        if ascending:
            if svt is not None:
                scan = scan.filter(F.col("valid_from") >= svt)
            if evt is not None:
                scan = scan.filter(F.col("valid_from") < evt)
            if start_tx_id is not None:
                scan = scan.filter(F.col("tx_from") >= start_tx_id)
            if end_tx_id is not None:
                scan = scan.filter(F.col("tx_from") < end_tx_id)
        else:
            if svt is not None:
                scan = scan.filter(F.col("valid_from") <= svt)
            if evt is not None:
                scan = scan.filter(F.col("valid_from") > evt)
            if start_tx_id is not None:
                scan = scan.filter(F.col("tx_from") <= start_tx_id)
            if end_tx_id is not None:
                scan = scan.filter(F.col("tx_from") > end_tx_id)
        rows = scan.collect()
        hist = [
            Version(
                r.valid_from, r.valid_to, r.tx_from, r.tx_to, r.tx_time,
                r.doc_json, r.deleted, r.content_hash, r.asserted,
            )
            for r in rows
        ]
        out = splice.entity_history(
            hist,
            ascending,
            with_corrections,
            start_valid_time=svt,
            end_valid_time=evt,
            start_tx_id=start_tx_id,
            end_tx_id=end_tx_id,
        )
        return [
            {
                "valid_from": splice.from_us(v.valid_from),
                "valid_to": None if v.valid_to == END_OF_TIME else splice.from_us(v.valid_to),
                "tx_from": v.tx_from,
                "doc": None if v.doc_json is None else _docjson.doc_loads(v.doc_json),
                "deleted": v.deleted,
            }
            for v in out
        ]

    def history_scan(
        self,
        start_valid_time: dt.datetime | None = None,
        end_valid_time: dt.datetime | None = None,
        start_tx_id: int | None = None,
        end_tx_id: int | None = None,
        with_corrections: bool = False,
    ) -> DataFrame:
        """Set-based bounded history across ALL entities — the distributed
        sibling of :meth:`entity_history` (same bound semantics, ascending
        orientation: start inclusive / end exclusive on (valid_from,
        tx_from)). Returns the asserted version events in the window as a
        DataFrame; at scale the bounds are partition-prunable predicates so
        an audit over a day's window scans a day, not the full store."""
        scan = self.versions.filter(F.col("asserted"))
        svt, evt = to_us(start_valid_time), to_us(end_valid_time)
        if svt is not None:
            scan = scan.filter(F.col("valid_from") >= svt)
        if evt is not None:
            scan = scan.filter(F.col("valid_from") < evt)
        if start_tx_id is not None:
            scan = scan.filter(F.col("tx_from") >= start_tx_id)
        if end_tx_id is not None:
            scan = scan.filter(F.col("tx_from") < end_tx_id)
        if not with_corrections:
            # latest assertion per (eid, valid_from) within the window —
            # same collapse as splice.entity_history under tx bounds
            w = F.row_number().over(
                Window.partitionBy("eid", "valid_from").orderBy(
                    F.col("tx_from").desc()
                )
            )
            scan = scan.withColumn("_rn", w).filter(F.col("_rn") == 1).drop("_rn")
        return scan

    def with_tx(self, ops: Iterable[Any], tx_time: dt.datetime | None = None) -> "TxStore":
        """Speculative fork (query.clj:1896-1913 / fork.clj): apply ops on a
        copy; the base store is untouched."""
        fork = TxStore(self.spark, self.versions)
        fork._tx_id = self._tx_id
        fork._tx_fns = dict(self._tx_fns)
        fork._schema_eids = (
            None if self._schema_eids is None else set(self._schema_eids)
        )
        fork.submit_tx(ops, tx_time)
        fork.commit()
        return fork

    def fork_at(self, tx: int | None) -> "TxStore":
        """Fork whose version state is the belief AS OF ``tx``
        (fork.clj / fork_test.clj test-speculative-from-point-in-past):
        rows written by later txs are dropped, rows CLOSED by later txs
        are reopened — txs after the basis are invisible in the fork.
        The tx counter continues from the base store so speculative txs
        get the next global id, like the reference."""
        from crux_spark.bitemporal.splice import END_OF_TX

        if tx is None:
            versions = self.versions
        else:
            versions = self.versions.filter(F.col("tx_from") <= tx).withColumn(
                "tx_to",
                F.when(F.col("tx_to") > tx, F.lit(END_OF_TX)).otherwise(
                    F.col("tx_to")
                ),
            )
        fork = TxStore(self.spark, versions)
        fork._tx_id = self._tx_id
        fork._tx_fns = dict(self._tx_fns)
        fork._schema_eids = (
            None if self._schema_eids is None else set(self._schema_eids)
        )
        return fork

    def catalog(
        self,
        valid_time: dt.datetime | None = None,
        tx: int | None = None,
        name: str = "docs",
        schema=None,
    ):
        """Datalog-queryable view of this store's snapshot:
        ``store.with_tx(ops).catalog()`` is the reference's speculative
        with-tx → q flow (query.clj:1896-1913) in one call."""
        from crux_spark.catalog import Catalog

        return Catalog.from_store(
            self, valid_time=valid_time, tx=tx, name=name, schema=schema
        )

    # ------------------------------------------------------------ persistence

    def compact(self, before_tx: int) -> int:
        """Drop version rows invisible to every snapshot at tx >=
        before_tx — the reference's index/doc-store compaction
        (compaction_test.clj): a row superseded in the tx dimension
        before the horizon (tx_to <= before_tx) can never satisfy
        tx_from <= tx < tx_to for tx >= before_tx. Valid-time history
        at or after the horizon is untouched (corrections keep their
        full (vt, tt >= horizon) rectangles); db()/history reads at tx
        < before_tx become undefined. Returns rows removed."""
        old = self.versions
        n_before = old.count()
        self.versions = old.filter(
            F.col("tx_to") > before_tx
        ).localCheckpoint()
        return n_before - self.versions.count()

    def compact_wal(self) -> int:
        """Physically erase evicted documents from the durable log — the
        reference's evict deletes the docs from the document store
        (tx.clj evict; the tx-log keeps redacted tombstones). Rewrites
        the WAL in place with {"crux.db/evicted": true} bodies for every
        op on an evicted eid; returns the number of redacted ops."""
        if self._wal is None:
            return 0
        entries = list(self._wal.entries())
        if not entries:
            return 0
        # Only COMMITTED evicts redact (the WAL is written at submit time,
        # so it carries evicts from txs later aborted by a failed match —
        # those never happened), and only ops strictly BEFORE the evict in
        # (tx_id, seq) order: the reference keys redaction on the evicted
        # content-hashes (tx-log-evict-454), so a doc put AFTER the evict
        # (re-created entity) must survive the rewrite — a WAL-tail replay
        # after this rewrite must reproduce the live store byte-for-byte.
        not_applied = self.aborted_txs | {r["tx_id"] for r in self._pending}
        evict_pos: dict[str, tuple[int, int]] = {}
        for e in entries:
            for r in e["rows"]:
                if r.get("op") == "evict" and int(r["tx_id"]) not in not_applied:
                    p = (int(r["tx_id"]), int(r.get("seq") or 0))
                    if p > evict_pos.get(r["eid"], (-1, -1)):
                        evict_pos[r["eid"]] = p
        # The rewrite keeps the ORIGINAL doc's content-hash inside the
        # tombstone (the reference's log stores content-hashes that evict
        # never touches, tx.clj) so that a replayed match op still compares
        # the same hashes as the original run — equal docs stay equal,
        # different docs stay different — and replay verdicts are stable.
        n = 0
        for e in entries:
            for r in e["rows"]:
                p = (int(r["tx_id"]), int(r.get("seq") or 0))
                if p < evict_pos.get(r.get("eid"), (-1, -1)):
                    for k in ("doc_json", "expected_json"):
                        v = r.get(k)
                        if v is not None and not _is_evict_tombstone(v):
                            r[k] = json.dumps(
                                {
                                    "crux.db/evicted": True,
                                    "crux.db/content-hash": splice.content_hash(
                                        json.loads(v)
                                    ),
                                },
                                sort_keys=True,
                            )
                            n += 1
        self._wal.rewrite(entries)
        return n

    def save(
        self,
        path: str,
        buckets: int = 64,
        versions: DataFrame | None = None,
        schema_eids: set | None = None,
    ) -> None:
        """Persist partitioned by eid hash bucket (co-locates future
        cogroups; at scale use .bucketBy on a metastore table).

        ``versions``/``schema_eids`` let CheckpointStore write an
        atomic snapshot() instead of live (possibly newer) state; when
        ``versions`` is given, the passed ``schema_eids`` is
        authoritative (None = unknown, same as the live field)."""
        df = versions if versions is not None else self.versions
        eids = schema_eids if versions is not None else self._schema_eids
        (
            df.withColumn("bucket", F.abs(F.hash("eid")) % buckets)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(path)
        )
        # sidecar: the SQL registry side-set survives the checkpoint, so
        # a load()ed store never pays even the one discovery scan (a
        # _SUCCESS-style marker key; an object-store deployment writes
        # it through the same FS client as the parquet)
        if eids is not None:
            try:
                with open(
                    os.path.join(path, "_schema_doc_eids.json"), "w"
                ) as f:
                    json.dump(sorted(eids), f)
            except OSError:
                pass  # non-local path: load() falls back to discovery

    @classmethod
    def recover(cls, spark: SparkSession, wal_path, doc_store=None) -> "TxStore":
        """Rebuild a store by replaying the write-ahead log (deterministic
        replay on every node, tx.clj:424-479). Ops in the WAL are already
        tx-fn-expanded, so no fn registry is needed. Accepts any WAL spec
        (JSONL path, 'sqlite:<path>', or a TxLogBackend); an existing
        doc-store spec re-attaches unchanged (it persists independently
        of the replay, like the reference's doc store)."""
        from crux_spark.bitemporal.txlog import open_tx_log

        backend = open_tx_log(wal_path)
        store = cls(spark, wal_path=None, doc_store=doc_store)
        replayed = False
        for entry in backend.entries():
            if entry.get("aborted"):
                # fn-failed tx: occupies its id slot, indexes nothing
                store.aborted_txs.add(int(entry["tx_id"]))
            else:
                store._pending.extend(entry["rows"])
            store._tx_id = max(store._tx_id, int(entry["tx_id"]))
            replayed = True
        if replayed:
            store.commit()
        store.wal_path = backend
        return store

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "TxStore":
        df = spark.read.parquet(path).drop("bucket")
        if "legacy_hash" not in df.columns:
            # pre-legacy_hash checkpoints: provenance unknown -> True
            # keeps the tolerant r12/r13 fallback for restored rows
            df = df.withColumn("legacy_hash", F.lit(True))
        if "origin_tx" not in df.columns:
            # pre-origin_tx checkpoints: 0 = unknown, origin() falls
            # back to tx_from
            df = df.withColumn("origin_tx", F.lit(0).cast("long"))
        store = cls(spark, df.localCheckpoint())
        row = df.agg(F.max("tx_from").alias("m")).first()
        store._tx_id = int(row.m or 0)
        try:
            with open(os.path.join(path, "_schema_doc_eids.json")) as f:
                loaded = json.load(f)
            # Shape-validate before adopting: a JSON string would become a
            # set of characters (silently hiding registry docs), a number
            # would TypeError on iteration. Anything but a list of strings
            # falls back to the discovery scan like a corrupt sidecar.
            if not (isinstance(loaded, list)
                    and all(isinstance(e, str) for e in loaded)):
                raise ValueError("sidecar is not a list of strings")
            store._schema_eids = set(loaded)
        except (OSError, ValueError, TypeError):
            # pre-sidecar or corrupt sidecar: discovery scan on first use
            pass
        return store

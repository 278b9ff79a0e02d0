"""Checkpointing for TxStores — the reference's crux.checkpoint module
(crux-core/src/crux/checkpoint.clj; checkpoint_test.clj) recast for the
parquet-backed store.

The reference periodically uploads the KV index dir to a checkpoint
store so a fresh node restores the latest checkpoint and replays only
the tx-log tail. Here a checkpoint = the store's versions table saved as
eid-bucketed parquet plus a metadata file; a fresh session restores the
newest checkpoint and replays the WAL tail past its tx id.

Parity points kept from the reference:
- frequency gating: `checkpoint()` is a no-op while the newest
  checkpoint is younger than approx_frequency (checkpoint.clj
  cp-seq / checkpoint_test.clj "doesn't do a second checkpoint within
  half a second");
- available_checkpoints lists newest-first;
- retention: `cleanup(keep=n)` prunes all but the n newest (the
  reference's retention-policy map).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil

from crux_spark.bitemporal.store import TxStore, _call_listener

_META = "checkpoint.json"

# Index-format version stamped into every checkpoint (the reference's
# crux.codec/index-version, persisted beside the KV index): a node must
# not silently serve queries from an index laid out by an incompatible
# build (index_version_override_test.clj). Version history:
#   1 — pre-r12 layout
#   2 — r12: typed-doc sidecar in doc_json (bitemporal/docjson.py) and
#       the full codec tag spectrum in the EAV order. Old checkpoints
#       still DECODE (untagged docs pass through), but hashes written
#       by a v1 build for docs containing sets differ from v2's — an
#       explicit skip flag acknowledges the compatibility judgment.
INDEX_VERSION = 2


class IndexVersionOutOfSyncError(RuntimeError):
    """The checkpoint's index version differs from this build's
    (IndexVersionOutOfSyncException analogue)."""


class CheckpointStore:
    def __init__(self, path: str, approx_frequency: float = 3600.0):
        self.path = path
        self.approx_frequency = approx_frequency
        os.makedirs(path, exist_ok=True)

    # -- listing ----------------------------------------------------------
    def available_checkpoints(self) -> list[dict]:
        """Checkpoint metadata, newest first (checkpoint.clj
        available-checkpoints)."""
        out = []
        for name in os.listdir(self.path):
            meta_path = os.path.join(self.path, name, _META)
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    meta = json.load(f)
                meta["dir"] = os.path.join(self.path, name)
                out.append(meta)
        return sorted(out, key=lambda m: m["checkpoint_at"], reverse=True)

    # -- writing ----------------------------------------------------------
    def checkpoint(
        self, store: TxStore, force: bool = False, indexes: dict | None = None
    ) -> dict | None:
        """Save a checkpoint unless the newest one is fresher than
        approx_frequency (returns None when gated) or the store has no
        new txs since it.

        `indexes` maps name -> secondary index object with a
        ``save(path)`` method (e.g. IncrementalTextIndex) — saved under
        the checkpoint dir alongside the versions table, the way the
        reference checkpoints its Lucene dir beside the KV index
        (crux-lucene via crux-core/src/crux/checkpoint.clj)."""
        now = dt.datetime.now(dt.timezone.utc)
        # atomic snapshot under the store mutex (shared with
        # submit_tx/commit): a commit landing between reading the
        # watermark and saving would persist version rows newer than the
        # recorded tx_id, which restore_latest's WAL-tail replay
        # (entries > tx_id) would then apply a second time. The parquet
        # write itself runs lock-free on the immutable snapshot frame.
        versions_df, tx_id, aborted, schema_eids = store.snapshot()
        cps = self.available_checkpoints()
        if cps and not force:
            newest = cps[0]
            age = (
                now
                - dt.datetime.fromisoformat(newest["checkpoint_at"])
            ).total_seconds()
            if age < self.approx_frequency:
                return None
            if newest["tx_id"] >= tx_id:
                return None
        cp_name = f"checkpoint-{tx_id}-{now.strftime('%Y%m%dT%H%M%S%f')}"
        cp_dir = os.path.join(self.path, cp_name)
        # tx_id is the watermark INCLUDING aborted ids (an aborted tx still
        # occupies its id slot); aborted_txs up to the watermark must travel
        # with the checkpoint — the versions table alone can't reproduce
        # either (aborted txs index nothing), and a restored node must (a)
        # never re-issue a pre-checkpoint id and (b) answer
        # tx_committed(aborted_id) == False exactly like the live node.
        try:
            store.save(
                os.path.join(cp_dir, "versions"),
                versions=versions_df,
                schema_eids=schema_eids,
            )
            for idx_name, idx in (indexes or {}).items():
                idx.save(os.path.join(cp_dir, "indexes", idx_name))
        except Exception:
            # a meta-less partial dir would never be listed NOR pruned
            # by cleanup() — remove it before re-raising
            shutil.rmtree(cp_dir, ignore_errors=True)
            raise
        meta = {
            "tx_id": tx_id,
            "checkpoint_at": now.isoformat(),
            "aborted_txs": sorted(aborted),
            "indexes": sorted((indexes or {}).keys()),
            "index_version": INDEX_VERSION,
        }
        with open(os.path.join(cp_dir, _META), "w") as f:
            json.dump(meta, f)
        return {**meta, "dir": cp_dir}

    # -- restore ----------------------------------------------------------
    def restore_latest(
        self, spark, wal_path=None, doc_store=None, index_loaders=None,
        skip_index_version_bump=None,
    ):
        """Build a TxStore from the newest checkpoint; with a WAL, replay
        only the txs PAST the checkpoint's tx id (the reference replays
        the tx-log tail after restoring, checkpoint.clj try-restore).
        Accepts any WAL spec (JSONL path, 'sqlite:<path>', backend); a
        doc-store spec re-attaches unchanged (it persists independently
        of checkpoints, like the reference's doc store).

        `index_loaders` maps name -> ``load(spark, path)`` (e.g.
        ``IncrementalTextIndex.load``); each secondary index saved in the
        checkpoint is restored and the WAL tail past its own indexed-tx
        watermark is replayed through its listener, so restored indexes
        answer identically to the live node's. With `index_loaders` the
        return value is ``(store, {name: index})``; without, just the
        store (backward compatible)."""
        from crux_spark.bitemporal.store import OPS_SCHEMA
        from crux_spark.bitemporal.txlog import open_tx_log

        cps = self.available_checkpoints()
        if not cps:
            return None if index_loaders is None else (None, {})
        newest = cps[0]
        # index-version gate (index_version_override_test.clj): versions
        # must match EXACTLY; `skip_index_version_bump=(from, to)`
        # permits exactly that one bump — and only needs supplying once,
        # because the next checkpoint written by this build stamps the
        # new version.
        stored = int(newest.get("index_version", 1))
        if stored != INDEX_VERSION and tuple(
            skip_index_version_bump or ()
        ) != (stored, INDEX_VERSION):
            raise IndexVersionOutOfSyncError(
                f"checkpoint {newest['dir']} has index version {stored}, "
                f"this build expects {INDEX_VERSION}; pass "
                f"skip_index_version_bump=({stored}, {INDEX_VERSION}) to "
                f"accept the layout difference"
            )
        store = TxStore.load(spark, os.path.join(newest["dir"], "versions"))
        # TxStore.load derives _tx_id from max(tx_from), which excludes
        # aborted txs (they index nothing). If the newest pre-checkpoint tx
        # was aborted, the restored node would re-issue its id on the next
        # submit_tx, writing a DUPLICATE tx_id into the durable WAL — seed
        # the counter from the checkpoint's watermark, which includes
        # aborted ids, and restore the pre-checkpoint abort set so
        # tx_committed answers match the live node.
        store._tx_id = max(store._tx_id, int(newest["tx_id"]))
        store.aborted_txs.update(
            int(a) for a in newest.get("aborted_txs", [])
        )
        # attach the doc store BEFORE replaying the WAL tail, matching
        # TxStore.recover: an evict op in the replayed tail must run the
        # doc-store tombstone pass during commit() (with self._docs None
        # it would silently skip, leaving evicted docs readable after a
        # crash between submit and commit). evict_eid is idempotent, so
        # re-applying on the happy path is harmless.
        store.doc_store = doc_store
        indexes = {}
        for name, loader in (index_loaders or {}).items():
            idx_dir = os.path.join(newest["dir"], "indexes", name)
            if os.path.isdir(idx_dir):
                indexes[name] = loader(spark, idx_dir)
        tail_rows: list[dict] = []
        backend = open_tx_log(wal_path)
        if backend is not None:
            for entry in backend.entries():
                if int(entry["tx_id"]) > newest["tx_id"]:
                    if entry.get("aborted"):
                        store.aborted_txs.add(int(entry["tx_id"]))
                    else:
                        store._pending.extend(entry["rows"])
                        if indexes:
                            tail_rows.extend(entry["rows"])
                    store._tx_id = max(store._tx_id, int(entry["tx_id"]))
            store.commit()
            store.wal_path = backend
        # replay the WAL tail through each restored index's listener,
        # scoped to txs past ITS watermark (which can trail the
        # checkpoint's if the index was saved earlier)
        # txs that aborted during the tail commit (failed match) index
        # nothing (reference semantics: aborted txs are invisible to
        # secondary indexes)
        for idx in indexes.values():
            rows = [
                r for r in tail_rows
                if int(r["tx_id"]) > getattr(idx, "last_tx_id", -1)
                and int(r["tx_id"]) not in store.aborted_txs
            ]
            if rows:
                batch = spark.createDataFrame(
                    [tuple(r.get(f.name) for f in OPS_SCHEMA.fields) for r in rows],
                    OPS_SCHEMA,
                )
                # the replay rows are driver-resident: hand the batch max
                # down so the index's watermark keeping costs no extra
                # aggregate job (listeners without the kwarg fall back)
                _call_listener(
                    idx.listener, 0, batch,
                    max(int(r["tx_id"]) for r in rows),
                )
        if index_loaders is not None:
            return store, indexes
        return store

    # -- retention --------------------------------------------------------
    def cleanup(self, keep: int = 2) -> list[str]:
        """Prune all but the `keep` newest checkpoints; returns removed
        dirs (the reference's retention policy)."""
        removed = []
        for meta in self.available_checkpoints()[keep:]:
            shutil.rmtree(meta["dir"])
            removed.append(meta["dir"])
        return removed


class Checkpointer:
    """Scheduled checkpointing — the reference's ->checkpointer `start`
    loop (crux-core/src/crux/checkpoint.clj:66-99: a single-thread
    scheduled executor fires roughly every approx-frequency; a failed
    checkpoint is logged and the schedule continues; close() stops it).

    Here: a daemon thread calls ``tick()`` every `interval` seconds
    (default: the CheckpointStore's approx_frequency, which ALSO gates
    inside checkpoint(), so an early tick is a harmless no-op).
    ``indexes`` (e.g. ``node.indexes`` after register_index) persist
    beside the versions table on every checkpoint. ``tick()`` is public
    so tests and cron-style callers can drive the schedule
    deterministically."""

    def __init__(self, cp_store: CheckpointStore, store: TxStore,
                 indexes: dict | None = None, interval: float | None = None):
        import threading

        self.cp_store = cp_store
        self.store = store
        self.indexes = indexes
        self.interval = (
            interval if interval is not None else cp_store.approx_frequency
        )
        self._stop = threading.Event()
        self._thread: "threading.Thread | None" = None

    def tick(self) -> dict | None:
        """One checkpoint attempt. Exceptions are logged and swallowed —
        one failed upload must not stop future checkpoints
        (checkpoint.clj catches Exception inside the scheduled run)."""
        try:
            return self.cp_store.checkpoint(self.store, indexes=self.indexes)
        except Exception:
            import logging

            logging.getLogger(__name__).warning(
                "checkpointing failed", exc_info=True
            )
            return None

    def start(self) -> "Checkpointer":
        import threading

        if self._thread is not None:
            return self

        def run():
            while not self._stop.wait(self.interval):
                self.tick()

        self._thread = threading.Thread(
            target=run, name="crux-checkpoint", daemon=True
        )
        self._thread.start()
        return self

    def close(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

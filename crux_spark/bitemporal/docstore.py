"""Content-addressed document-store transports (the reference's
DocumentStore protocol, crux-core/src/crux/db.clj submit-docs /
fetch-docs keyed by content hash).

The reference ships interchangeable backends for this one seam: the
default KV store (crux-core/src/crux/document_store.clj), JDBC
(crux-jdbc/src/crux/jdbc.clj), S3 (crux-s3/src/crux/s3.clj), Azure
Blobs and Google Cloud Storage (labs modules) — swapping them is a
topology-map change. Here the same seam with the two in-sandbox
transports the tx log already has (txlog.py):

- JsonlDocStore — append-only JSONL file / object-store key,
  last-write-wins per content hash (the S3/blob-store analogue: one
  PUT per doc batch, content hash as the key).
- SqliteDocStore — one ``doc_store(content_hash PRIMARY KEY, eid,
  doc)`` SQL table (the crux-jdbc analogue; postgres is a
  connection-string change).

Eviction is keyed by ENTITY: ``evict_eid`` replaces every stored doc
of the entity with the ``{"crux.db/evicted": true}`` tombstone —
matching the reference's evict semantics, where all content-addressed
docs an entity ever referenced are erased while tx structure survives
(tx.clj tx-log-evict-454).
"""

from __future__ import annotations

import json
import os
from contextlib import closing

_TOMBSTONE = {"crux.db/evicted": True}


class JsonlDocStore:
    def __init__(self, path: str):
        self.path = path

    def submit_docs(self, docs: dict[str, tuple[str, dict]]) -> None:
        """docs: content_hash -> (eid, doc)."""
        if not docs:
            return
        with open(self.path, "a") as f:
            for h, (eid, doc) in docs.items():
                f.write(
                    json.dumps({"content_hash": h, "eid": eid, "doc": doc})
                    + "\n"
                )

    def _all(self) -> dict[str, dict]:
        out: dict[str, dict] = {}
        if not os.path.exists(self.path):
            return out
        with open(self.path) as f:
            for line in f:
                if line.strip():
                    r = json.loads(line)
                    out[r["content_hash"]] = r  # last write wins
        return out

    def fetch_docs(self, content_hashes: list[str]) -> dict[str, dict]:
        all_ = self._all()
        return {
            h: all_[h]["doc"] for h in content_hashes if h in all_
        }

    def evict_eid(self, eid: str, keep_hashes=()) -> int:
        """Tombstone every doc of the entity except ``keep_hashes``
        (content referenced after the evict); returns docs redacted."""
        all_ = self._all()
        n = 0
        for r in all_.values():
            if (
                r["eid"] == eid
                and r["doc"] != _TOMBSTONE
                and r["content_hash"] not in keep_hashes
            ):
                r["doc"] = dict(_TOMBSTONE)
                n += 1
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            for r in all_.values():
                f.write(json.dumps(r) + "\n")
        os.replace(tmp, self.path)
        return n


class SqliteDocStore:
    def __init__(self, path: str):
        self.path = path
        with closing(self._conn()) as con, con:
            con.execute(
                "CREATE TABLE IF NOT EXISTS doc_store ("
                "content_hash TEXT PRIMARY KEY, eid TEXT NOT NULL, "
                "doc TEXT NOT NULL)"
            )

    def _conn(self):
        import sqlite3

        return sqlite3.connect(self.path)

    def submit_docs(self, docs: dict[str, tuple[str, dict]]) -> None:
        if not docs:
            return
        with closing(self._conn()) as con, con:
            con.executemany(
                "INSERT OR REPLACE INTO doc_store (content_hash, eid, doc)"
                " VALUES (?, ?, ?)",
                [
                    (h, eid, json.dumps(doc, sort_keys=True))
                    for h, (eid, doc) in docs.items()
                ],
            )

    def fetch_docs(self, content_hashes: list[str]) -> dict[str, dict]:
        if not content_hashes:
            return {}
        qs = ",".join("?" * len(content_hashes))
        with closing(self._conn()) as con:
            rows = con.execute(
                f"SELECT content_hash, doc FROM doc_store "
                f"WHERE content_hash IN ({qs})",
                list(content_hashes),
            ).fetchall()
        return {h: json.loads(d) for h, d in rows}

    def evict_eid(self, eid: str, keep_hashes=()) -> int:
        keep = list(keep_hashes)
        sql = "UPDATE doc_store SET doc = ? WHERE eid = ? AND doc != ?"
        args: list = [json.dumps(_TOMBSTONE), eid, json.dumps(_TOMBSTONE)]
        if keep:
            sql += f" AND content_hash NOT IN ({','.join('?' * len(keep))})"
            args += keep
        with closing(self._conn()) as con, con:
            return con.execute(sql, args).rowcount


def open_doc_store(spec):
    """Resolve a doc-store spec: an existing backend passes through; a
    'sqlite:<path>' string opens SqliteDocStore; any other string is a
    JSONL path."""
    if spec is None:
        return None
    if hasattr(spec, "submit_docs") and hasattr(spec, "fetch_docs"):
        return spec
    if isinstance(spec, str) and spec.startswith("sqlite:"):
        return SqliteDocStore(spec[len("sqlite:"):])
    return JsonlDocStore(spec)

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


class LocalEmulatedBlobFS:
    """Minimal object-store interface (put/get/list_prefix) backed by a
    local directory tree — the in-sandbox stand-in for an S3/Azure/GCS
    client. Keys map to files under <root>/<bucket>/<key>; list_prefix
    is a recursive walk, like a ListObjectsV2 prefix listing. A real
    deployment would swap in an fsspec filesystem or SDK client with the
    same three methods; nothing else in BlobDocStore changes."""

    def __init__(self, root: str):
        self.root = root

    def _path(self, bucket: str, key: str) -> str:
        return os.path.join(self.root, bucket, *key.split("/"))

    def put(self, bucket: str, key: str, data: bytes) -> None:
        p = self._path(bucket, key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, p)  # object PUTs are atomic; mirror that

    def get(self, bucket: str, key: str) -> bytes | None:
        p = self._path(bucket, key)
        if not os.path.exists(p):
            return None
        with open(p, "rb") as f:
            return f.read()

    def list_prefix(self, bucket: str, prefix: str) -> list[str]:
        base = self._path(bucket, prefix)
        if not os.path.isdir(base):
            return []
        out = []
        for dirpath, _, files in os.walk(base):
            for name in files:
                full = os.path.join(dirpath, name)
                rel = os.path.relpath(full, os.path.join(self.root, bucket))
                out.append(rel.replace(os.sep, "/"))
        return sorted(out)


class BlobDocStore:
    """Cloud blob-store transport (crux-s3/src/crux/s3.clj; the Azure /
    GCS labs modules share the layout): ONE OBJECT PER CONTENT HASH at
    ``<prefix>/docs/<hash>.json`` — a doc batch is N idempotent PUTs, a
    fetch is M keyed GETs, exactly the reference's S3DocumentStore
    put-objects/get-objects. Blob stores have no secondary index, so
    evict-by-entity is served by marker objects at
    ``<prefix>/eid/<eid-hex>/<hash>`` written alongside each doc (a
    prefix listing finds the entity's hashes without a full-store scan —
    at 100 TB a bucket-wide List per evict is the difference between an
    O(docs-of-entity) and an O(all-docs) operation).

    Accepts ``s3://bucket/prefix``, ``azure://container/prefix`` or
    ``gs://bucket/prefix`` URLs. The filesystem client is injectable;
    the default is the local emulation (CRUX_SPARK_BLOB_DIR or
    <tmpdir>/crux_spark_blob), keeping topology-config parity
    demonstrable in-sandbox."""

    SCHEMES = ("s3", "azure", "gs")

    def __init__(self, url: str, fs=None):
        scheme, rest = url.split("://", 1)
        if scheme not in self.SCHEMES:
            raise ValueError(f"unsupported blob scheme {scheme!r}")
        bucket, _, prefix = rest.partition("/")
        if not bucket:
            raise ValueError(f"blob URL needs a bucket: {url!r}")
        self.bucket = bucket
        self.prefix = prefix.rstrip("/")
        if fs is None:
            import tempfile

            root = os.environ.get(
                "CRUX_SPARK_BLOB_DIR",
                os.path.join(tempfile.gettempdir(), "crux_spark_blob"),
            )
            fs = LocalEmulatedBlobFS(root)
        self.fs = fs

    def _doc_key(self, h: str) -> str:
        return f"{self.prefix}/docs/{h}.json" if self.prefix else f"docs/{h}.json"

    def _eid_prefix(self, eid_hex: str) -> str:
        base = f"eid/{eid_hex}"
        return f"{self.prefix}/{base}" if self.prefix else base

    @staticmethod
    def _hex(eid: str) -> str:
        # eids are arbitrary strings; hex keeps the key charset safe
        return eid.encode("utf-8").hex()

    def submit_docs(self, docs: dict[str, tuple[str, dict]]) -> None:
        for h, (eid, doc) in docs.items():
            self.fs.put(
                self.bucket,
                self._doc_key(h),
                json.dumps({"eid": eid, "doc": doc}, sort_keys=True).encode(),
            )
            self.fs.put(
                self.bucket, f"{self._eid_prefix(self._hex(eid))}/{h}", b""
            )

    def fetch_docs(self, content_hashes: list[str]) -> dict[str, dict]:
        out: dict[str, dict] = {}
        for h in content_hashes:
            data = self.fs.get(self.bucket, self._doc_key(h))
            if data is not None:
                out[h] = json.loads(data)["doc"]
        return out

    def evict_eid(self, eid: str, keep_hashes=()) -> int:
        n = 0
        for key in self.fs.list_prefix(
            self.bucket, self._eid_prefix(self._hex(eid))
        ):
            h = key.rsplit("/", 1)[-1]
            if h in keep_hashes:
                continue
            data = self.fs.get(self.bucket, self._doc_key(h))
            if data is None:
                continue
            rec = json.loads(data)
            if rec["doc"] != _TOMBSTONE:
                rec["doc"] = dict(_TOMBSTONE)
                self.fs.put(
                    self.bucket,
                    self._doc_key(h),
                    json.dumps(rec, sort_keys=True).encode(),
                )
                n += 1
        return n


def open_doc_store(spec):
    """Resolve a doc-store spec: an existing backend passes through; a
    'sqlite:<path>' string opens SqliteDocStore; an 's3://', 'azure://'
    or 'gs://' URL opens BlobDocStore (local emulation in-sandbox); any
    other string is a JSONL path."""
    if spec is None:
        return None
    if hasattr(spec, "submit_docs") and hasattr(spec, "fetch_docs"):
        return spec
    if isinstance(spec, str) and spec.startswith("sqlite:"):
        return SqliteDocStore(spec[len("sqlite:"):])
    if isinstance(spec, str) and any(
        spec.startswith(s + "://") for s in BlobDocStore.SCHEMES
    ):
        return BlobDocStore(spec)
    return JsonlDocStore(spec)

"""JSON catalog: databases, collections, indexes, aliases, TTL, embedding.

Replaces the reference's server-side catalog that the client reaches via
``/database/*`` and ``/collection/*`` endpoints
(reference: aiotcvectordb/model/database.py:17-210). A versioned JSON state file (metastore.JsonState — object-store-safe,
highest committed version wins) holds all metadata; data lives in ``ParquetStore``. The catalog is tiny
(metadata only) so a plain file is fine at any data scale — at 100 TB the
bottleneck is data, never this.

Database types mirror the reference discriminator ``dbType`` in
{BASE_DB, AI_DOC, AI_DB} (reference database.py:103-112).
"""

from __future__ import annotations

import re
import time
from dataclasses import asdict, dataclass, field
from typing import Any

from aiotcvectordb_spark.errors import (
    CollectionNotExistError,
    DatabaseNotExistError,
    ParamError,
)

BASE_DB = "BASE_DB"
AI_DOC = "AI_DOC"
AI_DB = "AI_DB"

_NAME_RE = re.compile(r"^[A-Za-z0-9_]{1,128}$")


@dataclass
class IndexField:
    """One index declaration.

    kind: 'vector' | 'filter' | 'primary_key' | 'sparse'
    (reference model/__init__.py:29-42 — VectorIndex / FilterIndex /
    SparseIndex; FieldType String/Uint64/Array/Vector).
    """

    name: str
    kind: str
    field_type: str = "string"  # string | uint64 | double | array | vector | sparse_vector
    metric_type: str | None = None  # L2 | IP | COSINE
    index_type: str | None = None  # FLAT | HNSW | IVF_FLAT | PRIMARY_KEY | FILTER | ...
    dimension: int | None = None
    params: dict[str, Any] = field(default_factory=dict)  # M, efConstruction, nlist...


@dataclass
class CollectionMeta:
    name: str
    database: str
    shard: int = 1
    replicas: int = 0
    description: str = ""
    indexes: list[IndexField] = field(default_factory=list)
    embedding: dict[str, Any] | None = None  # {field, vector_field, model}
    ttl_config: dict[str, Any] | None = None  # {enable, timeField}
    filter_index_config: dict[str, Any] | None = None
    create_time: str = ""
    index_status: str = "ready"
    ann_state: dict[str, Any] = field(default_factory=dict)  # IVF/LSH build artifacts

    @property
    def primary_key(self) -> str:
        for ix in self.indexes:
            if ix.kind == "primary_key" or ix.index_type == "PRIMARY_KEY":
                return ix.name
        return "id"

    @property
    def vector_field(self) -> str | None:
        for ix in self.indexes:
            if ix.kind == "vector":
                return ix.name
        return None

    def vector_index(self) -> IndexField | None:
        for ix in self.indexes:
            if ix.kind == "vector":
                return ix
        return None


class Catalog:
    def __init__(self, root: str, spark=None) -> None:
        # versioned JSON state over the Hadoop FS API (r8): same code
        # path on local disk, HDFS, and object stores — no os.replace
        from aiotcvectordb_spark.metastore import JsonState

        self.root = root
        self._state = JsonState(root, "catalog", {"databases": {}}, spark)

    @property
    def path(self) -> str:
        return self._state.path

    def _load(self) -> dict:
        return self._state.load()

    def _save(self, data: dict) -> None:
        self._state.save(data)

    # -- databases (reference stub.py:61-193) --------------------------------

    def create_database(self, name: str, db_type: str = BASE_DB, exist_ok: bool = False) -> None:
        if not _NAME_RE.match(name):
            raise ParamError(
                f"database name {name!r} must be 1-128 chars of [A-Za-z0-9_]"
            )
        data = self._load()
        if name in data["databases"]:
            if exist_ok:
                return
            raise ParamError(f"database {name!r} already exists")
        data["databases"][name] = {
            "db_type": db_type,
            "create_time": time.strftime("%Y-%m-%d %H:%M:%S"),
            "collections": {},
            "aliases": {},
        }
        self._save(data)

    def drop_database(self, name: str) -> int:
        """Returns affectedCount (0 if absent — reference swallows not-exist,
        stub.py:126-142)."""
        data = self._load()
        if name not in data["databases"]:
            return 0
        del data["databases"][name]
        self._save(data)
        return 1

    def list_databases(self) -> list[dict]:
        data = self._load()
        return [
            {
                "name": n,
                "dbType": d["db_type"],
                "count": len(d["collections"]),
                "createTime": d["create_time"],
            }
            for n, d in data["databases"].items()
        ]

    def _db(self, data: dict, name: str) -> dict:
        if name not in data["databases"]:
            raise DatabaseNotExistError(f"database {name!r} does not exist")
        return data["databases"][name]

    def database_exists(self, name: str) -> bool:
        return name in self._load()["databases"]

    # -- collections (reference stub.py:195-437) -----------------------------

    def put_collection(self, meta: CollectionMeta, *, replace: bool = False) -> None:
        data = self._load()
        db = self._db(data, meta.database)
        if meta.name in db["collections"] and not replace:
            raise ParamError(
                f"collection {meta.database}.{meta.name} already exists"
            )
        if not meta.create_time:
            meta.create_time = time.strftime("%Y-%m-%d %H:%M:%S")
        db["collections"][meta.name] = asdict(meta)
        self._save(data)

    def get_collection(self, database: str, name: str) -> CollectionMeta:
        data = self._load()
        db = self._db(data, database)
        resolved = db["aliases"].get(name, name)
        if resolved not in db["collections"]:
            raise CollectionNotExistError(
                f"collection {database}.{name} does not exist"
            )
        raw = dict(db["collections"][resolved])
        raw["indexes"] = [IndexField(**ix) for ix in raw["indexes"]]
        return CollectionMeta(**raw)

    def collection_exists(self, database: str, name: str) -> bool:
        try:
            self.get_collection(database, name)
            return True
        except (CollectionNotExistError, DatabaseNotExistError):
            return False

    def list_collections(self, database: str) -> list[str]:
        data = self._load()
        return sorted(self._db(data, database)["collections"].keys())

    def drop_collection(self, database: str, name: str) -> int:
        data = self._load()
        db = self._db(data, database)
        if name not in db["collections"]:
            return 0
        del db["collections"][name]
        db["aliases"] = {a: c for a, c in db["aliases"].items() if c != name}
        self._save(data)
        return 1

    # -- aliases (reference stub.py:405-437) ---------------------------------

    def set_alias(self, database: str, collection: str, alias: str) -> int:
        data = self._load()
        db = self._db(data, database)
        if collection not in db["collections"]:
            raise CollectionNotExistError(
                f"collection {database}.{collection} does not exist"
            )
        db["aliases"][alias] = collection
        self._save(data)
        return 1

    def aliases_of(self, database: str, collection: str) -> list[str]:
        """Alias names currently pointing at a collection (the
        reference's describe response carries `alias` —
        database.py:457-479 coll_convert)."""
        data = self._load()
        db = self._db(data, database)
        return sorted(a for a, c in db["aliases"].items() if c == collection)

    def delete_alias(self, database: str, alias: str) -> int:
        data = self._load()
        db = self._db(data, database)
        if alias not in db["aliases"]:
            return 0
        del db["aliases"][alias]
        self._save(data)
        return 1

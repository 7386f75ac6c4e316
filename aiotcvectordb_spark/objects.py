"""Bound object wrappers: Database and Collection handles.

The reference's primary usage pattern is object-oriented — get a
database handle, get a collection handle, call operations on it
(reference: aiotcvectordb/model/database.py, model/collection.py:79-628;
client methods `database`/`collection` at stub.py:178-193/336-350).
These wrappers give the same ergonomics over ``VectorDBEngine`` by pure
delegation: every method simply curries the (database, collection)
arguments into the corresponding flat engine call, so the single
engine implementation stays the one source of truth.
"""

from __future__ import annotations

from typing import Any

# Engine methods whose first parameter is the database name.
_DB_METHODS = (
    "create_collection",
    "create_collection_if_not_exists",
    "exists_collection",
    "describe_collection",
    "list_collections",
    "drop_collection",
    "truncate_collection",
    "set_alias",
    "delete_alias",
    "sql",
)

# Engine methods whose first two parameters are (database, collection).
_COLL_METHODS = (
    "upsert",
    "query",
    "query_df",
    "count",
    "search",
    "search_by_id",
    "search_by_text",
    "hybrid_search",
    "fulltext_search",
    "update",
    "delete",
    "add_index",
    "drop_index",
    "rebuild_index",
    "modify_vector_index",
    "export",
    "read",
    "compact",
    "stream_search_sink",
)


class Collection:
    """A (database, collection)-bound handle; every operation delegates
    to the flat engine call with both names curried in."""

    def __init__(
        self, engine, database: str, name: str, *, read_consistency=None
    ) -> None:
        from aiotcvectordb_spark.params import validate_read_consistency

        self._engine = engine
        self.database_name = database
        self.collection_name = name
        # reference model/collection.py carries the client's consistency
        # into every read body; validated no-op here (snapshot reads)
        self.read_consistency = validate_read_consistency(read_consistency)

    def __getattr__(self, attr: str) -> Any:
        if attr not in _COLL_METHODS:
            raise AttributeError(
                f"Collection has no operation {attr!r}"
            )
        fn = getattr(self._engine, attr)

        def call(*args: Any, **kwargs: Any) -> Any:
            return fn(self.database_name, self.collection_name, *args, **kwargs)

        call.__name__ = attr
        return call

    def __repr__(self) -> str:  # pragma: no cover
        return f"Collection({self.database_name}.{self.collection_name})"


# CollectionViewManager methods whose first two params are (database, cv).
_CV_METHODS = (
    "load_and_split_text",
    "upload_file",
    "search",
    "query",
    "get_document_set",
    "delete",
    "update",
    "get_chunks",
    "register_images",
    "get_image_url",
    "query_file_details",
    "truncate_collection_view",
    "describe_collection_view",
    "drop_collection_view",
)

# Manager methods whose first param is the database name.
_AI_DB_METHODS = (
    "create_collection_view",
    "list_collection_views",
    "describe_collection_view",
    "drop_collection_view",
    "truncate_collection_view",
    "set_alias",
    "delete_alias",
)


class CollectionView:
    """A (database, view)-bound AI-pipeline handle (reference
    model/collection_view.py's CollectionView object)."""

    def __init__(self, manager, database: str, name: str) -> None:
        self._manager = manager
        self.database_name = database
        self.view_name = name

    def __getattr__(self, attr: str) -> Any:
        if attr not in _CV_METHODS:
            raise AttributeError(f"CollectionView has no operation {attr!r}")
        fn = getattr(self._manager, attr)

        def call(*args: Any, **kwargs: Any) -> Any:
            return fn(self.database_name, self.view_name, *args, **kwargs)

        call.__name__ = attr
        return call

    def __repr__(self) -> str:  # pragma: no cover
        return f"CollectionView({self.database_name}.{self.view_name})"


class AIDatabase:
    """An AI-database-bound handle (reference model/ai_database.py):
    collection-view lifecycle plus `collection_view()` handle lookup."""

    def __init__(self, engine, name: str) -> None:
        from aiotcvectordb_spark.collection_view import CollectionViewManager

        self._engine = engine
        self._manager = CollectionViewManager(engine)
        self.database_name = name

    def collection_view(self, name: str) -> CollectionView:
        # raises if the view doesn't exist, like Database.collection
        self._manager.describe_collection_view(self.database_name, name)
        return CollectionView(self._manager, self.database_name, name)

    def __getattr__(self, attr: str) -> Any:
        if attr not in _AI_DB_METHODS:
            raise AttributeError(f"AIDatabase has no operation {attr!r}")
        fn = getattr(self._manager, attr)

        def call(*args: Any, **kwargs: Any) -> Any:
            return fn(self.database_name, *args, **kwargs)

        call.__name__ = attr
        return call

    def __repr__(self) -> str:  # pragma: no cover
        return f"AIDatabase({self.database_name})"


class Database:
    """A database-bound handle mirroring the reference's Database
    object: collection lifecycle plus `collection()` handle lookup."""

    def __init__(self, engine, name: str, *, read_consistency=None) -> None:
        from aiotcvectordb_spark.params import validate_read_consistency

        self._engine = engine
        self.database_name = name
        self.read_consistency = validate_read_consistency(read_consistency)

    def collection(self, name: str) -> Collection:
        if not self._engine.exists_collection(self.database_name, name):
            from aiotcvectordb_spark.errors import CollectionNotExistError

            raise CollectionNotExistError(
                f"collection {name!r} not found in {self.database_name!r}"
            )
        return Collection(self._engine, self.database_name, name)

    def __getattr__(self, attr: str) -> Any:
        if attr not in _DB_METHODS:
            raise AttributeError(f"Database has no operation {attr!r}")
        fn = getattr(self._engine, attr)

        def call(*args: Any, **kwargs: Any) -> Any:
            return fn(self.database_name, *args, **kwargs)

        call.__name__ = attr
        return call

    def __repr__(self) -> str:  # pragma: no cover
        return f"Database({self.database_name})"

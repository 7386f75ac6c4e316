"""AI document pipeline surface: CollectionViews, DocumentSets, chunks.

Covers SURVEY §2.6 ops 35-47 (reference:
aiotcvectordb/model/ai_database.py + collection_view.py +
document_set.py). A CollectionView owns two parquet tables via the
engine's store: ``<cv>__docsets`` (one row per uploaded document:
id, name, full text, byte size, indexed status) and ``<cv>__chunks``
(the split+embedded chunks). Images metadata (op 45, multimodal) lives
in ``<cv>__images``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from aiotcvectordb_spark.catalog import AI_DOC, CollectionMeta
from aiotcvectordb_spark.errors import ParamError
from aiotcvectordb_spark.operators import chunks as chunk_ops
from aiotcvectordb_spark.operators.chunks import document_keywords


class CollectionViewManager:
    """Facade over an engine for AI-DB (AI_DOC) operations."""

    def __init__(self, engine) -> None:
        self.engine = engine

    # ------------------------------------------------------------ DDL 35-37

    def create_collection_view(
        self,
        database: str,
        name: str,
        *,
        description: str = "",
        embedding: dict | None = None,
        splitter_process: dict | None = None,
        parsing_process: dict | None = None,
        expected_file_num: int | None = None,
        average_file_size: int | None = None,
    ) -> CollectionMeta:
        meta = CollectionMeta(
            name=name,
            database=database,
            description=description,
            indexes=[],
            embedding=embedding
            or {"field": "text", "vector_field": "vector", "model": "hash-embed", "dim": 32},
        )
        meta.ann_state["cv"] = {
            "splitter": splitter_process or {"chunk_size": 200, "overlap": 50},
            "parsing": parsing_process or {},
            "expected_file_num": expected_file_num,
            "average_file_size": average_file_size,
        }
        self.engine.catalog.put_collection(meta)
        return meta

    def describe_collection_view(self, database: str, name: str) -> dict:
        meta = self.engine.catalog.get_collection(database, name)
        try:
            n = self._docsets(database, name).count()
        except FileNotFoundError:
            n = 0
        return {
            "database": database,
            "collectionView": name,
            "description": meta.description,
            "embedding": meta.embedding,
            "splitterPreprocess": meta.ann_state.get("cv", {}).get("splitter"),
            "parsingProcess": meta.ann_state.get("cv", {}).get("parsing"),
            "documentSetCount": n,
        }

    def list_collection_views(self, database: str) -> list[str]:
        return self.engine.catalog.list_collections(database)

    def drop_collection_view(self, database: str, name: str) -> dict:
        for suffix in ("__docsets", "__chunks", "__images"):
            self.engine.store.drop(database, name + suffix)
        return {
            "affectedCount": self.engine.catalog.drop_collection(database, name)
        }

    def truncate_collection_view(self, database: str, name: str) -> dict:
        try:
            ds = self._docsets(database, name)
        except FileNotFoundError:
            return {"affectedCount": 0}
        n = ds.count()
        self.engine.store.write(ds.limit(0), database, name + "__docsets")
        try:
            ch = self._chunks(database, name)
            self.engine.store.write(ch.limit(0), database, name + "__chunks")
        except FileNotFoundError:
            pass
        return {"affectedCount": n}

    # -------------------------------------------------------- ingest 38/44

    def load_and_split_text(
        self,
        database: str,
        cv: str,
        *,
        doc_name: str,
        text: str,
        metadata: dict | None = None,
    ) -> dict:
        """Op 38: ingest one document — parse (ParsingProcess + file
        extension), split, embed, append to the chunks table, register
        the DocumentSet (the reference uploads to COS and the server
        does this; here the ingestion job IS the engine). HTML/markdown
        uploads are tag-stripped by ``operators/docparse``; chunks and
        positions address the PARSED text (reference
        collection_view.py:342-423 carries the ParsingProcess config).
        """
        from aiotcvectordb_spark.operators import docparse

        meta = self.engine.catalog.get_collection(database, cv)
        cv_cfg = meta.ann_state.get("cv", {})
        cfg = cv_cfg.get("splitter", {})
        dim = (meta.embedding or {}).get("dim", 32)
        ds_id = hashlib.md5(f"{database}/{cv}/{doc_name}".encode()).hexdigest()[:16]

        parsed_text, title = docparse.parse_document(text, doc_name)
        title_prefix = (
            title if cfg.get("append_title_to_chunk") and title else None
        )
        keywords_prefix = None
        if cfg.get("append_keywords_to_chunk"):
            kws = document_keywords(parsed_text)
            keywords_prefix = ", ".join(kws) if kws else None

        new_chunks = chunk_ops.load_and_split_text(
            self.engine.spark,
            [(ds_id, parsed_text)],
            chunk_size=cfg.get("chunk_size", 200),
            overlap=cfg.get("overlap", 50),
            dim=dim,
            title_prefix=title_prefix,
            keywords_prefix=keywords_prefix,
        )
        try:
            old = self._chunks(database, cv).filter(F.col("doc_set_id") != ds_id)
            merged = old.unionByName(new_chunks)
        except FileNotFoundError:
            merged = new_chunks
        self.engine.store.write(merged, database, cv + "__chunks")

        n_chunks = self._chunks(database, cv).filter(
            F.col("doc_set_id") == ds_id
        ).count()
        row = {
            "doc_set_id": ds_id,
            "doc_set_name": doc_name,
            "text": text,
            "byte_length": len(text.encode("utf-8")),
            "chunk_num": n_chunks,
            "indexed_status": "Ready",
            "indexed_progress": 100,
            "meta_json": str(metadata or {}),
        }
        ds_df = self.engine.spark.createDataFrame(
            [tuple(row.values())],
            "doc_set_id string, doc_set_name string, text string, "
            "byte_length long, chunk_num long, indexed_status string, "
            "indexed_progress long, meta_json string",
        )
        try:
            old_ds = self._docsets(database, cv).filter(
                F.col("doc_set_id") != ds_id
            )
            merged_ds = old_ds.unionByName(ds_df)
        except FileNotFoundError:
            merged_ds = ds_df
        self.engine.store.write(merged_ds, database, cv + "__docsets")
        return {k: row[k] for k in ("doc_set_id", "doc_set_name", "chunk_num", "indexed_status")}

    upload_file = load_and_split_text  # op 44: same job, param-driven

    # --------------------------------------------------------- query 39-43

    def _docsets(self, database: str, cv: str) -> DataFrame:
        return self.engine.store.read(self.engine.spark, database, cv + "__docsets")

    def _chunks(self, database: str, cv: str) -> DataFrame:
        return self.engine.store.read(self.engine.spark, database, cv + "__chunks")

    def search(
        self,
        database: str,
        cv: str,
        content: str,
        *,
        document_set_name: Sequence[str] | None = None,
        expand_chunk: int = 0,
        limit: int = 3,
        filter: str | None = None,
    ) -> list[dict]:
        """Op 39: semantic chunk retrieval with optional neighborhood
        expansion."""
        meta = self.engine.catalog.get_collection(database, cv)
        dim = (meta.embedding or {}).get("dim", 32)
        chunks = self._chunks(database, cv)
        ds_ids = None
        if document_set_name:
            ds = self._docsets(database, cv)
            ds_ids = [
                r["doc_set_id"]
                for r in ds.filter(
                    F.col("doc_set_name").isin(list(document_set_name))
                ).select("doc_set_id").collect()
            ]
        out = chunk_ops.chunk_search(
            chunks,
            content,
            dim=dim,
            limit=limit,
            document_set_names=ds_ids,
            expand_chunk=expand_chunk,
            filter=filter,
        )
        return [r.asDict(recursive=True) for r in out.collect()]

    def query(
        self,
        database: str,
        cv: str,
        *,
        document_set_id: Sequence[str] | None = None,
        document_set_name: Sequence[str] | None = None,
        filter: str | None = None,
        limit: int | None = None,
        offset: int = 0,
        output_fields: Sequence[str] | None = None,
    ) -> list[dict]:
        """Op 40: list/filter DocumentSets."""
        df = self._docsets(database, cv).drop("text")
        if document_set_id:
            df = df.filter(F.col("doc_set_id").isin(list(document_set_id)))
        if document_set_name:
            df = df.filter(F.col("doc_set_name").isin(list(document_set_name)))
        if filter:
            df = df.filter(filter)
        df = df.orderBy("doc_set_id")
        if offset:
            df = df.offset(offset)
        if limit is not None:
            df = df.limit(limit)
        if output_fields:
            keep = ["doc_set_id"] + [
                c for c in output_fields if c != "doc_set_id"
            ]
            df = df.select(*keep)
        return [r.asDict() for r in df.collect()]

    def get_document_set(
        self, database: str, cv: str, *,
        document_set_id: str | None = None,
        document_set_name: str | None = None,
    ) -> dict | None:
        """Op 41: fetch one DocumentSet incl. full text."""
        if not document_set_id and not document_set_name:
            raise ParamError("need document_set_id or document_set_name")
        df = self._docsets(database, cv)
        if document_set_id:
            df = df.filter(F.col("doc_set_id") == document_set_id)
        if document_set_name:
            df = df.filter(F.col("doc_set_name") == document_set_name)
        rows = df.limit(1).collect()
        return rows[0].asDict() if rows else None

    def delete(
        self, database: str, cv: str, *,
        document_set_ids: Sequence[str] | None = None,
        document_set_names: Sequence[str] | None = None,
        filter: str | None = None,
    ) -> dict:
        """Op 42: delete DocumentSets (and their chunks) by id/name/filter."""
        ds = self._docsets(database, cv)
        pred = F.lit(False)
        if document_set_ids:
            pred = pred | F.col("doc_set_id").isin(list(document_set_ids))
        if document_set_names:
            pred = pred | F.col("doc_set_name").isin(list(document_set_names))
        if filter:
            pred = pred | F.expr(filter)
        victims = ds.filter(pred).select("doc_set_id")
        n = victims.count()
        self.engine.store.write(
            ds.join(F.broadcast(victims), "doc_set_id", "left_anti"),
            database, cv + "__docsets",
        )
        ch = self._chunks(database, cv)
        self.engine.store.write(
            ch.join(F.broadcast(victims), "doc_set_id", "left_anti"),
            database, cv + "__chunks",
        )
        return {"affectedCount": n}

    def update(
        self, database: str, cv: str, *,
        document_set_ids: Sequence[str] | None = None,
        document_set_names: Sequence[str] | None = None,
        filter: str | None = None,
        values: dict | None = None,
    ) -> dict:
        """Op 42 (update half, reference collection_view.py:244-302):
        conditional update of DocumentSet metadata fields by id/name/
        filter — same withColumn(when(pred, ...)) rewrite as op 20."""
        if not values:
            raise ParamError("update needs non-empty values")
        if not (document_set_ids or document_set_names or filter):
            raise ParamError("update needs ids, names, or a filter")
        ds = self._docsets(database, cv)
        for col in values:
            if col not in ds.columns or col == "doc_set_id":
                raise ParamError(f"cannot update field {col!r}")
        pred = F.lit(False)
        if document_set_ids:
            pred = pred | F.col("doc_set_id").isin(list(document_set_ids))
        if document_set_names:
            pred = pred | F.col("doc_set_name").isin(list(document_set_names))
        if filter:
            pred = pred | F.expr(filter)
        n = ds.filter(pred).count()
        updated = ds
        for col, val in values.items():
            updated = updated.withColumn(
                col, F.when(pred, F.lit(val)).otherwise(F.col(col))
            )
        self.engine.store.write(updated, database, cv + "__docsets")
        return {"affectedCount": n}

    def set_alias(self, database: str, cv: str, alias: str) -> dict:
        """Op 37 alias half: CVs live in the same catalog namespace as
        collections, so alias indirection is the shared catalog map."""
        return {"affectedCount": self.engine.catalog.set_alias(database, cv, alias)}

    def delete_alias(self, database: str, alias: str) -> dict:
        return {"affectedCount": self.engine.catalog.delete_alias(database, alias)}

    def get_chunks(
        self, database: str, cv: str, *,
        document_set_id: str | None = None,
        document_set_name: str | None = None,
        limit: int | None = None,
        offset: int = 0,
    ) -> list[dict]:
        """Op 43: page through a docset's chunks in position order."""
        if document_set_id is None:
            ds = self.get_document_set(
                database, cv, document_set_name=document_set_name
            )
            if ds is None:
                return []
            document_set_id = ds["doc_set_id"]
        df = (
            self._chunks(database, cv)
            .filter(F.col("doc_set_id") == document_set_id)
            .orderBy("chunk_pos")
            .select("chunk_pos", "start_pos", "end_pos", "text")
        )
        if offset:
            df = df.offset(offset)
        if limit is not None:
            df = df.limit(limit)
        return [r.asDict() for r in df.collect()]

    # ------------------------------------------------------ multimodal 45-46

    def register_images(
        self, database: str, cv: str, rows: Sequence[dict]
    ) -> int:
        """Op 45 plumbing: images metadata table
        (doc_set_id, file_name, image_url, width, height, content binary).
        Decode/feature-extract is stubbed (no image libs in container) but
        the Spark-side schema/partitioning is real."""
        df = self.engine.spark.createDataFrame(
            [
                (
                    r["doc_set_id"], r["file_name"], r.get("image_url", ""),
                    r.get("width"), r.get("height"), r.get("content"),
                )
                for r in rows
            ],
            "doc_set_id string, file_name string, image_url string, "
            "width int, height int, content binary",
        )
        try:
            old = self.engine.store.read(
                self.engine.spark, database, cv + "__images"
            )
            df = old.unionByName(df)
        except FileNotFoundError:
            pass
        self.engine.store.write(df, database, cv + "__images")
        return len(rows)

    def get_image_url(
        self, database: str, cv: str, *, document_ids: Sequence[str],
        file_name: str | None = None,
    ) -> list[dict]:
        df = self.engine.store.read(self.engine.spark, database, cv + "__images")
        df = df.filter(F.col("doc_set_id").isin(list(document_ids)))
        if file_name:
            df = df.filter(F.col("file_name") == file_name)
        return [
            r.asDict()
            for r in df.select("doc_set_id", "file_name", "image_url").collect()
        ]

    def query_file_details(
        self, database: str, cv: str, *,
        filter: str | None = None,
        limit: int | None = None,
        offset: int = 0,
        output_fields: Sequence[str] | None = None,
    ) -> list[dict]:
        """Op 46: file-level metadata with filter/projection/pagination."""
        return self.query(
            database, cv, filter=filter, limit=limit, offset=offset,
            output_fields=output_fields,
        )

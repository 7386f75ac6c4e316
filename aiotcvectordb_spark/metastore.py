"""Versioned JSON metadata files over the Hadoop FileSystem API.

The catalog and user registries are tiny driver-side JSON documents
that previously committed with ``os.replace`` — local-disk-only, and
the one remaining non-Hadoop write path after the r8 store port. This
gives them the same discipline as ``sources/parquet_store.py``: a
state file is a series of ``<name>.<N>.json`` objects, the highest N
wins, each save CREATES a fresh object (atomic create on HDFS, single
PUT on object stores — no rename, no in-place mutation anywhere) and
then garbage-collects everything older than one back-version. A
half-written crash artifact is simply a higher-N object that json
parsing rejects — ``load`` falls back to the newest parseable version,
so every crash window reads committed state.

At 100 TB scale this metadata belongs in a real metastore (Hive/Glue/
Unity); the protocol here is the minimal object-store-safe stand-in,
single-writer by the engine's DDL serialization.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession


class JsonState:
    def __init__(self, root: str, name: str, default: dict,
                 spark: SparkSession | None = None) -> None:
        self.root = root
        self.name = name
        self._default = default
        self._spark = spark

    def _fs(self):
        spark = self._spark or SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError("JsonState needs an active SparkSession")
        jvm = spark._jvm
        path_cls = jvm.org.apache.hadoop.fs.Path
        fs = path_cls(self.root).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        return jvm, path_cls, fs

    def _versions(self) -> list[int]:
        jvm, path_cls, fs = self._fs()
        root = path_cls(self.root)
        if not fs.exists(root):
            return []
        pre, suf = f"{self.name}.", ".json"
        out = []
        for st in fs.listStatus(root):
            n = st.getPath().getName()
            if n.startswith(pre) and n.endswith(suf):
                try:
                    out.append(int(n[len(pre):-len(suf)]))
                except ValueError:
                    continue
        return sorted(out)

    def _vpath(self, v: int) -> str:
        return f"{self.root}/{self.name}.{v}.json"

    @property
    def path(self) -> str:
        """Current version's path (the newest committed state file)."""
        vs = self._versions()
        return self._vpath(vs[-1]) if vs else self._vpath(0)

    def load(self) -> dict:
        jvm, path_cls, fs = self._fs()
        for v in reversed(self._versions()):
            stream = fs.open(path_cls(self._vpath(v)))
            try:
                text = jvm.org.apache.commons.io.IOUtils.toString(
                    stream, "UTF-8"
                )
            finally:
                stream.close()
            try:
                return json.loads(text)
            except ValueError:
                continue  # crashed half-write: fall back one version
        return json.loads(json.dumps(self._default))

    def save(self, data: dict) -> None:
        jvm, path_cls, fs = self._fs()
        vs = self._versions()
        nxt = (vs[-1] + 1) if vs else 0
        out = fs.create(path_cls(self._vpath(nxt)), True)
        try:
            out.write(bytearray(json.dumps(data, indent=1).encode("utf-8")))
        finally:
            out.close()
        # keep one back-version for in-flight readers
        for v in vs[:-1] if vs else []:
            fs.delete(path_cls(self._vpath(v)), False)

"""Parquet-backed collection storage with atomic rewrite.

Collections are immutable parquet directories; every write (upsert /
update / delete / truncate) produces a new versioned directory and
atomically flips a pointer file — the moral equivalent of a Delta
transaction log reduced to "latest version wins". Readers always see a
complete snapshot (reference reads are snapshot-consistent, which is how
we honor both STRONG and EVENTUAL ``ReadConsistency`` —
reference: aiotcvectordb/client/stub.py:29).

At cluster scale the same protocol works on any HDFS-compatible FS
(rename of the pointer file is the only atomicity requirement); swap in
Delta/Iceberg by replacing this class.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class ParquetStore:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _coll_dir(self, db: str, coll: str) -> str:
        return os.path.join(self.root, db, coll)

    def _pointer(self, db: str, coll: str) -> str:
        return os.path.join(self._coll_dir(db, coll), "_LATEST")

    def current_version(self, db: str, coll: str) -> int | None:
        p = self._pointer(db, coll)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)["version"]

    def data_path(self, db: str, coll: str) -> str | None:
        v = self.current_version(db, coll)
        if v is None:
            return None
        return os.path.join(self._coll_dir(db, coll), f"v{v}")

    def list_versions(self, db: str, coll: str) -> list[int]:
        """Snapshot versions still on disk (current + one back-version;
        older ones are GC'd by write)."""
        cdir = self._coll_dir(db, coll)
        if not os.path.isdir(cdir):
            return []
        return sorted(
            int(name[1:])
            for name in os.listdir(cdir)
            if name.startswith("v") and name[1:].isdigit()
        )

    def read(
        self, spark: SparkSession, db: str, coll: str, *, version: int | None = None
    ) -> DataFrame:
        """Snapshot read; ``version`` time-travels to a retained prior
        version (every write keeps one back-version before GC)."""
        if version is None:
            path = self.data_path(db, coll)
            if path is None:
                raise FileNotFoundError(f"collection {db}.{coll} has no data")
        else:
            if version not in self.list_versions(db, coll):
                raise FileNotFoundError(
                    f"collection {db}.{coll} has no retained version {version}"
                )
            path = os.path.join(self._coll_dir(db, coll), f"v{version}")
        return spark.read.parquet(path)

    def write(
        self,
        df: DataFrame,
        db: str,
        coll: str,
        *,
        shard: int | None = None,
        partition_by: list[str] | None = None,
    ) -> int:
        """Write a new version and atomically flip the pointer.

        ``shard`` maps the reference's collection shard count to an
        output-file count (reference stub.py:216-218); ``partition_by``
        is used by IVF (partition pruning on cluster_id).
        """
        cdir = self._coll_dir(db, coll)
        os.makedirs(cdir, exist_ok=True)
        cur = self.current_version(db, coll)
        nxt = 0 if cur is None else cur + 1
        out = os.path.join(cdir, f"v{nxt}")
        writer = df
        if shard:
            writer = df.repartition(shard)
        w = writer.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(out)
        tmp = self._pointer(db, coll) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": nxt}, f)
        os.replace(tmp, self._pointer(db, coll))  # atomic flip
        # Garbage-collect versions older than the previous one (keep one
        # back-version so in-flight readers finish).
        for name in os.listdir(cdir):
            if name.startswith("v") and name[1:].isdigit():
                v = int(name[1:])
                if cur is not None and v < cur:
                    shutil.rmtree(os.path.join(cdir, name), ignore_errors=True)
        return nxt

    def drop(self, db: str, coll: str | None = None) -> None:
        path = os.path.join(self.root, db) if coll is None else self._coll_dir(db, coll)
        shutil.rmtree(path, ignore_errors=True)

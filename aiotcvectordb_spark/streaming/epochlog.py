"""Shared epoch-log primitives for the streaming ingest twins.

All four standing indexes (gram / bucket-minima / LM counts / DSIR raw
counts) use the same storage shape: an append-only hive-partitioned
parquet log of ``epoch=N`` directories, one per committed micro-batch,
plus compacted generations at descending NEGATIVE ids. Everything here
goes through the Hadoop FileSystem API so the same code path works on
local disk, HDFS, and object stores (never ``os.listdir`` / rename).

Two compaction disciplines live on top of this layout:

- **Idempotent indexes** (distinct grams, per-bucket minima): the folded
  value of ``old epochs ∪ compacted generation`` equals the folded value
  of either alone, so the simple write-then-delete protocol in
  ``substrdedup.compact_gram_index`` is crash-safe at every point —
  leftover source epochs change nothing a reader computes.
- **Summed indexes** (LM term counts, DSIR bucket counts): union is NOT
  idempotent — a crash between the generation write and the source
  deletes would leave both readable and every merged count DOUBLED (and
  the next compaction would fold the doubled sums in permanently). These
  use the watermark protocol below (:func:`summed_epoch_paths` +
  :func:`compact_summed_index`): a generation carries the highest live
  epoch it folded in a ``_FOLDED_UP_TO_<N>`` marker file, readers skip
  every live epoch <= the active generation's watermark, and an
  UNMARKED generation (crash before the marker landed) is invisible to
  readers and garbage-collected by the next compaction. Every crash
  window therefore reads to exactly the committed sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_MARKER_PREFIX = "_FOLDED_UP_TO_"


def _fs(spark, any_path: str):
    """(jvm Path class, FileSystem) for ``any_path``."""
    jvm = spark._jvm
    path_cls = jvm.org.apache.hadoop.fs.Path
    fs = path_cls(any_path).getFileSystem(spark._jsc.hadoopConfiguration())
    return path_cls, fs


def epoch_ids(spark, index_dir: str) -> list[int]:
    """Committed ``epoch=N`` directory ids under ``index_dir``, via the
    Hadoop FileSystem API — the same code path on local disk, HDFS, and
    object stores (never ``os.listdir``). Empty list when the index
    directory does not exist yet."""
    path_cls, fs = _fs(spark, index_dir)
    root = path_cls(index_dir)
    if not fs.exists(root):
        return []
    out: list[int] = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("epoch="):
            try:
                out.append(int(name[6:]))
            except ValueError:
                continue
    return sorted(out)


def delete_epoch(spark, index_dir: str, epoch: int) -> None:
    path_cls, fs = _fs(spark, index_dir)
    fs.delete(path_cls(f"{index_dir}/epoch={epoch}"), True)


def generation_watermark(spark, index_dir: str, gen: int) -> int | None:
    """The highest live epoch folded into compacted generation ``gen``
    (read from its ``_FOLDED_UP_TO_<N>`` marker), or ``None`` when the
    generation is UNMARKED — i.e. a compaction crashed after the parquet
    write but before the marker landed; readers must ignore it."""
    path_cls, fs = _fs(spark, index_dir)
    gen_dir = path_cls(f"{index_dir}/epoch={gen}")
    if not fs.exists(gen_dir):
        return None
    for st in fs.listStatus(gen_dir):
        name = st.getPath().getName()
        if name.startswith(_MARKER_PREFIX):
            try:
                return int(name[len(_MARKER_PREFIX):])
            except ValueError:
                continue
    return None


def mark_generation(spark, index_dir: str, gen: int, watermark: int) -> None:
    """Commit point for a summed-index compaction: once the marker file
    exists, readers switch to the generation and stop reading the live
    epochs it folded."""
    path_cls, fs = _fs(spark, index_dir)
    fs.createNewFile(
        path_cls(f"{index_dir}/epoch={gen}/{_MARKER_PREFIX}{watermark}")
    )


def summed_epoch_paths(
    spark, index_dir: str, *, before_epoch: int | None = None
) -> list[str]:
    """Epoch directories a SUMMED-index read must fold, under the
    watermark protocol: the newest MARKED generation (most negative id)
    plus every live epoch strictly above its watermark — so leftover
    source epochs from a crashed compaction are never double-counted,
    and an unmarked generation is never trusted. ``before_epoch`` hides
    the replaying epoch's own deltas (a generation only ever folds
    epochs older than the newest live epoch at compaction time, so it
    always passes a replay's filter). Empty list ONLY when nothing is
    committed — callers return an explicit empty frame then; a transient
    listing failure raises so the micro-batch retries instead of
    silently scoring against an empty index."""
    epochs = epoch_ids(spark, index_dir)
    live = [e for e in epochs if e >= 0]
    if before_epoch is not None:
        live = [e for e in live if e < before_epoch]
    committed = [
        (g, wm)
        for g in epochs
        if g < 0
        and (wm := generation_watermark(spark, index_dir, g)) is not None
    ]
    if committed:
        active, wm = min(committed)  # most negative id = newest
        return [f"{index_dir}/epoch={active}"] + [
            f"{index_dir}/epoch={e}" for e in live if e > wm
        ]
    return [f"{index_dir}/epoch={e}" for e in live]


def compact_summed_index(spark, index_dir: str, read_fn) -> None:
    """Fold a SUMMED epoch log into one generation, crash-safe at every
    point (the fix for the count-doubling window an idempotent-style
    compaction would have here):

    1. garbage-collect unmarked generations (invisible to readers) and
       stale older marked generations (already folded into the active
       one by a compaction that crashed mid-delete);
    2. write ``read_fn(spark, index_dir, before_epoch=newest live)`` —
       the exact committed sums, under the same watermark-aware read the
       sink uses — to a fresh negative ``epoch=<target>`` directory;
    3. COMMIT by writing the ``_FOLDED_UP_TO_<max folded live epoch>``
       marker (readers switch atomically: generation in, folded live
       epochs out);
    4. delete the folded sources.

    A crash before (3) leaves an ignored orphan; a crash during (4)
    leaves sources that readers already skip via the watermark. The
    NEWEST live epoch is never folded — it is the only batch id
    foreachBatch can replay, and its ``before_epoch`` read must not find
    its own deltas inside a generation.

    SINGLE COMPACTOR REQUIRED: step (1) garbage-collects every unmarked
    generation, so two compactions running concurrently on the same
    index would delete each other's in-flight generation before it is
    marked. Crash-then-retry is safe (the retry IS the next single
    compactor); concurrent compactors are not. Call this from the one
    maintenance path that owns the index — in the ingest twins that is
    the foreachBatch sink itself, which Structured Streaming already
    serializes per query."""
    epochs = epoch_ids(spark, index_dir)
    if not epochs:
        return
    gens = [g for g in epochs if g < 0]
    marked = [
        g
        for g in gens
        if generation_watermark(spark, index_dir, g) is not None
    ]
    active = min(marked) if marked else None
    for g in gens:
        if g != active:
            delete_epoch(spark, index_dir, g)  # orphans + superseded gens
    live = [e for e in epochs if e >= 0]
    folded_live = [e for e in live if e != max(live)] if live else []
    sources = ([active] if active is not None else []) + folded_live
    if len(sources) <= 1:
        return  # nothing to merge
    target = min(epochs) - 1 if epochs[0] < 0 else -1
    read_fn(
        spark, index_dir, before_epoch=max(live) if live else None
    ).write.mode("overwrite").parquet(f"{index_dir}/epoch={target}")
    mark_generation(spark, index_dir, target, max(folded_live))
    for e in sources:
        delete_epoch(spark, index_dir, e)


def read_epoch_log(spark, index_dir: str, paths: list[str]) -> DataFrame:
    """Load the selected epoch directories with ``epoch`` available as a
    partition column."""
    return spark.read.option("basePath", index_dir).parquet(*paths)

"""Distributed byte-pair-encoding tokenizer — train on the corpus,
encode at scale.

The registry's ``token_count`` is the regex/whitespace counter; real
training pipelines tokenize with a LEARNED subword vocabulary (Sennrich
et al. 2016). This module trains one with Spark:

- **train** (``bpe_train``): the classic BPE loop, distributed the way
  the corpus size demands. The corpus collapses ONCE to the
  word-frequency table (one shuffle; at 100 TB this is the ~10⁷-row
  vocab, not the 10¹²-token corpus), each word held as a symbol array.
  Every round counts adjacent symbol pairs weighted by word frequency
  (JVM-side pair explode → groupBy sum), picks the top pair(s) on the
  driver (a ≤``batch_merges``-row collect — merge-table METADATA, like
  KMeans centroids), and rewrites ONLY the words containing a merged
  pair (Arrow-batched ``mapInPandas``; untouched words pass through
  unshuffled). Lineage is truncated with DISK-backed local checkpoints
  every few rounds.
- **batch_merges > 1** applies the top-K *symbol-disjoint* pairs per
  round — K× fewer Spark rounds for a large vocab. Disjointness keeps
  each batched merge equal to some sequential merge order; strict
  classic BPE is ``batch_merges=1`` (the test default).
- **encode** (``bpe_encode``): broadcast the learned merge ranks, apply
  the standard lowest-rank-first merge loop per word in a pandas UDF
  with a per-batch word cache (words repeat heavily — the cache turns
  per-token work into per-distinct-word work).

Determinism: pair ties break on (count desc, pair lexicographic), so
the same corpus always learns the same merges — asserted in
tests/test_bpe.py along with the lossless round trip
(concat(tokens) == word).

No SQL oracle (iterative training is not SQL-expressible); the
encode/count registry query is a rows-only driver check per the
BASELINE.md correctness contract.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aiotcvectordb_spark.functions import sparse as sparse_fn

_CKPT_EVERY = 8
_EOW = "</w>"  # end-of-word marker (standard BPE: lets merges learn suffixes)


def _word_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) frequency table — the ONE corpus-sized shuffle.
    CJK-aware (r4): latin words are units; each CJK char is its own
    unit, so BPE learns multi-character CJK merges from data."""
    return (
        df.select(F.explode(sparse_fn.bpe_pretokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the symbol arrays, weighted by
    word count — pure JVM (explode + partial agg), no Python workers."""
    pairs = words.select(
        "n",
        F.explode(
            F.expr(
                "transform(slice(syms, 1, size(syms) - 1), "
                "(s, i) -> struct(s AS a, syms[i + 1] AS b))"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.a", "p.b").agg(F.sum("n").alias("cnt"))


def _apply_merges(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Rewrite only the words containing a merged pair; the rest pass
    through untouched (no shuffle — mapInPandas is map-side)."""
    pair_set = {tuple(m) for m in merges}

    def rewrite(batches):
        import pandas as pd

        for pdf in batches:
            out_syms = []
            for syms in pdf["syms"]:
                syms = list(syms)
                changed = True
                while changed:
                    changed = False
                    i = 0
                    res = []
                    while i < len(syms):
                        if (
                            i + 1 < len(syms)
                            and (syms[i], syms[i + 1]) in pair_set
                        ):
                            res.append(syms[i] + syms[i + 1])
                            i += 2
                            changed = True
                        else:
                            res.append(syms[i])
                            i += 1
                    syms = res
                out_syms.append(syms)
            yield pd.DataFrame(
                {"word": pdf["word"], "n": pdf["n"], "syms": out_syms}
            )

    conds = [
        F.arrays_overlap(
            F.expr(
                "transform(slice(syms, 1, size(syms) - 1), "
                "(s, i) -> concat(s, char(31), syms[i + 1]))"
            ),
            F.array(*[F.lit(a + chr(31) + b) for a, b in merges]),
        )
    ]
    touched = words.filter(conds[0])
    untouched = words.filter(~conds[0])
    rewritten = touched.mapInPandas(
        rewrite, schema="word string, n long, syms array<string>"
    )
    return untouched.unionByName(rewritten)


def bpe_train(
    df: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 200,
    min_pair_count: int = 2,
    batch_merges: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list (rank = position)."""
    words = _word_table(df, text_col).select(
        "word",
        "n",
        F.expr(
            f"concat(transform(split(word, ''), c -> c), array('{_EOW}'))"
        ).alias("syms"),
    ).localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)

    merges: list[tuple[str, str]] = []
    rounds = 0
    while len(merges) < num_merges:
        take = min(batch_merges, num_merges - len(merges))
        top = (
            _pair_counts(words)
            .filter(F.col("cnt") >= min_pair_count)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(max(take * 4, 16))  # headroom for the disjoint filter
            .collect()
        )
        if not top:
            break
        batch: list[tuple[str, str]] = []
        used: set[str] = set()
        for r in top:
            if len(batch) == take:
                break
            # symbol-disjoint: batched merges can't chain within a round,
            # so the batch equals SOME sequential merge order
            if r["a"] in used or r["b"] in used:
                continue
            batch.append((r["a"], r["b"]))
            used.update((r["a"], r["b"], r["a"] + r["b"]))
        if not batch:
            break
        merges.extend(batch)
        words = _apply_merges(words, batch)
        rounds += 1
        if rounds % _CKPT_EVERY == 0:
            words = words.localCheckpoint(
                eager=True, storageLevel=StorageLevel.DISK_ONLY
            )
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize each document with the learned merges. Returns
    (id, tokens array<string>, n_tokens). Merge ranks are a broadcast
    closure; per-batch word cache makes the loop run once per DISTINCT
    word, not per occurrence. Shuffle-free."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, tokens array<string>, n_tokens int"

    def encode_word(word: str, cache: dict) -> list[str]:
        hit = cache.get(word)
        if hit is not None:
            return hit
        syms = list(word) + [_EOW]
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        cache[word] = syms
        return syms

    def encode(batches):
        import pandas as pd

        from aiotcvectordb_spark.functions.sparse import bpe_pretokens

        cache: dict = {}
        for pdf in batches:
            ids, toks, counts = [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                words = bpe_pretokens(text or "")
                doc_tokens: list[str] = []
                for w in words:
                    doc_tokens.extend(encode_word(w, cache))
                ids.append(i)
                toks.append(doc_tokens)
                counts.append(len(doc_tokens))
            yield pd.DataFrame(
                {id_col: ids, "tokens": toks, "n_tokens": counts}
            )

    return df.select(id_col, text_col).mapInPandas(encode, schema=schema)


def save_merges(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist the learned merge table as a parquet artifact
    (rank, a, b) — the tokenizer analog of a fitted model; rank order
    IS the vocabulary."""
    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    (
        spark.createDataFrame(rows, "rank int, a string, b string")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path)
    )


def load_merges(spark, path: str) -> list[tuple[str, str]]:
    """Load a persisted merge table back into the ordered list
    ``bpe_encode`` consumes."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["a"], r["b"]) for r in rows]

"""Scale probe: does each headline operator's runtime grow ~linearly?

Builds a K-times-larger copy of the sf0.1 tables under /tmp (ids
offset per replica; document text and embeddings perturbed so near-dup
operators see distinct rows, not K-way exact duplicates), then times a
set of scan-heavy queries at 1x and Kx and prints the ratio. A ratio
near K (or below, where fixed overhead dominates the 1x run) means the
operator scales; a ratio near K^2 flags a quadratic blowup that would
fall over at 100 TB.

Usage: python tools/scale_probe.py [K] [sf_dir] [name ...]
(names restrict the probe to a subset of PROBE_QUERIES — the 100x run
targets the flagship kNN + dedup chain + curation pipeline instead of
re-timing all 38.)
Writes one JSON line: {"k": K, "queries": {name: {"t1": s, "tk": s,
"ratio": r}}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aiotcvectordb_spark import queries as Q
from aiotcvectordb_spark.session import get_spark

PROBE_QUERIES = [
    "pdf_extract",
    "doc_extract",
    "ppt_extract",
    "xls_extract",
    "docx_extract",
    "pptx_extract",
    "xlsx_extract",
    "rtf_extract",
    "epub_extract",
    "gif_frames",
    "search_flat_cosine",
    "search_flat_cosine_local_topk",
    "fulltext_bm25",
    "hybrid_rrf",
    "dedup_exact",
    "minhash_lsh_candidates",
    "dedup_components",
    "simhash_near_dup",
    # the scale-routed entry point — the oracled embedding_near_dup is
    # exact-only by contract (O(N^2)) and must not be probed at 100x
    "embedding_near_dup_auto",
    # same routing story for SemDeDup: fixed-K cells are N^2/K, the
    # auto entry switches to nlist-proportional trained cells at scale
    "semantic_dedup_auto",
    "token_count",
    "line_dedup",
    "incremental_line_dedup",
    "incremental_semantic_dedup",
    "substring_dedup",
    "substring_dedup_hashed",
    "substring_dedup_cjk",
    "incremental_substring_dedup_cjk",
    "dataset_mix",
    "pricing_summary",
    "top_revenue_orders",
    "group_topk",
    "sessionize",
    "dataset_split",
    "curate_corpus",
    # curate_corpus_v2 (oracled) composes the fixed-K semantic_dedup and
    # fail-fasts above its cap (100k embedding rows — probe it at 100x
    # where it still fits); the scale-routed funnel carries the
    # unbounded story
    "curate_corpus_v2",
    "curate_corpus_v2_auto",
    "nation_volume_shipping",
    "national_market_share",
    "order_priority_check",
    "customer_distribution",
    "time_gap_fill",
    "window_range_frame",
    "zscore_outliers",
    "unigram_logprob",
    "perplexity_filter",
    "dsir_weights",
    "quality_classifier",
    "gopher_quality_filter",
    "c4_quality_filter",
    "training_shards",
    "ewma_smooth",
    "source_quota",
    "mmr_rerank",
    # r9 additions: the novelty profile (substring_dedup's shuffle
    # class) and the int8-grid ANN (map-only scan + TakeOrdered)
    "gram_novelty",
    "incremental_gram_novelty",
    "ann_sq8_cosine",
    "stratified_sample_hash",
    "search_grouped",
    "fulltext_phrase",
    "decontaminate_fraction",
    # r10 additions: fixed-centroid IVF (assignment + broadcast probe
    # join + rank window), the portable-hash substring lane (the
    # production lane's shuffle class), and the incremental
    # decontamination (bench-or-batch scan only)
    "ann_ivf_cosine_fixed",
    "substring_dedup_hashed_portable",
    "incremental_decontaminate_fraction",
    # r11 additions: the hashed CJK lane (reduced-key shuffle class),
    # the frozen scoring/projection twins, the codec heavies' full
    # decode vs header-walk metadata routes
    "substring_dedup_cjk",
    "substring_dedup_cjk_hashed",
    "quality_classifier_frozen",
    "embedding_pca_fixed",
    "audio_mp3_probe",
    "audio_mp3_meta",
    "jpeg_meta",
    "ann_pq_cosine_fixed",
    "ann_lsh_l2_fixed",
    "bigram_logprob",
    "incremental_dedup",
    "profile_table",
    "equidepth_histogram",
    "lang_top_terms",
    "group_topk_salted",
    "label_centroids",
    "attribution_last_touch",
    "audio_probe",
    "ann_bq_cosine",
    "video_frames",
    "jpeg_probe",
    "jpeg_progressive_probe",
    "multimodal_features",
    "pack_sequences",
    "pack_sequences_nosplit",
    "bpe_token_count",
    "ann_ivf_fullprobe",
    "ann_pq_fullrescore",
]

# tables each probe query touches (so we only scale what's needed)
SCALED_TABLES = [
    "documents",
    "embeddings",
    "events",
    "lineitem",
    "orders",
]
COPIED_TABLES = ["region", "nation", "customer", "supplier", "part"]

ID_COLS = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
}


def build_scaled(spark, sf_dir: str, out_dir: str, k: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in COPIED_TABLES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copy(os.path.join(sf_dir, f"{t}.parquet"), dst)
    only = os.environ.get("SCALE_PROBE_TABLES")
    wanted = set(only.split(",")) if only else None
    for t in SCALED_TABLES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        if wanted is not None and t not in wanted:
            # targeted probes (e.g. a 300x embeddings-only IMI probe)
            # skip building the tables their queries never read
            continue
        df = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
        idc = ID_COLS[t]
        max_id = df.agg(F.max(idc)).first()[0] + 1
        reps = []
        for i in range(k):
            r = df.withColumn(idc, F.col(idc) + F.lit(i * max_id))
            if t == "documents" and i > 0:
                # make replica text distinct so near-dup ops do real work
                r = r.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" replica{i}"))
                )
            if t == "embeddings" and i > 0:
                r = r.withColumn(
                    "embedding",
                    F.expr(
                        f"transform(embedding, (x, j) -> cast(x + "
                        f"sin(j * {i} * 0.7) * 0.05 as float))"
                    ),
                )
            if t == "orders" and i > 0:
                r = r.withColumn("o_custkey", F.col("o_custkey"))
            if t == "lineitem" and i > 0:
                pass  # orderkey offset matches orders replica offset
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.write.mode("overwrite").parquet(dst)
        print(f"# built {t} x{k}", file=sys.stderr)


def time_query(spark, name: str, sf_dir: str) -> float:
    """Best-of-2 wall clock of FULL query materialization.

    r8: the action is a noop-format write, not ``count()`` — count lets
    Catalyst prune everything the row count doesn't need (a map-only
    battery's entire projection; an unreferenced distinct LEFT JOIN is
    eliminated outright), so count-based ratios for projection-shaped
    queries timed only the scan. The noop sink consumes every output
    row with all columns computed and writes nothing. Probe records
    created before r8 (probe_x300/x1000, and x100 rows not re-measured)
    are count-based; each is still internally consistent (same action
    at 1x and Kx), but map-only entries re-measured under noop are the
    honest numbers."""
    fn = Q.QUERIES[name]
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or PROBE_QUERIES
    unknown = set(names) - set(Q.QUERIES)
    if unknown:
        raise SystemExit(f"unknown probe queries: {sorted(unknown)}")
    base = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # keyed by base too: a 100x-of-sf0.01 probe (used for fail-fast-
    # capped fixed-K entries that a 100x-of-sf0.1 corpus would refuse)
    # must not reuse tables replicated from a different base
    out_dir = f"/tmp/scale_probe_x{k}_sf{base}"
    spark = get_spark("scale_probe")
    build_scaled(spark, sf_dir, out_dir, k)
    # warm
    if os.path.exists(f"{out_dir}/lineitem.parquet"):
        spark.read.parquet(f"{out_dir}/lineitem.parquet").count()
    results = {}
    for name in names:
        t1 = time_query(spark, name, sf_dir)
        tk = time_query(spark, name, out_dir)
        results[name] = {
            "t1": round(t1, 3),
            "tk": round(tk, 3),
            "ratio": round(tk / t1, 2) if t1 > 0 else None,
        }
        print(f"# {name}: 1x={t1:.2f}s {k}x={tk:.2f}s ratio={tk/t1:.2f}", file=sys.stderr)
    print(json.dumps({"k": k, "base": base, "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Regenerate EXPLAIN.md: the formatted physical plans of the flagship
queries, with the scale-critical properties called out. Run after
changing any operator's plan shape:

    python tools/explain_dump.py > EXPLAIN.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aiotcvectordb_spark import queries as Q
from aiotcvectordb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# (query, what to look for in the plan)
SHOWCASE = [
    (
        "doc_extract",
        "shuffle-free document codec shape: two chained mapInPandas "
        "stages (writer, then CFB/piece-table extractor) directly over "
        "the parquet scan — no Exchange anywhere, so the codec cost "
        "partitions with the data at any scale",
    ),
    (
        "search_flat_cosine",
        "filter pushed to the parquet scan (PushedFilters), vector column "
        "read only for scoring, broadcast of the query side, single "
        "window top-k",
    ),
    (
        "fulltext_bm25",
        "prebuilt postings reuse (InMemoryTableScan), broadcast term join, "
        "TakeOrderedAndProject top-k instead of a global sort",
    ),
    (
        "pricing_summary",
        "shipdate filter at the scan; HashAggregate below the Exchange "
        "(map-side partials) so the shuffle carries 4 groups",
    ),
    (
        "top_revenue_orders",
        "both date filters pushed; aggregate reuses the join's hash "
        "partitioning (no exchange between join and aggregate); "
        "TakeOrderedAndProject top-10",
    ),
    (
        "join_pruned_dims",
        "dimension tables broadcast (BroadcastHashJoin), filters pushed "
        "below the joins",
    ),
    (
        "national_market_share",
        "TPC-H Q8 shape: p_type/year filters pushed to the scans, "
        "partial aggregation before the final small exchange; "
        "nation/region are broadcast by hint, the other sides by "
        "Catalyst's size estimate at this SF — at real scale those "
        "revert to shuffle joins on the declared keys (AQE re-plans)",
    ),
    (
        "search_udtf_topk",
        "SQL table-function kNN: JVM-side scoring macro inside the scan "
        "projection, then two PythonUDTF stages — k rows kept per hash "
        "partition, single-partition merge of parts*k survivors; the "
        "exchange between them carries at most parts*k narrow rows",
    ),
    (
        "returned_item_revenue",
        "TPC-H Q10 shape: returnflag + date filters pushed to both fact "
        "scans, nation broadcast by hint, partial aggregation on the "
        "join's custkey partitioning, TakeOrderedAndProject top-20 (no "
        "global sort)",
    ),
    (
        "curate_corpus",
        "whole pipeline in one job: projections fused into the scan "
        "stage, one window for exact-dedup, one shuffle for LSH buckets, "
        "broadcast for the dominated-id anti side",
    ),
    (
        "sessionize_udtf",
        "SQL table-function sessionization: ONE exchange on the user "
        "key feeding a within-partition sort, the PythonUDTF stage "
        "streams rows with O(1) state per group, and the session "
        "aggregate reuses the same partitioning (no second shuffle "
        "before GROUP BY user_id, session_no)",
    ),
    (
        "image_probe",
        "real-codec plumbing: a single narrow (doc_id, text) scan "
        "projection feeds two chained MapInPandas stages (PNG encode, "
        "header probe) with ZERO exchanges in the whole plan — binary "
        "payloads stay on the partition that produced them and never "
        "shuffle",
    ),
    (
        "unigram_logprob",
        "corpus LM quality: per-doc term frequencies aggregated BEFORE "
        "the vocabulary join (the join input is distinct (doc, token) "
        "pairs, not raw tokens), the corpus-total side is a one-row "
        "broadcast, and the final per-doc aggregate is the only other "
        "exchange",
    ),
    (
        "training_shards",
        "deterministic shard layout: hash expressions fused into the "
        "scan projection, ONE exchange on the shard id feeding the "
        "within-shard sort + row_number — exactly the "
        "repartition+sortWithinPartitions shape a sharded writer needs",
    ),
    (
        "ewma_smooth",
        "finite-window EWMA: one exchange on user_id, windowed "
        "collect_list bounded at 8 rows, the weighted fold fused into "
        "the projection (no UDF, no second shuffle)",
    ),
    (
        "source_quota",
        "per-source quota: one exchange on source, in-partition sort + "
        "row_number, filter on the rank — the degenerate (unsalted) "
        "group-top-k; the skew-safe two-phase variant is "
        "partitioning.salted_group_topk",
    ),
    (
        "mmr_rerank",
        "MMR: the candidate fetch is the standard broadcast-queries kNN "
        "(scan -> broadcast NLJ -> window top-fetch_k), then ONE "
        "exchange on query_idx into FlatMapGroupsInPandas running the "
        "bounded greedy selection per query group",
    ),
    (
        "audio_probe",
        "real WAV codec plumbing: narrow (doc_id, text) scan feeds two "
        "chained MapInPandas stages (RIFF PCM16 encode, decode + DSP "
        "features) with ZERO exchanges — payloads never leave the "
        "partition that produced them",
    ),
    (
        "attribution_last_touch",
        "last-touch attribution: ONE exchange on user_id for the "
        "carry-forward IGNORE NULLS window, then the touch-type "
        "aggregate partially combines map-side (3 output rows cross "
        "the final exchange)",
    ),
    (
        "equidepth_histogram",
        "equi-depth deciles: exact percentile_disc edges in one tiny "
        "aggregate, the 9-edge array broadcast back onto the scan "
        "(BroadcastNestedLoopJoin of ONE row), bin assignment fused "
        "into the projection, 10-row final aggregate",
    ),
    (
        "incremental_dedup",
        "new-vs-corpus near-dedup: both sides of the (band, hash) "
        "equi-join derive from ONE signature pipeline, corpus x corpus "
        "pairs never form, and the keep flag is a left join back to "
        "the batch side only",
    ),
    (
        "bigram_logprob",
        "order-2 LM score: per-doc bigram frequencies aggregate BEFORE "
        "the corpus joins (distinct (doc, w1, w2) rows, not raw "
        "tokens), then two equi-joins against the derived bigram and "
        "prefix tables and one per-doc aggregate",
    ),
    (
        "embedding_outliers",
        "distance-to-centroid mining: the labels x dim centroid "
        "aggregate is tiny and BROADCAST back onto the scan, the "
        "zip_with distance fold fuses into the projection, and the "
        "per-label top-5 is one bounded window",
    ),
    (
        "rolling_active_users",
        "rolling DISTINCT without a range join: (day, user) dedup, "
        "7-way explode into window-end days, one count-distinct "
        "aggregate — linear in events, key-partitioned shuffles only",
    ),
    (
        "equidepth_histogram",
        "ONE distributed sort instead of nine percentile_disc "
        "aggregates: range-partition + sort-within-partitions, "
        "per-partition counts to exclusive rank offsets (metadata), "
        "each partition emits only the decile ranks it owns; the bin "
        "assignment fuses the 9-edge literal array into the scan "
        "projection and the final aggregate shuffles 10 rows",
    ),
    (
        "pack_sequences",
        "global token cumsum with NO single-partition window: range "
        "partition by doc_id, per-pid running-sum window (32 keys, "
        "large partitions), 32-row offset table broadcast back — then "
        "pack assignment is integer division fused into the "
        "projection",
    ),
    (
        "ann_ivf_fullprobe",
        "the IVF machinery at its exact limit: cluster assignment, "
        "probe-set isin predicate, exact rerank — nprobe=nlist makes "
        "the prune a provable no-op, so the plan hash-matches flat "
        "kNN (driver-verified against the same oracle)",
    ),
    (
        "jpeg_probe",
        "real baseline-JPEG encode AND decode as two shuffle-free "
        "Arrow-batched mapInPandas stages — payloads never leave "
        "their producing partition; only (id, width, height, mean) "
        "rows reach the output",
    ),
    (
        "bpe_token_count",
        "learned-subword tokenization: merge ranks ride the closure "
        "(broadcast), the encode stage is map-only over the document "
        "scan — the single exchange is the deliberate scan-widen "
        "repartition",
    ),
    (
        "substring_dedup",
        "exact repeated-substring removal: grams built JVM-side in the "
        "scan projection (no UDF), ONE hash aggregate finds duplicated "
        "grams, the coverage join is a bounded equi-join (no pairwise "
        "doc compare), the keep filter a LEFT ANTI hash join on "
        "(doc_id, pos) — every exchange keyed, nothing quadratic",
    ),
    (
        "dataset_mix",
        "token-budgeted data mixture: pass 1 collapses to a one-row "
        "broadcast (global token count), selection windows sort only "
        "within (lang, salt) buckets — language skew never funnels "
        "into a single partition",
    ),
    (
        "perplexity_filter",
        "CCNet-style LM filter: per-doc term frequencies first, ONE "
        "hapax-pruned vocab equi-join, per-doc agg; the 70% cut never "
        "sorts the corpus — the cumulative window runs over the tiny "
        "(lang, rounded-bits) histogram and row_number only over the "
        "boundary tie-group",
    ),
    (
        "gopher_quality_filter",
        "published heuristic rule battery in ONE scan projection — "
        "no Exchange in the plan at all (map-only), every flag a "
        "codegen'd array/string expression over the split token list",
    ),
    (
        "quality_classifier",
        "trained quality scoring: hashed-bigram occurrences built in "
        "the scan projection, the learned (bucket, weight) table "
        "broadcast, one per-doc aggregate, map-side sigmoid — model "
        "training is bounded driver-side (PQ-codebook pattern), the "
        "corpus-sized work is all keyed joins and aggregates",
    ),
    (
        "dsir_weights",
        "DSIR importance weights: hashed-bigram buckets built in the "
        "scan projection, two bucket-domain aggregates (8192 keys, "
        "map-side combinable), the log-ratio table broadcast onto the "
        "raw occurrences, one per-doc agg; global top-25% via the same "
        "histogram threshold — no corpus sort",
    ),
    (
        "search_by_text",
        "r8: hash embedder as Catalyst SQL — token explode feeding a "
        "(doc, bucket) hash aggregate, the <=dim-row query vector "
        "BROADCAST onto it, per-doc dot/norm, and the global top-10 as "
        "TakeOrderedAndProject (never a full sort); md5/conv folding "
        "stays inside whole-stage codegen",
    ),
    (
        "semantic_dedup",
        "r8 SemDeDup (oracled, fixed centroids): one BroadcastNested"
        "LoopJoin against the K-row centroid literal table, argmax via "
        "a vec_id-keyed window, then ONE cell-keyed self-equi-join "
        "(SortMergeJoin on cell — sum(cell²), never N²) with the "
        "unrolled fixed-dim cosine in codegen; fail-fast capped, the "
        "scale router is semantic_dedup_auto",
    ),
    (
        "pack_sequences_nosplit",
        "r8 doc-atomic greedy packing: salted-bucket hash partitioning "
        "(one Exchange on bucket), per-bucket window cumsum, one "
        "aggregate — no global sort, packs parallel across buckets by "
        "construction",
    ),
    (
        "gopher_quality_filter",
        "r8 full Gopher battery incl. the repetition rules, r9 hoisted: "
        "the word/line/para arrays, their distinct sets, char masses "
        "and the three top-n-gram run-length fold structs are staged "
        "named columns computed ONCE per row (the fold had been inlined "
        "twice per rule), flags derived from them — still ONE map-only "
        "scan projection chain, zero Exchange at any scale",
    ),
    (
        "curate_corpus_v2",
        "r8 composed funnel: the battery projections, the exact-dedup "
        "hash window, the SemDeDup join and the split bucket feed ONE "
        "annotated frame whose per-doc stage-membership array explodes "
        "into a single groupBy — the funnel costs one pass, not one "
        "recompute per stage row",
    ),
    (
        "incremental_line_dedup",
        "r9 batch-vs-standing line cleaning: one (norm) hash aggregate "
        "per side, the count-join runs on the BATCH's distinct norms "
        "only (standing never self-joined), LEFT ANTI removal, ordered "
        "per-doc reassembly, explicit-decision left join from the "
        "batch spine — O(batch + collisions); the standing side is the "
        "streaming summed epoch index at serving scale",
    ),
    (
        "incremental_semantic_dedup",
        "r9 (oracled): fixed-centroid assignment on both sides, then "
        "batch rows join standing members on the CELL id only — "
        "O(batch x touched-cell membership), no corpus x corpus; "
        "first-arrival-wins standing domination plus keep-order "
        "batch-mates, the exact per-epoch semantics of "
        "streaming/semdedup.py",
    ),
    (
        "ann_bq_cosine",
        "r9 (oracled): sign-bit pack in the scan projection, integral "
        "Hamming popcount candidates via TakeOrdered per query (5x "
        "oversample), broadcast candidate set back onto the embedding "
        "scan for the exact-cosine rescore window — 32x less vector "
        "I/O in the ranking pass, float-accurate top-k",
    ),
    (
        "ann_sq8_cosine",
        "r9 (oracled): the int8-grid approximate cosine is ONE codegen "
        "expression fused into the embedding scan projection (no "
        "Python, no shuffle), TakeOrdered per query for the 5x "
        "oversample, broadcast candidates back for the exact rescore "
        "— same plan family as BQ with a 256-level sketch",
    ),
    (
        "gram_novelty",
        "r9: shared word-ngram kernel in the scan, ONE gram-keyed min "
        "aggregate with map-side partials, keyed equi-join back, "
        "doc-keyed count — substring_dedup's shuffle class, no "
        "all-pairs anywhere; the left join onto the doc spine emits "
        "explicit decision rows",
    ),
    (
        "mmr_rerank",
        "r9 (oracled): exact top-40 fetch per query (TakeOrdered), then "
        "the greedy selection runs in ONE applyInPandas group of <=40 "
        "rows per query — the iterative stage is bounded and "
        "query-parallel, never corpus-sized",
    ),
    (
        "search_grouped",
        "r9 (oracled): group_by search — the per-label representative "
        "is a struct-min HashAggregate with map-side partials (each "
        "scan task pre-reduces to <= Q x labels rows before the keyed "
        "exchange), never a corpus-wide window; the group-rank window "
        "sees <= labels rows per query",
    ),
    (
        "fulltext_phrase",
        "r9 (oracled): exact-phrase adjacency match as ONE map-only "
        "sliding slice-equality fold over the tokenizer array in the "
        "scan projection — zero exchanges before the 10-row top-k; "
        "the positional-postings m-way join twin is the persisted-"
        "index form (pinned frame-equal in pytest)",
    ),
    (
        "ann_ivf_cosine_fixed",
        "r10 (oracled): the IVF cell-prune plan end-to-end — broadcast "
        "nested-loop of K centroid literals against the scan + "
        "vec_id-keyed assignment window (the index BUILD; stored "
        "cell-partitioned at serving scale), tiny broadcast probe-set "
        "join (Q x nprobe rows, engine-computed on both sides), exact "
        "rescore only inside probed cells, per-query rank window",
    ),
    (
        "substring_dedup_hashed_portable",
        "r10 (oracled): the hashed Lee-et-al lane with the portable "
        "md5 key pair — gram reduced to two 60-bit BIGINTs in the "
        "scan projection, ONE hash aggregate with map-side partials, "
        "keyed equi-join back, bounded xN coverage explode, LEFT "
        "ANTI keep, ordered reassembly; identical dataflow to the "
        "xxhash64 production lane, now driver-hash-checked",
    ),
    (
        "incremental_decontaminate_fraction",
        "r10 (oracled): bench-or-batch filter BEFORE tokenization (the "
        "scan never shingles the standing train corpus), shared "
        "shingle kernel, ONE shingle equi-join against the distinct "
        "eval-suite set, two doc-keyed distinct aggregates, spine "
        "left joins for explicit decision rows — O(eval suite + "
        "batch) at any corpus scale",
    ),
    (
        "substring_dedup_cjk_hashed",
        "r11 (oracled): the lang-routed Lee-et-al pass with hash-PAIR "
        "gram keys built in the scan projection — the dup aggregate "
        "and coverage join shuffle two 8-byte lanes instead of ~36-"
        "byte CJK gram strings (~2.3x fewer key bytes; the xxhash64 "
        "production lanes share this exact plan shape), LEFT ANTI "
        "keep, ordered reassembly, no pairwise doc comparison",
    ),
    (
        "embedding_pca_fixed",
        "r11 (oracled): frozen-basis PCA projection — eight zip_with/"
        "aggregate dot products fused into the scan projection, ZERO "
        "exchanges, whole-stage codegen end to end; the map-only "
        "matmul shape any trained basis ships at 100 TB",
    ),
    (
        "quality_classifier_frozen",
        "r11 (oracled): classifier scoring — JVM-built hashed-bigram "
        "buckets in the scan stage, ONE broadcast of the 256-row "
        "(bucket, weight) table, per-doc aggregate, map-side sigmoid; "
        "the only exchanges are the two doc-keyed aggregates",
    ),
    (
        "ann_pq_cosine_fixed",
        "r11 (oracled): frozen-codebook PQ — normalize + nearest-code "
        "encode as zip_with/aggregate folds in the scan projection, "
        "broadcast of the Q x (4x16) ADC LUTs, ONE exchange feeding "
        "the per-query ADC rank window, exact rescore of only the "
        "oversample-50 survivors",
    ),
    (
        "ann_lsh_l2_fixed",
        "r11 (oracled): frozen-plane LSH — bucket ids are scan-"
        "projection folds; OR-amplification is a UNION of four KEYED "
        "broadcast joins (no nested-loop anywhere), then the candidate "
        "dedup and rescore rank are the only exchanges",
    ),
]


def main() -> None:
    spark = get_spark("explain_dump")
    print("# EXPLAIN — physical plans of the flagship queries")
    print()
    try:
        import subprocess

        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.strip()
    except Exception:
        head = "unknown"
    print(
        "Auto-generated by `python tools/explain_dump.py > EXPLAIN.md` "
        f"at {SF_DIR} (source commit {head}; tests/test_bench_freshness.py "
        "checks this stamp against the latest functional commit). The "
        "point: each plan is the one you'd WANT at 100 TB — pushdown, "
        "partial aggregation, broadcast where small, TakeOrdered instead "
        "of global sorts."
    )
    for name, why in SHOWCASE:
        df = Q.QUERIES[name](spark, SF_DIR)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(mode)
        # strip volatile ids so regenerated output diffs cleanly
        plan = re.sub(r"#\d+L?", "#x", plan)
        plan = re.sub(r"\[plan_id=\d+\]", "[plan_id=x]", plan)
        plan = re.sub(r"file:[^,\]\s]+", "file:...", plan)
        print(f"\n## {name}\n")
        print(f"Scale properties: {why}.\n")
        print("```")
        print(plan.rstrip())
        print("```")
    spark.stop()


if __name__ == "__main__":
    main()

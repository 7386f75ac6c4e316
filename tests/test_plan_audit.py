"""Lock in the scale-critical physical-plan properties: predicate
pushdown to the parquet scan, vector-column pruning, broadcast joins in
the kNN/fusion paths, and no cartesian products."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiotcvectordb_spark import queries as Q
from aiotcvectordb_spark.operators import knn
from aiotcvectordb_spark.plans import audit


def test_filter_pushdown_read_path(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    q = df.filter("o_custkey < 100").select("o_orderkey")
    audit.assert_filter_pushed(q, "LessThan(o_custkey,100)")
    # projection prunes: only the two referenced columns reach the scan
    assert audit.scan_columns(q) == [["o_orderkey", "o_custkey"]]


def test_knn_scan_prunes_vector_when_not_retrieved(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = knn.knn_search(
        emb,
        [Q.qvec(1.0)],
        vector_col="embedding",
        id_col="vec_id",
        metric="COSINE",
        limit=5,
        filter="label IN (1, 2)",
        output_fields=["label"],
    )
    # scalar pre-filter reaches the parquet scan under the scoring join
    audit.assert_filter_pushed(out, "In(label, [1,2])")
    audit.assert_no_cartesian(out)


def test_knn_query_side_broadcasts(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = knn.knn_search(
        emb, [Q.qvec(1.0)], vector_col="embedding", id_col="vec_id",
        metric="COSINE", limit=5,
    )
    assert audit.has_broadcast_join(out)


def test_query_projection_prunes_vector_column(spark, sf_dir):
    """retrieve_vector=False (the default) must not read the fat vector
    column at all — op 25's main scale property."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter("label = 3").select("vec_id", "label")
    audit.assert_column_pruned(q, "embedding")


def test_star_join_broadcasts_dims(spark, sf_dir):
    out = Q.q_join_pruned_dims(spark, sf_dir)
    assert audit.has_broadcast_join(out)


def test_fulltext_no_full_corpus_window(spark, sf_dir):
    """The BM25 top-k must be TakeOrderedAndProject (per-partition heap)
    rather than a global-sort window over every scored doc."""
    out = Q.q_fulltext_bm25(spark, sf_dir)
    assert "TakeOrderedAndProject" in audit.executed_plan(out)


def test_no_cartesian_product_in_any_registry_query(spark, sf_dir):
    """Registry-wide lint: no registered query may plan a
    CartesianProduct (broadcast nested-loop against a BROADCAST side is
    fine — that's the deliberate small-side pattern; an unhinted
    cartesian is always a scale bug). Queries that fit models or
    iterate at plan-BUILD time are skipped — their inner plans are
    audited by their own tests."""
    eager_at_build = {
        # KMeans/LSH fits, iterative contraction, or driver actions run
        # during DataFrame construction — too slow for a sweep
        "ann_ivf_cosine", "ann_lsh_l2", "ann_pq_cosine",
        "embedding_near_dup_ivf", "dedup_components", "search_by_text",
        "curate_corpus",  # exact_groups=False but builds big plan; keep? cheap enough
    }
    eager_at_build.discard("curate_corpus")
    failures = []
    for name, fn in Q.QUERIES.items():
        if name in eager_at_build:
            continue
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # a build failure is its own signal
            failures.append(f"{name}: build error {e}")
            continue
        if "CartesianProduct" in audit.executed_plan(df):
            failures.append(f"{name}: CartesianProduct in plan")
    assert not failures, failures


def test_no_array_or_struct_in_oracled_projection(spark, sf_dir):
    """Driver-contract lint: the driver canonicalizer pandas-sorts every
    projected column before hashing and crashes on array/struct/map
    cells (``TypeError: unhashable type: 'list'`` — the r4
    multimodal_features red row). Every ORACLED query's final schema
    must therefore be scalar-only. ``dedup_components`` (eager
    iterative build) is covered too — its projection is fixed at
    (doc_id, component), and a schema check forces the build once."""
    from pyspark.sql import types as T

    nested = (T.ArrayType, T.StructType, T.MapType)
    failures = []
    for name in Q.ORACLES:
        try:
            df = Q.QUERIES[name](spark, sf_dir)
        except Exception as e:
            failures.append(f"{name}: build error {e}")
            continue
        bad = [f.name for f in df.schema.fields if isinstance(f.dataType, nested)]
        if bad:
            failures.append(f"{name}: nested-typed oracled columns {bad}")
    assert not failures, failures


def test_fulltext_fractional_cutoff_is_lazy(spark, sf_dir):
    """cutoff_frequency < 1 must read the corpus size from the postings
    n_docs column (a broadcast constant), not launch an eager df.count()
    job while the query plan is being CONSTRUCTED."""
    from aiotcvectordb_spark.operators import fulltext

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sc = spark.sparkContext
    sc.setJobGroup("frac_cutoff_build", "plan construction must be job-free")
    try:
        out = fulltext.fulltext_search_df(
            docs,
            "data pipeline quality",
            id_col="doc_id",
            text_col="text",
            limit=5,
            cutoff_frequency=0.99,
        )
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(sc.statusTracker().getJobIdsForGroup("frac_cutoff_build")) == []
    assert out.count() > 0


def test_count_shuffles_bounded_exact_knn(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = knn.knn_search(
        emb, [Q.qvec(1.0)], vector_col="embedding", id_col="vec_id",
        metric="COSINE", limit=5, strategy="local_topk",
    )
    # local_topk: one shuffle for the final per-query window, nothing else
    assert audit.count_shuffles(out) <= 2


def test_ivf_search_prunes_partitions(engine, spark, sf_dir):
    """The IVF cluster_id predicate must prune at the PARTITION level
    (directory pruning from the partitioned index rewrite), not merely
    as a row filter — this is what makes nprobe/nlist the I/O ratio."""
    from aiotcvectordb_spark.catalog import IndexField
    from aiotcvectordb_spark.operators import ann

    db = "db_prune"
    engine.create_database(db)
    engine.create_collection(
        db, "emb",
        indexes=[
            IndexField(name="vec_id", kind="primary_key", field_type="uint64"),
            IndexField(
                name="embedding", kind="vector", field_type="vector",
                metric_type="COSINE", index_type="IVF_FLAT", dimension=64,
                params={"nlist": 8},
            ),
        ],
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    engine.store.write(emb, db, "emb")
    engine.rebuild_index(db, "emb")

    meta = engine.catalog.get_collection(db, "emb")
    df = engine.store.read(spark, db, "emb")
    out = ann.ivf_search(engine, meta, df, [Q.qvec(1.0)], metric="COSINE", limit=5, nprobe=2)
    plan = audit.executed_plan(out)
    m = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert m and "cluster_id" in m[0], f"no partition pruning on cluster_id: {m}"


def test_pricing_summary_pushdown_and_partial_agg(spark, sf_dir):
    """TPC-H Q1 shape: the shipdate filter reaches the parquet scan and
    the aggregate runs map-side partials (HashAggregate below the
    exchange), so the shuffle carries 4 groups, not 600k rows."""
    out = Q.q_pricing_summary(spark, sf_dir)
    assert any(
        "l_shipdate" in f for scan in audit.pushed_filters(out) for f in [scan]
    ), audit.pushed_filters(out)
    plan = audit.executed_plan(out)
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_top_revenue_orders_no_regroup_shuffle(spark, sf_dir):
    """Grouping on (o_orderkey, ...) after the o_orderkey equi-join must
    reuse the join's hash partitioning — exactly one shuffle per join
    side, none between join and aggregate, and a TakeOrdered top-10
    instead of a global sort."""
    out = Q.q_top_revenue_orders(spark, sf_dir)
    plan = audit.executed_plan(out)
    assert "TakeOrderedAndProject" in plan
    # shuffles: at most the two join inputs (broadcast/AQE may cut more)
    assert audit.count_shuffles(out) <= 2


def test_correlated_subquery_decorrelates(spark, sf_dir):
    """Catalyst must rewrite the per-row subquery into one aggregate +
    one join — no iterative re-execution node."""
    out = Q.q_correlated_subquery(spark, sf_dir)
    plan = audit.executed_plan(out)
    assert "Join" in plan or "BroadcastHashJoin" in plan
    assert audit.count_shuffles(out) <= 3


def test_grouping_sets_single_expand(spark, sf_dir):
    """GROUPING SETS compiles to ONE Expand + aggregate — not one scan
    per set."""
    out = Q.q_grouping_sets_agg(spark, sf_dir)
    plan = audit.executed_plan(out)
    assert plan.count("Expand") >= 1
    assert plan.count("Scan parquet") == 1


def test_curate_pipeline_plan_shape(spark, sf_dir):
    """The composed pipeline must stay one declarative job: no
    cartesian, bounded shuffle count (window for exact-dedup + LSH
    bucket groupBy + final aggregate; AQE may coalesce further)."""
    from aiotcvectordb_spark import pipelines as P

    cur = P.curate(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    audit.assert_no_cartesian(cur)
    assert audit.count_shuffles(cur) <= 6

def test_order_priority_check_semi_join(spark, sf_dir):
    """TPC-H Q4 shape: the EXISTS runs as a LEFT SEMI join (lineitem
    never widens the output) and the quarter filter reaches the orders
    scan."""
    out = Q.q_order_priority_check(spark, sf_dir)
    plan = audit.executed_plan(out)
    assert "LeftSemi" in plan, plan[:2000]
    assert any(
        "o_orderdate" in f for f in audit.pushed_filters(out)
    ), audit.pushed_filters(out)


def test_customer_distribution_no_regroup_shuffle(spark, sf_dir):
    """TPC-H Q13 shape: the per-customer count reuses the outer join's
    custkey hash partitioning — no exchange between the join and the
    first aggregate; the second aggregate's input is one row per
    customer."""
    out = Q.q_customer_distribution(spark, sf_dir)
    # shuffles: two join inputs + the tiny c_count regroup, nothing more
    assert audit.count_shuffles(out) <= 3

def test_returned_item_revenue_plan(spark, sf_dir):
    """TPC-H Q10 shape: returnflag/date filters reach the scans; top-20
    is TakeOrderedAndProject, never a global sort."""
    out = Q.q_returned_item_revenue(spark, sf_dir)
    plan = audit.executed_plan(out)
    assert "TakeOrderedAndProject" in plan
    pushed = audit.pushed_filters(out)
    assert any("l_returnflag" in f for f in pushed), pushed
    assert any("o_orderdate" in f for f in pushed), pushed

def test_histogram_and_sliding_window_partial_agg(spark, sf_dir):
    """Both new aggregations must partial-aggregate below the exchange
    (the shuffle carries bins/windows, not raw rows)."""
    for q in (Q.q_price_histogram, Q.q_sliding_window_agg):
        out = q(spark, sf_dir)
        plan = audit.executed_plan(out)
        assert plan.index("HashAggregate") < plan.index("Exchange"), q.__name__


def test_embedding_near_dup_runs_on_executors(spark, sf_dir):
    """The near-dup prefilter must be an executor-side mapInPandas block
    matmul over a JVM-broadcast matrix row — no driver-side collect and
    no cartesian product (VERDICT r01 anti-pattern #1)."""
    import inspect

    src = inspect.getsource(Q.q_embedding_near_dup)
    assert ".collect(" not in src and ".toPandas(" not in src
    out = Q.q_embedding_near_dup(spark, sf_dir)
    plan = audit.executed_plan(out)
    assert "MapInPandas" in plan
    audit.assert_no_cartesian(out)
    assert audit.has_broadcast_join(out)


def test_round2b_ops_shuffle_budgets(spark, sf_dir):
    """Lock the round-2 additions to their designed shuffle budgets:
    single-exchange window shapes stay single-exchange, the LM scores
    stay within their three key-partitioned shuffles (+1 persisted-read
    exchange), and the codec round trips stay shuffle-FREE."""
    from aiotcvectordb_spark import queries as Q
    from aiotcvectordb_spark.plans import audit

    budgets = {
        "training_shards": 1,   # shard window
        "source_quota": 1,      # per-source window
        "ewma_smooth": 1,       # per-user window
        "attribution_last_touch": 2,  # user window + tiny group agg
        # scan-widen repartition + partial agg + salted phase-1 window +
        # merge window (r5: +1 bounded exchange buys away the
        # vocab-sized single-task sort per language)
        "lang_top_terms": 4,
        # codec chains: zero exchanges beyond the deliberate scan-widen
        # repartition (ensure_min_partitions on the single-row-group
        # testdata file) — encode->decode itself never shuffles
        "audio_probe": 1,
        "video_frames": 1,
    }
    for name, budget in budgets.items():
        df = Q.QUERIES[name](spark, sf_dir)
        got = audit.count_shuffles(df)
        assert got <= budget, (name, got, budget)
        audit.assert_no_cartesian(df)


def test_embedding_near_dup_scale_routing(spark, sf_dir, monkeypatch):
    """q_embedding_near_dup_auto is scale-routed: above the row
    threshold the O(N^2) broadcast-matmul plan must NOT appear — no
    broadcast of the full matrix (BroadcastNestedLoopJoin) and no
    block-matmul MapInPandas; the IVF cell equi-join engages instead.
    Below the threshold the exact plan (matrix ride-along +
    MapInPandas) stays. The ORACLED q_embedding_near_dup entry is
    exact-only at every scale/env (ADVICE r3: the hash check must
    vouch for the plan that actually runs)."""
    from aiotcvectordb_spark import queries as Q
    from aiotcvectordb_spark.plans import audit

    # force the knee BELOW the fixture size -> auto must route to IVF
    monkeypatch.setenv(Q._NEARDUP_EXACT_MAX_ROWS_ENV, "1")
    routed = Q.q_embedding_near_dup_auto(spark, sf_dir)
    plan = audit.executed_plan(routed)
    assert "BroadcastNestedLoop" not in plan
    assert "MapInPandas" not in plan
    # ...while the oracled entry ignores the knee and stays exact
    oracled = Q.q_embedding_near_dup(spark, sf_dir)
    assert "MapInPandas" in audit.executed_plan(oracled)

    # default knee (20k, r5) -> fixture routes to the exact broadcast plan
    monkeypatch.delenv(Q._NEARDUP_EXACT_MAX_ROWS_ENV, raising=False)
    exact = Q.q_embedding_near_dup_auto(spark, sf_dir)
    plan = audit.executed_plan(exact)
    assert "MapInPandas" in plan

    # both routes agree on the fixture (IVF recall is exact-complete at
    # this scale because every true pair shares a probed cell)
    got = {(r.vec_a, r.vec_b) for r in routed.collect()}
    want = {(r.vec_a, r.vec_b) for r in exact.collect()}
    assert want >= got and len(got) >= int(0.8 * len(want))


def test_round3_ops_shuffle_budgets(spark, sf_dir):
    """Round-3 additions stay within their designed shuffle budgets:
    the JPEG codec chain is shuffle-free beyond the deliberate
    scan-widen repartition, sequence packing spends exactly its two
    planned exchanges (range partition + pid window) plus the tiny
    offset/final aggregates, and the one-sort equidepth histogram's
    returned plan is the bin aggregate only (edges are precomputed
    metadata)."""
    from aiotcvectordb_spark import queries as Q
    from aiotcvectordb_spark.plans import audit

    budgets = {
        "jpeg_probe": 1,        # scan-widen only; encode->decode map-side
        "jpeg_progressive_probe": 1,  # same chain, SOF2 scans
        # 3 data-sized exchanges (range partition, pid window, final
        # agg) + 3 metadata-sized ones (32-row offset agg/window,
        # broadcast) — the point is NO global single-partition window
        # over the data
        "pack_sequences": 6,
        "equidepth_histogram": 1,  # final 10-row bin aggregate
    }
    for name, budget in budgets.items():
        df = Q.QUERIES[name](spark, sf_dir)
        got = audit.count_shuffles(df)
        assert got <= budget, (name, got, budget)
        audit.assert_no_cartesian(df)


def test_bpe_train_plan_shape(spark, sf_dir):
    """BPE training's per-round work is JVM pair counting + map-side
    rewrite: the encode stage itself must be shuffle-free and the
    registry query must not plan a cartesian product."""
    from aiotcvectordb_spark import queries as Q
    from aiotcvectordb_spark.plans import audit

    df = Q.QUERIES["bpe_token_count"](spark, sf_dir)
    # encode is map-only; the single exchange is the deliberate
    # scan-widen repartition (ensure_min_partitions)
    assert audit.count_shuffles(df) <= 1
    audit.assert_no_cartesian(df)


def test_write_path_broadcast_guard(spark, sf_dir, monkeypatch):
    """Unbounded victim/batch key sets must NOT carry a forced broadcast
    hint (VERDICT r3: a filter-only delete matching half a 100 TB
    collection would ship its key set to every executor). Bounded paths
    (limited delete, the <=1000-doc API upsert) keep the hint."""
    from aiotcvectordb_spark.engine import (
        _BROADCAST_KEYS_MAX,
        delete_rows,
        upsert_dataframes,
    )
    from aiotcvectordb_spark.plans import audit

    df = Q.load(spark, sf_dir, "documents")

    # limited delete: victim count bounded -> broadcast expected
    remaining, n = delete_rows(df, F.col("lang") == "en", "doc_id", limit=5)
    assert n == 5
    assert "ResolvedHint" in remaining._jdf.queryExecution().analyzed().toString() or (
        audit.has_broadcast_join(remaining)
    )

    # unbounded filter-only delete: NO forced hint in the analyzed plan
    # (AQE may still CHOOSE broadcast from observed size — that's fine;
    # the assertion is about the hint, not the physical strategy).
    # Shrink the threshold so the small test table crosses it.
    import aiotcvectordb_spark.engine as engine_mod

    monkeypatch.setattr(engine_mod, "_BROADCAST_KEYS_MAX", 10)
    remaining_all, n_all = delete_rows(df, F.lit(True), "doc_id")
    assert n_all > 10
    analyzed = remaining_all._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    monkeypatch.undo()

    # streaming-sink upsert contract: known_small=False -> no hint
    batch = df.limit(10)
    merged = upsert_dataframes(df, batch, "doc_id", known_small=False)
    analyzed = merged._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    # API path keeps the hint
    merged_hinted = upsert_dataframes(df, batch, "doc_id")
    analyzed_h = merged_hinted._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in analyzed_h


def test_round9_ops_shuffle_budgets(spark, sf_dir):
    """Lock the r9 additions to their designed shuffle budgets — every
    exchange here is KEYED (gram / doc_id / query_idx), never all-pairs:
    the novelty pair's exchanges are the scan-widen repartition, the
    (doc_id, gram) distinct, the gram-keyed min aggregate, the gram
    equi-join alignment, the doc-keyed count, and the spine left join
    (the incremental twin adds the standing-index side); the int8-grid
    ANN is a map-only scan + per-query TakeOrdered with one tiny
    query_idx exchange for the rescore window; the hash sampler is a
    pure scan filter (ZERO shuffles at any scale); MMR is the kNN fetch
    plus one bounded <=fetch_k-per-query applyInPandas group."""
    from aiotcvectordb_spark import queries as Q
    from aiotcvectordb_spark.plans import audit

    budgets = {
        "gram_novelty": 6,
        "incremental_gram_novelty": 8,
        # r12: one shared-dequant candidate scan for the whole query
        # batch replaced Q TakeOrdered scans — the per-query top-50 now
        # rides a narrow (query_idx, vec_id, score) rank window, so the
        # plan gains one bounded exchange and loses a full parquet scan
        # (3 -> 2 scans; isolated 4.61 -> 2.60 s)
        "ann_sq8_cosine": 2,
        "stratified_sample_hash": 0,
        "mmr_rerank": 2,
    }
    for name, budget in budgets.items():
        df = Q.QUERIES[name](spark, sf_dir)
        got = audit.count_shuffles(df)
        assert got <= budget, (name, got, budget)
        audit.assert_no_cartesian(df)


def test_semdedup_in_cell_join_partition_pin(spark, sf_dir, monkeypatch):
    """r10 (judge), re-pinned for the r13 per-cell kernel: the fixed-K
    SemDeDup in-cell domination work is quadratic per cell while its
    INPUT shuffle bytes are tiny, so AQE's byte-based advisory
    coalescing collapsed the stage to ~7 tasks at the 50k-row probe.
    Above the row threshold the assignment carries ONE
    REPARTITION_BY_NUM exchange on the cell key — the origin AQE may
    NOT coalesce — and the groupBy().applyInPandas REUSES it (its
    ClusteredDistribution is satisfied, so no ENSURE_REQUIREMENTS
    exchange on cell appears). Below the threshold the plan is
    unchanged."""
    import re

    monkeypatch.setenv("SPARK_GRAFT_SEMDEDUP_PIN_MIN_ROWS", "1")
    for name, n_pins in (
        ("semantic_dedup", 1),
        ("incremental_semantic_dedup", 1),
    ):
        pinned = audit.executed_plan(Q.QUERIES[name](spark, sf_dir))
        cells = re.findall(
            r"Exchange hashpartitioning\(cell#\d+, \d+\), REPARTITION_BY_NUM",
            pinned,
        )
        assert len(cells) == n_pins, (name, pinned.count("REPARTITION_BY_NUM"))
        assert not re.findall(
            r"Exchange hashpartitioning\(cell#\d+, \d+\), ENSURE_REQUIREMENTS",
            pinned,
        ), (name, "pin not reused by the per-cell kernel")
    monkeypatch.delenv("SPARK_GRAFT_SEMDEDUP_PIN_MIN_ROWS")
    default = audit.executed_plan(Q.QUERIES["semantic_dedup"](spark, sf_dir))
    assert "REPARTITION_BY_NUM" not in default


def test_round10_ops_shuffle_budgets(spark, sf_dir):
    """Lock the r10 additions to their designed shuffle budgets — every
    exchange is KEYED, never all-pairs: the fixed-centroid IVF carries
    the vec_id-keyed assignment window, the broadcast probe join (no
    data exchange), and the per-query rank window; the portable-hash
    substring lane is the production lane's budget (hash aggregate,
    hash equi-join, coverage distinct, anti-join, reassembly); the
    incremental decontamination is shingle/doc-keyed aggregates plus
    the spine joins over ONLY bench-or-batch docs."""
    budgets = {
        "ann_ivf_cosine_fixed": 3,
        "substring_dedup_hashed_portable": 6,
        "incremental_decontaminate_fraction": 9,
        # staged r11 promotions: the weighted sampler is a pure
        # map-only key projection + TakeOrdered (ZERO shuffles; the
        # rank window sees only the k merged rows); winnowing is ONE
        # doc-keyed window whose partitioning the final per-doc
        # aggregate reuses; entropy is the widen repartition + two
        # keyed aggregates ((doc, tok) then doc), both with map-side
        # partials.
        "weighted_sample_hash": 0,
        "winnow_fingerprint": 1,
        "token_entropy": 3,
    }
    for name, budget in budgets.items():
        df = Q.QUERIES[name](spark, sf_dir)
        got = audit.count_shuffles(df)
        assert got <= budget, (name, got, budget)
        audit.assert_no_cartesian(df)


def test_round11_ops_shuffle_budgets(spark, sf_dir):
    """Lock the r11 additions to their designed shuffle budgets. The
    frozen PCA projection is pure scan-stage matmul (ZERO exchanges);
    the metadata routes carry only the ensure_min_partitions widen (the
    codec mapInPandas stages are shuffle-free); the frozen classifier
    is two doc-keyed aggregates plus the spine join (the weight side is
    an explicit broadcast — no data exchange); the hashed CJK lanes run
    the word lane's Lee-et-al budget twice (one per routed lane), every
    exchange keyed on the hash pair or (doc, pos) — never all-pairs."""
    budgets = {
        "embedding_pca_fixed": 0,
        "audio_mp3_meta": 1,
        "jpeg_meta": 1,
        "quality_classifier_frozen": 5,
        "substring_dedup_cjk_hashed": 16,
        "substring_dedup_cjk": 16,
        # the ANN twins: PQ's only exchange feeds the per-query ADC
        # rank window (encode + LUTs live in the scan projection /
        # broadcast); LSH adds the candidate-dedup exchange on top of
        # the rescore rank — the four bucket joins are all broadcast
        "ann_pq_cosine_fixed": 1,
        "ann_lsh_l2_fixed": 2,
    }
    for name, budget in budgets.items():
        df = Q.QUERIES[name](spark, sf_dir)
        got = audit.count_shuffles(df)
        assert got <= budget, (name, got, budget)
        audit.assert_no_cartesian(df)

"""End-to-end corpus-curation pipeline invariants: each stage's flag is
consistent with the standalone oracle-checked operator, and the
materialized export round-trips."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiotcvectordb_spark import pipelines as P


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_curate_optional_stages(spark, sf_dir):
    """scrub_pii redacts before cleaning; a benchmark adds a
    contaminated flag that gates keep; defaults leave the base
    composition byte-identical."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    base = P.curate(docs)
    # default path unchanged by the new parameters
    again = P.curate(docs, scrub_pii=False, benchmark=None)
    assert base.schema == again.schema

    # PII scrubbing: an email-bearing doc loses the address pre-clean
    with_pii = docs.limit(5).withColumn(
        "text", F.concat(F.col("text"), F.lit(" contact bob@example.com now"))
    )
    scrubbed = P.curate(with_pii, scrub_pii=True)
    assert scrubbed.filter(F.col("clean_text").contains("example.com")).count() == 0
    assert scrubbed.filter(F.col("clean_text").contains("<email>")).count() == 5

    # decontamination: docs sharing 8-token windows with the benchmark
    # slice are flagged and excluded from keep
    bench = docs.filter("doc_id % 5 = 0").select("text")
    cur = P.curate(docs, benchmark=bench)
    flagged = cur.filter("contaminated")
    assert flagged.count() > 0
    assert cur.filter("keep AND contaminated").count() == 0
    # benchmark members overlap themselves trivially -> flagged
    assert flagged.filter("doc_id % 5 = 0").count() > 0


def test_curate_flags_and_keep(spark, sf_dir):
    cur = P.curate(_docs(spark, sf_dir)).cache()
    total = _docs(spark, sf_dir).count()
    assert cur.count() == total  # annotation, not filtering
    kept = cur.filter("keep")
    n_kept = kept.count()
    assert 0 < n_kept <= total
    # kept set contains no exact duplicates of clean_text
    assert kept.select("clean_text").distinct().count() == n_kept
    # every kept doc passes the quality gate
    assert kept.filter("NOT quality_ok").count() == 0
    # splits cover the kept set, mostly train
    splits = {r.split: r.n for r in kept.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(splits) <= {"train", "val", "test"}
    assert splits.get("train", 0) > splits.get("val", 0)
    cur.unpersist()


def test_near_dedup_keeps_bucket_minimum(spark, sf_dir):
    cur = P.curate(_docs(spark, sf_dir))
    # a doc flagged near_dup must have a lower-id candidate partner that
    # survived (transitively: the bucket minimum is never flagged)
    flagged = cur.filter("near_dup")
    if flagged.count():
        min_all = cur.agg(F.min("doc_id")).first()[0]
        assert flagged.filter(F.col("doc_id") == min_all).count() == 0


def test_materialize_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus")
    counts = P.materialize(P.curate(_docs(spark, sf_dir)), out)
    back = spark.read.parquet(out)
    assert back.count() == sum(counts.values())
    assert set(counts) == {r.split for r in back.select("split").distinct().collect()}


def test_duplicate_injection_is_removed(spark, sf_dir):
    """Inject exact copies of 5 docs with new ids — the pipeline must
    drop every copy (keep the original, lower id)."""
    docs = _docs(spark, sf_dir)
    max_id = docs.agg(F.max("doc_id")).first()[0]
    clones = (
        docs.orderBy("doc_id")
        .limit(5)
        .withColumn("doc_id", F.col("doc_id") + F.lit(max_id + 1))
    )
    cur = P.curate(docs.unionByName(clones))
    clone_rows = cur.filter(F.col("doc_id") > max_id).collect()
    assert len(clone_rows) == 5
    assert all(not r.keep for r in clone_rows)


def test_stateless_stages_run_on_stream(spark, sf_dir, tmp_path):
    """clean/quality/split are pure projections, so the same stage
    functions run unchanged on a structured stream (dedup stages need
    global state and stay batch — run them in the foreachBatch merge)."""
    import shutil

    docs = _docs(spark, sf_dir)
    batch = (
        P.split_stage(P.quality_stage(P.clean_stage(docs)))
        .select("doc_id", "clean_text", "n_tokens", "quality_ok", "split")
    )
    expected = {tuple(r) for r in batch.collect()}

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", src / "documents.parquet")
    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    out = (
        P.split_stage(P.quality_stage(P.clean_stage(stream)))
        .select("doc_id", "clean_text", "n_tokens", "quality_ok", "split")
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("cur_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in spark.sql("SELECT * FROM cur_stream").collect()}
    assert got == expected


def test_near_dedup_exact_groups_collapses_chains(spark):
    """Chain A~B, B~C (A,C never share a bucket): one-pass domination
    can keep both ends; exact_groups keeps exactly one representative."""
    from aiotcvectordb_spark import pipelines as P

    base = "the quick brown fox jumps over the lazy dog " * 3
    docs = spark.createDataFrame(
        [
            (1, base + "alpha beta gamma delta epsilon"),
            (2, base + "alpha beta gamma delta zeta"),
            (3, base + "alpha beta eta theta iota"),
            (10, "completely different text about spark partitions and shuffles ok"),
        ],
        "doc_id: long, text: string",
    )
    flagged = P.near_dedup_stage(
        P.clean_stage(docs), exact_groups=True, max_bucket_size=None
    )
    kept = {r.doc_id for r in flagged.filter("NOT near_dup").collect()}
    dup_cluster_kept = kept & {1, 2, 3}
    assert dup_cluster_kept == {1}, kept
    assert 10 in kept
    # default (pair-domination) keeps a superset of the exact resolution
    loose = P.near_dedup_stage(P.clean_stage(docs), max_bucket_size=None)
    loose_kept = {r.doc_id for r in loose.filter("NOT near_dup").collect()}
    assert kept <= loose_kept


def test_exact_groups_rejects_streams(spark, tmp_path):
    from aiotcvectordb_spark import pipelines as P
    import pytest as _pytest

    src = str(tmp_path / "stream_src")
    spark.createDataFrame(
        [(1, "a b c")], "doc_id: long, text: string"
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    with _pytest.raises(ValueError, match="exact_groups"):
        P.near_dedup_stage(P.clean_stage(stream), exact_groups=True)


def test_quota_stage_gates_keep(spark, sf_dir):
    from aiotcvectordb_spark import pipelines as P
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cur = P.curate(docs, source_quota=10)
    rows = cur.select("doc_id", "source", "n_tokens", "quota_ok").collect()
    # at most 10 quota_ok docs per source, and they are the per-source
    # best by (n_tokens desc, doc_id)
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        ok = {r.doc_id for r in rs if r.quota_ok}
        assert len(ok) <= 10
        best = {
            r.doc_id
            for r in sorted(rs, key=lambda r: (-r.n_tokens, r.doc_id))[:10]
        }
        assert ok == best, src
    # keep implies quota_ok
    assert cur.filter("keep AND NOT quota_ok").count() == 0


def test_shard_stage_matches_registry_query(spark, sf_dir):
    from aiotcvectordb_spark import pipelines as P
    from aiotcvectordb_spark import queries as Q

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    staged = {
        r.doc_id: (r.shard, r.shard_pos)
        for r in P.shard_stage(docs).select(
            "doc_id", "shard", "shard_pos"
        ).collect()
    }
    reg = {
        r.doc_id: (r.shard, r.pos)
        for r in Q.q_training_shards(spark, sf_dir).collect()
    }
    # same hash family and order: identical layout wherever both ran
    # (the registry query reads the same table at the same sf)
    common = set(staged) & set(reg)
    assert common
    assert all(staged[d] == reg[d] for d in common)

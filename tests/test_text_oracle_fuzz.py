"""Adversarial-corpus oracle parity for the text / dedup / curation
family — the same treatment ``test_extract_oracle_fuzz.py`` gives the
extract round trips.

The driver gate runs these queries on the synthetic corpus (pure-ASCII,
single-line, single-spaced), so Spark-vs-DuckDB agreement was never
exercised on the text real pretraining corpora have: CJK documents,
duplicate and near-duplicate groups, shared substring runs, PII
patterns, tabs/CRLF/multi-space, empty-after-normalization docs. This
sweep runs every documents-only oracled query in the family on such a
corpus and compares with the driver's own (rowcount, columns,
order-insensitive value hash) rule.
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aiotcvectordb_spark import queries as Q

_SHARED_RUN = (
    "the quick brown fox jumps over the lazy dog near the river bank today"
)
_CJK_RUN = "东风夜放花千树更吹落星如雨宝马雕车香满路"

_DOCS = [
    # --- plain English prose, some sharing a long word run -----------
    f"intro sentence one {_SHARED_RUN} and a unique tail alpha",
    f"intro sentence two {_SHARED_RUN} with a different ending beta",
    f"{_SHARED_RUN}",
    "a wholly unique document about spark partition pruning strategies",
    "another unique document mentioning shuffle hash join fallback",
    # --- exact duplicate groups --------------------------------------
    "duplicate group one payload text",
    "duplicate group one payload text",
    "duplicate group one payload text",
    "duplicate group two other payload",
    "duplicate group two other payload",
    # --- CJK, whitespace-free, sharing a char run --------------------
    f"{_CJK_RUN}凤箫声动玉壶光转一夜鱼龙舞",
    f"蛾儿雪柳黄金缕{_CJK_RUN}笑语盈盈暗香去",
    f"{_CJK_RUN}",
    "众里寻他千百度蓦然回首那人却在灯火阑珊处",
    # --- mixed script ------------------------------------------------
    f"mixed header {_CJK_RUN} mixed tail",
    "中文 with spaces 的 mixed 文本 tokens",
    # --- PII-looking content ----------------------------------------
    "contact alice at alice@example.com or 555-123-4567 for details",
    "no pii here just words",
    # --- nasty shapes -------------------------------------------------
    "trailing newline doc\n",
    "\nleading newline doc",
    "blank\n\n\n\nrun doc",
    "tab\tseparated\ttokens doc",
    "multi  space   runs    doc",
    " edge space doc ",
    "x",
    "\n\n",
    "   ",
    "carriage\r\nreturn doc",
    "emoji 😀 bearing doc \U0001f680",
    "UPPER CASE SHOUTING DOC WITH PUNCT!!! ??? ...",
    "123 456 789 numeric doc 000",
    "word " * 120 + "long repetitive doc",
    ("repeat me " * 30).strip(),
    # --- duplicate lines / paragraphs (Gopher repetition battery, r8) -
    "same line here\nsame line here\nsame line here\nunique closing line",
    "para one body text\n\npara one body text\n\npara two other text",
    "mixed\nmixed\nnot mixed\nmixed\n\nmixed\nfinal",
    "one line only but with with with repeated repeated tokens",
    # --- C4 rule shapes (line filter + page drops, r8) -----------------
    "This line ends with a period and has enough words.\n"
    "short line.\n"
    "this long line mentions javascript libraries and ends properly.\n"
    'a quoted ending line with exactly seven words here"\n'
    "no terminal punctuation on this long line at all",
    "A good first sentence is here. A second one follows! A third? Yes.",
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do.",
    "a config page with a { brace token inside it somewhere.",
    "Trailing whitespace before punct line .  \nAnother fine sentence here.",
]

N_DOCS = 3 * len(_DOCS)

QUERY_NAMES = [
    "clean_text",
    "dataset_split",
    "unigram_logprob",
    "perplexity_filter",
    "dsir_weights",
    "gopher_quality_filter",
    "c4_quality_filter",
    "lang_top_terms",
    "bigram_logprob",
    "pii_scrub",
    "training_shards",
    "source_quota",
    "token_count",
    "line_dedup",
    "substring_dedup",
    "substring_dedup_cjk",
    "incremental_substring_dedup",
    "incremental_substring_dedup_cjk",
    "lang_id",
    "dedup_exact",
    "fulltext_bm25",
    "sparse_encode",
    "doc_fingerprint",
    "text_quality",
    "doc_repetition",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash_fingerprint",
    "chunk_expand",
    "benchmark_decontaminate",
    "decontaminate_fraction",
    "pack_sequences",
    # r9: the rest of the r8 family + the r9 additions sweep the
    # hostile corpus too — doc-atomic packing (overflow docs), the
    # incremental line cleaner (duplicate-line groups, empty-ish
    # docs), and the composed funnel (gate flags over every shape)
    "pack_sequences_nosplit",
    "incremental_line_dedup",
    "curate_corpus_v2",
    # r9: first-seen gram novelty — duplicate groups must show novelty
    # 1.0 on the first copy and 0.0 on later ones; short docs NULL
    "gram_novelty",
    "incremental_gram_novelty",
    "stratified_sample_hash",
    # r9: sliding-window phrase fold vs DuckDB list_filter — CJK
    # bigram lanes and sub-phrase-length docs exercise both guards
    "fulltext_phrase",
    "curate_corpus",
    "dataset_mix",
    "dataset_mix_temp",
    "multimodal_meta",
    "query_projection",
    "update_conditional",
    "upsert_merge",
    # completeness: every remaining oracled query runs on the hostile
    # corpus too — codec probes exercise their payload builders over
    # nasty text/ids, the dedup/rank family its banding and components,
    # the hybrids their sparse+dense legs (embeddings copied in)
    "lang_id_cjk",
    "fulltext_bm25_cjk",
    # r9: the hash-embedder search gained its CJK bigram lane — this
    # corpus (CJK runs, mixed script, emoji, empty-ish docs) is the
    # cross-engine exercise the ASCII driver corpus can't give it
    "search_by_text",
    "incremental_dedup",
    "minhash_lsh_candidates",
    "simhash_near_dup",
    "dedup_components",
    "hybrid_rrf",
    "hybrid_weighted",
    "image_probe",
    "gif_frames",
    "jpeg_probe",
    "jpeg_progressive_probe",
    "audio_probe",
    "video_frames",
    "multimodal_features",
]

LANGS = ["en", "zh", "en", "de", "fr", "en"]


@pytest.fixture(scope="module")
def nasty_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("nasty_text_sf")
    texts = [_DOCS[i % len(_DOCS)] for i in range(N_DOCS)]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                [
                    "zh" if any("一" <= c <= "鿿" for c in t)
                    else LANGS[i % len(LANGS)]
                    for i, t in enumerate(texts)
                ],
                pa.string(),
            ),
            "source": pa.array(
                [f"src{i % 5}" for i in range(N_DOCS)], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    # the hybrid queries join an embeddings side; the real tiny table
    # keeps the adversarial part the documents
    import shutil

    shutil.copyfile(
        "/root/testdata/sf0.001/embeddings.parquet",
        str(d / "embeddings.parquet"),
    )
    return str(d)


def _norm_hash(df) -> str:
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        if str(d[c].dtype) in ("float64", "float32"):
            d[c] = d[c].astype("float64").round(9)
    rows = sorted(
        tuple(str(v) for v in row)
        for row in d.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_text_query_matches_oracle_on_nasty_corpus(spark, nasty_sf, name):
    sdf = Q.QUERIES[name](spark, nasty_sf).toPandas()

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{nasty_sf}/documents.parquet'"
    )
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{nasty_sf}/embeddings.parquet'"
    )
    odf = con.sql(Q.ORACLES[name]).df()

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} != {sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), (
        f"{name}: rows spark={len(sdf)} oracle={len(odf)}"
    )
    if _norm_hash(sdf) != _norm_hash(odf):
        # locate a differing row for the failure message
        s_rows = sorted(
            tuple(str(v) for v in r)
            for r in sdf[sorted(sdf.columns)].itertuples(index=False, name=None)
        )
        o_rows = sorted(
            tuple(str(v) for v in r)
            for r in odf[sorted(odf.columns)].itertuples(index=False, name=None)
        )
        diff = next(
            (i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b),
            min(len(s_rows), len(o_rows)) - 1,
        )
        pytest.fail(
            f"{name}: value hash mismatch; first differing sorted row "
            f"#{diff}:\n  spark : {s_rows[diff]}\n  oracle: {o_rows[diff]}"
        )


ROWS_ONLY = [
    "audio_adpcm_probe",
    "audio_mp3_probe",
    "bpe_token_count",
    "heavy_hitters",
    "quality_classifier",
    "stratified_sample",
    "substring_dedup_hashed",
]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_text_query_survives_nasty_corpus(spark, nasty_sf, name):
    """Rows-only operators (no SQL oracle) must still run to completion
    on the hostile corpus — empty/CJK/control-ish shapes and duplicate
    groups must never abort the job."""
    sdf = Q.QUERIES[name](spark, nasty_sf).toPandas()
    assert len(sdf) >= 0


def test_curation_funnel_survives_nasty_corpus(spark, nasty_sf, tmp_path):
    """The composed r8 funnel (rule gate -> exact dedup -> SemDeDup ->
    split) must run to completion on the hostile corpus — empty docs,
    CJK, control chars, duplicate-line shapes — and the scale-routed
    variant must agree with the oracled plan below the routing knee.
    (Rows-only here: the funnel's oracle registration is deferred to
    r9 for rotation-slot reasons; its constituents are oracled.)"""
    import math
    import shutil

    from aiotcvectordb_spark import queries as Q

    d = tmp_path / "funnel_sf"
    d.mkdir()
    shutil.copyfile(
        f"{nasty_sf}/documents.parquet", str(d / "documents.parquet")
    )
    rows = [
        (i, [round(math.sin(0.1 * j + 0.01 * i), 6) for j in range(Q.DIM)])
        for i in range(N_DOCS)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.parquet(str(d / "embeddings.parquet"))

    fixed = {
        (r.stage_idx, r.stage): r.n_docs
        for r in Q.QUERIES["curate_corpus_v2"](spark, str(d)).collect()
    }
    assert fixed[(0, "raw")] == N_DOCS
    assert 0 <= fixed[(1, "rule_gate")] <= N_DOCS
    # the corpus is 3 copies of each doc: exact dedup must bite
    assert fixed[(2, "exact_keeper")] < fixed[(1, "rule_gate")]
    auto = {
        (r.stage_idx, r.stage): r.n_docs
        for r in Q.QUERIES["curate_corpus_v2_auto"](spark, str(d)).collect()
    }
    assert auto == fixed  # below the knee the router picks the oracled plan

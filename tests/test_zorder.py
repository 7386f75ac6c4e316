"""Z-order layout: parquet footer stats prune files on BOTH columns."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiotcvectordb_spark.sources.zorder import (
    files_overlapping,
    write_zordered,
    z_value,
)
from tests.conftest import SF_DIR

N_FILES = 16


def _fact(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"
    )


def test_z_value_is_deterministic_and_bounded(spark):
    df = _fact(spark)
    wb, z = z_value(df, ["l_partkey", "l_suppkey"])
    vals = [r["__z"] for r in wb.withColumn("__z", z).select("__z").collect()]
    assert all(0 <= v < (1 << 32) for v in vals)
    again = [r["__z"] for r in wb.withColumn("__z", z).select("__z").collect()]
    assert vals == again


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    df = _fact(spark)
    z_path = str(tmp_path / "zorder")
    lin_path = str(tmp_path / "linear")
    write_zordered(df, z_path, ["l_partkey", "l_suppkey"], n_files=N_FILES)
    # baseline layout: range-clustered on the FIRST column only
    (
        df.repartitionByRange(N_FILES, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lin_path)
    )

    # identical content
    assert (
        spark.read.parquet(z_path).orderBy("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice").collect()
        == spark.read.parquet(lin_path).orderBy("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice").collect()
    )

    stats = df.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    pk_mid = (stats[0] + stats[1]) / 2
    sk_mid = (stats[2] + stats[3]) / 2
    pk_w = (stats[1] - stats[0]) / 8
    sk_w = (stats[3] - stats[2]) / 8

    # narrow range on the SECOND dimension: the single-column layout
    # cannot prune it at all; z-order must skip files
    z_hit, z_tot = files_overlapping(z_path, "l_suppkey", sk_mid, sk_mid + sk_w)
    lin_hit, lin_tot = files_overlapping(lin_path, "l_suppkey", sk_mid, sk_mid + sk_w)
    assert z_tot == lin_tot == N_FILES
    assert lin_hit == N_FILES  # first-column sort is blind to suppkey
    assert z_hit < N_FILES // 2, (z_hit, N_FILES)

    # first dimension: z-order keeps useful (if coarser) pruning too
    z_hit_a, _ = files_overlapping(z_path, "l_partkey", pk_mid, pk_mid + pk_w)
    assert z_hit_a < N_FILES, z_hit_a


def test_engine_compact_zorder_preserves_content(engine):
    from tests.test_engine_api import make_collection

    db, coll = make_collection(engine, name="z_coll")
    docs = [
        {"id": f"r{i}", "vector": [1.0, 0.0, 0.0], "tag": "t",
         "page": (i * 37) % 100}
        for i in range(200)
    ]
    engine.upsert(db, coll, docs[:100])
    engine.upsert(db, coll, docs[100:])
    before = {(d["id"], d["page"]) for d in docs}
    engine.compact(db, coll, target_files=4, zorder_by=["page", "page"])
    got = {
        (r["id"], r["page"])
        for r in engine.query(db, coll, limit=1000, output_fields=["id", "page"])
    }
    assert got == before

"""Z-order (Morton-curve) clustering: multi-column data skipping.

Range-sorting a table on ONE column gives file-level min/max pruning
for that column only; predicates on a second column still scan every
file. Interleaving the bits of both columns (the Morton / Z-order
curve) and range-partitioning on the interleaved value clusters rows
that are close in BOTH dimensions into the same files, so parquet
footer min/max statistics prune files for predicates on EITHER column
(or a box on both). This is the standard lakehouse layout trick for
100 TB fact tables queried along more than one axis; here it is plain
Spark — the z-value is a pure codegen expression, the layout is
``repartitionByRange(z) + sortWithinPartitions(z)``, and the pruning
win is measured directly from parquet footer stats in
``tests/test_zorder.py``.

Everything is expression-level (shiftleft/AND masks — classic bit
spreading), no UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 16  # per-dimension resolution: 2 dims x 16 bits -> 32-bit z


def _spread_bits_expr(col: str) -> str:
    """Insert a zero between consecutive bits of a 16-bit int (the
    classic mask-shift cascade), yielding a 32-bit spread value."""
    x = f"cast({col} as bigint)"
    x = f"(({x} | shiftleft({x}, 8)) & 16711935)"        # 0x00FF00FF
    x = f"(({x} | shiftleft({x}, 4)) & 252645135)"       # 0x0F0F0F0F
    x = f"(({x} | shiftleft({x}, 2)) & 858993459)"       # 0x33333333
    x = f"(({x} | shiftleft({x}, 1)) & 1431655765)"      # 0x55555555
    return x


def _scale_expr(col: str, mn: str, mx: str) -> str:
    """Scale a numeric column to [0, 2^16-1] using broadcast min/max.

    Value-proportional scaling (not equi-depth ranks): it needs only a
    tiny min/max aggregate — no global sort — and zone-map pruning only
    needs *locality*, not balance."""
    span = f"greatest({mx} - {mn}, 1e-300)"
    return (
        f"cast(least({_BITS_MAX}, floor((cast({col} as double) - {mn}) / {span} "
        f"* {_BITS_MAX})) as bigint)"
    )


_BITS_MAX = (1 << _BITS) - 1


def z_value(df: DataFrame, cols: Sequence[str]) -> tuple[DataFrame, Column]:
    """Attach min/max-scaled Z-order value for two numeric columns.

    Returns (df_with_bounds, z_column). The bounds come from ONE tiny
    aggregate broadcast onto the scan; the z computation itself is a
    whole-stage-codegen integer expression.
    """
    if len(cols) != 2:
        raise ValueError("z_value interleaves exactly 2 columns")
    a, b = cols
    bounds = df.agg(
        F.min(F.col(a).cast("double")).alias("__mna"),
        F.max(F.col(a).cast("double")).alias("__mxa"),
        F.min(F.col(b).cast("double")).alias("__mnb"),
        F.max(F.col(b).cast("double")).alias("__mxb"),
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    za = _spread_bits_expr(_scale_expr(a, "__mna", "__mxa"))
    zb = _spread_bits_expr(_scale_expr(b, "__mnb", "__mxb"))
    z = F.expr(f"{za} | shiftleft({zb}, 1)").alias("__z")
    return with_bounds, z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    *,
    n_files: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Z-order curve of ``cols``: range-partition on z (contiguous curve
    segments per file — this is what makes per-file min/max tight on
    BOTH dimensions), sort within partitions, drop the helper columns
    at the writer."""
    with_bounds, z = z_value(df, cols)
    (
        with_bounds.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", "__mna", "__mxa", "__mnb", "__mxb")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_overlapping(
    path: str, col: str, lo: float, hi: float
) -> tuple[int, int]:
    """(n_overlapping, n_total) parquet files under ``path`` whose
    footer min/max for ``col`` intersects [lo, hi] — i.e. the files a
    stats-pruning reader must actually scan. Reads ONLY footers."""
    import glob
    import os

    import pyarrow.parquet as pq

    n_total = n_hit = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        fmn, fmx = None, None
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                fmn = fmx = None
                break
            fmn = st.min if fmn is None else min(fmn, st.min)
            fmx = st.max if fmx is None else max(fmx, st.max)
        n_total += 1
        if fmn is None or (fmx >= lo and fmn <= hi):
            n_hit += 1
    return n_hit, n_total

"""As-of join — the time-series operator Spark lacks as a built-in.

For each left row, attach the most recent right row with
``right.on <= left.on`` within the same ``by`` group (backward
direction, inclusive — the semantics of DuckDB/pandas ``ASOF JOIN``).

Strategy: NOT a range join (per-left-row range predicates explode into
O(|L|·|R|) comparisons under a cartesian/range executor). Instead the
classic union trick, which is one shuffle and linear work:

    union(left tagged 1, right tagged 0)
      -> Window.partitionBy(by).orderBy(on, tag, tiebreak)
           .rowsBetween(unboundedPreceding, current)
      -> last(right_payload, ignorenulls=True)   # carry-forward
      -> keep tagged-left rows

At 100 TB this is a single hash-partition by the group key with a
per-partition sort — the same cost as any groupBy-window — and no
state beyond the one carried struct per row. Skewed ``by`` keys behave
like any skewed window (AQE or pre-salting apply unchanged).

Tie rule: right rows sharing (by, on) are reduced to the one with the
greatest ``tiebreak`` value, so results are deterministic and
cross-engine comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: str,
    tiebreak: str,
    right_cols: list[str] | None = None,
    tolerance: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward inclusive as-of join (left outer).

    ``on``: ordering column (numeric/sortable) present in both inputs.
    ``by``: equality group key present in both inputs.
    ``tiebreak``: right column resolving equal-``on`` ties (max wins).
    ``right_cols``: right payload columns to attach (default: all except
    ``on``/``by``), each renamed with ``suffix`` if it collides.
    ``tolerance``: optional max allowed ``left.on - right.on`` distance;
    matches farther back are nulled out (pandas merge_asof semantics).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, by)]

    # deterministic ties: one right row per (by, on) — greatest tiebreak
    r = (
        right.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(by, on).orderBy(F.col(tiebreak).desc())
            ),
        )
        .filter("__rn = 1")
        .drop("__rn")
    )

    out_names = {}
    for c in right_cols:
        out_names[c] = c + suffix if c in left.columns else c
    payload = F.struct(
        F.col(on).alias("__on"), *[F.col(c).alias(out_names[c]) for c in right_cols]
    )

    l_tagged = left.select(
        F.col(by), F.col(on), F.lit(1).alias("__side"),
        F.lit(None).alias("__tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(
            r.select(payload.alias("__rrow")).schema["__rrow"].dataType
        ).alias("__rrow"),
    )
    r_tagged = r.select(
        F.col(by), F.col(on), F.lit(0).alias("__side"),
        F.col(tiebreak).cast("long").alias("__tie"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("__lrow")
            ).schema["__lrow"].dataType
        ).alias("__lrow"),
        payload.alias("__rrow"),
    )

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", F.last("__rrow", ignorenulls=True).over(w))
        .filter("__side = 1")
    )
    if tolerance is not None:
        matched = matched.withColumn(
            "__match",
            F.when(
                F.col(on) - F.col("__match.__on") <= F.lit(tolerance),
                F.col("__match"),
            ),
        )

    cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns] + [
        F.col(f"__match.{out_names[c]}").alias(out_names[c]) for c in right_cols
    ]
    return matched.select(*cols)

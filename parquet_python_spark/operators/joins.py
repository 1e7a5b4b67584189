"""Custom join operators Spark lacks as built-ins: as-of join and range
join (task brief: "when the reference has an operator Spark lacks (e.g.,
as-of join, range join) implement it as a composition of existing
DataFrame ops").  The reference itself has NO joins at all (SURVEY.md
§2.4), so these are new engine surface, expressed entirely with
shuffles/windows Catalyst already optimizes — no Python in either path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    on: str,
    payload_cols: list[str],
    prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: for each left row, the single most recent right row
    of the same ``by`` key with right.on <= left.on (inclusive — DuckDB /
    kdb ASOF semantics).

    Implementation is the union + running-window composition: tag sides,
    sort each ``by`` partition by (on, side) with right rows first on ties,
    and take the last non-null right payload at or before each left row.
    ONE shuffle on the by-key (the window's partitioning); no join node at
    all, so there is nothing quadratic anywhere — the 100 TB shape.

    Right payload travels as a single struct so all matched columns come
    from the SAME right row (per-column last() could mix rows when a
    payload value is legitimately NULL).
    """
    r_payload = F.struct(*[F.col(c) for c in payload_cols]).alias("__p")
    lrow = F.struct(*[F.col(c) for c in left.columns]).alias("__lrow")
    # NULL 'on' never satisfies r.on <= l.on (ASOF semantics): a NULL right
    # timestamp would otherwise sort NULLS FIRST and become the fallback
    # match for the whole partition
    rp = right.filter(F.col(on).isNotNull()).select(
        F.col(by).alias("__by"), F.col(on).alias("__on"),
        F.lit(0).alias("__side"), r_payload,
    )
    lp = left.select(
        F.col(by).alias("__by"), F.col(on).alias("__on"),
        F.lit(1).alias("__side"), lrow,
    )
    # align schemas for the union: each side carries the other's column as null
    rp = rp.withColumn("__lrow", F.lit(None).cast(lp.schema["__lrow"].dataType))
    lp = lp.withColumn("__p", F.lit(None).cast(rp.schema["__p"].dataType))
    u = lp.select("__by", "__on", "__side", "__lrow", "__p").unionByName(
        rp.select("__by", "__on", "__side", "__lrow", "__p")
    )
    w = (
        Window.partitionBy("__by")
        .orderBy(
            F.col("__on").asc(),
            F.col("__side").asc(),
            # deterministic among right rows sharing the same instant:
            # the greatest payload struct wins (nulls_first keeps left
            # rows' null payloads from affecting their position)
            F.col("__p").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )
    return matched.select(
        "__lrow.*",
        *[F.col(f"__m.{c}").alias(prefix + c) for c in payload_cols],
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
) -> DataFrame:
    """Range join (left.point BETWEEN right.lo AND right.hi) via binning.

    The naive theta join is a quadratic nested-loop; instead each point
    maps to one bin and each interval explodes into the bins it overlaps,
    turning the predicate into an equi-join on the bin id + an exact
    residual filter — the standard interval-bin optimization (cf. interval
    joins in genomics engines and Flink's window join).  Shuffle cost is
    O(points + intervals * avg_bins) on the bin key; pick bin_width near
    the typical interval length so avg_bins stays ~2.
    """
    lp = left.withColumn("__bin", (F.col(point_col) / bin_width).cast("long"))
    rp = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.col(lo_col) / bin_width).cast("long"),
                (F.col(hi_col) / bin_width).cast("long"),
            )
        ),
    )
    return (
        lp.join(rp, "__bin")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__bin")
    )

"""Custom join operators Spark has no native physical operator for —
as-of join and range join — implemented as compositions of existing
DataFrame ops (the preferred strategy: stays inside Catalyst/codegen,
no Python in the path).

The reference has no joins at all (SURVEY.md §2.5); these belong to the
Layer-B/time-series surface its Doris fact table implies (nearest-state
lookup and time-window correlation over event streams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: tuple[str, ...],
) -> DataFrame:
    """As-of join: for every left row, the latest right row of the same
    key with right_ts <= left_ts (inner: unmatched left rows drop).

    Implementation: the union-scan trick — tag both sides, sort each key
    by (t, side, ...) with right rows ordered BEFORE left rows at equal
    t (<= semantics), then carry right values forward with
    last_value(ignoreNulls) over a running window. ONE shuffle on the
    key, no per-row subquery, no skew-prone theta join; at 100 TB this
    is a single sort-merge pass, the canonical distributed as-of.

    Right side must be unique per (key, right_ts); pre-aggregate if not.
    NULLs inside ``value_cols`` are skipped over by the ignoreNulls carry
    (a matched row may carry an older non-null value for that column);
    the inner-join match test itself uses an always-non-null marker (the
    right row's timestamp), so a NULL value column never drops the row.
    """
    lcols = [c for c in left.columns]
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_right"),
        *[F.col(c) for c in lcols if c not in (key,)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_matched_t"),
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_right"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (key,)],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(right_ts).alias("__r_matched_t"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in value_cols
        ],
        F.last("__r_matched_t", ignorenulls=True).over(w).alias("__m_matched_t"),
    )
    out = (
        carried.where((F.col("__is_right") == 0) & F.col("__m_matched_t").isNotNull())
        .select(
            F.col("__k").alias(key),
            F.col("__t").alias(left_ts),
            *[F.col(c) for c in lcols if c not in (key, left_ts)],
            *[F.col(f"__m_{c}").alias(c) for c in value_cols],
        )
    )
    return out


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance_ms: int = 3_600_000,
) -> DataFrame:
    """Range join |left_ts - right_ts| <= tolerance, same key — via
    tolerance-sized epoch buckets: each right row is replicated into its
    bucket and both neighbors (fixed fanout 3), then an EQUI-join on
    (key, bucket) + the exact range predicate.

    This turns an inequality (nested-loop/cartesian) join into a
    bounded-fanout hash join — the 100 TB shape: shuffle on (key,
    bucket), no candidate pair more than 3x, exact filter afterwards.

    The output carries the key once (left's copy); if the two timestamp
    columns share a name, the right one comes back as ``right_<name>`` —
    no ambiguous duplicate columns downstream."""
    if right_ts == left_ts:
        right = right.withColumnRenamed(right_ts, f"right_{right_ts}")
        right_ts = f"right_{right_ts}"
    right = right.withColumnRenamed(key, "__rk")
    # cast: parquet NTZ timestamps need an explicit upcast for
    # unix_millis; session TZ is pinned UTC so this is stable
    r_ms = F.unix_millis(F.col(right_ts).cast("timestamp"))
    l_ms_col = F.unix_millis(F.col(left_ts).cast("timestamp"))
    r_exp = right.withColumn(
        "__bkt",
        F.explode(
            F.array(*[F.floor(r_ms / tolerance_ms) + d for d in (-1, 0, 1)])
        ),
    )
    l_b = left.withColumn("__bkt", F.floor(l_ms_col / tolerance_ms))
    cond = (
        (l_b[key] == r_exp["__rk"])
        & (l_b["__bkt"] == r_exp["__bkt"])
        & (
            F.abs(
                F.unix_millis(l_b[left_ts].cast("timestamp"))
                - F.unix_millis(r_exp[right_ts].cast("timestamp"))
            )
            <= tolerance_ms
        )
    )
    return l_b.join(r_exp, cond).drop("__bkt", "__rk")

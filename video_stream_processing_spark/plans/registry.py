"""Query registry.

Each engine operator/capability is declared as a named query:
  - a Spark callable ``(spark, sf_dir) -> DataFrame`` (the implementation
    under test, DataFrame-API-first so Catalyst owns the physical plan),
  - an optional ANSI-SQL oracle string DuckDB runs on the same parquet
    tables (None => genuinely non-SQL-expressible; the driver then records
    a weaker rows-only check).

Column-name parity rule (driver contract): every computed column is
aliased identically in the Spark plan and the oracle SQL, because the
comparison sorts columns by name before hashing values.

Float parity rule: money-like 2-decimal doubles are summed as
DECIMAL(18,2) in BOTH engines (exact, order-insensitive) and cast back to
DOUBLE; genuinely floating results (stddev, cosine) are rounded to a few
decimals on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = ()
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import (order = SURVEY §7.2 milestones).
_PLAN_MODULES = (
    "video_stream_processing_spark.plans.layer_a",
    "video_stream_processing_spark.plans.layer_b",
    "video_stream_processing_spark.plans.extensions",
    "video_stream_processing_spark.plans.graph_mining",
    "video_stream_processing_spark.plans.udf_surface",
)


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query implementation under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def _load_all() -> None:
    for mod in _PLAN_MODULES:
        importlib.import_module(mod)


# The driver verifies queries in dict order with a cap (~50 rows per
# round), so enumeration order decides which certifications refresh.
# LAST_DRIVER_ROUND (generated from CORRECTNESS_r*.json by
# tools/gen_driver_rounds.py) records each query's most recent driver
# row; enumerating ascending by that round puts never-certified queries
# first and the stalest green rows right behind them, so every round's
# capped pass drains the oldest cohort (VERDICT r10 task 5) instead of
# re-certifying last round's sample.
from video_stream_processing_spark.plans.driver_rounds import LAST_DRIVER_ROUND

# Queries whose ORACLE text (or semantics) changed after their latest
# driver row was recorded, mapped to the round the change landed. A green
# row older than that round certifies the OLD oracle, so the query
# re-enumerates as never-certified — but only until a row at or after the
# change round lands, at which point the overlay self-clears (r11 ADVICE:
# the frozenset form pinned b63/x127 to tier 0 forever).
# r11: b63's oracle became a single-statement MATERIALIZED CTE (the
# ADVICE contract fix); x127's kept-filter gained ::DOUBLE (decimal vs
# double boundary math, ADVICE medium). Both drew fresh rows in r11, so
# these entries are inert and kept only as examples of the mechanism.
_ORACLE_CHANGED: dict[str, int] = {
    "b63_recursive_bfs_reach": 11,
    "x127_html_extract": 11,
    # r13: x140's synth gained the uint8 clamp (ADVICE high — sf0.1
    # overflow divergence); x141 became the FOUR-modality closure with
    # per-doc modality attribution (VERDICT r12 task 2).
    "x140_video_fingerprint_neardup": 13,
    "x141_multimodal_dup_clusters": 13,
    # r13: the builder's FULL sf0.1 differential sweep (first ever at
    # that scale) caught two cross-engine half-tie roundings invisible
    # at sf0.01 — b34's mins_apart and b47's pct_rank/cume now round in
    # integer micro-units (the x131 discipline).
    "b34_range_join": 13,
    "b47_ntile_distribution": 13,
}


def _driver_order(name: str) -> tuple[int, str]:
    rnd = LAST_DRIVER_ROUND.get(name, 0)
    if rnd < _ORACLE_CHANGED.get(name, 0):
        rnd = 0
    return (rnd, name)


def all_queries() -> dict[str, QuerySpec]:
    """All registered queries, stalest driver certification first (see
    LAST_DRIVER_ROUND / _driver_order)."""
    _load_all()
    return {name: _REGISTRY[name] for name in sorted(_REGISTRY, key=_driver_order)}


def query_map() -> dict[str, QueryFn]:
    """The driver-contract ``queries()`` payload."""

    def _wrap(spec: QuerySpec) -> QueryFn:
        # Late-bind session conventions (UTC, Arrow, AQE) even on sessions
        # we did not construct.
        from video_stream_processing_spark.session import ensure_session_conf

        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_conf(spark)
            return spec.fn(spark, sf_dir)

        run.__name__ = spec.name
        run.__doc__ = spec.doc
        return run

    return {name: _wrap(spec) for name, spec in all_queries().items()}


def oracle_map() -> dict[str, str]:
    """The driver-contract ``oracle_sql()`` payload (SQL-expressible only)."""
    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None}

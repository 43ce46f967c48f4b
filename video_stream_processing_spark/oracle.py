"""Differential-test harness: run a declared Spark query and its DuckDB
oracle side-by-side on the same parquet tables and compare
(row count + column names + order-insensitive values) — a local mirror of
the driver's CORRECTNESS gate so mismatches surface before a round ends.

The reference repo has no tests at all (SURVEY.md §5.1); this harness IS
the engine's primary correctness instrument.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd

from video_stream_processing_spark.tables import TABLES, table_path

# Comparison tolerances for float columns. Declared queries are designed
# to be bit-exact (decimal sums, identical op order), so this is a
# safety net, not a crutch.
REL_TOL = 1e-9
ABS_TOL = 1e-9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register every test table as a view, like the driver does."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int = 0
    oracle_rows: int = 0
    issues: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for i in self.issues:
            msg += f"\n        - {i}"
        return msg


def _canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values to comparable forms."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            # normalize to naive UTC, render to microseconds as string
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: tuple(np.asarray(v).tolist()) if isinstance(v, (list, np.ndarray)) else v
            )
    return df


def _sort_rows(df: pd.DataFrame) -> pd.DataFrame:
    if len(df.columns) == 0 or len(df) == 0:
        return df
    # stable order-insensitive comparison: sort by stringified row
    key = df.astype(str).apply(lambda r: "\x1f".join(r.values), axis=1)
    return df.loc[key.sort_values(kind="mergesort").index].reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        return math.isclose(af, bf, rel_tol=REL_TOL, abs_tol=ABS_TOL)
    return str(a) == str(b)


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    res = CompareResult(name=name, ok=True, spark_rows=len(spark_pdf), oracle_rows=len(oracle_pdf))
    # tz-aware outputs are a parity hazard (the driver's hash may keep the
    # offset suffix): fail so the query/oracle gets fixed at the source.
    for side, pdf in (("spark", spark_pdf), ("oracle", oracle_pdf)):
        for c in pdf.columns:
            if getattr(pdf[c].dtype, "tz", None) is not None:
                res.ok = False
                res.issues.append(f"{side} column {c!r} is tz-aware ({pdf[c].dtype}); emit naive timestamps")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        res.ok = False
        res.issues.append(f"column mismatch: spark={s_cols} oracle={o_cols}")
        return res
    if len(spark_pdf) != len(oracle_pdf):
        res.ok = False
        res.issues.append("row count mismatch")
        return res
    s = _sort_rows(_canonicalize(spark_pdf))
    o = _sort_rows(_canonicalize(oracle_pdf))
    for c in s.columns:
        sv, ov = s[c].values, o[c].values
        bad = [
            i
            for i in range(len(sv))
            if not _values_equal(sv[i], ov[i])
        ]
        if bad:
            i = bad[0]
            res.ok = False
            res.issues.append(
                f"column {c!r}: {len(bad)} differing cells; first at sorted-row {i}: "
                f"spark={sv[i]!r} oracle={ov[i]!r}"
            )
    return res


def run_query_pair(spark, con, spec, sf_dir: str) -> CompareResult:
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        ok = True
        return CompareResult(
            name=spec.name, ok=ok, spark_rows=len(spark_pdf), oracle_rows=-1,
            issues=["rows-only (no oracle)"] if ok else [],
        )
    oracle_pdf = con.execute(spec.oracle).fetchdf()
    return compare_frames(spec.name, spark_pdf, oracle_pdf)


def run_all(spark, sf_dir: str, names: list[str] | None = None) -> list[CompareResult]:
    from video_stream_processing_spark.plans.registry import all_queries
    from video_stream_processing_spark.session import ensure_session_conf

    ensure_session_conf(spark)
    con = duckdb_connection(sf_dir)
    results = []

    from video_stream_processing_spark.session import (
        release_since,
        snapshot_persistent_ids,
    )

    for name, spec in all_queries().items():
        if names and name not in names:
            continue
        baseline = snapshot_persistent_ids(spark)
        try:
            results.append(run_query_pair(spark, con, spec, sf_dir))
        except Exception as e:  # surface, keep going
            results.append(
                CompareResult(name=name, ok=False, issues=[f"exception: {type(e).__name__}: {e}"])
            )
        # release the finished query's localCheckpoint blocks (rationale
        # and reuse caveat live in session.release_since)
        release_since(spark, baseline)
    return results

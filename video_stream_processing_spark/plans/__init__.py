"""Declared-query registry: every operator from SURVEY.md §2 becomes a
named query with (optionally) a DuckDB oracle for differential testing."""

from .registry import QuerySpec, all_queries, oracle_map, query_map, register  # noqa: F401

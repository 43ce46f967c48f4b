"""Dataflow operators, each a pure DataFrame -> DataFrame function.

Mirrors the reference's operator inventory (SURVEY.md §2) re-expressed
Spark-first: built-in expressions wherever semantics allow, pandas UDFs
only for genuinely imperative kernels (inference, NMS, stateful windows).
"""

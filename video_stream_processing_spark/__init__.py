"""PySpark-native analytics engine with the query and data-processing
capabilities of xiangge1208/video-stream-processing (a Flink video-stream
ETL job), rebuilt Spark-first.

Layers (see SURVEY.md):
  - Layer A: dataflow-operator analogs of the reference pipeline
    (keyframe gate, explode/flatten to the Doris-style fact table,
    segment windows, sink partition keys) — reference wiring at
    /root/reference/src/main/java/com/video/streaming/VideoStreamProcessingJob.java:60-102.
  - Layer B: the relational/analytic query surface the reference's Doris
    fact table implies (joins, aggregates, window functions, set ops,
    scalar functions) — README.md:81-105 of the reference.
  - Extensions: large-scale training-data pipeline operators (dedup,
    similarity search, text analysis, multimodal columns).

Everything is expressed with the DataFrame API so Catalyst owns the
physical plan; Python appears only in Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .tables import TABLES, load_tables  # noqa: F401

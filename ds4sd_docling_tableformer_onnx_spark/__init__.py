"""PySpark-native table-structure extraction engine.

A from-scratch, Spark-first reimplementation of the behavior of the
``mapo80/ds4sd-docling-tableformer-onnx`` reference stack (Docling
TableFormer table-structure decoding: OTSL/HTML grids, cell matching,
matching post-processing, Docling response assembly), applied per turn to
multi-turn conversation transcripts stored in parquet/Iceberg tables.

Layout
------
- ``core``       pure-Python per-turn extraction algebra (runs inside
                 Arrow-batched pandas UDFs; zero Spark imports)
- ``operators``  Spark DataFrame operators (extraction, dedup, similarity,
                 text analysis, multimodal plumbing)
- ``sources``    transcript synthesis + readers/writers
- ``functions``  column-level helpers built on pyspark.sql.functions
- ``plans``      checkpoint / lineage / idempotent-resume utilities
- ``streaming``  Structured Streaming wrapper of the extraction operator
"""

__version__ = "0.1.0"

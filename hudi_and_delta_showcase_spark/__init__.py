"""PySpark-native analytics engine with the capabilities of the
``Dalas5/hudi-and-delta-showcase`` reference (CDC ingestion, keyed upsert,
Copy-on-Write / Merge-on-Read lakehouse tables, SQL MERGE semantics,
maintenance ops), extended with large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Everything here is built Spark-first: declarative DataFrame/SQL plans that
Catalyst + Tungsten optimize (predicate pushdown, column pruning, broadcast
joins, AQE), with Pandas UDFs only where built-ins cannot express the
semantics. See SURVEY.md for the reference-capability blueprint.
"""

from hudi_and_delta_showcase_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

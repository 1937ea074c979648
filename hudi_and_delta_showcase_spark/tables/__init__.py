"""Lakehouse table formats: manifest-based snapshot versioning (C7),
Copy-on-Write (C2/C8) and Merge-on-Read (C3/S5/S9) tables, maintenance
(D7 VACUUM / D8 OPTIMIZE)."""

from hudi_and_delta_showcase_spark.tables.lakehouse import LakehouseTable

__all__ = ["LakehouseTable"]

"""Persistent catalog sync (SURVEY.md §2.8 D6): the reference registers
its lakehouse tables in a Hive metastore so any later session can query
them by name (hive-sync, /root/reference/README.md:283-294).

Spark-first equivalent: a Hive-catalog session over an embedded Derby
metastore + ``saveAsTable``. Table METADATA persists in the metastore db
and DATA in the warehouse dir, so a brand-new session (new JVM) against
the same two paths sees and queries the table — proven by
tests/test_catalog_persistence.py across real process restarts.

At scale the embedded Derby db is swapped for a shared metastore service
(thrift URI / Glue); the ``saveAsTable``/``spark.table`` surface is
identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def get_persistent_spark(
    root: str, master: str = "local[4]", app: str = "hudi-showcase-catalog"
) -> SparkSession:
    """A SparkSession whose catalog SURVIVES process restarts: Hive
    catalog implementation, metastore db and warehouse both under
    ``root``. Two invocations with the same ``root`` (from different
    processes) share one catalog."""
    os.makedirs(root, exist_ok=True)
    return (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.warehouse.dir", os.path.join(root, "warehouse"))
        .config(
            "spark.driver.extraJavaOptions",
            f"-Dderby.system.home={os.path.join(root, 'metastore')}",
        )
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .enableHiveSupport()
        .getOrCreate()
    )


def sync_table(
    spark: SparkSession, name: str, df: DataFrame, mode: str = "overwrite"
) -> None:
    """Hive-sync: publish a DataFrame as a managed catalog table
    (CREATE-or-replace + data write in one step)."""
    df.write.mode(mode).saveAsTable(name)


def table_names(spark: SparkSession) -> list[str]:
    return sorted(t.name for t in spark.catalog.listTables())

"""D6 metastore sync: a table published via saveAsTable must survive a
REAL process restart — new JVM, same metastore/warehouse paths — exactly
like the reference's hive-synced tables (README.md:283-294). Runs each
phase in a subprocess so the suite's shared session is untouched."""

from __future__ import annotations

import subprocess
import sys
import tempfile
import textwrap

_PHASE1 = """
import sys
from hudi_and_delta_showcase_spark.catalog import get_persistent_spark, sync_table
from hudi_and_delta_showcase_spark.io import load_table

root = sys.argv[1]
spark = get_persistent_spark(root, master="local[2]")
nation = load_table(spark, "/root/testdata/sf0.001", "nation")
sync_table(spark, "nation_synced", nation)
print("PHASE1", spark.sql("SELECT COUNT(*) FROM nation_synced").collect()[0][0])
spark.stop()
"""

_PHASE2 = """
import sys
from hudi_and_delta_showcase_spark.catalog import get_persistent_spark, table_names

root = sys.argv[1]
spark = get_persistent_spark(root, master="local[2]")
assert "nation_synced" in table_names(spark), table_names(spark)
out = spark.sql(
    "SELECT n_regionkey, COUNT(*) AS n FROM nation_synced "
    "GROUP BY n_regionkey ORDER BY n_regionkey"
).collect()
print("PHASE2", [(r.n_regionkey, r.n) for r in out])
spark.stop()
"""


def _run(code: str, root: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code), root],
        capture_output=True, text=True, timeout=240, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_saveAsTable_survives_process_restart():
    root = tempfile.mkdtemp(prefix="persist_catalog_")
    out1 = _run(_PHASE1, root)
    assert "PHASE1 25" in out1
    out2 = _run(_PHASE2, root)
    # 25 nations over 5 regions, 5 each — read back by a NEW process
    assert "PHASE2 [(0, 5), (1, 5), (2, 5), (3, 5), (4, 5)]" in out2

"""Per-process stored-index namespace (VERDICT r9 #3).

Round 9's PARITY recorded a process-rule mitigation for a real race: a
measurement JVM and a pytest session share one warehouse directory, and
either one's ``_clear_superseded`` could delete table FILES the other
had registered and was reading (the session catalog is per-process, so
the sibling's registration is invisible and its leftovers read as
untrustworthy).  The code guarantee replacing that rule: the whole
stored-index database is keyed on the pid, so a process only ever
creates/drops/clears inside its own namespace, and namespaces orphaned
by DEAD pids are swept at first use.  These tests prove the guarantee
by actually running a second Spark process against the same warehouse.
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the sibling process builds the SAME dataset's stored IVF index — the
# exact operation whose _clear_superseded deleted the parent's files
# under the old shared namespace
_SIBLING_SCRIPT = textwrap.dedent("""
    import json, os, sys
    sys.path.insert(0, {repo!r})
    os.environ["PYTHONPATH"] = {repo!r} + os.pathsep + \\
        os.environ.get("PYTHONPATH", "")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[2]")
             .config("spark.sql.shuffle.partitions", "2")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.warehouse.dir", {wh!r})
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from waimak_spark.catalog.similarity import (
        _IVF_IDX_DB, _ivf_index_table)
    name = _ivf_index_table(spark, {sf!r})
    n = spark.table(name).count()
    print(json.dumps({{"db": _IVF_IDX_DB, "table": name, "rows": n,
                       "pid": os.getpid()}}))
    spark.stop()
""")


def _run_sibling(wh: str, sf_dir: str) -> dict:
    script = _SIBLING_SCRIPT.format(repo=REPO, wh=wh, sf=sf_dir)
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


class TestPerProcessIndexNamespace:
    def test_sibling_process_build_cannot_delete_this_sessions_index(
            self, spark, sf_dir):
        """The round-9 failure shape, now run deliberately: this session
        builds and registers its stored IVF index, a SECOND Spark
        process pointed at the SAME warehouse dir builds the same
        dataset's index (running its own stale-cleanup passes), and the
        first session's table must still be fully readable afterwards —
        under the shared-namespace layout the sibling's
        _clear_superseded deleted these files."""
        from waimak_spark.catalog.similarity import (
            _IVF_IDX_DB,
            _ivf_index_table,
        )

        name = _ivf_index_table(spark, sf_dir)
        before = spark.table(name).count()
        assert before > 0
        wh = spark.conf.get("spark.sql.warehouse.dir")
        sib = _run_sibling(wh, sf_dir)
        # the sibling worked in its OWN namespace, on the same data
        assert sib["db"] != _IVF_IDX_DB
        assert sib["rows"] == before
        # and this session's registered table survived, files intact
        assert spark.catalog.tableExists(name)
        assert spark.table(name).count() == before

    def test_orphaned_namespace_swept_once_pid_is_dead(self, spark,
                                                       sf_dir):
        """The sibling's namespace becomes garbage the moment its pid
        dies (its registrations lived in its in-memory catalog): the
        next stored-index use in any process must sweep it, and must
        NOT touch this live session's namespace."""
        import waimak_spark.catalog.similarity as CS
        from waimak_spark.filesystem import FileOps

        name = CS._ivf_index_table(spark, sf_dir)
        wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
        sib = _run_sibling(wh, sf_dir)
        fops = FileOps(spark)
        sib_dir = f"{wh}/{sib['db']}.db"
        assert fops.glob(sib_dir), "sibling left no namespace dir"
        assert not CS._pid_alive(sib["pid"])
        # the sweep runs once per process — re-arm it to simulate the
        # next process's first stored-index use
        CS._ORPHANS_SWEPT = False
        try:
            CS._sweep_orphan_idx_namespaces(spark)
        finally:
            CS._ORPHANS_SWEPT = True
        assert not fops.glob(sib_dir), "dead pid's namespace not swept"
        assert spark.catalog.tableExists(name)
        assert spark.table(name).count() > 0

    def test_live_pid_namespace_never_swept(self, spark):
        """A directory named for a LIVE pid must survive the sweep —
        liveness, not age, is the criterion."""
        import waimak_spark.catalog.similarity as CS
        from waimak_spark.filesystem import FileOps

        wh = spark.conf.get("spark.sql.warehouse.dir").rstrip("/")
        # os-level dir creation needs the local path, not the URI form
        wh_local = wh[len("file:"):] if wh.startswith("file:") else wh
        live_dir = f"{wh}/{CS._IVF_IDX_DB_BASE}_p{os.getpid()}.db"
        fake_live = f"{wh}/{CS._IVF_IDX_DB_BASE}_p1.db"  # pid 1: init
        os.makedirs(f"{wh_local}/{CS._IVF_IDX_DB_BASE}_p1.db",
                    exist_ok=True)
        os.makedirs(f"{wh_local}/{CS._IVF_IDX_DB_BASE}_p{os.getpid()}.db",
                    exist_ok=True)
        fops = FileOps(spark)
        CS._ORPHANS_SWEPT = False
        try:
            CS._sweep_orphan_idx_namespaces(spark)
        finally:
            CS._ORPHANS_SWEPT = True
        try:
            assert fops.glob(fake_live), "live pid 1 namespace was swept"
            assert fops.glob(live_dir), "own namespace was swept"
        finally:
            os.rmdir(f"{wh_local}/{CS._IVF_IDX_DB_BASE}_p1.db")

    def test_own_namespace_is_pid_keyed(self):
        from waimak_spark.catalog.similarity import (
            _IVF_IDX_DB,
            _IVF_IDX_DB_BASE,
        )

        assert _IVF_IDX_DB == f"{_IVF_IDX_DB_BASE}_p{os.getpid()}"

"""Iceberg-shaped concurrency integration (r5 verdict stretch task 8):
two real OS processes — a streaming-style appender and a batch
compactor — share one ParquetTableIO warehouse and interleave
append + anchored rewrite under the advisory manifest lock, with
file-barriers forcing the orderings the optimistic-concurrency path
must survive:

  * the compactor anchors at snapshot X, then commits only AFTER
    more appends landed — those post-anchor rows must survive the
    rewrite (emptying them would be silent data loss);
  * commit keys stay exactly-once across both writers;
  * the manifest is valid JSON at every step and the final data dirs
    on disk are exactly the manifest's live files (no orphans).

This is the contention surface the real Iceberg jar would exercise;
the environment has no jar/network, so the fallback implementation
carries the guarantees and this test pins them cross-process.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys, time
root, role, bdir = sys.argv[1:4]
sys.path.insert(0, "@REPO@")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .appName("tio-" + role).getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from gorillaspark.sources.tableio import ParquetTableIO
io = ParquetTableIO(spark, root)


def wait_for(name, timeout=180):
    p = os.path.join(bdir, name)
    t0 = time.time()
    while not os.path.exists(p):
        time.sleep(0.05)
        if time.time() - t0 > timeout:
            raise SystemExit("barrier timeout: " + name)


def signal(name):
    open(os.path.join(bdir, name), "w").close()


def batch(tag, n=10):
    return spark.range(n).selectExpr("id", f"'{tag}' AS tag")


if role == "appender":
    for i in range(6):
        snap = io.append("t", batch(f"a{i}"), commit_key=f"a{i}")
        assert snap is not None, i
        # replayed append with the same key must no-op cross-process
        assert io.append("t", batch(f"a{i}"), commit_key=f"a{i}") is None
        signal(f"a{i}")
        if i == 2:
            wait_for("compact1_done")   # force appends on BOTH sides
    signal("appender_done")
else:
    wait_for("a1")
    anchor = io.current_snapshot_id("t")
    base = io.read("t", anchor)
    wait_for("a2")                      # an append lands AFTER anchor
    snap = io.rewrite("t", base, commit_key="compact1",
                      expected_snapshot_id=anchor)
    assert snap is not None
    signal("compact1_done")
    wait_for("appender_done")
    anchor2 = io.current_snapshot_id("t")
    base2 = io.read("t", anchor2)
    snap2 = io.rewrite("t", base2, commit_key="compact2",
                       expected_snapshot_id=anchor2)
    assert snap2 is not None
    signal("compactor_done")
spark.stop()
"""


def test_concurrent_appender_and_compactor(spark, tmp_path):
    root = str(tmp_path / "wh")
    bdir = str(tmp_path / "barriers")
    os.makedirs(bdir)
    script = _WORKER.replace("@REPO@", REPO)
    procs = [
        subprocess.Popen([sys.executable, "-c", script, root, role,
                          bdir], cwd=REPO)
        for role in ("appender", "compactor")]
    deadline = time.time() + 600
    for p in procs:
        p.wait(timeout=max(1, deadline - time.time()))
    assert all(p.returncode == 0 for p in procs), \
        [p.returncode for p in procs]

    from gorillaspark.sources.tableio import ParquetTableIO
    io = ParquetTableIO(spark, root)
    # every append survived both compactions, exactly once
    rows = io.read("t").groupBy("tag").count().collect()
    assert {r["tag"]: r["count"] for r in rows} == {
        f"a{i}": 10 for i in range(6)}
    keys = io.committed_keys("t")
    assert {f"a{i}" for i in range(6)} <= keys
    assert {"compact1", "compact2"} <= keys
    # manifest is valid JSON and disk holds exactly the live files
    manifest = json.loads(open(io._manifest_path("t")).read())
    live = {os.path.basename(f) for s in manifest for f in s["files"]}
    on_disk = set(os.listdir(os.path.join(root, "t", "data")))
    assert live == on_disk, (live, on_disk)
    # time travel at the final snapshot equals the live read
    last = io.current_snapshot_id("t")
    assert io.read("t", last).count() == 60


def test_stale_manifest_lock_is_broken(spark, tmp_path):
    """A writer that died holding the lockfile must not wedge the
    table: locks older than 60 s are broken (rename-based, so exactly
    one waiter wins) and the commit proceeds."""
    from gorillaspark.sources.tableio import ParquetTableIO

    io = ParquetTableIO(spark, str(tmp_path / "wh"))
    lock = io._manifest_path("t") + ".lock"
    os.makedirs(os.path.dirname(lock), exist_ok=True)
    open(lock, "w").close()
    old = time.time() - 120
    os.utime(lock, (old, old))
    snap = io.append("t", spark.range(3).selectExpr("id", "'x' AS tag"),
                     commit_key="k")
    assert snap is not None
    assert io.committed_keys("t") == {"k"}
    assert not os.path.exists(lock)

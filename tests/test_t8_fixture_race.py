"""Two-PROCESS race on the t8 bench fixture's rename-publish.

`queries_warehouse._t8_fixture_root` builds a machine-persistent
fixture (two committed warehouse snapshots) at a deterministic
/tmp path and publishes it by atomic rename with uid-trust, a
markerless-husk aside step, and lost-race adoption. The logic is
subtle and was only exercised implicitly until now (VERDICT r10
task 5); this test races two REAL processes — each with its own
SparkSession — through the publish window simultaneously and proves
they converge on ONE trusted fixture with identical snapshot
fingerprints and no litter.

The race is made deterministic, not hoped-for: each worker wraps
``os.rename`` so the publish rename (dst basename starts with
``spark_graft_t8_`` and is not an ``.aside.`` move) first signals a
file barrier and waits until BOTH workers are poised at the rename.
One wins the atomic rename; the loser's rename fails ENOTEMPTY and
must adopt the winner's (deterministic, identical) fixture. A
markerless husk is pre-planted at the fixture root so the aside
path runs too.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import os, sys, time
sys.path.insert(0, sys.argv[1])
sync_dir, sf_dir = sys.argv[2], sys.argv[3]

real_rename = os.rename

def rename(src, dst, *a, **kw):
    base = os.path.basename(str(dst).rstrip("/"))
    if base.startswith("spark_graft_t8_") and ".aside." not in base:
        open(os.path.join(sync_dir, "ready.%d" % os.getpid()), "w").close()
        deadline = time.time() + 120  # partner-died escape hatch
        while time.time() < deadline:
            n = len([f for f in os.listdir(sync_dir) if f.startswith("ready.")])
            if n >= 2:
                break
            time.sleep(0.01)
    return real_rename(src, dst, *a, **kw)

os.rename = rename

from lavasmart_bank_sync_etl_spark.session import get_spark
from lavasmart_bank_sync_etl_spark import queries_warehouse as QW
from lavasmart_bank_sync_etl_spark.sources.warehouse import Warehouse

spark = get_spark("t8-race-%d" % os.getpid(), shuffle_partitions=4)
root = QW._t8_fixture_root(spark, sf_dir)
wh = Warehouse(spark, root)
versions = wh.history("transfers")
prior = wh.read_version("transfers", versions[-2])
cur = wh.read("transfers")
import pyspark.sql.functions as F

def fp(df):
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("monto") * 100).cast("long")).alias("cents"),
    ).collect()[0]
    return "%d:%d" % (row["n"], row["cents"])

print("RESULT|%s|%s|%s" % (root, fp(prior), fp(cur)), flush=True)
spark.stop()
"""


def test_t8_fixture_publish_race_two_processes(tmp_path):
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    fixdir = tmp_path / "fixtmp"
    sync_dir = tmp_path / "sync"
    fixdir.mkdir()
    sync_dir.mkdir()

    # compute the root the module will derive (same tag recipe:
    # sf dir + orders.parquet size/mtime fingerprint + version) and
    # pre-plant a markerless husk there to force the aside path
    from lavasmart_bank_sync_etl_spark.queries_warehouse import _T8_FIXTURE_VERSION

    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    ident = f"{sf_dir.rstrip('/')}|{st.st_size}|{st.st_mtime_ns}"
    tag = hashlib.md5(ident.encode()).hexdigest()[:10]
    root = fixdir / f"spark_graft_t8_{tag}_v{_T8_FIXTURE_VERSION}"
    root.mkdir()
    (root / "junk_from_crashed_build").write_text("not a fixture")

    env = dict(os.environ)
    env["TMPDIR"] = str(fixdir)  # fresh interpreters re-derive gettempdir()
    env["SPARK_GRAFT_CPUS"] = "4"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, REPO, str(sync_dir), sf_dir],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for _ in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT|")]
        assert lines, out
        outs.append(lines[-1])

    # both processes converged on the SAME root with IDENTICAL
    # snapshot fingerprints (winner and adopter are indistinguishable)
    assert outs[0] == outs[1]
    got_root = outs[0].split("|")[1]
    assert got_root == str(root)

    # the published fixture is trusted: marker present, owned by us,
    # and the pre-planted junk is gone (the husk was moved aside and
    # discarded, not merged into the published fixture)
    assert os.path.exists(os.path.join(got_root, "_FIXTURE_COMPLETE"))
    assert os.stat(got_root).st_uid == os.getuid()
    assert not os.path.exists(os.path.join(got_root, "junk_from_crashed_build"))

    # no litter: exactly one fixture dir, no build husks, no aside dirs
    leftovers = sorted(os.listdir(fixdir))
    fixtures = [n for n in leftovers if n.startswith("spark_graft_t8_")]
    assert fixtures == [os.path.basename(got_root)], leftovers

    # both workers genuinely reached the publish window (the barrier
    # fired twice) — the race happened, it wasn't a serial fallback
    ready = [n for n in os.listdir(sync_dir) if n.startswith("ready.")]
    assert len(ready) == 2, ready

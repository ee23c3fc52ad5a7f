"""CheckpointManager: atomic snapshots, stage resume, CC iteration resume."""

import os

from jmdfane_spark.operators.connected_components import connected_components
from jmdfane_spark.plans.checkpoint import CheckpointManager


def test_stage_compute_or_resume(spark, tmp_path):
    ck = CheckpointManager(spark, str(tmp_path / "ck"))
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")

    a = ck.stage("s1", build)
    b = ck.stage("s1", build)  # must hit the snapshot, not recompute
    assert calls["n"] == 1
    assert sorted(r.id for r in a.collect()) == sorted(r.id for r in b.collect())
    assert ck.exists("s1")


def test_incomplete_snapshot_is_recomputed(spark, tmp_path):
    root = str(tmp_path / "ck")
    ck = CheckpointManager(spark, root)
    ck.stage("s1", lambda: spark.createDataFrame([(1,)], "id long"))
    # simulate a crash mid-write: remove the commit marker
    os.remove(os.path.join(root, "s1", "_COMMITTED"))
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.createDataFrame([(2,)], "id long")

    out = ck.stage("s1", build)
    assert calls["n"] == 1
    assert [r.id for r in out.collect()] == [2]


def test_cc_resumes_from_iteration(spark, tmp_path):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"), ("x", "y")]
    vdf = spark.createDataFrame([(v,) for v in "abcdefxy"], "id string")
    edf = spark.createDataFrame(edges, "id_a string, id_b string")

    ck1 = CheckpointManager(spark, str(tmp_path / "cc"))
    full = connected_components(vdf, edf, checkpointer=ck1)
    want = {r.id: r.component for r in full.labels.collect()}
    assert full.iterations >= 2

    # restart: a fresh manager over the same dir resumes past iterations
    ck2 = CheckpointManager(spark, str(tmp_path / "cc"))
    resumed = connected_components(vdf, edf, checkpointer=ck2)
    got = {r.id: r.component for r in resumed.labels.collect()}
    assert got == want
    # resume re-ran at most the convergence-check iteration
    assert resumed.iterations <= full.iterations + 1
    assert resumed.metrics and resumed.metrics[-1]["labels_changed"] == 0

    ck1.log_metric(stage="test", x=1)
    ck1.flush_metrics()
    assert os.path.exists(os.path.join(str(tmp_path / "cc"), "metrics.jsonl"))

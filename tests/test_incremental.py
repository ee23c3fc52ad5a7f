"""Incremental ER: delta pairs + warm-start component merge ≡ full recompute."""

import pyspark.sql.functions as F

from jmdfane_spark.operators.connected_components import connected_components
from jmdfane_spark.operators.pairs import blocked_pairs
from jmdfane_spark.streaming.incremental import delta_pairs, merge_components


def _members(spark, rows):
    return spark.createDataFrame(rows, "block_key string, id string, toks array<string>")


OLD = [
    ("b1", "a", ["x", "y", "z"]),
    ("b1", "b", ["x", "y", "z"]),
    ("b1", "c", ["p", "q", "r"]),
    ("b2", "d", ["m", "n"]),
]
NEW = [
    ("b1", "e", ["p", "q", "r"]),   # joins c's cluster
    ("b2", "f", ["m", "n"]),        # joins d
    ("b1", "g", ["u", "v"]),        # singleton
    ("b1", "h", ["x", "y", "z"]),   # bridges into {a,b}
]


def _edges(pairs):
    from jmdfane_spark.functions.similarity import jaccard

    return (
        pairs.withColumn("j", jaccard(F.col("toks_a"), F.col("toks_b")))
        .where(F.col("j") >= 0.9)
        .select("id_a", "id_b")
    )


def test_incremental_equals_full(spark):
    old_m, new_m = _members(spark, OLD), _members(spark, NEW)
    full_m = _members(spark, OLD + NEW)

    # full recompute
    full_pairs = blocked_pairs(full_m)
    full_cc = connected_components(full_m.select("id"), _edges(full_pairs))
    want = {r.id: r.component for r in full_cc.labels.collect()}

    # incremental: old labels from old-only run, then fold the delta
    old_cc = connected_components(old_m.select("id"), _edges(blocked_pairs(old_m)))
    dp = delta_pairs(new_m, old_m)
    merged = merge_components(old_cc.labels, new_m.select("id"), _edges(dp))
    got = {r.id: r.component for r in merged.collect()}

    assert got == want


def test_delta_pairs_never_regenerates_old_pairs(spark):
    old_m, new_m = _members(spark, OLD), _members(spark, NEW)
    dp = delta_pairs(new_m, old_m)
    new_ids = {r[1] for r in NEW}
    for r in dp.select("id_a", "id_b").collect():
        assert r.id_a in new_ids or r.id_b in new_ids
    # completeness: every new×(new+old) within-block pair present
    got = {(r.id_a, r.id_b) for r in dp.collect()}
    all_rows = OLD + NEW
    want = set()
    for i in range(len(all_rows)):
        for j in range(len(all_rows)):
            (bk1, id1, _), (bk2, id2, _) = all_rows[i], all_rows[j]
            if bk1 == bk2 and id1 < id2 and (id1 in new_ids or id2 in new_ids):
                want.add((id1, id2))
    assert got == want

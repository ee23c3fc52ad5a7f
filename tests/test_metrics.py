"""NMI / ARI / Munkres-ACC vs independent pure-python reference math.

The engine computes these as DataFrame contingency closed forms
(operators/evaluate.py); the oracles here are straight-from-the-formula
numpy implementations (sklearn conventions, matching the reference's
src/utils/clustering_metric.py:16-66) plus brute-force permutation search
for the assignment problem.
"""

import itertools
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from jmdfane_spark.operators.evaluate import munkres_accuracy, nmi_ari, _hungarian_max


def _ref_nmi(truth, pred):
    n = len(truth)
    from collections import Counter

    cells = Counter(zip(pred, truth))
    ca, cb = Counter(pred), Counter(truth)
    if len(ca) == 1 and len(cb) == 1:
        return 1.0
    mi = sum(c / n * math.log(n * c / (ca[p] * cb[t])) for (p, t), c in cells.items())
    hp = -sum(c / n * math.log(c / n) for c in ca.values())
    ht = -sum(c / n * math.log(c / n) for c in cb.values())
    return mi / max(2.220446049250313e-16, (hp + ht) / 2)


def _ref_ari(truth, pred):
    from collections import Counter

    def comb2(x):
        return x * (x - 1) / 2

    n = len(truth)
    cells = Counter(zip(pred, truth))
    ca, cb = Counter(pred), Counter(truth)
    sum_cells = sum(comb2(c) for c in cells.values())
    sa = sum(comb2(c) for c in ca.values())
    sb = sum(comb2(c) for c in cb.values())
    total = comb2(n)
    expected = sa * sb / total if total else 0.0
    denom = (sa + sb) / 2 - expected
    return 1.0 if denom == 0 else (sum_cells - expected) / denom


LABELINGS = [
    # (truth, pred)
    ([0, 0, 1, 1, 2, 2], [0, 0, 1, 1, 2, 2]),          # perfect
    ([0, 0, 1, 1, 2, 2], [0, 1, 2, 3, 4, 5]),          # all singletons
    ([0, 0, 1, 1, 2, 2], [0, 0, 0, 0, 0, 0]),          # all merged
    ([0, 0, 0, 1, 1, 2], [0, 0, 1, 1, 2, 2]),          # partial
    ([0, 1, 0, 1, 0, 1], [1, 0, 1, 0, 1, 1]),          # near-inverted
    ([0] * 6, [0] * 6),                                  # both trivial
]


def _joined_df(spark):
    rows = []
    for bi, (truth, pred) in enumerate(LABELINGS):
        for i, (t, p) in enumerate(zip(truth, pred)):
            rows.append((f"b{bi}", f"id{bi}_{i}", f"p{p}", f"t{t}"))
    return spark.createDataFrame(rows, "block_key string, id string, pred string, truth string")


def test_nmi_ari_match_reference_formulas(spark):
    got = {r["block_key"]: r for r in nmi_ari(_joined_df(spark)).collect()}
    for bi, (truth, pred) in enumerate(LABELINGS):
        r = got[f"b{bi}"]
        assert r["nmi"] == pytest.approx(_ref_nmi(truth, pred), abs=1e-9), f"nmi block {bi}"
        assert r["ari"] == pytest.approx(_ref_ari(truth, pred), abs=1e-9), f"ari block {bi}"


def test_hungarian_matches_bruteforce():
    rng = np.random.default_rng(42)
    for trial in range(20):
        k = int(rng.integers(1, 6))
        m = rng.integers(0, 50, size=(k, k)).astype("float64")
        best = max(
            sum(m[i, perm[i]] for i in range(k)) for perm in itertools.permutations(range(k))
        )
        assert _hungarian_max(m) == pytest.approx(best)
    # rectangular (rows < cols)
    m = np.array([[5.0, 1.0, 9.0], [2.0, 7.0, 3.0]])
    assert _hungarian_max(m) == pytest.approx(16.0)


def test_munkres_accuracy(spark):
    got = {r["block_key"]: r["acc"] for r in munkres_accuracy(_joined_df(spark)).collect()}
    assert got["b0"] == pytest.approx(1.0)           # perfect
    assert got["b2"] == pytest.approx(2 / 6)         # all merged: best column has 2
    assert got["b5"] == pytest.approx(1.0)           # trivial
    # partial case: brute-force the contingency assignment
    truth, pred = LABELINGS[3]
    from collections import Counter

    cells = Counter(zip(pred, truth))
    ps, ts = sorted({p for p, _ in cells}), sorted({t for _, t in cells})
    k = max(len(ps), len(ts))
    m = np.zeros((k, k))
    for (p, t), c in cells.items():
        m[ps.index(p), ts.index(t)] = c
    best = max(sum(m[i, perm[i]] for i in range(k)) for perm in itertools.permutations(range(k)))
    assert got["b3"] == pytest.approx(best / len(truth))


def test_nmi_ari_against_planted_pipeline_labels(spark, fixture_dfs):
    """End-to-end: perfect pipeline labels score NMI=ARI=1 on every block."""
    files, labels, _ = fixture_dfs
    joined = labels.select(
        "block_key", "id", F.col("cluster_id").alias("pred"), F.col("cluster_id").alias("truth")
    )
    rows = nmi_ari(joined).collect()
    assert rows
    for r in rows:
        assert r["nmi"] == pytest.approx(1.0)
        assert r["ari"] == pytest.approx(1.0)


def test_triplet_auc_matches_bruteforce(spark):
    """Rank-based triplet AUC ≡ brute-force over all (anchor, pos, neg)
    triples — wins + half-ties (reference src/utils/utils.py:114-169 in
    expectation over sampled triples). Includes tied scores."""
    import random

    from jmdfane_spark.operators.evaluate import triplet_auc

    rng = random.Random(7)
    rows = []
    for a in range(6):
        for p in range(rng.randint(3, 9)):
            # quantized scores force ties
            rows.append((f"a{a}", round(rng.random() * 4) / 4.0, rng.random() < 0.5))
    df = spark.createDataFrame(rows, "id_a string, score double, is_match boolean")
    got = {r["anchor"]: r for r in triplet_auc(df).collect()}

    by_anchor: dict = {}
    for a, s, y in rows:
        by_anchor.setdefault(a, []).append((s, y))
    for a, sl in by_anchor.items():
        pos = [s for s, y in sl if y]
        neg = [s for s, y in sl if not y]
        if not pos or not neg:
            assert a not in got
            continue
        wins = sum(1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg)
        want = wins / (len(pos) * len(neg))
        assert got[a]["n_pos"] == len(pos) and got[a]["n_neg"] == len(neg)
        assert got[a]["auc"] == pytest.approx(want, abs=1e-12), a

"""GHAC per-block exact clustering (G7/G8) vs threshold-CC and numpy oracle."""

import numpy as np
import pytest

from jmdfane_spark.operators.clustering import (
    _cut_k,
    _modularity,
    _nn_chain_average,
    _threshold_cc_labels,
    ghac_cluster,
    ghac_labels,
    spectral_cluster,
    spectral_labels,
)
from jmdfane_spark.operators.connected_components import connected_components


def _sym(n, edges):
    m = np.zeros((n, n))
    for i, j, w in edges:
        m[i, j] = m[j, i] = w
    return m


def _partition(labels, ids=None):
    ids = ids or list(range(len(labels)))
    groups = {}
    for i, l in zip(ids, labels):
        groups.setdefault(l, set()).add(i)
    return frozenset(frozenset(g) for g in groups.values())


def test_nn_chain_matches_bruteforce_average_linkage():
    """NN-chain heights == naive O(n³) average-linkage on random matrices."""
    rng = np.random.default_rng(7)
    for _ in range(10):
        n = int(rng.integers(3, 12))
        d = rng.random((n, n))
        d = (d + d.T) / 2
        np.fill_diagonal(d, 0)
        merges = _nn_chain_average(d)
        # naive: repeatedly merge the closest pair under average linkage
        clusters = [[i] for i in range(n)]
        naive_heights = []
        dd = d.copy()
        act = list(range(n))
        size = [1] * n
        while len(act) > 1:
            best = (np.inf, None)
            for ai in range(len(act)):
                for bi in range(ai + 1, len(act)):
                    v = dd[act[ai], act[bi]]
                    if v < best[0]:
                        best = (v, (ai, bi))
            h, (ai, bi) = best
            a, b = act[ai], act[bi]
            naive_heights.append(h)
            for z in act:
                if z not in (a, b):
                    dd[a, z] = dd[z, a] = (size[a] * dd[a, z] + size[b] * dd[b, z]) / (
                        size[a] + size[b]
                    )
            size[a] += size[b]
            act.remove(b)
        assert np.allclose(sorted(h for h, _, _ in merges), sorted(naive_heights))


def test_ghac_reproduces_threshold_cc_on_clean_blocks():
    """Two clean cliques with faint cross-talk: GHAC == threshold-CC."""
    edges = [(0, 1, 0.9), (0, 2, 0.9), (1, 2, 0.9), (3, 4, 0.9), (0, 3, 0.05), (2, 4, 0.05)]
    sim = _sym(5, edges)
    assert _partition(ghac_labels(sim, 0.3)) == _partition(_threshold_cc_labels(sim, 0.3))
    assert _partition(ghac_labels(sim, 0.3)) == _partition([0, 0, 0, 1, 1])


def test_ghac_beats_threshold_cc_on_heterogeneous_block():
    """Adversarial density mix: a spurious above-threshold bridge joins two
    dense pairs, while a true member hangs below threshold. Threshold-CC
    errs on both; GHAC's k-scan recovers the true partition."""
    # true clusters: {0,1}, {2,3}, {4,5,6}
    edges = [
        (0, 1, 0.9), (2, 3, 0.9),
        (1, 2, 0.31),            # spurious bridge, just above threshold
        (4, 5, 0.9), (4, 6, 0.28), (5, 6, 0.28),  # 6 below threshold
    ]
    sim = _sym(7, edges)
    truth = _partition([0, 0, 1, 1, 2, 2, 2])
    cc = _partition(_threshold_cc_labels(sim, 0.3))
    ghac = _partition(ghac_labels(sim, 0.3))
    assert cc != truth           # CC merges the bridge AND splits node 6
    assert ghac == truth


def test_cut_and_modularity_basics():
    merges = [(-0.9, 0, 1), (-0.9, 2, 3), (0.0, 0, 2)]
    assert _partition(_cut_k(4, merges, 2)) == _partition([0, 0, 1, 1])
    w = _sym(4, [(0, 1, 1.0), (2, 3, 1.0)])
    assert _modularity(w, np.array([0, 0, 1, 1])) == pytest.approx(0.5)
    assert _modularity(w, np.array([0, 0, 0, 0])) == pytest.approx(0.0)


def test_spectral_labels_separate_cliques():
    """Spectral with true k recovers planted cliques (G7, reference
    true-k runs) even when weak cross-talk would fool threshold-CC."""
    edges = (
        [(i, j, 0.9) for i in range(3) for j in range(3) if i < j]
        + [(i, j, 0.9) for i in range(3, 6) for j in range(3, 6) if i < j]
        + [(0, 3, 0.35)]  # spurious above-threshold bridge
    )
    sim = _sym(6, edges)
    got = _partition(spectral_labels(sim, 2))
    assert got == _partition([0, 0, 0, 1, 1, 1])
    # deterministic across calls
    assert _partition(spectral_labels(sim, 2)) == got
    # three planted groups, k=3
    edges3 = edges + [(6, 7, 0.9)]
    sim3 = _sym(8, edges3)
    assert _partition(spectral_labels(sim3, 3)) == _partition([0, 0, 0, 1, 1, 1, 2, 2])


def test_spectral_cluster_dataframe_operator(spark):
    scored = spark.createDataFrame(
        [("blk", "a1", "a2", 0.9), ("blk", "b1", "b2", 0.9), ("blk", "a1", "b1", 0.2)],
        "block_key string, id_a string, id_b string, score double",
    )
    members = spark.createDataFrame(
        [("blk", v, 2) for v in ["a1", "a2", "b1", "b2"]],
        "block_key string, id string, true_k int",
    )
    rows = spectral_cluster(scored, members, k_col="true_k").collect()
    comp = {r["id"]: r["component"] for r in rows}
    assert comp["a1"] == comp["a2"] != comp["b1"]
    assert comp["b1"] == comp["b2"]
    # predicted-k path (no k_col): thresholded components give k=2 here too
    rows2 = spectral_cluster(scored, members.drop("true_k")).collect()
    comp2 = {r["id"]: r["component"] for r in rows2}
    assert comp2["a1"] == comp2["a2"] != comp2["b1"]


def test_ghac_cluster_dataframe_operator(spark):
    scored = spark.createDataFrame(
        [
            ("blk", "a1", "a2", 0.9), ("blk", "a3", "a4", 0.9), ("blk", "a2", "a3", 0.31),
            ("blk", "b1", "b2", 0.9), ("blk", "b1", "b3", 0.28), ("blk", "b2", "b3", 0.28),
            ("blk2", "x1", "x2", 0.95),
        ],
        "block_key string, id_a string, id_b string, score double",
    )
    members = spark.createDataFrame(
        [("blk", v) for v in ["a1", "a2", "a3", "a4", "b1", "b2", "b3"]]
        + [("blk2", "x1"), ("blk2", "x2"), ("blk2", "lonely")],
        "block_key string, id string",
    )
    rows = ghac_cluster(scored, members, threshold=0.3).collect()
    comp = {r["id"]: r["component"] for r in rows}
    assert comp["a1"] == comp["a2"] != comp["a3"]
    assert comp["a3"] == comp["a4"]
    assert comp["b1"] == comp["b2"] == comp["b3"]
    assert comp["x1"] == comp["x2"] != comp["lonely"]
    assert comp["lonely"] == "blk2#lonely"  # isolated vertex = singleton


def test_oversized_block_falls_back_to_cc(spark):
    """Above max_block_rows the solver switches to union-find — identical
    partition to the engine's distributed hash-min CC."""
    scored = spark.createDataFrame(
        [("big", f"v{i}", f"v{i+1}", 0.9) for i in range(0, 30, 2)]
        + [("big", "v0", "v2", 0.5)],
        "block_key string, id_a string, id_b string, score double",
    )
    members = spark.createDataFrame(
        [("big", f"v{i}") for i in range(31)], "block_key string, id string"
    )
    small = ghac_cluster(scored, members, threshold=0.3, max_block_rows=5)
    cc = connected_components(
        members.select("id"),
        scored.where("score > 0.3").select("id_a", "id_b"),
    )
    got = _partition(
        [r["component"] for r in small.orderBy("id").collect()],
        [r["id"] for r in small.orderBy("id").collect()],
    )
    want_rows = cc.labels.orderBy("id").collect()
    want = _partition([r["component"] for r in want_rows], [r["id"] for r in want_rows])
    assert got == want


def test_estimate_k_two_estimators(spark):
    """G10: per-block k estimation — k_cc = thresholded-component count,
    k_modularity = modularity-argmax of the GHAC dendrogram scan
    (reference FastNewman role, cluster_predict.py:41-129). Oracle = the
    same numpy kernels run locally per block."""
    from jmdfane_spark.operators.clustering import estimate_k, ghac_labels

    # clean3: three 0.9-cliques with sub-threshold cross-talk → k_cc=3
    clean3 = (
        [("clean3", f"c{g}_{i}", f"c{g}_{j}", 0.9) for g in range(3) for i in range(3) for j in range(3) if i < j]
        + [("clean3", "c0_0", "c1_0", 0.2), ("clean3", "c1_0", "c2_0", 0.2)]
    )
    # bridge: two cliques joined by a spurious above-threshold edge → the
    # thresholded graph is ONE component, so both estimators report 1
    bridge = (
        [("bridge", f"x{i}", f"x{j}", 0.9) for i in range(3) for j in range(3) if i < j]
        + [("bridge", f"y{i}", f"y{j}", 0.9) for i in range(3) for j in range(3) if i < j]
        + [("bridge", "x0", "y0", 0.4)]
    )
    scored = spark.createDataFrame(
        clean3 + bridge, "block_key string, id_a string, id_b string, score double"
    )
    ids = sorted({r[1] for r in clean3 + bridge} | {r[2] for r in clean3 + bridge})
    members = spark.createDataFrame(
        [("clean3", v) for v in ids if v.startswith("c")]
        + [("bridge", v) for v in ids if v[0] in "xy"],
        "block_key string, id string",
    )
    got = {r["block_key"]: r for r in estimate_k(scored, members, threshold=0.3).collect()}
    assert got["clean3"]["k_cc"] == 3 and got["clean3"]["n"] == 9
    assert got["bridge"]["k_cc"] == 1 and got["bridge"]["n"] == 6

    # numpy oracle for k_modularity: same sim matrix through ghac_labels
    for bk, rows_ in (("clean3", clean3), ("bridge", bridge)):
        vs = sorted({r[1] for r in rows_} | {r[2] for r in rows_})
        pos = {v: i for i, v in enumerate(vs)}
        sim = np.zeros((len(vs), len(vs)))
        for _, a, b, s in rows_:
            sim[pos[a], pos[b]] = sim[pos[b], pos[a]] = s
        want = len(np.unique(ghac_labels(sim, 0.3)))
        assert got[bk]["k_modularity"] == want, bk

    # oversized block falls back to k_modularity = k_cc
    small = estimate_k(scored, members, threshold=0.3, max_block_rows=4).collect()
    for r in small:
        assert r["k_modularity"] == r["k_cc"]


def test_oversized_block_never_allocates_dense(monkeypatch):
    """The max_block_rows guard runs BEFORE any dense allocation: an
    oversized block must be solved by union-find over the edge rows with
    the dense-matrix builder completely unreachable (a 100k-row block
    would otherwise allocate ~80 GB just to reach the fallback)."""
    import pandas as pd

    from jmdfane_spark.operators import clustering as C

    def boom(*a, **k):
        raise AssertionError("dense sim matrix built on the fallback path")

    monkeypatch.setattr(C, "_dense_sim", boom)

    n = 12
    rows = {
        "_bk": ["big"] * (n + n - 1),
        "_a": [f"v{i:02d}" for i in range(n)] + [f"v{i:02d}" for i in range(n - 1)],
        "_b": [f"v{i:02d}" for i in range(n)] + [f"v{i+1:02d}" for i in range(n - 1)],
        "_s": [0.0] * n + [0.9 if i % 2 == 0 else 0.1 for i in range(n - 1)],
    }
    pdf = pd.DataFrame(rows)

    out = C._solve_ghac_block(pdf, threshold=0.3, max_block_rows=5)
    # chain with every other edge above threshold: v0-v1, v2-v3, ... pairs
    comp = dict(zip(out["id"], out["component"]))
    assert comp["v00"] == comp["v01"] and comp["v02"] == comp["v03"]
    assert comp["v01"] != comp["v02"]

    pdf_k = pdf.copy()
    outk = C._solve_estimate_k_block(pdf_k, threshold=0.3, max_block_rows=5)
    assert outk["k_cc"].iloc[0] == 6 and outk["k_modularity"].iloc[0] == 6

    pdf_s = pdf.copy()
    pdf_s["_k"] = None
    outs = C._solve_spectral_block(pdf_s, threshold=0.3, max_block_rows=5)
    comp_s = dict(zip(outs["id"], outs["component"]))
    assert comp_s["v00"] == comp_s["v01"] and comp_s["v01"] != comp_s["v02"]

    # below the guard the dense path IS taken (and our stub fires)
    try:
        C._solve_ghac_block(pdf, threshold=0.3, max_block_rows=100)
    except AssertionError as e:
        assert "dense sim" in str(e)
    else:
        raise AssertionError("dense path not taken for a small block")


def test_fastnewman_greedy_modularity():
    """CNM trace oracle (reference FastNewman, cluster_predict.py:41-129):
    two triangles joined by one bridge edge — greedy ΔQ merges collapse
    each triangle, and the modularity argmax lands at 2 communities."""
    from jmdfane_spark.operators.clustering import fastnewman_labels

    n = 6
    adj = np.zeros((n, n))
    for a, b in [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]:
        adj[a, b] = adj[b, a] = 1.0
    labels = fastnewman_labels(adj)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4] == labels[5]
    assert labels[0] != labels[3]

    # disconnected: no bridge — still two communities at the argmax
    adj2 = adj.copy()
    adj2[2, 3] = adj2[3, 2] = 0.0
    labels2 = fastnewman_labels(adj2)
    assert len(np.unique(labels2)) == 2

    # degenerate inputs
    assert fastnewman_labels(np.zeros((1, 1))).tolist() == [0]
    assert fastnewman_labels(np.zeros((3, 3))).tolist() == [0, 1, 2]


def test_estimate_k_fastnewman_column(spark):
    """k_fastnewman from estimate_k matches the numpy kernel run on the
    same thresholded binary adjacency per block."""
    from jmdfane_spark.operators.clustering import estimate_k, fastnewman_labels

    clean3 = (
        [("clean3", f"c{g}_{i}", f"c{g}_{j}", 0.9) for g in range(3) for i in range(3) for j in range(3) if i < j]
        + [("clean3", "c0_0", "c1_0", 0.2), ("clean3", "c1_0", "c2_0", 0.2)]
    )
    bridge = (
        [("bridge", f"x{i}", f"x{j}", 0.9) for i in range(3) for j in range(3) if i < j]
        + [("bridge", f"y{i}", f"y{j}", 0.9) for i in range(3) for j in range(3) if i < j]
        + [("bridge", "x0", "y0", 0.4)]
    )
    scored = spark.createDataFrame(
        clean3 + bridge, "block_key string, id_a string, id_b string, score double"
    )
    ids = sorted({r[1] for r in clean3 + bridge} | {r[2] for r in clean3 + bridge})
    members = spark.createDataFrame(
        [("clean3", v) for v in ids if v.startswith("c")]
        + [("bridge", v) for v in ids if v[0] in "xy"],
        "block_key string, id string",
    )
    got = {r["block_key"]: r for r in estimate_k(scored, members, threshold=0.3).collect()}
    for bk, rows_ in (("clean3", clean3), ("bridge", bridge)):
        vs = sorted({r[1] for r in rows_} | {r[2] for r in rows_})
        pos = {v: i for i, v in enumerate(vs)}
        sim = np.zeros((len(vs), len(vs)))
        for _, a, b, s in rows_:
            sim[pos[a], pos[b]] = sim[pos[b], pos[a]] = s
        thr = sim.copy()
        thr[thr <= 0.3] = 0.0
        want = len(np.unique(fastnewman_labels((thr > 0).astype("float64"))))
        assert got[bk]["k_fastnewman"] == want, bk
    assert got["clean3"]["k_fastnewman"] == 3
    assert got["bridge"]["k_fastnewman"] == 2
    # oversized fallback: all three estimators collapse to k_cc
    for r in estimate_k(scored, members, threshold=0.3, max_block_rows=4).collect():
        assert r["k_fastnewman"] == r["k_cc"] == r["k_modularity"]


def test_hdbscan_k_kernel():
    """Trace the density estimator against hand-computable blocks
    (reference hdbscan_pred role, cluster_predict.py:132-160: HDBSCAN
    min_cluster_size=3 then len(set(labels)) — noise counts as one)."""
    from jmdfane_spark.operators.clustering import hdbscan_k

    def block(sizes, win=0.9, across=0.05):
        n = sum(sizes)
        sim = np.full((n, n), across)
        i0 = 0
        for s in sizes:
            sim[i0:i0 + s, i0:i0 + s] = win
            i0 += s
        np.fill_diagonal(sim, 1.0)
        return sim

    # two dense 4-clusters, no stragglers: 2 selected, no noise
    assert hdbscan_k(block([4, 4])) == 2
    # same + 2 stragglers weakly similar to everything: the stragglers
    # shed from the root before the dense split -> noise group counts 1
    assert hdbscan_k(block([4, 4, 1, 1])) == 3
    assert hdbscan_k(block([5, 5, 5])) == 3
    # uniform similarity: the condensed root never splits -> all noise
    assert hdbscan_k(block([10], win=0.5)) == 1
    # degenerate inputs (n < min_cluster_size: every point noise)
    assert hdbscan_k(block([2])) == 1
    assert hdbscan_k(np.ones((1, 1))) == 1
    assert hdbscan_k(np.zeros((0, 0))) == 0

    # hand-traced mutual-reachability asymmetric case: one tight triangle
    # (0.95) + one looser triangle (0.7), cross-sim 0.1. Core distances:
    # tight=0.05, loose=0.3; the MST bridges at mreach 0.9 -> split into
    # exactly two condensed clusters of 3, both selected, no noise.
    sim = np.full((6, 6), 0.1)
    sim[:3, :3] = 0.95
    sim[3:, 3:] = 0.7
    np.fill_diagonal(sim, 1.0)
    assert hdbscan_k(sim) == 2


def test_estimate_k_hdbscan_column(spark):
    """k_hdbscan from estimate_k matches the numpy kernel per block and
    collapses to k_cc on oversized blocks."""
    from jmdfane_spark.operators.clustering import estimate_k, hdbscan_k

    rows = (
        [("two", f"a{i}", f"a{j}", 0.9) for i in range(4) for j in range(4) if i < j]
        + [("two", f"b{i}", f"b{j}", 0.9) for i in range(4) for j in range(4) if i < j]
        + [("two", "a0", "b0", 0.05)]
    )
    scored = spark.createDataFrame(rows, "block_key string, id_a string, id_b string, score double")
    ids = sorted({r[1] for r in rows} | {r[2] for r in rows})
    members = spark.createDataFrame([("two", v) for v in ids], "block_key string, id string")
    got = {r["block_key"]: r for r in estimate_k(scored, members, threshold=0.3).collect()}

    pos = {v: i for i, v in enumerate(ids)}
    sim = np.zeros((len(ids), len(ids)))
    for _, a, b, s in rows:
        sim[pos[a], pos[b]] = sim[pos[b], pos[a]] = s
    assert got["two"]["k_hdbscan"] == hdbscan_k(sim) == 2

    for r in estimate_k(scored, members, threshold=0.3, max_block_rows=4).collect():
        assert r["k_hdbscan"] == r["k_cc"]


def test_gn_labels_kernel():
    """Girvan–Newman trace (reference GN class, cluster_predict.py:174-255):
    max-betweenness edge removal, modularity argmax on the original graph."""
    from jmdfane_spark.operators.clustering import gn_labels

    # two triangles joined by one bridge: the bridge carries all cross
    # shortest paths -> removed first -> 2 communities at the Q argmax
    adj = np.zeros((6, 6))
    for i, j in [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]:
        adj[i, j] = adj[j, i] = 1
    assert len(np.unique(gn_labels(adj))) == 2

    # no positive-Q split exists: stays ONE community (reference initial
    # partition [all nodes] with max_Q = 0.0 and strict >)
    tri = np.zeros((3, 3))
    for i, j in [(0, 1), (1, 2), (0, 2)]:
        tri[i, j] = tri[j, i] = 1
    assert len(np.unique(gn_labels(tri))) == 1

    # already-disconnected components found without any bridge
    two = np.zeros((6, 6))
    for i, j in [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]:
        two[i, j] = two[j, i] = 1
    assert len(np.unique(gn_labels(two))) == 2

    # degenerate: edgeless graph = all singletons; single vertex
    assert len(np.unique(gn_labels(np.zeros((4, 4))))) == 4
    assert gn_labels(np.zeros((1, 1))).tolist() == [0]


def test_estimate_k_gn_column(spark):
    """k_gn from estimate_k matches the kernel; oversized and
    over-max_gn_edges blocks fall back to k_cc."""
    from jmdfane_spark.operators.clustering import estimate_k, gn_labels

    rows = (
        [("b", f"x{i}", f"x{j}", 0.9) for i in range(3) for j in range(3) if i < j]
        + [("b", f"y{i}", f"y{j}", 0.9) for i in range(3) for j in range(3) if i < j]
        + [("b", "x0", "y0", 0.8)]
    )
    scored = spark.createDataFrame(rows, "block_key string, id_a string, id_b string, score double")
    ids = sorted({r[1] for r in rows} | {r[2] for r in rows})
    members = spark.createDataFrame([("b", v) for v in ids], "block_key string, id string")
    got = {r["block_key"]: r for r in estimate_k(scored, members, threshold=0.3).collect()}
    pos = {v: i for i, v in enumerate(ids)}
    adj = np.zeros((len(ids), len(ids)), dtype=bool)
    for _, a, b, s in rows:
        if s > 0.3:
            adj[pos[a], pos[b]] = adj[pos[b], pos[a]] = True
    assert got["b"]["k_gn"] == len(np.unique(gn_labels(adj))) == 2

    # guard: max_gn_edges=0 forces the k_cc fallback
    for r in estimate_k(scored, members, threshold=0.3, max_gn_edges=0).collect():
        assert r["k_gn"] == r["k_cc"]
    for r in estimate_k(scored, members, threshold=0.3, max_block_rows=4).collect():
        assert r["k_gn"] == r["k_cc"]

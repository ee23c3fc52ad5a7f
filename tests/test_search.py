"""Similarity search: brute-force exactness, batched == window variant, IVF recall."""

import math

from jmdfane_spark.operators import similarity_search as NN


def _emb(spark, n=40, dim=8):
    # deterministic pseudo-vectors
    rows = []
    for i in range(n):
        v = [math.sin(i * 131 + j * 17) for j in range(dim)]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, vec array<float>")


def test_brute_force_topk_exact(spark):
    emb = _emb(spark)
    q = emb.where("vec_id < 3").selectExpr("vec_id as q_id", "vec")
    c = emb.selectExpr("vec_id as c_id", "vec")
    got = {(r.q_id, r.rank): r.c_id for r in NN.brute_force_topk(q, c, k=3).collect()}
    # rank 1 must be self (cosine 1.0)
    for i in range(3):
        assert got[(i, 1)] == i


def test_batched_matches_window_variant(spark):
    emb = _emb(spark)
    q = emb.where("vec_id < 5").selectExpr("vec_id as q_id", "vec")
    c = emb.selectExpr("vec_id as c_id", "vec")
    a = {(r.q_id, r.rank): r.c_id for r in NN.brute_force_topk(q, c, k=4).collect()}
    b = {(r.q_id, r.rank): r.c_id for r in NN.brute_force_topk_batched(q, c, k=4).collect()}
    assert a == b


def test_ivf_recall(spark):
    emb = _emb(spark, n=60)
    q = emb.where("vec_id < 5").selectExpr("vec_id as q_id", "vec")
    c = emb.selectExpr("vec_id as c_id", "vec")
    exact = {(r.q_id, r.c_id) for r in NN.brute_force_topk(q, c, k=3).collect()}
    assignments, centroids = NN.ivf_build(c, nlist=4, iters=2)
    approx = {(r.q_id, r.c_id) for r in NN.ivf_search(q, c, assignments, centroids, k=3, nprobe=3).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, (recall, exact - approx)

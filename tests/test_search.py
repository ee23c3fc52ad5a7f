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


def test_ivf_recall_sparse_probe(spark):
    """The configuration a 100 TB user actually runs: nprobe << nlist.

    On a CLUSTERED corpus (IVF's contract — inverted lists align with
    data structure) a 1-of-8 probe already recovers the exact top-k.
    On an unstructured random corpus (worst case: uniform directions,
    partitions are arbitrary) the same sparse probe still recovers a
    majority, and nprobe=nlist degrades to exact brute force.
    """
    import math

    dim = 16
    rows = []
    for cl in range(8):
        center = [math.sin(cl * 97 + j * 13) * 2 for j in range(dim)]
        for i in range(30):
            v = [center[j] + 0.05 * math.sin(cl * 31 + i * 7 + j * 3) for j in range(dim)]
            rows.append((cl * 30 + i, v))
    c = spark.createDataFrame(rows, "c_id long, vec array<double>")
    q = c.where("c_id % 30 = 0").selectExpr("c_id as q_id", "vec")
    exact = {(r.q_id, r.c_id) for r in NN.brute_force_topk(q, c, k=10).collect()}
    assignments, centroids = NN.ivf_build(c, nlist=8, iters=3)
    probe1 = {
        (r.q_id, r.c_id)
        for r in NN.ivf_search(q, c, assignments, centroids, k=10, nprobe=1).collect()
    }
    assert len(exact & probe1) / len(exact) >= 0.9

    # worst case: unstructured corpus, nprobe = nlist/4
    emb = _emb(spark, n=200, dim=16)
    qr = emb.where("vec_id < 10").selectExpr("vec_id as q_id", "vec")
    cr = emb.selectExpr("vec_id as c_id", "vec")
    exact_r = {(r.q_id, r.c_id) for r in NN.brute_force_topk(qr, cr, k=10).collect()}
    a_r, cen_r = NN.ivf_build(cr, nlist=8, iters=3)
    quarter = {
        (r.q_id, r.c_id)
        for r in NN.ivf_search(qr, cr, a_r, cen_r, k=10, nprobe=2).collect()
    }
    assert len(exact_r & quarter) / len(exact_r) >= 0.4
    full = {
        (r.q_id, r.c_id)
        for r in NN.ivf_search(qr, cr, a_r, cen_r, k=10, nprobe=8, round_digits=9).collect()
    }
    assert full == exact_r  # nprobe = nlist ⇒ exact

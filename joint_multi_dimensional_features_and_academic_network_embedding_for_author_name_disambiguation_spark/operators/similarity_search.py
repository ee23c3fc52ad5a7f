"""Approximate-nearest-neighbor search over an embedding column.

Two paths:
  * brute-force cosine top-k — exact baseline; queries × corpus join with
    JVM array math, per-query top-k via window. Oracle-checkable in SQL.
  * IVF (inverted-file) — the scale path: deterministic hash-seeded
    centroids refined by Lloyd iterations (each iteration = one join +
    one agg, all DataFrame ops), then search probes only the nprobe
    nearest centroid partitions. At 100 TB the corpus is partitioned by
    centroid id, so a query touches nprobe/nlist of the data.

Batched matmul variant: `brute_force_topk_batched` broadcasts the corpus
matrix into a mapInPandas numpy matmul — the pattern for a corpus that
fits per-executor memory (≤ a few GB) with millions of queries.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.similarity import cosine_with_norms, l2_norm


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    q_id: str = "q_id",
    c_id: str = "c_id",
    vec: str = "vec",
) -> DataFrame:
    """Exact cosine top-k: (q_id, c_id, cosine, rank), rank 1..k.

    Ties broken by c_id for determinism. The cross join is the exact
    baseline — O(|Q|·|C|), use only when one side is small/broadcastable.
    Norms fold once per ROW before the join (bit-identical values, one
    array fold per pair instead of three).
    """
    q = queries.select(
        F.col(q_id).alias("q_id"), F.col(vec).alias("_qv")
    ).withColumn("_qn", l2_norm(F.col("_qv")))
    c = corpus.select(
        F.col(c_id).alias("c_id"), F.col(vec).alias("_cv")
    ).withColumn("_cn", l2_norm(F.col("_cv")))
    scored = q.crossJoin(c).select(
        "q_id",
        "c_id",
        F.round(
            cosine_with_norms(F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")), 9
        ).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def brute_force_topk_batched(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    q_id: str = "q_id",
    c_id: str = "c_id",
    vec: str = "vec",
) -> DataFrame:
    """Same result as brute_force_topk via one numpy matmul per Arrow batch.

    Corpus is collected to the driver once (must fit; the 100 TB pattern
    keeps it ≤ executor memory and lets Spark broadcast the closure),
    queries stream through mapInPandas — zero per-row Python.
    """
    rows = corpus.select(c_id, vec).collect()
    c_ids = np.array([r[0] for r in rows])
    c_mat = np.array([r[1] for r in rows], dtype=np.float32)
    c_norm = c_mat / np.maximum(np.linalg.norm(c_mat, axis=1, keepdims=True), 1e-12)
    order0 = np.argsort(c_ids, kind="stable")  # tie-break by ascending c_id

    kk = k

    def search(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qm = np.array(list(pdf[vec]), dtype=np.float32)
            qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
            sims = qm @ c_norm.T  # (B, C)
            # stable top-k with (−sim, c_id) ordering: pre-sort by c_id
            sims_sorted = sims[:, order0]
            ids_sorted = c_ids[order0]
            top = np.argsort(-sims_sorted, axis=1, kind="stable")[:, :kk]
            b = len(pdf)
            out = pd.DataFrame(
                {
                    "q_id": np.repeat(pdf[q_id].to_numpy(), kk),
                    "c_id": ids_sorted[top].reshape(-1),
                    "cosine": np.round(np.take_along_axis(sims_sorted, top, 1).reshape(-1).astype("float64"), 9),
                    "rank": np.tile(np.arange(1, kk + 1), b),
                }
            )
            yield out

    schema = f"q_id {queries.schema[q_id].dataType.simpleString()}, c_id {corpus.schema[c_id].dataType.simpleString()}, cosine double, rank int"
    return queries.select(q_id, vec).mapInPandas(search, schema)


def ivf_build(
    corpus: DataFrame,
    c_id: str = "c_id",
    vec: str = "vec",
    nlist: int = 16,
    iters: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Build an IVF index: (assignments(c_id, centroid_id), centroids).

    Seeds = deterministic hash-sample of nlist corpus vectors (min
    xxhash64 per bucket); Lloyd refinement is join + groupBy(avg) per
    iteration — all DataFrame ops, checkpoint-friendly.
    """
    c = corpus.select(F.col(c_id).alias("c_id"), F.col(vec).alias("vec"))
    seeds = (
        c.withColumn("_b", F.pmod(F.xxhash64("c_id"), F.lit(nlist)))
        .withColumn(
            "_rk",
            F.row_number().over(Window.partitionBy("_b").orderBy(F.xxhash64(F.lit(1), "c_id"))),
        )
        .where(F.col("_rk") == 1)
        .select(F.col("_b").alias("centroid_id"), F.col("vec").alias("cvec"))
    )
    centroids = seeds
    for _ in range(iters):
        assigned = _assign(c, centroids)
        centroids = (
            assigned.join(c, "c_id")
            .select("centroid_id", F.posexplode("vec").alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("_pm"))
            .select("centroid_id", F.col("_pm.m").alias("cvec"))
        )
    return _assign(c, centroids), centroids


def _assign(c: DataFrame, centroids: DataFrame) -> DataFrame:
    cn = c.withColumn("_vn", l2_norm(F.col("vec")))
    ct = centroids.withColumn("_cn", l2_norm(F.col("cvec")))
    scored = cn.crossJoin(F.broadcast(ct)).select(
        "c_id",
        "centroid_id",
        cosine_with_norms(F.col("vec"), F.col("cvec"), F.col("_vn"), F.col("_cn")).alias("_s"),
    )
    w = Window.partitionBy("c_id").orderBy(F.desc("_s"), F.asc("centroid_id"))
    return scored.withColumn("_r", F.row_number().over(w)).where(F.col("_r") == 1).select("c_id", "centroid_id")


def ivf_search(
    queries: DataFrame,
    corpus: DataFrame,
    assignments: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    q_id: str = "q_id",
    c_id: str = "c_id",
    vec: str = "vec",
    round_digits: int = 9,
) -> DataFrame:
    """Probe the nprobe nearest centroids per query, exact cosine inside.

    ``round_digits`` sets the cosine precision BEFORE ranking (ties broken
    by c_id), so results are rank-comparable with a baseline computed at
    the same precision (e.g. the round-6 brute-force oracle)."""
    q = queries.select(F.col(q_id).alias("q_id"), F.col(vec).alias("_qv")).withColumn(
        "_qn", l2_norm(F.col("_qv"))
    )
    ct = centroids.withColumn("_ctn", l2_norm(F.col("cvec")))
    qprobe = q.crossJoin(F.broadcast(ct)).select(
        "q_id",
        "_qv",
        "_qn",
        "centroid_id",
        cosine_with_norms(F.col("_qv"), F.col("cvec"), F.col("_qn"), F.col("_ctn")).alias("_cs"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("_cs"), F.asc("centroid_id"))
    qprobe = qprobe.withColumn("_r", F.row_number().over(w)).where(F.col("_r") <= nprobe).select("q_id", "_qv", "_qn", "centroid_id")
    cc = corpus.select(F.col(c_id).alias("c_id"), F.col(vec).alias("_cv")).join(
        assignments, "c_id"
    ).withColumn("_cn", l2_norm(F.col("_cv")))
    scored = qprobe.join(cc, "centroid_id").select(
        "q_id",
        "c_id",
        F.round(
            cosine_with_norms(F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")),
            round_digits,
        ).alias("cosine"),
    )
    w2 = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return scored.withColumn("rank", F.row_number().over(w2)).where(F.col("rank") <= k)

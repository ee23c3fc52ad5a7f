"""Network-embedding channel: deterministic random walks + Word2Vec (G4).

The reference's metapath2vec (src/hin_embedding/meta2vec.py:34-39,127-193)
does weighted random walks over a heterogeneous graph and trains SkipGram
(64-d, 500 epochs, negative sampling at freq^0.75); a simpler gensim
variant lives in src/hin_embedding/local_hin_walks.py:24-80. Here:

  random_walks — walks as an ITERATIVE JOIN: each step joins the frontier
      to a grouped adjacency table and picks the next hop by
      xxhash64(walk_id, step, node) mod degree — deterministic under any
      partitioning (no RNG state; SURVEY §7.4 risk 4), one shuffle per
      step, never a per-block Python loop.

  train_node_embeddings — Spark ML Word2Vec over walk "sentences"
      (distributed SkipGram, the JVM replacement for gensim).

The resulting vectors feed the dense-cosine scoring channel (F6) — the
"network embedding" dimension of the reference's joint feature vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def random_walks(
    edges: DataFrame,
    num_walks: int = 5,
    walk_len: int = 10,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """(walk_id, start, path: array<string>) — deterministic walks.

    Adjacency is symmetrized and grouped once (node → sorted neighbor
    array, broadcast-sized per partition); step t extends every active
    walk by element_at(nbrs, hash(walk, t, node) mod degree). Walks from
    every node, num_walks each.
    """
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .unionByName(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .distinct()
    )
    adj = sym.groupBy("u").agg(F.array_sort(F.collect_list("v")).alias("nbrs")).persist()

    starts = adj.select("u").distinct()
    walks = starts.select(
        F.col("u").alias("cur"),
        F.explode(F.sequence(F.lit(0), F.lit(num_walks - 1))).alias("walk_id"),
    ).select("walk_id", "cur", F.array("cur").alias("path"))

    for step in range(1, walk_len):
        walks = (
            walks.join(adj.withColumnRenamed("u", "cur"), "cur", "left")
            .select(
                "walk_id",
                "path",
                F.when(
                    F.col("nbrs").isNotNull() & (F.size("nbrs") > 0),
                    F.element_at(
                        "nbrs",
                        (
                            F.pmod(
                                F.xxhash64(F.col("walk_id"), F.lit(step), F.col("cur")),
                                F.size("nbrs"),
                            )
                            + 1
                        ).cast("int"),
                    ),
                ).alias("nxt"),
            )
            .select(
                "walk_id",
                F.coalesce(F.col("nxt"), F.element_at("path", -1)).alias("cur"),
                F.when(F.col("nxt").isNotNull(), F.concat("path", F.array("nxt")))
                .otherwise(F.col("path"))
                .alias("path"),
            )
        )
        if step % 5 == 0:
            walks = walks.localCheckpoint()  # bound iterative plan growth
    adj.unpersist()
    return walks.select("walk_id", F.element_at("path", 1).alias("start"), "path")


def train_node_embeddings(
    walks: DataFrame, dim: int = 32, window: int = 2, min_count: int = 0, seed: int = 42
) -> DataFrame:
    """Spark ML Word2Vec on walk sentences → (node, vector array<float>)."""
    from pyspark.ml.feature import Word2Vec

    w2v = Word2Vec(
        vectorSize=dim,
        windowSize=window,
        minCount=min_count,
        seed=seed,
        inputCol="path",
        outputCol="_emb",
    )
    model = w2v.fit(walks.select("path"))
    vecs = model.getVectors()  # (word, vector: ml.linalg.Vector)
    to_arr = F.udf(lambda v: [float(x) for x in v], "array<float>")
    return vecs.select(F.col("word").alias("node"), to_arr("vector").alias("vec"))

"""Stage-2 pairwise scoring: the reference's joint multi-dimensional
feature vector, fused by fixed learned weights.

Reference semantics being re-expressed (NOT ported):
  * rule model `generate_pair`: score = coauthor·1.5 + tanimoto(venue) +
    tanimoto(org) + |title∩|/3, accept ≥ 1.5 (src/utils/utils.py:182-254);
  * channel similarity graphs with per-channel rules
    (src/pre_data/generate_adj.py:73-138);
  * the adaptive local model (src/local_embedding/local_embedding.py) whose
    *semantic effect* is a learned convex combination of channel
    similarities (SURVEY §2.8 G5) — here the fixed ``CHANNEL_WEIGHTS``.

Channels over the files table:
  token_jaccard   — content token-set Jaccard (A4, JVM array math)
  shingle_jaccard — word-3-gram Jaccard (structure-sensitive)
  path_sim        — Levenshtein ratio on normalized paths (F5, built-in)
  tfidf_cosine    — hashed TF-IDF cosine, batched numpy in a pandas UDF
  minhash_est     — signature-agreement Jaccard estimate (cheap prefilter)

Two scorer impls with identical semantics:
  * ``score_pairs_jvm`` — whole-stage-codegen column math (small channels);
  * ``tfidf_cosine_udf`` — Arrow-batched pandas UDF; per batch it densifies
    hashed sparse vectors into one (batch × D) float32 matrix with
    np.add.at and does a single row-wise dot — zero per-row Python
    (north_rule stage 2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..functions import similarity as S

# Fused channel weights (sum 1.0) — plays the role of the reference's
# learned attention weights over channels (local_embedding/model.py:34-58).
CHANNEL_WEIGHTS = {
    "token_jaccard": 0.35,
    "shingle_jaccard": 0.25,
    "tfidf_cosine": 0.25,
    "path_sim": 0.15,
}

TFIDF_DIM = 1024  # hashed feature space for the cosine channel


def tfidf_features(docs: DataFrame, id_col: str, tokens_col: str, dim: int = TFIDF_DIM) -> DataFrame:
    """Per-doc hashed TF-IDF sparse vectors: (id, idx: array<int>, val: array<float>).

    IDF = ln(N / df + 1) — the reference's formula
    (src/pre_embedding/get_pre_embedding.py:50-51). All JVM-side: explode →
    df counts → idf join (broadcast) → per-doc tf·idf grouped back.
    """
    n_docs = docs.count()
    toks = docs.select(id_col, F.explode(tokens_col).alias("tok"))
    tf = toks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    df_counts = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = df_counts.select("tok", (F.log(F.lit(float(n_docs)) / F.col("df") + 1.0)).alias("idf"))
    w = (
        tf.join(F.broadcast(idf), "tok")
        .withColumn("idx", F.pmod(F.xxhash64("tok"), F.lit(dim)).cast("int"))
        .withColumn("val", (F.col("tf") * F.col("idf")).cast("float"))
    )
    return (
        w.groupBy(id_col)
        .agg(F.collect_list(F.struct("idx", "val")).alias("_iv"))
        .select(
            id_col,
            F.col("_iv.idx").alias("tfidf_idx"),
            F.col("_iv.val").alias("tfidf_val"),
        )
    )


@pandas_udf(DoubleType())
def tfidf_cosine_udf(
    idx_a: pd.Series, val_a: pd.Series, idx_b: pd.Series, val_b: pd.Series
) -> pd.Series:
    """Batched hashed-vector cosine. One np.add.at densify per side per
    Arrow batch, one einsum for the dots — no per-row Python."""
    n = len(idx_a)
    if n == 0:
        return pd.Series([], dtype="float64")

    def densify(idx: pd.Series, val: pd.Series) -> np.ndarray:
        mat = np.zeros((n, TFIDF_DIM), dtype=np.float32)
        lens = np.fromiter((0 if v is None else len(v) for v in idx), dtype=np.int64, count=n)
        if lens.sum() == 0:
            return mat
        rows = np.repeat(np.arange(n), lens)
        cols = np.concatenate([np.asarray(v, dtype=np.int64) for v in idx if v is not None and len(v)])
        vals = np.concatenate([np.asarray(v, dtype=np.float32) for v in val if v is not None and len(v)])
        np.add.at(mat, (rows, cols), vals)
        return mat

    ma, mb = densify(idx_a, val_a), densify(idx_b, val_b)
    dots = np.einsum("ij,ij->i", ma, mb)
    na = np.linalg.norm(ma, axis=1)
    nb = np.linalg.norm(mb, axis=1)
    denom = na * nb
    out = np.where(denom > 0, dots / np.where(denom == 0, 1, denom), 0.0)
    return pd.Series(out.astype("float64"))


def score_pairs(pairs: DataFrame, weights: dict[str, float] | None = None) -> DataFrame:
    """Attach per-channel similarities + fused score to a candidate-pair df.

    Expects payload columns tokens_a/b, shingles_a/b, norm_path_a/b and
    (optionally) tfidf_idx_a/b + tfidf_val_a/b from ``tfidf_features``.
    """
    w = weights or CHANNEL_WEIGHTS
    out = pairs.withColumn("token_jaccard", S.jaccard(F.col("tokens_a"), F.col("tokens_b")))
    out = out.withColumn("shingle_jaccard", S.jaccard(F.col("shingles_a"), F.col("shingles_b")))
    out = out.withColumn("path_sim", S.levenshtein_ratio(F.col("norm_path_a"), F.col("norm_path_b")))
    if "tfidf_idx_a" in pairs.columns:
        out = out.withColumn(
            "tfidf_cosine",
            tfidf_cosine_udf(
                F.col("tfidf_idx_a"), F.col("tfidf_val_a"), F.col("tfidf_idx_b"), F.col("tfidf_val_b")
            ),
        )
    else:
        out = out.withColumn("tfidf_cosine", F.col("token_jaccard"))
    fused: Column = sum(
        (F.lit(wt) * F.col(ch) for ch, wt in w.items()), F.lit(0.0)
    )
    return out.withColumn("score", F.round(fused, 9))


def adaptive_threshold(
    scored: DataFrame, block_col: str = "block_key", base: float = 0.5, k_sigma: float = 0.0
) -> DataFrame:
    """Per-block adaptive accept threshold: max(base, mean + k·σ) (A5).

    The reference thresholds text edges at mean+2σ *within a block*
    (generate_adj.py:117). Two-pass agg + broadcast join-back.
    """
    stats = scored.groupBy(block_col).agg(
        F.avg("score").alias("_mu"), F.coalesce(F.stddev("score"), F.lit(0.0)).alias("_sd")
    )
    thr = stats.select(
        block_col, F.greatest(F.lit(base), F.col("_mu") + k_sigma * F.col("_sd")).alias("_thr")
    )
    return scored.join(F.broadcast(thr), block_col).where(F.col("score") >= F.col("_thr")).drop("_thr")

"""Pairwise precision / recall / F1 — the reference's acceptance metric.

Counting semantics are exactly src/utils/utils.py:63-94 (and the duplicate
pairwise_evaluate at :302-324): over all unordered mention pairs i<j in a
block,
    TP    = pred-same ∧ true-same
    TP+FP = pred-same
    TP+FN = true-same
    P = TP/(TP+FP), R = TP/(TP+FN), F1 = harmonic mean (0 when either is 0).

The reference loops O(n²) in Python; here the same numbers come from the
contingency table in O(#distinct label pairs): for cluster-size counts c,
#same-pairs = Σ c·(c−1)/2 — a groupBy + sum, no pair materialization (A6).
Macro = average of per-block F1 (the reference's trailing `average` CSV
row, local_embedding.py:640-645); micro = pooled counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pairs_of(n):  # n·(n−1)/2 as a Column
    return (n * (n - F.lit(1)) / F.lit(2)).cast("double")


def pairwise_confusion(
    joined: DataFrame, block_col: str = "block_key", pred_col: str = "pred", true_col: str = "truth"
) -> DataFrame:
    """Per-block (tp, pred_pairs, true_pairs) from (block, id, pred, true)."""
    cell = joined.groupBy(block_col, pred_col, true_col).agg(F.count("*").alias("c"))
    tp = cell.groupBy(block_col).agg(F.sum(_pairs_of(F.col("c"))).alias("tp"))
    pred_sz = (
        joined.groupBy(block_col, pred_col).agg(F.count("*").alias("c"))
        .groupBy(block_col).agg(F.sum(_pairs_of(F.col("c"))).alias("pred_pairs"))
    )
    true_sz = (
        joined.groupBy(block_col, true_col).agg(F.count("*").alias("c"))
        .groupBy(block_col).agg(F.sum(_pairs_of(F.col("c"))).alias("true_pairs"))
    )
    return tp.join(pred_sz, block_col).join(true_sz, block_col)


def pairwise_f1(
    pred_labels: DataFrame,
    true_labels: DataFrame,
    block_col: str = "block_key",
    id_col: str = "id",
) -> dict:
    """pred_labels(id, component); true_labels(block_key, id, cluster_id).

    Returns {'macro_f1', 'micro_f1', 'micro_precision', 'micro_recall',
    'per_block': DataFrame}.
    """
    joined = true_labels.join(pred_labels.select(id_col, "component"), id_col).select(
        F.col(block_col), F.col(id_col), F.col("component").alias("pred"), F.col("cluster_id").alias("truth")
    )
    conf = pairwise_confusion(joined, block_col)
    per_block = conf.select(
        block_col,
        "tp",
        "pred_pairs",
        "true_pairs",
        F.when(F.col("pred_pairs") > 0, F.col("tp") / F.col("pred_pairs")).otherwise(F.lit(0.0)).alias("precision"),
        F.when(F.col("true_pairs") > 0, F.col("tp") / F.col("true_pairs")).otherwise(F.lit(0.0)).alias("recall"),
    ).withColumn(
        "f1",
        F.when(
            (F.col("precision") > 0) & (F.col("recall") > 0),
            2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall")),
        ).otherwise(F.lit(0.0)),
    )
    agg = per_block.agg(
        F.avg("f1").alias("macro_f1"),
        F.sum("tp").alias("tp"),
        F.sum("pred_pairs").alias("pp"),
        F.sum("true_pairs").alias("tpn"),
    ).collect()[0]
    micro_p = (agg["tp"] / agg["pp"]) if agg["pp"] else 0.0
    micro_r = (agg["tp"] / agg["tpn"]) if agg["tpn"] else 0.0
    micro_f1 = (2 * micro_p * micro_r / (micro_p + micro_r)) if (micro_p and micro_r) else 0.0
    return {
        "macro_f1": float(agg["macro_f1"] or 0.0),
        "micro_f1": float(micro_f1),
        "micro_precision": float(micro_p),
        "micro_recall": float(micro_r),
        "per_block": per_block,
    }


def pairwise_f1_on_labeled_pairs(pred_labels: DataFrame, labeled_pairs: DataFrame) -> dict:
    """F1 against an explicit labeled-pairs table (BASELINE.json metric:
    'labeled pairs at matching blocking keys').

    labeled_pairs(block_key, id_a, id_b, is_match); a pair counts as
    pred-same when both sides landed in the same component.
    """
    la = pred_labels.select(F.col("id").alias("id_a"), F.col("component").alias("comp_a"))
    lb = pred_labels.select(F.col("id").alias("id_b"), F.col("component").alias("comp_b"))
    j = labeled_pairs.join(la, "id_a").join(lb, "id_b")
    agg = j.agg(
        F.sum(((F.col("comp_a") == F.col("comp_b")) & F.col("is_match")).cast("long")).alias("tp"),
        F.sum((F.col("comp_a") == F.col("comp_b")).cast("long")).alias("pred_same"),
        F.sum(F.col("is_match").cast("long")).alias("true_same"),
    ).collect()[0]
    p = agg["tp"] / agg["pred_same"] if agg["pred_same"] else 0.0
    r = agg["tp"] / agg["true_same"] if agg["true_same"] else 0.0
    f1 = 2 * p * r / (p + r) if (p and r) else 0.0
    return {"precision": float(p), "recall": float(r), "f1": float(f1), "tp": int(agg["tp"])}

"""Stage-3 transitive clustering: iterative hash-min connected components.

The reference computes transitive closure with
scipy.sparse.csgraph.connected_components after zeroing weak edges
(src/local_embedding/local_embedding.py:337-342, src/cluster_pred/
cluster_predict.py:284-287). That is a single-machine dense operation; the
distributed equivalent (north_rule stage 3) is the hash-min fixpoint:

    label(v) ← min(label(v), min over neighbours u of label(u))

repeated until no label changes. Each iteration is one join + one
min-aggregate; lineage is cut every iteration via localCheckpoint (or a
parquet checkpoint dir for kill-resumability), and a per-iteration metrics
row (labels changed, components remaining) is collected — the north_rule's
"components merged per iteration" lineage metric.

Labels are the row-id strings themselves (min = lexicographic), so the
final component id is the smallest member id — deterministic, collision-free,
and directly joinable back to the labels table.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CCResult:
    labels: DataFrame          # (id, component)
    iterations: int
    metrics: list[dict] = field(default_factory=list)  # per-iteration rows
    converged: bool = True     # False ⇒ labels are NOT a fixpoint (diameter > max_iter)


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
    checkpointer=None,
    count_components: bool = False,
) -> CCResult:
    """Hash-min CC over an undirected edge table.

    vertices: one row per id (isolated vertices become singletons).
    edges: unordered pairs; symmetrized internally.
    checkpointer: optional plans.checkpoint.CheckpointManager — when given,
    each iteration's label table is persisted (resume = continue from the
    last completed iteration).
    """
    # no distinct(): hash-min's min-aggregate is idempotent to duplicate
    # edges, and for unique unordered input pairs the swapped union has no
    # duplicates anyway — a distinct here is a full extra shuffle of 2|E|
    # rows for nothing (measured ~100s of task time on the 14.5M-pair
    # scaling workload).
    sym = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).unionByName(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )
    sym.persist()

    start_iter = 0
    labels = None
    if checkpointer is not None:
        labels, start_iter = checkpointer.latest_iteration("cc_labels")
    if labels is None:
        labels = vertices.select(F.col(id_col).alias("id"), F.col(id_col).alias("component"))
        labels = labels.localCheckpoint()

    metrics: list[dict] = []
    it = start_iter
    for it in range(start_iter + 1, max_iter + 1):
        # candidate labels flowing along edges
        msgs = (
            sym.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(msgs, "id", "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))).alias(
                    "component"
                ),
                (F.col("nbr_component") < F.col("component")).alias("_changed"),
            )
        )
        # Materialize ONCE, then read the convergence count from the
        # materialized partitions: running the `changed` agg on the lazy
        # plan and then checkpointing executed the whole join pipeline
        # TWICE per iteration (measured ~2× the CC stage cost — CC was
        # ~40s at 8 and 16 cores alike, pure overhead).
        changed_agg = F.coalesce(
            F.sum(F.coalesce(F.col("_changed").cast("long"), F.lit(0))), F.lit(0)
        ).alias("n")
        if checkpointer is not None:
            flagged = new_labels.persist()
            changed = flagged.agg(changed_agg).collect()[0]["n"]
            labels = checkpointer.write_iteration("cc_labels", it, flagged.drop("_changed"))
            flagged.unpersist()
        else:
            flagged = new_labels.localCheckpoint()  # also cuts iterative lineage
            changed = flagged.agg(changed_agg).collect()[0]["n"]
            labels = flagged.drop("_changed")
        row = {"iteration": it, "labels_changed": int(changed)}
        if count_components:
            # optional: a full extra job per iteration — only for lineage
            # metrics, never needed for convergence
            row["components"] = int(labels.select("component").distinct().count())
        metrics.append(row)
        if changed == 0:
            break

    sym.unpersist()
    converged = (not metrics) or metrics[-1]["labels_changed"] == 0
    if not converged:
        # a component with graph diameter > max_iter would silently get
        # wrong ids — never return that as if it were a fixpoint
        warnings.warn(
            f"connected_components did not converge in {max_iter} iterations "
            f"({metrics[-1]['labels_changed']} labels still changing); "
            "labels are NOT transitive-closure-complete",
            RuntimeWarning,
            stacklevel=2,
        )
    return CCResult(labels=labels, iterations=it, metrics=metrics, converged=converged)

"""Reference-style ablation harness: one results CSV per configuration.

The reference's regression methodology is end-to-end ablation runs, each
writing a results_test*.csv of per-name metrics plus a trailing `average`
row — (name, num_nodes, true_clusters, pf1, nmi, ari), written at
src/local_embedding/local_embedding.py:640-645 and collected under
OAG-WhoisWh0-na-v1/*/out/ (~40 files: +adaptive-SGC, +multi-dim fusion,
+spectral, true-k vs predicted-k, ...). This tool reproduces that harness
over the synthetic labeled fixture for this engine's configurations:

  cc_fixed          threshold-CC, fixed channel weights (the flagship)
  cc_banded         + MinHash band blocking keys
  cc_embedding      + network-embedding 5th channel (metapath walks + W2V)
  cc_fitted         channel weights FITTED from labeled pairs (G3)
  ghac              per-block GHAC clusterer (G8)
  spectral_true_k   per-block spectral with true k (the reference's
                    headline 真实簇个数 configuration, G7)
  spectral_pred_k   spectral with predicted k (thresholded-CC count, G10)

Usage: python tools/ablation.py [out_dir]   (default BENCH/ablation)
"""

from __future__ import annotations

import csv
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from jmdfane_spark.operators import scoring  # noqa: E402
from jmdfane_spark.operators.evaluate import nmi_ari, pairwise_f1  # noqa: E402
from jmdfane_spark.plans.pipeline import normalize_files, run_pipeline  # noqa: E402
from jmdfane_spark.session import get_spark  # noqa: E402
from jmdfane_spark.sources.synthetic import synthesize, to_spark  # noqa: E402


def per_block_results(res_labels, labels) -> list[dict]:
    """Reference CSV row shape: per block + trailing average row."""
    pf = pairwise_f1(res_labels.select("id", "component"), labels)
    f1_rows = {r["block_key"]: r for r in pf["per_block"].collect()}
    joined = labels.join(res_labels.select("id", "component"), "id").select(
        "block_key", "id", F.col("component").alias("pred"), F.col("cluster_id").alias("truth")
    )
    na_rows = {r["block_key"]: r for r in nmi_ari(joined).collect()}
    kt = {
        r["block_key"]: r["k"]
        for r in labels.groupBy("block_key")
        .agg(F.countDistinct("cluster_id").alias("k"))
        .collect()
    }
    out = []
    for bk in sorted(f1_rows):
        out.append(
            {
                "name": bk,
                "num_nodes": na_rows[bk]["n"],
                "true_clusters": kt[bk],
                "pf1": round(f1_rows[bk]["f1"], 5),
                "nmi": round(na_rows[bk]["nmi"], 5),
                "ari": round(na_rows[bk]["ari"], 5),
            }
        )
    n = len(out)
    out.append(
        {
            "name": "average",
            "num_nodes": sum(r["num_nodes"] for r in out),
            "true_clusters": sum(r["true_clusters"] for r in out),
            "pf1": round(sum(r["pf1"] for r in out) / n, 5),
            "nmi": round(sum(r["nmi"] for r in out) / n, 5),
            "ari": round(sum(r["ari"] for r in out) / n, 5),
        }
    )
    return out


def fitted_weights(spark, files, lpairs) -> dict:
    norm = normalize_files(files, staged=True)
    feats = scoring.tfidf_features(norm.select("id", "tokens"), "id", "tokens")
    members = norm.join(feats, "id", "left")
    pcols = [c for c in members.columns if c != "id"]
    pa = members.select(F.col("id").alias("id_a"), *[F.col(c).alias(f"{c}_a") for c in pcols])
    pb = members.select(F.col("id").alias("id_b"), *[F.col(c).alias(f"{c}_b") for c in pcols])
    wide = lpairs.select("id_a", "id_b").join(pa, "id_a").join(pb, "id_b")
    scored = scoring.score_pairs(wide, prune_below=None)
    return scoring.fit_channel_weights(scored, lpairs)


def main() -> None:
    out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "BENCH" / "ablation"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="jmdfane-ablation")
    fx = synthesize(n_blocks=8, min_rows=10, max_rows=40, hot_block_rows=120)
    files, labels, lpairs = to_spark(spark, fx)
    files, labels, lpairs = files.persist(), labels.persist(), lpairs.persist()
    true_k = labels.groupBy("block_key").agg(F.countDistinct("cluster_id").alias("k"))

    configs: dict[str, dict] = {
        "cc_fixed": dict(use_bands=False, use_tfidf=True),
        "cc_banded": dict(use_bands=True, bands=8, rows_per_band=2, use_tfidf=False),
        "cc_embedding": dict(use_bands=False, use_tfidf=True, use_embedding=True),
        "cc_fitted": dict(
            use_bands=False, use_tfidf=True, channel_weights=fitted_weights(spark, files, lpairs)
        ),
        "ghac": dict(use_bands=False, use_tfidf=True, clusterer="ghac"),
        "spectral_true_k": dict(
            use_bands=False, use_tfidf=True, clusterer="spectral", true_k=true_k
        ),
        "spectral_pred_k": dict(use_bands=False, use_tfidf=True, clusterer="spectral"),
    }

    summary = []
    for name, kw in configs.items():
        t0 = time.time()
        res = run_pipeline(spark, files, **kw)
        rows = per_block_results(res.labels, labels)
        path = out_dir / f"results_test_{name}.csv"
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["name", "num_nodes", "true_clusters", "pf1", "nmi", "ari"])
            w.writeheader()
            w.writerows(rows)
        avg = rows[-1]
        summary.append((name, avg["pf1"], avg["nmi"], avg["ari"], round(time.time() - t0, 1)))
        print(f"{name:<16} pf1={avg['pf1']:.5f} nmi={avg['nmi']:.5f} ari={avg['ari']:.5f} "
              f"({summary[-1][4]}s) -> {path}")

    with open(out_dir / "SUMMARY.md", "w") as f:
        f.write("# Ablation summary (reference results_test*.csv harness)\n\n")
        f.write("| config | avg pf1 | avg nmi | avg ari | wall (s) |\n|---|---|---|---|---|\n")
        for name, pf1, nmi, ari, wall in summary:
            f.write(f"| {name} | {pf1} | {nmi} | {ari} | {wall} |\n")
    print(f"wrote {out_dir}/SUMMARY.md")


if __name__ == "__main__":
    main()

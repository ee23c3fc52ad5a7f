"""PySpark-native entity-resolution (record-linkage) engine.

Re-expresses the semantics of the reference repo
jackforlove/JOINT-MULTI-DIMENSIONAL-FEATURES-AND-ACADEMIC-NETWORK-EMBEDDING-
FOR-AUTHOR-NAME-DISAMBIGUATION (author name disambiguation: blocking →
multi-dimensional pairwise similarity → graph → transitive clustering →
pairwise-F1 evaluation) as an idiomatic Spark DataFrame pipeline over a
source-code-repository table ``files(repo, path, commit, lang, content)``.

Design notes (Spark-first, scale-first):
  * Everything is a DataFrame; graphs are edge tables, never N×N matrices.
  * Blocking keys bound the O(n²) candidate-pair join; hot blocks are
    salted within MinHash bands (never across, to preserve recall).
  * Scoring is JVM-side column math where possible; the only Python is
    vectorized Arrow/pandas UDFs doing batched numpy (zero per-row Python).
  * Clustering is iterative hash-min connected components with
    per-iteration checkpointing (resumable) and a metrics table.
"""

__version__ = "0.1.0"

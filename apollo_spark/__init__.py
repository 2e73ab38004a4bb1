"""apollo_spark — a from-scratch PySpark-native near-duplicate detection and
clustering engine over tables of image+caption pairs.

Re-expresses what src-d/apollo computes (weighted bags -> Weighted MinHash ->
LSH banding -> connected components -> cluster resolution -> query/eval), as
idiomatic Spark: DataFrame/SQL plans optimized by Catalyst, vectorized
pandas/Arrow UDF kernels, per-stage columnar checkpoints. No RDDs, no per-row
Python UDFs, no driver-resident data.

Reference semantics (cited per module as /root/reference file:line):
  - Weighted MinHash sample math .... apollo/hasher.py:237-256
  - LSH (b, r) parameter search ..... apollo/hasher.py:25-58
  - Band explosion .................. apollo/hasher.py:90-99
  - Connected components ............ apollo/graph.py:63-88
  - Weighted Jaccard / eval ......... apollo/query.py:80-81, graph.py:349-377
"""

__version__ = "0.1.0"

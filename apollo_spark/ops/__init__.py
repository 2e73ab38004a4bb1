"""Training-data pipeline operators (dedup / similarity / text / multimodal).

These are first-class engine components alongside the apollo-derived
pipeline stages: the operations a 100 TB training-data curation run needs
on top of near-duplicate clustering. All are pure DataFrame expressions
(JVM-side, whole-stage-codegen) except where a kernel genuinely requires
NumPy, in which case it is an Arrow-batched mapInPandas.
"""

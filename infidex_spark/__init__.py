"""infidex_spark — a PySpark-native inverted-index build + BM25 query engine.

A from-scratch reimplementation of the search core of lofcz/Infidex
(reference at /root/reference, C#/.NET) on top of Apache Spark:

- ``kernel``   : pure-Python/numpy parity kernel (text normalization,
  tokenization, BM25+ math, a single-process reference engine used as the
  golden oracle for all distributed components).
- ``build``    : distributed index construction (tokenize -> postings ->
  segments) expressed as DataFrame dataflow with Arrow-vectorized UDFs.
- ``query``    : driver-side top-k retrieval over the built index
  (posting-list intersection, block-max WAND, bounded heap) plus a
  distributed batch-query mode.
- ``functions``: relational post-processing (Infiscript filter DSL ->
  Spark SQL, boosts, sorts, facets, top-k).
- ``pipeline`` : large-scale training-data operators (dedup, similarity
  search, text stats, multimodal plumbing).
"""

__version__ = "0.1.0"

"""Extension operators for large-scale training-data pipelines:

- ``dedup``: exact, MinHash+LSH, SimHash, n-gram Jaccard
- ``similarity``: brute-force cosine top-k, random-hyperplane LSH ANN,
  IVF (centroid-probed) ANN, embedding near-dup pairs
- ``text``: tokenization (whitespace + BPE-ish regex), language-ID,
  quality scoring, rolling-hash fingerprints
- ``multimodal``: binary media columns with typed metadata; decode /
  feature-extract plumbing over mapInPandas (decode itself stubbed —
  image/audio libs are not in this container)

All hot paths are built-in column expressions (JVM, codegen) or
Arrow-batched pandas transforms; nothing does per-row Python.
"""

"""Training-data pipeline functions over Spark DataFrames.

- :mod:`images`     — multimodal binary-column handling (decode /
  feature-extract / re-encode as vectorized kernels; codecs are
  deterministic stand-ins since no image libraries exist in this
  environment — the Spark-side plumbing is real).
- :mod:`dedup`      — exact, MinHash+LSH, SimHash, n-gram Jaccard.
- :mod:`similarity` — brute-force and LSH-bucketed cosine top-k.
- :mod:`text`       — language ID, quality scoring, token counting,
  fingerprinting.
"""

"""Large-scale training-data pipeline operators (beyond the reference surface).

These are first-class engine components designed for 100 TB corpora:
- dedup: exact (hash groupBy), MinHash+LSH, SimHash — shuffle-light banding
- similarity: brute-force cosine top-k baseline + LSH-bucketed ANN scale path
- text: language-ID heuristic, quality scoring, token counting, fingerprints
- multimodal: binary columns with typed metadata; decode/extract plumbing as
  Arrow-batched mapInPandas (decoders stubbed — image/audio libs not present)
"""

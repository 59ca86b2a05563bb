"""Large-scale training-data operators built on Ray Data primitives:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
similarity search, text analysis, multimodal plumbing."""

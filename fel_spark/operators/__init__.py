"""Operators: ranking, mention extraction, blocking, scoring, clustering,
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / prefix-filter exact
/ embedding-cosine), similarity search (brute-force, LSH, IVF + k-means),
per-entity LR embedding training + LR scorers, type language models, text
analytics, conversation coherence."""

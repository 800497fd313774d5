"""Operators: ranking, mention extraction, blocking, scoring, clustering,
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / prefix-filter exact
/ embedding-cosine / span-level + excision / near-containment / SemDeDup
semantic / benchmark decontamination), similarity
search (brute-force, LSH, IVF + k-means), per-entity LR embedding training
+ LR scorers, type language models, text analytics (quality, repetition,
PII, lang-id), dataset splits + stratified sampling, corpus filtering,
sequence packing, sessionization, conversation-integrity gating,
conversation coherence."""

"""Operators: ranking, mention extraction, blocking, scoring, clustering,
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / prefix-filter exact
/ embedding-cosine / span-level + excision / near-containment / SemDeDup
semantic / benchmark decontamination), similarity
search (brute-force, LSH, IVF + k-means), per-entity LR embedding training
+ LR scorers, type language models, text analytics (quality, repetition,
PII, lang-id), dataset splits + stratified sampling, corpus filtering,
sequence packing, sessionization, conversation-integrity gating,
conversation coherence — plus the record-linkage canon: string/numeric/
temporal comparators (editsim), Fellegi-Sunter supervised + EM families
(linkage), pair-decision matching (mutual-best / greedy / star / pivot /
canopy), evaluation metrics (B-cubed, ARI, V-measure, MUC, CEAF,
threshold + progressive curves), lossless skew balancing (loadbalance),
privacy-preserving encodings (pprl), collective relational evidence
(collective), group linkage (grouplink), blocking-scheme learning
(blockscheme), q-gram approximate string joins (qgramjoin), Swoosh
merge-based ER (swoosh), temporal decayed-evidence linkage (temporal),
cluster repair (cluster.repair_clusters), active-learning
uncertainty sampling (linkage.uncertain_pairs), community decision
layers (matching.merge_center_clusters / label_propagation, mcl),
match-graph cleaning (graphclean: k-core / k-truss), sample-based
duplicate estimation (estimate: Chao1 / Good-Turing), alignment
comparators (editsim: LCS / Smith-Waterman / Needleman-Wunsch), and
the completed evaluation canon (evalmetrics: + BLANC, Generalized
Merge Distance, VI/MI/NMI)."""

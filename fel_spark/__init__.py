"""fel_spark — a from-scratch PySpark-native record-linkage / entity-resolution
engine with the query and data-processing capabilities of yahoo/FEL.

The reference (read-only at /root/reference) is a Java/Pig/Hadoop entity
linker; this package re-expresses its semantics Spark-first:

- alias-dictionary candidate generation  -> DataFrame joins against a
  broadcast alias dict (reference: hash/QuasiSuccinctEntityHash.java:79-126)
- count-based probabilistic ranking      -> pure column arithmetic
  (reference: entityranker/ProbabilityRanker.java:54-72)
- compressed-embedding context scoring   -> int8-quantized broadcast NumPy
  matrix + vectorized pandas UDFs (reference: w2v/Quantizer.java,
  it/cnr/isti/hpc/Word2VecCompress.java)
- coherence clustering                   -> blocking + pairwise scoring +
  connected components (reference: CoherentEntityLinker.java:152-255)

Layout:
    fel_spark.session    SparkSession factory (AQE, Arrow, shuffle tuning)
    fel_spark.functions  column-level text / similarity / hashing functions
    fel_spark.sources    synthetic transcript generator, testdata loaders
    fel_spark.operators  blocking, scoring, ranking, clustering, dedup, ANN
    fel_spark.plans      multi-stage jobs (dictionary build, ER pipeline)
    fel_spark.streaming  incremental (Structured Streaming) variants
"""

__version__ = "0.1.0"

"""Sources: deterministic synthetic transcripts, testdata loaders, multimodal."""

from fel_spark.sources.testdata import load_table, register_views  # noqa: F401

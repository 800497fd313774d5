"""Shipped model weight tables (the datapack-as-shipped-data pattern:
the reference ships its trained artifacts with the code, `README.md:10`)."""

from fel_spark.models.langmodels import (
    LANGID_WEIGHTS,
    QUALITY_BIAS,
    QUALITY_WEIGHTS,
    default_langid_model,
    default_quality_model,
    langid_weights_df,
)
from fel_spark.models.trained import (
    TRAINED_LANGID_WEIGHTS,
    TRAINED_QUALITY_BIAS,
    TRAINED_QUALITY_WEIGHTS,
)

__all__ = [
    "LANGID_WEIGHTS",
    "QUALITY_BIAS",
    "QUALITY_WEIGHTS",
    "TRAINED_LANGID_WEIGHTS",
    "TRAINED_QUALITY_BIAS",
    "TRAINED_QUALITY_WEIGHTS",
    "default_langid_model",
    "default_quality_model",
    "langid_weights_df",
]

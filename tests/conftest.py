from __future__ import annotations

import pytest

from fel_spark.session import get_spark
from fel_spark.sources.synth import build_dict_pack, synth_transcripts_df


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fel_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def dict_pack():
    return build_dict_pack(n_entities=120, seed=42)


@pytest.fixture(scope="session")
def tiny_corpus(spark, dict_pack):
    """~1k turns with gold mentions, cached for the test session."""
    df = synth_transcripts_df(spark, dict_pack, n_conv=150, turns_per_conv=6)
    df = df.cache()
    df.count()
    return df

"""Blocking: LSH keys group similar surfaces, caps bound block sizes,
pair generation dedups and orders ids."""

from __future__ import annotations

from pyspark.sql import functions as F

from fel_spark.operators import blocking


def _mentions(spark, rows):
    return spark.createDataFrame(
        rows, ["mention_id", "span", "entity_id", "entity_key", "score"]
    )


def test_lsh_groups_typos_and_entity_blocks(spark):
    m = _mentions(
        spark,
        [
            ("m1", "sataka tovson", 1, "_wiki_a", 0.0),
            ("m2", "saaka tovson", 1, "_wiki_a", 0.0),
            ("m3", "совершенно other", 2, "_wiki_b", 0.0),
        ],
    )
    blocked = blocking.blocking_keys(m)
    keys = {
        r["mention_id"]: set(v["block_key"] for v in blocked.filter(F.col("mention_id") == r["mention_id"]).collect())
        for r in m.collect()
    }
    # typo pair shares at least one LSH band; entity block shared too
    assert keys["m1"] & keys["m2"]
    assert "e1" in keys["m1"] and "e1" in keys["m2"]
    assert not (keys["m1"] & keys["m3"])


def test_cap_blocks_bounds_size(spark):
    rows = [(f"m{i:03d}", "same span", 1, "_wiki_a", 0.0) for i in range(100)]
    blocked = blocking.blocking_keys(_mentions(spark, rows), use_entity_block=True)
    capped = blocking.cap_blocks(blocked, max_block=30)
    sizes = capped.groupBy("block_key").count().collect()
    assert max(r["count"] for r in sizes) <= 30 + 5  # hash salting is approximate
    # every original key survives as a prefix
    assert capped.count() == blocked.count()


def test_candidate_pairs_order_and_dedup(spark):
    m = _mentions(
        spark,
        [
            ("m1", "alpha beta", 1, "_wiki_a", 0.0),
            ("m2", "alpha beta", 1, "_wiki_a", 0.0),
        ],
    )
    blocked = blocking.blocking_keys(m)
    pairs = blocking.candidate_pairs(blocked).collect()
    # identical spans share several keys -> still exactly one pair, a < b
    assert len(pairs) == 1
    assert pairs[0]["mention_id_a"] == "m1" and pairs[0]["mention_id_b"] == "m2"


def test_capped_block_stats_quantifies_drop(spark):
    """The audit row matches hand-computed hot-block volume."""
    from fel_spark.operators import blocking
    from pyspark.sql import functions as F

    rows = [("hot", f"m{i}") for i in range(10)] + [("cold", "x"), ("cold", "y")]
    blocked = spark.createDataFrame(rows, ["block_key", "mention_id"])
    got = blocking.capped_block_stats(blocked, max_block=4).collect()[0]
    assert got["n_hot_blocks"] == 1
    assert got["rows_in_hot_blocks"] == 10
    assert got["pairs_before_cap"] == 45  # C(10,2)
    # 3 shards of ~3.33 rows -> well under 45
    assert 0 < got["est_pairs_after_cap"] < 45

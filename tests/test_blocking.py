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

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


def test_snm_pairs_hand_example_and_prefix_invariance(spark):
    from fel_spark.operators.blocking import sorted_neighborhood_pairs

    # sorted key order: aa(1) ab(2) ac(3) ba(4) bb(5) — window 3 pairs
    # every rank distance <= 2
    rows = [(10, "ba"), (11, "aa"), (12, "ac"), (13, "bb"), (14, "ab")]
    df = spark.createDataFrame(rows, "record_id int, k string")
    got = {
        (r["id_a"], r["id_b"]): (r["rank_a"], r["rank_b"])
        for r in sorted_neighborhood_pairs(df, "k", window=3).collect()
    }
    # ranks: 11->1, 14->2, 12->3, 10->4, 13->5
    expect = {
        (11, 14): (1, 2), (11, 12): (1, 3), (14, 12): (2, 3),
        (14, 10): (2, 4), (12, 10): (3, 4), (12, 13): (3, 5),
        (10, 13): (4, 5),
    }
    assert got == expect
    # result invariant to prefix_len AND to input partitioning
    for pl in (1, 3, 10):
        alt = {
            (r["id_a"], r["id_b"]): (r["rank_a"], r["rank_b"])
            for r in sorted_neighborhood_pairs(
                df.repartition(4), "k", window=3, prefix_len=pl
            ).collect()
        }
        assert alt == expect, pl


def test_snm_pairs_null_keys_sort_first_and_window2(spark):
    from fel_spark.operators.blocking import sorted_neighborhood_pairs

    rows = [(1, None), (2, "a"), (3, "b")]
    df = spark.createDataFrame(rows, "record_id int, k string")
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(df, "k", window=2).collect()
    )
    # window 2 -> only adjacent pairs; null ('' after coalesce) is rank 1
    assert got == [(1, 2), (2, 3)]


def _suffix_replay(rows, min_len=4, max_key=20, max_block=50):
    """Plain-Python replay of suffix_block_pairs semantics."""
    from collections import defaultdict

    blocks = defaultdict(list)
    for rid, key in rows:
        k = (key or "").lower()[:max_key]
        if len(k) < min_len:
            continue
        for i in range(len(k) - min_len + 1):
            blocks[k[i:]].append(rid)
    pairs = defaultdict(int)
    for members in blocks.values():
        if not (2 <= len(members) <= max_block):
            continue
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs[(ms[i], ms[j])] += 1
    return dict(pairs)


def test_suffix_blocking_catches_leading_corruption(spark):
    df = spark.createDataFrame(
        [
            (1, "John Smith"),
            (2, "Xohn Smith"),  # head typo: prefix blocking misses it
            (3, "completely other"),
        ],
        ["record_id", "name"],
    )
    got = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in blocking.suffix_block_pairs(
            df, "name", min_suffix_len=4
        ).collect()
    }
    assert (1, 2) in got
    # "ohn smith"(9) .. "mith"(4): 6 shared suffixes
    assert got[(1, 2)] == 6
    assert all(3 not in p for p in got)


def test_suffix_blocking_matches_python_replay(spark):
    rows = [
        (i, f"{'xy'[i % 2]}{i % 5}_tail_{'ab'[i % 2]}{i % 3}")
        for i in range(40)
    ] + [(99, None), (98, "ab")]  # null + too-short keys drop out
    df = spark.createDataFrame(rows, ["record_id", "name"])
    got = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in blocking.suffix_block_pairs(
            df, "name", min_suffix_len=4, max_block=50
        ).collect()
    }
    assert got == _suffix_replay(rows)


def test_suffix_blocking_max_block_drops_common_tail(spark):
    # 15 records all ending "_common_tail" -> every shared suffix block
    # is above max_block=10; the distinct-head suffixes are singletons
    rows = [(i, f"{chr(97 + i)}_common_tail") for i in range(15)]
    df = spark.createDataFrame(rows, ["record_id", "name"])
    out = blocking.suffix_block_pairs(
        df, "name", min_suffix_len=4, max_block=10
    )
    assert out.count() == 0
    assert _suffix_replay(rows, max_block=10) == {}


def _dynamic_replay(rows, keys, max_block):
    """Plain-Python replay of dynamic_block_assign semantics."""
    from collections import Counter

    sent = lambda v: "\x00null" if v is None else str(v)
    cnts = [
        Counter(tuple(sent(r[k]) for k in keys[: l + 1]) for r in rows)
        for l in range(len(keys))
    ]
    out = {}
    for r in rows:
        for l in range(len(keys)):
            pfx = tuple(sent(r[k]) for k in keys[: l + 1])
            if cnts[l][pfx] <= max_block:
                out[r["record_id"]] = (l + 1, "\x1f".join(pfx))
                break
    return out


def test_dynamic_blocking_three_levels_and_drop(spark):
    # 'hot' needs 2 levels; ('hot','a') still hot -> level 3;
    # ('hot','a','x') stays oversized -> dropped; 'cold' fits at level 1
    rows = (
        [{"record_id": i, "a": "hot", "b": "a", "c": "x"} for i in range(10)]
        + [{"record_id": 10 + i, "a": "hot", "b": "a", "c": f"y{i}"} for i in range(3)]
        + [{"record_id": 20 + i, "a": "hot", "b": f"b{i}", "c": "z"} for i in range(4)]
        + [{"record_id": 30 + i, "a": "cold", "b": "q", "c": None} for i in range(2)]
    )
    df = spark.createDataFrame(rows)
    got = {
        r["record_id"]: (r["level"], r["block_key"])
        for r in blocking.dynamic_block_assign(
            df, ["a", "b", "c"], max_block=4
        ).collect()
    }
    exp = _dynamic_replay(rows, ["a", "b", "c"], 4)
    assert got == exp
    # the 10-record ('hot','a','x') leaf is oversized at every level
    assert all(i not in got for i in range(10))
    # null key value lands in a block via the sentinel, not dropped
    assert got[30] == (1, "cold")
    assert got[21] == (2, "hot\x1fb1")
    assert got[11][0] == 3


def test_dynamic_blocking_matches_replay_single_key(spark):
    rows = [{"record_id": i, "a": f"g{i % 7}"} for i in range(50)]
    df = spark.createDataFrame(rows)
    got = {
        r["record_id"]: (r["level"], r["block_key"])
        for r in blocking.dynamic_block_assign(df, ["a"], max_block=8).collect()
    }
    assert got == _dynamic_replay(rows, ["a"], 8)

"""PageRank / RRF fusion / priority sampling / tool transitions.

Parity strategy: PageRank against a NumPy power iteration of the same
formulation (uniform dangling redistribution) on a hand-built graph with
a dangling node and a cycle; RRF against a hand-computed fusion; priority
sampling against a plain-Python replay of the identical hash arithmetic;
tool transitions against hand-counted adjacency on a fixture transcript.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from fel_spark.functions.hashing import md5_hash60
from fel_spark.operators.convstats import tool_transitions
from fel_spark.operators.graphrank import pagerank
from fel_spark.operators.retrieval import bm25_topk, rrf_fuse
from fel_spark.operators.splits import priority_sample


def _numpy_pagerank(edges, iterations, damping):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in edges:
        out[idx[u]] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.zeros(n)
        for u, v in edges:
            nxt[idx[v]] += pr[idx[u]] / out[idx[u]]
        dangling = pr[out == 0].sum()
        pr = (1 - damping) / n + damping * (nxt + dangling / n)
    return {node: pr[idx[node]] for node in nodes}


def test_pagerank_matches_numpy_power_iteration(spark):
    # cycle a->b->c->a, plus a->d where d is dangling, plus e->a
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("e", "a")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["pr"] for r in pagerank(df, iterations=4).collect()}
    want = _numpy_pagerank(edges, iterations=4, damping=0.85)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k
    assert abs(sum(got.values()) - 1.0) < 1e-12


def test_pagerank_mass_conserved_with_all_dangling_sinks(spark):
    # star: hub -> 3 leaves (all dangling)
    df = spark.createDataFrame(
        [("h", "l1"), ("h", "l2"), ("h", "l3")], ["src", "dst"]
    )
    got = {r["node"]: r["pr"] for r in pagerank(df, iterations=6).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-12
    assert got["l1"] == got["l2"] == got["l3"]
    want = _numpy_pagerank(
        [("h", "l1"), ("h", "l2"), ("h", "l3")], 6, 0.85
    )
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_rrf_fuse_hand_computed(spark):
    a = spark.createDataFrame(
        [("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3)],
        ["query_id", "doc_id", "rank"],
    )
    b = spark.createDataFrame(
        [("q1", "d2", 1), ("q1", "d4", 2)],
        ["query_id", "doc_id", "rank"],
    )
    out = {
        r["doc_id"]: (r["rrf_micro"], r["n_lists"], r["rank"])
        for r in rrf_fuse([a, b], k=4).collect()
    }
    # d2: 1/62 + 1/61; d1: 1/61; d4: 1/62; d3: 1/63
    assert out["d2"][0] == round((1 / 62 + 1 / 61) * 1e6)
    assert out["d1"][0] == round(1 / 61 * 1e6)
    assert out["d2"][1] == 2 and out["d1"][1] == 1
    assert [k for k, v in sorted(out.items(), key=lambda kv: kv[1][2])] == [
        "d2",
        "d1",
        "d4",
        "d3",
    ]


def test_rrf_with_bm25_and_cosine_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta doc {i} " + "gamma " * (i % 3)) for i in range(20)],
        ["doc_id", "text"],
    )
    q = spark.createDataFrame(
        [("q1", "alpha"), ("q1", "gamma")], ["query_id", "term"]
    )
    lex = bm25_topk(docs, q, k=5)
    # a second "dense" list: reuse bm25 on one term as a stand-in ranking
    dense = bm25_topk(docs, q.filter(F.col("term") == "gamma"), k=5)
    f1 = rrf_fuse([lex, dense], k=5).collect()
    f2 = rrf_fuse([lex, dense], k=5).collect()
    assert sorted(map(tuple, f1)) == sorted(map(tuple, f2))
    assert len(f1) == 5


def test_priority_sample_matches_python_replay(spark):
    rows = [(i, (i % 7) + 1) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = [
        (r["doc_id"], r["sample_rank"])
        for r in priority_sample(
            df, 50, "w", hash_fn=lambda c: md5_hash60(c, seed=7)
        ).collect()
    ]
    import hashlib

    def h60(x):
        return int(hashlib.md5(f"7:{x}".encode()).hexdigest()[:15], 16)

    pri = sorted(
        ((w / ((h60(i) + 1) / 2**60), i) for i, w in rows),
        key=lambda t: (-t[0], t[1]),
    )
    want = [(i, r + 1) for r, (_, i) in enumerate(pri[:50])]
    assert sorted(got, key=lambda t: t[1]) == want


def test_priority_sample_partition_invariant_and_weight_biased(spark):
    rows = [(i, 100 if i < 50 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    a = sorted(r["doc_id"] for r in priority_sample(df, 100, "w").collect())
    b = sorted(
        r["doc_id"]
        for r in priority_sample(df.repartition(13), 100, "w").collect()
    )
    assert a == b and len(a) == 100
    heavy = sum(1 for i in a if i < 50)
    # 50 ids carry weight 100 vs 950 ids at weight 1: nearly all heavy
    # ids should be sampled
    assert heavy >= 45


def test_priority_sample_per_group_quota(spark):
    rows = [(i, 1 + i % 3, "g" + str(i % 2)) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "w", "g"])
    out = priority_sample(df, 10, "w", group_cols=("g",)).collect()
    per = {}
    for r in out:
        per[r["g"]] = per.get(r["g"], 0) + 1
    assert per == {"g0": 10, "g1": 10}


def test_tool_transitions_hand_counted(spark):
    t = spark.createDataFrame(
        [
            ("c1", 0, "user", "", None),
            ("c1", 1, "assistant", "", "search"),
            ("c1", 2, "tool", "", None),
            ("c1", 3, "assistant", "", "browse"),
            ("c1", 4, "assistant", "", "search"),
            ("c2", 0, "assistant", "", "search"),
            ("c2", 1, "assistant", "", "browse"),
            ("c2", 2, "assistant", "", "browse"),
        ],
        ["conv_id", "turn_idx", "role", "text", "tool"],
    )
    out = {
        (r["tool"], r["next_tool"]): (r["n"], r["p_6dp"], r["rank"])
        for r in tool_transitions(t).collect()
    }
    # c1 tool-bearing: search,browse,search -> (search,browse),(browse,search)
    # c2: search,browse,browse -> (search,browse),(browse,browse)
    assert out[("search", "browse")] == (2, 1000000, 1)
    assert out[("browse", "search")][0] == 1
    assert out[("browse", "browse")][0] == 1
    assert out[("browse", "search")][1] == 500000
    # neutral tie-break: browse->browse (n=1) ranks before browse->search
    assert out[("browse", "browse")][2] == 1
    assert out[("browse", "search")][2] == 2


def test_key_skew_report_exact_and_surfaces_hot_lsh_band(spark):
    from fel_spark.operators.blocking import (
        blocking_keys,
        cap_blocks,
        key_skew_report,
    )

    # exact replay on a known distribution
    rows = [(i, "k" + str(i % 5)) for i in range(100)]
    df = spark.createDataFrame(rows, ["rid", "key"])
    rep = key_skew_report(df, ["key"], 3).collect()
    assert len(rep) == 3
    assert rep[0]["n_keys"] == 5 and rep[0]["total_rows"] == 100
    assert {r["key"]: r["n"] for r in rep} == {"k0": 20, "k1": 20, "k2": 20}
    assert all(r["share_6dp"] == 200000 for r in rep)
    assert [r["key"] for r in sorted(rep, key=lambda r: r["rank"])] == [
        "k0",
        "k1",
        "k2",
    ]

    # the ER use: a planted hot alias floods one LSH band key; the
    # report surfaces it ex ante, and cap_blocks then bounds it
    mentions = spark.createDataFrame(
        [(i, "acme corporation", i % 7) for i in range(300)]
        + [(1000 + i, f"unique alias {i} xq{i}", i) for i in range(60)],
        ["mention_id", "span", "entity_id"],
    )
    blocked = blocking_keys(mentions, use_entity_block=False)
    rep = key_skew_report(blocked, ["block_key"], 5).collect()
    # every band key of the planted alias holds >= 300 rows; the top
    # entries must all be hot and carry the dominant share
    assert rep[0]["n"] >= 300
    hot_key = rep[0]["block_key"]
    capped = cap_blocks(blocked, max_block=64)
    sizes = {
        r["block_key"]: r["n"]
        for r in capped.groupBy("block_key").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert hot_key not in sizes  # the hot key was salted into shards
    assert all(
        n <= 64 + 8 for k, n in sizes.items() if k.startswith(hot_key)
    )


def test_bcubed_ari_against_python_replay(spark):
    from collections import Counter

    from fel_spark.operators.evalmetrics import bcubed_ari

    rows = [(i, i % 6, (i % 6) if i % 4 else 99) for i in range(120)]
    df = spark.createDataFrame(rows, ["rid", "gold", "pred"])
    got = bcubed_ari(df).collect()[0]

    cells = Counter((p, g) for _, g, p in rows)
    pn = Counter()
    gn = Counter()
    for (p, g), c in cells.items():
        pn[p] += c
        gn[g] += c
    n = sum(cells.values())
    sp = sum(c * c / pn[p] for (p, g), c in cells.items())
    sg = sum(c * c / gn[g] for (p, g), c in cells.items())
    a = sum(c * (c - 1) // 2 for c in cells.values())
    b1 = sum(c * (c - 1) // 2 for c in pn.values())
    b2 = sum(c * (c - 1) // 2 for c in gn.values())
    e = b1 * b2 / (n * (n - 1) / 2)
    m = (b1 + b2) / 2.0
    p_, r_ = sp / n, sg / n
    assert got["n_records"] == n
    assert got["b3_p_micro"] == round(p_ * 1e6)
    assert got["b3_r_micro"] == round(r_ * 1e6)
    assert got["b3_f1_micro"] == round(2.0 * p_ * r_ / (p_ + r_) * 1e6)
    assert got["ari_micro"] == round((a - e) / (m - e) * 1e6)


def test_bcubed_ari_perfect_clustering_is_all_ones(spark):
    from fel_spark.operators.evalmetrics import bcubed_ari

    df = spark.createDataFrame(
        [(i, i % 4, 10 + i % 4) for i in range(40)], ["rid", "gold", "pred"]
    )
    got = bcubed_ari(df).collect()[0]
    assert (
        got["b3_p_micro"]
        == got["b3_r_micro"]
        == got["b3_f1_micro"]
        == got["ari_micro"]
        == 1000000
    )

"""Connected components: known graphs, determinism, isolated vertices."""

from __future__ import annotations

from fel_spark.operators.cluster import cluster_mentions, connected_components


def test_two_components_and_chain(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["src", "dst"]
    )
    got = {
        r["id"]: r["component"] for r in connected_components(edges).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_long_chain_converges(spark):
    n = 12
    edges = spark.createDataFrame(
        [(f"v{i:02d}", f"v{i + 1:02d}") for i in range(n)], ["src", "dst"]
    )
    got = connected_components(edges).collect()
    assert {r["component"] for r in got} == {"v00"}


def test_driver_and_distributed_paths_agree(spark):
    """The union-find fast path and the hash-min loop must be byte-identical
    on the same graph (components labeled by min reachable id)."""
    import random

    rng = random.Random(7)
    n = 120
    edges_py = [
        (f"n{rng.randrange(n):03d}", f"n{rng.randrange(n):03d}")
        for _ in range(150)
    ]
    edges = spark.createDataFrame(edges_py, ["src", "dst"])
    fast = {
        r["id"]: r["component"]
        for r in connected_components(edges).collect()
    }
    dist = {
        r["id"]: r["component"]
        for r in connected_components(edges, driver_cc_max_edges=0).collect()
    }
    assert fast == dist and len(fast) > 0


def test_driver_path_self_loop_vertex_survives(spark):
    edges = spark.createDataFrame([("a", "b"), ("z", "z")], ["src", "dst"])
    got = {
        r["id"]: r["component"] for r in connected_components(edges).collect()
    }
    assert got == {"a": "a", "b": "a", "z": "z"}


def test_isolated_vertices_become_singletons(spark):
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    mentions = spark.createDataFrame(
        [("a",), ("b",), ("solo",)], ["mention_id"]
    )
    got = {
        r["mention_id"]: r["cluster_id"]
        for r in cluster_mentions(mentions, edges).collect()
    }
    assert got == {"a": "a", "b": "a", "solo": "solo"}


def test_cc_matches_union_find_reference(spark):
    """Ground truth: both CC paths must equal a plain-Python min-label
    union-find on random multigraphs (self-loops, duplicate + reversed
    edges) — path-agreement alone can't catch a bug shared by both."""
    import random

    def uf_reference(edges_py):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for s, d in edges_py:
            rs, rd = find(s), find(d)
            if rs != rd:
                parent[rs] = rd
        comp = {}
        for v in list(parent):
            comp.setdefault(find(v), []).append(v)
        return {v: min(members) for members in comp.values() for v in members}

    for seed, n, m in [(1, 30, 20), (2, 60, 90), (3, 10, 40)]:
        rng = random.Random(seed)
        edges_py = [
            (f"n{rng.randrange(n):03d}", f"n{rng.randrange(n):03d}")
            for _ in range(m)
        ]
        edges_py += [(d, s) for s, d in edges_py[: m // 4]]  # reversed dups
        want = uf_reference(edges_py)
        edges = spark.createDataFrame(edges_py, ["src", "dst"])
        for kw in ({}, {"driver_cc_max_edges": 0}):
            got = {
                r["id"]: r["component"]
                for r in connected_components(edges, **kw).collect()
            }
            assert got == want, (seed, kw)

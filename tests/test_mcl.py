"""Quantized MCL: exact-integer plain-Python replay and the barbell
flow-separation property."""

from __future__ import annotations

import random

from fel_spark.operators.mcl import mcl_clusters, mcl_matrix

SCALE = 1_000_000


def _py_mcl_matrix(edges, n_iter, prune):
    """Plain replay of the quantized rounds. ``edges`` = [(a, b, w)]."""
    from collections import defaultdict

    m = defaultdict(int)
    for a, b, w in edges:
        m[(a, b)] += 0  # keys only; weights assigned below
    m = {}
    for a, b, w in edges:
        m[(a, b)] = w
        m[(b, a)] = w
    colmax = defaultdict(int)
    for (r, c), p in m.items():
        colmax[c] = max(colmax[c], p)
    for c, w in colmax.items():
        m[(c, c)] = w

    def normalize(d, floor_at=1):
        s = defaultdict(int)
        for (r, c), p in d.items():
            s[c] += p
        out = {}
        for (r, c), p in d.items():
            q = (p * SCALE) // s[c]
            if q >= floor_at:
                out[(r, c)] = q
        return out

    e = normalize(m)
    for _ in range(n_iter):
        ex = defaultdict(int)
        by_k_left = defaultdict(list)   # k -> [(r, p)]
        by_k_right = defaultdict(list)  # k -> [(c, p)]
        for (r, k), p in e.items():
            by_k_left[k].append((r, p))
        for (k, c), p in e.items():
            by_k_right[k].append((c, p))
        for k in by_k_left:
            for r, pl in by_k_left[k]:
                for c, pr in by_k_right.get(k, []):
                    ex[(r, c)] += pl * pr
        nx = normalize(ex)
        inf = {k: v * v for k, v in nx.items()}
        e = normalize(inf, floor_at=prune)
    return e


def _py_mcl_clusters(edges, n_iter, prune):
    e = _py_mcl_matrix(edges, n_iter, prune)
    best = {}
    for (r, c), p in e.items():
        cur = best.get(c)
        if cur is None or (p, -r) > (cur[1], -cur[0]):
            best[c] = (r, p)
    return {c: rp for c, rp in best.items()}


def _edges_df(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long, w long")


def test_mcl_matrix_replay_fuzz(spark):
    rng = random.Random(79)
    for trial in range(2):
        edges = {}
        while len(edges) < 40:
            a, b = rng.randint(0, 19), rng.randint(0, 19)
            if a != b:
                edges[(min(a, b), max(a, b))] = rng.randint(1, 100)
        rows = [(a, b, w) for (a, b), w in sorted(edges.items())]
        got = {
            (r["r"], r["c"]): r["p"]
            for r in mcl_matrix(
                _edges_df(spark, rows), weight_col="w", n_iter=2
            ).collect()
        }
        assert got == _py_mcl_matrix(rows, 2, 1000), f"trial {trial}"


def test_mcl_clusters_replay_fuzz(spark):
    rng = random.Random(83)
    edges = {}
    while len(edges) < 35:
        a, b = rng.randint(0, 17), rng.randint(0, 17)
        if a != b:
            edges[(min(a, b), max(a, b))] = rng.randint(1, 50)
    rows = [(a, b, w) for (a, b), w in sorted(edges.items())]
    got = {
        r["id"]: (r["attractor"], r["p_micro"])
        for r in mcl_clusters(
            _edges_df(spark, rows), weight_col="w", n_iter=2
        ).collect()
    }
    assert got == _py_mcl_clusters(rows, 2, 1000)


def test_mcl_barbell_separates_flow(spark):
    # two strong triangles joined by ONE weak bridge: reachability (CC)
    # merges them; MCL's flow decays across the bottleneck, so the two
    # sides keep distinct attractors.
    heavy, light = 100, 1
    rows = [
        (0, 1, heavy), (0, 2, heavy), (1, 2, heavy),
        (10, 11, heavy), (10, 12, heavy), (11, 12, heavy),
        (2, 10, light),
    ]
    got = {
        r["id"]: r["attractor"]
        for r in mcl_clusters(
            _edges_df(spark, rows), weight_col="w", n_iter=3
        ).collect()
    }
    left = {got[v] for v in (0, 1, 2)}
    right = {got[v] for v in (10, 11, 12)}
    assert left.isdisjoint(right), (left, right)

"""Assignment matching + star clustering: sequential-greedy parity,
plain-Python star replay, pinned examples, plan shape."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from fel_spark.operators.matching import (
    canopy_clusters,
    merge_center_clusters,
    mutual_best_matches,
    one_to_one_greedy,
    pivot_clusters,
    star_clusters,
)


def _pairs_df(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long, score long")


# ---------------------------------------------------------------------------
# sequential greedy replay (the textbook algorithm)


def _seq_greedy(edges):
    """Greedy matching by (score DESC, id_a ASC, id_b ASC)."""
    used_a, used_b, out = set(), set(), []
    for a, b, s in sorted(edges, key=lambda e: (-e[2], e[0], e[1])):
        if a not in used_a and b not in used_b:
            used_a.add(a)
            used_b.add(b)
            out.append((a, b, s))
    return set(out)


def test_mutual_best_pinned(spark):
    # 1 prefers 20 (score 9); 20 prefers 1 -> mutual.
    # 2 prefers 20 too but loses; 2's best remaining (21, 5) is mutual
    # only if 21 prefers 2 — it does.
    rows = [
        (1, 20, 9),
        (2, 20, 8),
        (2, 21, 5),
        (3, 21, 4),
    ]
    out = {
        (r["id_a"], r["id_b"])
        for r in mutual_best_matches(_pairs_df(spark, rows)).collect()
    }
    assert out == {(1, 20)}  # (2,21) is NOT mutual-best: 2's best is 20
    # one-to-one greedy picks it up in round 2
    full = {
        (r["id_a"], r["id_b"], r["round"])
        for r in one_to_one_greedy(
            _pairs_df(spark, rows), max_rounds=4, checkpoint=False
        ).collect()
    }
    assert full == {(1, 20, 1), (2, 21, 2)}


def test_one_to_one_greedy_equals_sequential_greedy_fuzz(spark):
    """Locally-dominant rounds to convergence == sequential greedy under
    the shared total edge order (Preis 1999)."""
    rng = random.Random(7)
    for trial in range(3):
        n_a, n_b = 25, 25
        edges = set()
        while len(edges) < 120:
            a = rng.randint(0, n_a - 1)
            b = 100 + rng.randint(0, n_b - 1)
            edges.add((a, b))
        rows = [(a, b, rng.randint(1, 40)) for a, b in sorted(edges)]
        got = {
            (r["id_a"], r["id_b"], r["score"])
            for r in one_to_one_greedy(
                _pairs_df(spark, rows), max_rounds=60
            ).collect()
        }
        assert got == _seq_greedy(rows), f"trial {trial}"


def test_one_to_one_vertices_unique(spark):
    rng = random.Random(11)
    rows = [
        (rng.randint(0, 10), 50 + rng.randint(0, 10), rng.randint(1, 5))
        for _ in range(60)
    ]
    rows = list({(a, b): (a, b, s) for a, b, s in rows}.values())
    out = one_to_one_greedy(_pairs_df(spark, rows), max_rounds=40).collect()
    a_ids = [r["id_a"] for r in out]
    b_ids = [r["id_b"] for r in out]
    assert len(a_ids) == len(set(a_ids))
    assert len(b_ids) == len(set(b_ids))


# ---------------------------------------------------------------------------
# star clustering


def _py_star(edges):
    """Plain replay of the one-shot parallel star definition."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(ws) for v, ws in adj.items()}

    def dominates(w, v):
        return deg[w] > deg[v] or (deg[w] == deg[v] and w < v)

    centers = {v for v in adj if not any(dominates(w, v) for w in adj[v])}
    out = {}
    for v in adj:
        if v in centers:
            out[v] = (v, 1)
        else:
            cand = [(w, deg[w]) for w in adj[v] if w in centers]
            if cand:
                best = min(cand, key=lambda t: (-t[1], t[0]))[0]
                out[v] = (best, 0)
            else:
                out[v] = (v, 0)
    return out


def test_star_clusters_replay_fuzz(spark):
    rng = random.Random(23)
    for trial in range(3):
        edges = set()
        while len(edges) < 70:
            a, b = rng.randint(0, 39), rng.randint(0, 39)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        rows = [(a, b) for a, b in sorted(edges)]
        df = spark.createDataFrame(rows, "id_a long, id_b long")
        got = {
            r["id"]: (r["cluster_id"], r["is_center"])
            for r in star_clusters(df).collect()
        }
        assert got == _py_star(rows), f"trial {trial}"


def test_star_centers_independent_and_no_chains(spark):
    # path graph 0-1-2-3-4: CC would merge all five; star must not.
    rows = [(0, 1), (1, 2), (2, 3), (3, 4)]
    df = spark.createDataFrame(rows, "id_a long, id_b long")
    got = {
        r["id"]: (r["cluster_id"], r["is_center"])
        for r in star_clusters(df).collect()
    }
    centers = {v for v, (_, c) in got.items() if c == 1}
    # centers form an independent set
    for a, b in rows:
        assert not (a in centers and b in centers), (a, b)
    # no cluster spans the whole path
    clusters = {c for c, _ in got.values()}
    assert len(clusters) >= 2
    # every member is adjacent to its center (or is its own cluster)
    adj = {(a, b) for a, b in rows} | {(b, a) for a, b in rows}
    for v, (c, is_c) in got.items():
        assert is_c == 1 or c == v or (v, c) in adj


# ---------------------------------------------------------------------------
# merge-center clustering


def _py_merge_center(edges):
    """Plain replay: star centers, then BFS components over the subgraph
    of edges incident to >=1 center; everything else is a singleton."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(ws) for v, ws in adj.items()}

    def dominates(w, v):
        return deg[w] > deg[v] or (deg[w] == deg[v] and w < v)

    centers = {v for v in adj if not any(dominates(w, v) for w in adj[v])}
    kadj = defaultdict(set)
    for a, b in edges:
        if a in centers or b in centers:
            kadj[a].add(b)
            kadj[b].add(a)
    out = {}
    for v in sorted(adj):
        if v in out:
            continue
        comp, stack = {v}, [v]
        while stack:
            u = stack.pop()
            for w in kadj[u]:
                if w not in comp:
                    comp.add(w)
                    stack.append(w)
        root = min(comp)
        for u in comp:
            out[u] = (root, 1 if u in centers else 0)
    return out


def test_merge_center_replay_fuzz(spark):
    rng = random.Random(47)
    for trial in range(3):
        edges = set()
        while len(edges) < 70:
            a, b = rng.randint(0, 39), rng.randint(0, 39)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        rows = [(a, b) for a, b in sorted(edges)]
        df = spark.createDataFrame(rows, "id_a long, id_b long")
        got = {
            r["id"]: (r["cluster_id"], r["is_center"])
            for r in merge_center_clusters(df).collect()
        }
        assert got == _py_merge_center(rows), f"trial {trial}"


def test_merge_center_between_star_and_cc(spark):
    # Two stars (centers 0 and 4) sharing member 1, plus a center-free
    # pendant chain 3-7-8. Star keeps the stars apart; CC would merge
    # everything including the chain; merge-center merges the stars
    # through the shared member but the chain does NOT conduct.
    rows = [(0, 1), (0, 2), (0, 3), (1, 4), (4, 5), (4, 6), (3, 7), (7, 8)]
    df = spark.createDataFrame(rows, "id_a long, id_b long")
    got = {
        r["id"]: (r["cluster_id"], r["is_center"])
        for r in merge_center_clusters(df).collect()
    }
    centers = {v for v, (_, c) in got.items() if c == 1}
    assert centers == {0, 4}
    # stars merged through shared member 1
    assert {got[v][0] for v in (0, 1, 2, 3, 4, 5, 6)} == {0}
    # the center-free chain segment stays out
    assert got[7] == (7, 0) and got[8] == (8, 0)
    # star_clusters on the same graph keeps the two stars apart
    star = {
        r["id"]: r["cluster_id"] for r in star_clusters(df).collect()
    }
    assert star[5] == 4 and star[2] == 0 and star[5] != star[2]


def test_merge_center_refines_cc_and_is_refined_by_star(spark):
    # fuzz property: star partition <= merge-center partition <= CC
    from fel_spark.operators.cluster import connected_components

    rng = random.Random(53)
    edges = set()
    while len(edges) < 60:
        a, b = rng.randint(0, 34), rng.randint(0, 34)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    rows = [(a, b) for a, b in sorted(edges)]
    df = spark.createDataFrame(rows, "id_a long, id_b long")
    mc = {
        r["id"]: r["cluster_id"]
        for r in merge_center_clusters(df).collect()
    }
    star = {r["id"]: r["cluster_id"] for r in star_clusters(df).collect()}
    cc = {
        r["id"]: r["component"]
        for r in connected_components(
            df.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        ).collect()
    }
    for u in mc:
        for v in mc:
            if star[u] == star[v]:
                assert mc[u] == mc[v], (u, v)
            if mc[u] == mc[v]:
                assert cc[u] == cc[v], (u, v)


# ---------------------------------------------------------------------------
# parallel-pivot correlation clustering


def _py_pivot(edges, max_rounds):
    """Plain replay of the deterministic parallel-pivot rounds."""
    import hashlib
    from collections import defaultdict

    def o(v):
        return hashlib.md5(str(v).encode()).hexdigest()

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    active = set(adj)
    out = {}
    for rnd in range(1, max_rounds + 1):
        if not active:
            break
        pivots = {
            v
            for v in active
            if all(o(v) < o(w) for w in adj[v] if w in active)
        }
        for v in pivots:
            out[v] = (v, rnd)
        assigned = {}
        for v in active - pivots:
            cand = [w for w in adj[v] if w in pivots]
            if cand:
                assigned[v] = min(cand, key=o)
        for v, c in assigned.items():
            out[v] = (c, rnd)
        active -= pivots | set(assigned)
    for v in active:
        out[v] = (v, 0)
    return out


def test_pivot_clusters_replay_fuzz(spark):
    rng = random.Random(31)
    for trial, rounds in [(0, 1), (1, 2), (2, 4)]:
        edges = set()
        while len(edges) < 70:
            a, b = rng.randint(0, 39), rng.randint(0, 39)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        rows = [(a, b) for a, b in sorted(edges)]
        df = spark.createDataFrame(rows, "id_a long, id_b long")
        got = {
            r["id"]: (r["cluster_id"], r["round"])
            for r in pivot_clusters(df, max_rounds=rounds).collect()
        }
        assert got == _py_pivot(rows, rounds), f"trial {trial}"


def test_pivot_clusters_radius_one_partition(spark):
    # path 0-1-...-9: every cluster must have radius 1 around its pivot
    # (no chain merges), every vertex exactly one row, pivots
    # self-clustered.
    rows = [(i, i + 1) for i in range(9)]
    df = spark.createDataFrame(rows, "id_a long, id_b long")
    out = pivot_clusters(df, max_rounds=6).collect()
    assert len(out) == 10 and len({r["id"] for r in out}) == 10
    adj = {(a, b) for a, b in rows} | {(b, a) for a, b in rows}
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r["id"])
        assert r["id"] == r["cluster_id"] or (r["id"], r["cluster_id"]) in adj
    # a generous round bound resolves the whole path: no round-0 leftovers
    assert all(r["round"] >= 1 for r in out)
    # pivots own their clusters
    for c in by_cluster:
        assert c in by_cluster[c] or [c] == by_cluster[c]


def test_pivot_clusters_bounded_prefix_leftovers(spark):
    # max_rounds=1 on a dense-ish graph leaves round-0 singletons that a
    # deeper run resolves; the round-1 prefix must agree between runs.
    rng = random.Random(47)
    edges = set()
    while len(edges) < 60:
        a, b = rng.randint(0, 24), rng.randint(0, 24)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    df = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    one = {
        r["id"]: (r["cluster_id"], r["round"])
        for r in pivot_clusters(df, max_rounds=1).collect()
    }
    deep = {
        r["id"]: (r["cluster_id"], r["round"])
        for r in pivot_clusters(df, max_rounds=8).collect()
    }
    for v, (c, rnd) in one.items():
        if rnd == 1:
            assert deep[v] == (c, 1)
        else:
            assert rnd == 0 and deep[v][1] != 1


# ---------------------------------------------------------------------------
# canopy clustering


def _py_canopy_rounds(scored, t_loose, t_tight, max_rounds):
    """Plain replay of the deterministic parallel canopy rounds."""
    import hashlib
    from collections import defaultdict

    def o(v):
        return hashlib.md5(str(v).encode()).hexdigest()

    loose, tight = defaultdict(set), defaultdict(set)
    for a, b, s in scored:
        if s >= t_loose:
            loose[a].add(b)
            loose[b].add(a)
        if s >= t_tight:
            tight[a].add(b)
            tight[b].add(a)
    cand = set(loose)
    out = set()
    for rnd in range(1, max_rounds + 1):
        if not cand:
            break
        centers = {
            v
            for v in cand
            if all(o(v) < o(w) for w in tight[v] if w in cand)
        }
        for c in centers:
            out.add((c, c, rnd))
            for v in loose[c]:
                out.add((v, c, rnd))
        removed = set(centers)
        for c in centers:
            removed |= {w for w in tight[c] if w in cand}
        cand -= removed
    covered = {v for v, _, _ in out}
    for v in cand:
        if v not in covered:
            out.add((v, v, 0))
    return out


def _py_canopy_sequential(scored, t_loose, t_tight):
    """The textbook sequential sweep (McCallum et al. 2000) in md5
    order; returns the canopy membership set (ignoring rounds)."""
    import hashlib
    from collections import defaultdict

    def o(v):
        return hashlib.md5(str(v).encode()).hexdigest()

    loose, tight = defaultdict(set), defaultdict(set)
    for a, b, s in scored:
        if s >= t_loose:
            loose[a].add(b)
            loose[b].add(a)
        if s >= t_tight:
            tight[a].add(b)
            tight[b].add(a)
    cand = set(loose)
    out = set()
    for v in sorted(loose, key=o):
        if v not in cand:
            continue
        out.add((v, v))
        for w in loose[v]:
            out.add((w, v))
        cand.discard(v)
        cand -= tight[v]
    return out


def _scored_graph(rng, n, m):
    edges = {}
    while len(edges) < m:
        a, b = rng.randint(0, n - 1), rng.randint(0, n - 1)
        if a != b:
            edges[(min(a, b), max(a, b))] = rng.randint(1, 100)
    return [(a, b, s) for (a, b), s in sorted(edges.items())]


def test_canopy_replay_fuzz(spark):
    rng = random.Random(59)
    for trial, rounds in [(0, 1), (1, 3)]:
        rows = _scored_graph(rng, 30, 80)
        df = _pairs_df(spark, rows)
        got = {
            (r["id"], r["canopy_id"], r["round"])
            for r in canopy_clusters(
                df, t_loose=40, t_tight=75, max_rounds=rounds
            ).collect()
        }
        assert got == _py_canopy_rounds(rows, 40, 75, rounds), trial


def test_canopy_converged_equals_sequential_sweep(spark):
    """Run to convergence, the parallel rounds' centers are the
    lexicographic-first MIS of the tight graph — exactly the sequential
    md5-order sweep's centers, hence identical memberships."""
    rng = random.Random(61)
    for trial in range(2):
        rows = _scored_graph(rng, 25, 70)
        df = _pairs_df(spark, rows)
        got = {
            (r["id"], r["canopy_id"])
            for r in canopy_clusters(
                df, t_loose=30, t_tight=70, max_rounds=40
            ).collect()
            if r["round"] >= 1
        }
        assert got == _py_canopy_sequential(rows, 30, 70), trial


def test_canopy_overlap_and_coverage(spark):
    # two tight-separated centers share a loose-only middle point:
    # the middle must belong to BOTH canopies.
    rows = [(1, 2, 50), (2, 3, 50)]  # loose edges only at t_tight=90
    df = _pairs_df(spark, rows)
    out = canopy_clusters(df, t_loose=40, t_tight=90, max_rounds=4).collect()
    memb = {(r["id"], r["canopy_id"]) for r in out}
    # 1, 2, 3 all candidates; no tight edges -> all three are centers
    assert (2, 1) in memb and (2, 3) in memb and (2, 2) in memb
    assert {v for v, _ in memb} == {1, 2, 3}


def test_matching_plan_no_cartesian(spark):
    rows = [(1, 10, 3), (2, 10, 2), (2, 11, 1)]
    plan = (
        mutual_best_matches(_pairs_df(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Cartesian" not in plan
    star_plan = (
        star_clusters(
            spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Cartesian" not in star_plan


# ---------------------------------------------------------------------------
# label propagation


def _py_lpa(edges, rounds):
    """Plain replay of the deterministic synchronous plurality rounds."""
    from collections import Counter, defaultdict

    adj = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    lab = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v, ws in adj.items():
            votes = Counter(lab[w] for w in ws)
            new[v] = min(votes, key=lambda l: (-votes[l], l))
        lab = new
    return lab


def test_label_propagation_replay_fuzz(spark):
    from fel_spark.operators.matching import label_propagation

    rng = random.Random(61)
    for trial in range(3):
        edges = set()
        while len(edges) < 70:
            a, b = rng.randint(0, 39), rng.randint(0, 39)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        rows = [(a, b) for a, b in sorted(edges)]
        df = spark.createDataFrame(rows, "id_a long, id_b long")
        got = {
            r["id"]: r["cluster_id"]
            for r in label_propagation(df, max_rounds=3).collect()
        }
        assert got == _py_lpa(rows, 3), f"trial {trial}"


def test_label_propagation_bridge_does_not_merge(spark):
    from fel_spark.operators.matching import label_propagation

    # two triangles {0,1,2} and {10,11,12} joined by the single bridge
    # 2-10: CC merges them; LPA's plurality vote keeps each side on its
    # own side's labels (the bridge endpoint is out-voted 2-to-1).
    rows = [(0, 1), (0, 2), (1, 2), (10, 11), (10, 12), (11, 12), (2, 10)]
    df = spark.createDataFrame(rows, "id_a long, id_b long")
    got = {
        r["id"]: r["cluster_id"]
        for r in label_propagation(df, max_rounds=4).collect()
    }
    left = {got[v] for v in (0, 1, 2)}
    right = {got[v] for v in (10, 11, 12)}
    assert left.isdisjoint(right), (left, right)


def test_label_propagation_self_vote_merges_isolated_edge(spark):
    from fel_spark.operators.matching import label_propagation

    # pure neighbor voting on an isolated edge swaps labels forever —
    # the pair NEVER merges at any even round; the self-vote variant
    # breaks the tie to the smaller label and converges in one round.
    df = spark.createDataFrame([(7, 3)], "id_a long, id_b long")
    pure = {
        r["id"]: r["cluster_id"]
        for r in label_propagation(df, max_rounds=4).collect()
    }
    assert pure[3] != pure[7]
    merged = {
        r["id"]: r["cluster_id"]
        for r in label_propagation(
            df, max_rounds=2, include_self=True
        ).collect()
    }
    assert merged[3] == merged[7] == 3


# ---------------------------------------------------------------------------
# capacitated greedy b-matching


def _seq_greedy_caps(edges, cap_a, cap_b):
    """Sequential greedy with capacities under the shared total order."""
    from collections import defaultdict

    na, nb = defaultdict(int), defaultdict(int)
    out = set()
    for a, b, s in sorted(edges, key=lambda e: (-e[2], e[0], e[1])):
        if na[a] < cap_a and nb[b] < cap_b:
            na[a] += 1
            nb[b] += 1
            out.add((a, b, s))
    return out


def test_b_matching_equals_sequential_greedy_fuzz(spark):
    from fel_spark.operators.matching import b_matching_greedy

    rng = random.Random(179)
    for trial, (ca, cb) in enumerate([(1, 2), (2, 3), (1, 1)]):
        edges = set()
        while len(edges) < 100:
            a = rng.randint(0, 19)
            b = 100 + rng.randint(0, 14)
            edges.add((a, b))
        rows = [(a, b, rng.randint(1, 50)) for a, b in sorted(edges)]
        got = {
            (r["id_a"], r["id_b"], r["score"])
            for r in b_matching_greedy(
                _pairs_df(spark, rows), cap_a=ca, cap_b=cb, max_rounds=40
            ).collect()
        }
        assert got == _seq_greedy_caps(rows, ca, cb), (trial, ca, cb)


def test_b_matching_respects_caps(spark):
    from collections import Counter

    from fel_spark.operators.matching import b_matching_greedy

    rng = random.Random(181)
    rows = [
        (rng.randint(0, 8), 100 + rng.randint(0, 5), rng.randint(1, 30))
        for _ in range(80)
    ]
    rows = list({(a, b): (a, b, s) for a, b, s in rows}.values())
    out = b_matching_greedy(
        _pairs_df(spark, rows), cap_a=2, cap_b=3, max_rounds=30
    ).collect()
    ca = Counter(r["id_a"] for r in out)
    cb = Counter(r["id_b"] for r in out)
    assert all(v <= 2 for v in ca.values())
    assert all(v <= 3 for v in cb.values())


def test_b_matching_cap1_equals_one_to_one(spark):
    from fel_spark.operators.matching import b_matching_greedy

    rng = random.Random(191)
    rows = [
        (rng.randint(0, 10), 50 + rng.randint(0, 10), rng.randint(1, 9))
        for _ in range(60)
    ]
    rows = list({(a, b): (a, b, s) for a, b, s in rows}.values())
    bm = {
        (r["id_a"], r["id_b"])
        for r in b_matching_greedy(
            _pairs_df(spark, rows), cap_a=1, cap_b=1, max_rounds=40
        ).collect()
    }
    oo = {
        (r["id_a"], r["id_b"])
        for r in one_to_one_greedy(
            _pairs_df(spark, rows), max_rounds=40
        ).collect()
    }
    assert bm == oo


# ---------------------------------------------------------------------------
# Gale-Shapley stable matching


def _seq_gale_shapley(edges):
    """Textbook sequential deferred acceptance (A-proposing); unique
    A-optimal outcome (McVitie-Wilson) regardless of order."""
    prefs = {}
    score = {}
    for a, b, s in edges:
        prefs.setdefault(a, []).append((-s, b))
        score[(a, b)] = s
    for a in prefs:
        prefs[a].sort()
    ptr = {a: 0 for a in prefs}
    tent = {}  # b -> a
    free = list(prefs)
    while free:
        a = free.pop()
        while ptr[a] < len(prefs[a]):
            b = prefs[a][ptr[a]][1]
            ptr[a] += 1
            cur = tent.get(b)
            if cur is None:
                tent[b] = a
                break
            # b prefers higher score, tie smaller id_a
            if (-score[(a, b)], a) < (-score[(cur, b)], cur):
                tent[b] = a
                free.append(cur)
                break
        # else: a exhausted its list, stays unmatched
    return {(a, b, score[(a, b)]) for b, a in tent.items()}


def test_stable_marriage_equals_sequential_fuzz(spark):
    from fel_spark.operators.matching import stable_marriage

    rng = random.Random(193)
    for trial in range(3):
        edges = set()
        while len(edges) < 90:
            edges.add((rng.randint(0, 14), 100 + rng.randint(0, 14)))
        rows = [(a, b, rng.randint(1, 60)) for a, b in sorted(edges)]
        rows = list({(a, b): (a, b, s) for a, b, s in rows}.values())
        got = {
            (r["id_a"], r["id_b"], r["score"])
            for r in stable_marriage(
                _pairs_df(spark, rows), max_rounds=40
            ).collect()
        }
        assert got == _seq_gale_shapley(rows), trial


def test_stable_marriage_no_blocking_pair(spark):
    from fel_spark.operators.matching import stable_marriage

    rng = random.Random(197)
    rows = list(
        {
            (a, b): (a, b, rng.randint(1, 40))
            for a, b in [
                (rng.randint(0, 9), 100 + rng.randint(0, 9))
                for _ in range(70)
            ]
        }.values()
    )
    out = stable_marriage(_pairs_df(spark, rows), max_rounds=40).collect()
    match_a = {r["id_a"]: (r["id_b"], r["score"]) for r in out}
    match_b = {r["id_b"]: (r["id_a"], r["score"]) for r in out}
    score = {(a, b): s for a, b, s in rows}
    for (a, b), s in score.items():
        sa = match_a.get(a)
        sb = match_b.get(b)
        a_prefers = sa is None or (-s, b) < (-sa[1], sa[0])
        b_prefers = sb is None or (-s, a) < (-sb[1], sb[0])
        assert not (a_prefers and b_prefers), (a, b, s, sa, sb)

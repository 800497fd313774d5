"""k-core / k-truss peeling: plain-Python synchronous-round replays,
fixpoint order-independence, structural bridge-removal properties."""

from __future__ import annotations

import random

from fel_spark.operators.graphclean import k_core, k_truss, triangle_support


def _rand_edges(rng, n_v, n_e):
    edges = set()
    while len(edges) < n_e:
        a, b = rng.randint(0, n_v - 1), rng.randint(0, n_v - 1)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    return sorted(edges)


def _py_kcore(edges, k, rounds):
    """Synchronous peel replay -> {v: (peel_round, in_core)}."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    live = {v: set(ws) for v, ws in adj.items()}
    out = {}
    for rnd in range(1, rounds + 1):
        drop = {v for v, ws in live.items() if len(ws) < k}
        if not drop:
            break
        for v in drop:
            out[v] = (rnd, 0)
        live = {
            v: ws - drop for v, ws in live.items() if v not in drop
        }
    for v in adj:
        out.setdefault(v, (0, 1))
    return out


def _py_support(edges):
    es = {tuple(sorted(e)) for e in edges}
    sup = {e: 0 for e in es}
    vs = sorted({v for e in es for v in e})
    for i, a in enumerate(vs):
        for b in vs[i + 1 :]:
            if (a, b) not in es:
                continue
            for c in vs:
                if c > b and (a, c) in es and (b, c) in es:
                    sup[(a, b)] += 1
                    sup[(a, c)] += 1
                    sup[(b, c)] += 1
    return sup


def _py_ktruss(edges, k, rounds):
    es = {tuple(sorted(e)) for e in edges}
    out = {}
    live = set(es)
    for rnd in range(1, rounds + 1):
        sup = _py_support(live)
        drop = {e for e in live if sup[e] < k - 2}
        if not drop:
            break
        for e in drop:
            out[e] = (rnd, 0)
        live -= drop
    for e in es:
        out.setdefault(e, (0, 1))
    return out


def test_triangle_support_replay_fuzz(spark):
    rng = random.Random(67)
    rows = _rand_edges(rng, 18, 45)
    df = spark.createDataFrame(rows, "id_a long, id_b long")
    got = {
        (r["id_a"], r["id_b"]): r["support"]
        for r in triangle_support(df).collect()
    }
    assert got == _py_support(rows)


def test_k_core_replay_fuzz(spark):
    rng = random.Random(71)
    for trial, k in [(0, 2), (1, 3)]:
        rows = _rand_edges(rng, 24, 50)
        df = spark.createDataFrame(rows, "id_a long, id_b long")
        got = {
            r["id"]: (r["peel_round"], r["in_core"])
            for r in k_core(df, k, max_rounds=6).collect()
        }
        assert got == _py_kcore(rows, k, 6), (trial, k)


def test_k_truss_replay_fuzz(spark):
    rng = random.Random(73)
    rows = _rand_edges(rng, 16, 40)
    df = spark.createDataFrame(rows, "id_a long, id_b long")
    got = {
        (r["id_a"], r["id_b"]): (r["peel_round"], r["in_truss"])
        for r in k_truss(df, 3, max_rounds=5).collect()
    }
    assert got == _py_ktruss(rows, 3, 5)


def test_truss_drops_bridge_core_does_not(spark):
    # two triangles joined by the bridge 2-10: every vertex has degree
    # >= 2, so the 2-core keeps everything — but the bridge has zero
    # triangle support and falls out of the 3-truss in round 1, while
    # every triangle edge survives.
    rows = [(0, 1), (0, 2), (1, 2), (10, 11), (10, 12), (11, 12), (2, 10)]
    df = spark.createDataFrame(rows, "id_a long, id_b long")
    core = {r["id"]: r["in_core"] for r in k_core(df, 2).collect()}
    assert all(v == 1 for v in core.values())
    truss = {
        (r["id_a"], r["id_b"]): (r["peel_round"], r["in_truss"])
        for r in k_truss(df, 3).collect()
    }
    assert truss[(2, 10)] == (1, 0)
    assert all(
        t == (0, 1) for e, t in truss.items() if e != (2, 10)
    )


def test_k_core_cascading_peel(spark):
    # path 0-1-2-3 hanging off triangle 3-4-5: 2-core peels the path
    # endpoint first, then the cascade 1, then 2 — three rounds.
    rows = [(0, 1), (1, 2), (2, 3), (3, 4), (3, 5), (4, 5)]
    df = spark.createDataFrame(rows, "id_a long, id_b long")
    got = {
        r["id"]: (r["peel_round"], r["in_core"])
        for r in k_core(df, 2, max_rounds=6).collect()
    }
    assert got[0] == (1, 0)
    assert got[1] == (2, 0)
    assert got[2] == (3, 0)
    assert got[3] == (0, 1) and got[4] == (0, 1) and got[5] == (0, 1)


def test_graphclean_plan_no_cartesian(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "id_a long, id_b long")
    for built in (triangle_support(df), k_truss(df, 3, max_rounds=1, checkpoint=False)):
        plan = built._jdf.queryExecution().executedPlan().toString()
        assert "Cartesian" not in plan


# ---------------------------------------------------------------------------
# adaptive sorted-neighborhood blocking (blocking.adaptive_sorted_blocks)


def _py_adaptive(rows, t):
    """Sequential replay: sort by (key, id), cut where adjacent-key JW
    (DuckDB's native — bit-exact vs the Spark kernel) < t."""
    import duckdb

    con = duckdb.connect()

    def jw(a, b):
        return round(
            con.execute(
                "SELECT jaro_winkler_similarity(?, ?)", [a, b]
            ).fetchone()[0]
            * 1_000_000
        )

    order = sorted(rows, key=lambda r: (r[1], r[0]))
    out, block, prev = {}, None, None
    for i, (rid, k) in enumerate(order, start=1):
        start = 1 if prev is None or jw(prev, k) < t else 0
        if start:
            block = i
        out[rid] = (i, block, start)
        prev = k
    return out


def test_adaptive_sorted_blocks_replay_fuzz(spark):
    from fel_spark.operators.blocking import adaptive_sorted_blocks

    rng = random.Random(89)
    base = ["thompson", "thomson", "tohmpson", "smith", "smyth", "jones"]
    rows = []
    for i in range(60):
        w = rng.choice(base)
        if rng.random() < 0.4:
            p = rng.randrange(len(w))
            w = w[:p] + rng.choice("abcdefgh") + w[p + 1 :]
        rows.append((i, w))
    df = spark.createDataFrame(rows, "record_id long, k string")
    got = {
        r["id"]: (r["rank"], r["block_id"], r["is_start"])
        for r in adaptive_sorted_blocks(
            df, "k", min_sim_micro=880_000
        ).collect()
    }
    assert got == _py_adaptive(rows, 880_000)


def test_adaptive_sorted_blocks_prefix_len_invariant(spark):
    from fel_spark.operators.blocking import adaptive_sorted_blocks

    rng = random.Random(97)
    rows = [
        (
            i,
            "".join(
                rng.choice("ab") for _ in range(rng.randint(1, 6))
            ),
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "record_id long, k string")
    outs = []
    for pl in (1, 3):
        outs.append(
            sorted(
                (r["id"], r["rank"], r["block_id"], r["is_start"])
                for r in adaptive_sorted_blocks(
                    df, "k", min_sim_micro=900_000, prefix_len=pl
                ).collect()
            )
        )
    assert outs[0] == outs[1]


def test_lsh_operating_curve_matches_closed_form(spark):
    from fel_spark.operators.blocking import lsh_operating_curve

    rows = {
        r["jaccard_4dp"]: r["p_candidate_micro"]
        for r in lsh_operating_curve(spark, bands=4, rows_per_band=2).collect()
    }
    assert rows[0] == 0 and rows[10_000] == 1_000_000
    # monotone non-decreasing
    vals = [rows[k] for k in sorted(rows)]
    assert vals == sorted(vals)
    for i in (25, 50, 75):
        s = i / 100.0
        want = round((1.0 - (1.0 - s**2.0) ** 4.0) * 1_000_000)
        assert rows[round(s * 10_000)] == want


# ---------------------------------------------------------------------------
# cluster depth audit (cluster.cluster_depth_audit)


def _py_depth(edges, max_rounds):
    from collections import defaultdict, deque

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    seen_all = set()
    out = {}
    for v in sorted(adj):
        if v in seen_all:
            continue
        comp, q = {v}, deque([v])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in comp:
                    comp.add(w)
                    q.append(w)
        root = min(comp)
        dist = {root: 0}
        q = deque([root])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in dist and dist[u] + 1 <= max_rounds:
                    dist[w] = dist[u] + 1
                    q.append(w)
        out[root] = (len(comp), max(dist.values()))
        seen_all |= comp
    return out


def test_cluster_depth_audit_replay_fuzz(spark):
    from fel_spark.operators.cluster import cluster_depth_audit

    rng = random.Random(199)
    edges = set()
    while len(edges) < 50:
        a, b = rng.randint(0, 39), rng.randint(0, 39)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    rows = sorted(edges)
    df = spark.createDataFrame(rows, "src long, dst long")
    got = {
        r["cluster_id"]: (r["n_nodes"], r["root_ecc"])
        for r in cluster_depth_audit(df, max_rounds=12).collect()
    }
    assert got == _py_depth(rows, 12)


def test_cluster_depth_audit_chain_vs_clique(spark):
    from fel_spark.operators.cluster import cluster_depth_audit

    # path 0-1-2-3-4 (ecc 4 from root 0) vs clique {10,11,12} (ecc 1)
    rows = [(0, 1), (1, 2), (2, 3), (3, 4),
            (10, 11), (10, 12), (11, 12)]
    df = spark.createDataFrame(rows, "src long, dst long")
    got = {
        r["cluster_id"]: (r["n_nodes"], r["root_ecc"], r["converged"])
        for r in cluster_depth_audit(df, max_rounds=8).collect()
    }
    assert got[0] == (5, 4, 1)
    assert got[10] == (3, 1, 1)


def test_k_truss_decremental_cascade_fuzz(spark):
    """r6: support is maintained DECREMENTALLY after the first full
    triangle pass — k=4 (need=2) genuinely cascades over rounds (k=3
    cannot: support-0 drops sit in no triangle), so this pins the
    delta bookkeeping (distinct triangles containing a dropped edge,
    each surviving edge -1) to the recompute reference, with and
    without broadcast edges. (checkpoint=False takes the per-round
    recompute path, whose un-cut lineage grows exponentially with
    rounds — it stays covered by the existing max_rounds=1 test.)"""
    rng = random.Random(79)
    for trial in range(2):
        rows = _rand_edges(rng, 14, 52)
        df = spark.createDataFrame(rows, "id_a long, id_b long")
        ref = _py_ktruss(rows, 4, 6)
        for kw in (
            {"checkpoint": True},
            {"checkpoint": True, "broadcast_edges": True},
        ):
            got = {
                (r["id_a"], r["id_b"]): (r["peel_round"], r["in_truss"])
                for r in k_truss(df, 4, max_rounds=6, **kw).collect()
            }
            assert got == ref, (trial, kw)

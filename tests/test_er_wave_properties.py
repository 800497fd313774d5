"""Hypothesis properties: meta-blocking and threshold-curve exact parity
with plain-Python replays on arbitrary inputs."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from fel_spark.operators.blocking import metablocking_pairs
from fel_spark.operators.evalmetrics import threshold_curve


def _meta_ref(rows):
    """Plain-Python weighted-edge-pruning replay."""
    from collections import defaultdict
    from itertools import combinations

    assign = sorted(set(rows))
    blocks = defaultdict(set)
    per_rec = defaultdict(set)
    for rid, bk in assign:
        blocks[bk].add(rid)
        per_rec[rid].add(bk)
    common = defaultdict(int)
    for members in blocks.values():
        for a, b in combinations(sorted(members), 2):
            common[(a, b)] += 1
    edges = {}
    for (a, b), c in common.items():
        js = round(c / (len(per_rec[a]) + len(per_rec[b]) - c) * 1_000_000)
        edges[(a, b)] = (c, js)
    if not edges:
        return {}
    thr = sum(js for _, js in edges.values()) / len(edges)
    return {k: v for k, v in edges.items() if v[1] >= thr}


@settings(max_examples=20, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.sampled_from("abcd")),
        min_size=1,
        max_size=30,
    )
)
def test_metablocking_matches_python_replay(spark, rows):
    df = spark.createDataFrame(
        [(r, b) for r, b in rows], "record_id int, block_key string"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["common"], r["js_micro"])
        for r in metablocking_pairs(df).collect()
    }
    assert got == _meta_ref(rows)


def _curve_ref(rows):
    from collections import defaultdict

    per = defaultdict(lambda: [0, 0])
    for s, m in rows:
        per[s][0 if m else 1] += 1
    total_m = sum(v[0] for v in per.values())
    out = {}
    tp = fp = 0
    for s in sorted(per, reverse=True):
        tp += per[s][0]
        fp += per[s][1]
        p = tp / (tp + fp)
        r = 0.0 if total_m == 0 else tp / total_m
        f1 = 0 if tp == 0 else round(2.0 * p * r / (p + r) * 1_000_000)
        out[s] = (tp, fp, total_m - tp, round(p * 1e6), round(r * 1e6), f1)
    return out


@settings(max_examples=20, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(st.integers(-5, 5), st.booleans()),
        min_size=1,
        max_size=40,
    )
)
def test_threshold_curve_matches_python_replay(spark, rows):
    df = spark.createDataFrame(rows, "score int, is_match boolean")
    got = {
        r["thr"]: (
            r["tp"], r["fp"], r["fn"],
            r["prec_micro"], r["rec_micro"], r["f1_micro"],
        )
        for r in threshold_curve(df, "score").collect()
    }
    assert got == _curve_ref(rows)

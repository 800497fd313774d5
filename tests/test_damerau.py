"""True Damerau-Levenshtein: batch kernel vs scalar reference vs DuckDB."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from fel_spark.functions import sim
from fel_spark.functions.sim import (
    damerau_levenshtein,
    damerau_levenshtein_batch,
)

PINNED = [
    ("CA", "ABC", 2),  # TRUE DL, not OSA (which gives 3)
    ("ab", "ba", 1),
    ("abcdef", "abcfed", 2),  # transposition + substitution interplay
    ("kitten", "sitting", 3),
    ("", "abc", 3),
    ("abc", "", 3),
    ("", "", 0),
    ("aa", "aa", 0),
]


def test_dl_pinned_vectors():
    for a, b, want in PINNED:
        assert damerau_levenshtein(a, b) == want, (a, b)
    got = damerau_levenshtein_batch(
        [a for a, _, _ in PINNED], [b for _, b, _ in PINNED]
    )
    assert got.tolist() == [w for _, _, w in PINNED]


@settings(max_examples=150, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcde", max_size=10),
            st.text(alphabet="abcde", max_size=10),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_dl_batch_equals_scalar_and_duckdb(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = damerau_levenshtein_batch(a, b).tolist()
    assert got == [damerau_levenshtein(x, y) for x, y in pairs]
    con = duckdb.connect()
    for (x, y), g in zip(pairs, got):
        assert (
            g
            == con.sql(
                "SELECT damerau_levenshtein(?, ?)", params=[x, y]
            ).fetchone()[0]
        ), (x, y)


def test_dl_batch_chunk_boundary(monkeypatch):
    """Results identical when the batch straddles the DP-tensor chunk."""
    import random

    rng = random.Random(11)
    pairs = [
        (
            "".join(rng.choice("xyz") for _ in range(rng.randint(0, 8))),
            "".join(rng.choice("xyz") for _ in range(rng.randint(0, 8))),
        )
        for _ in range(25)
    ]
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    full = damerau_levenshtein_batch(a, b).tolist()
    monkeypatch.setattr(sim, "_DL_CHUNK", 7)
    chunked = damerau_levenshtein_batch(a, b).tolist()
    assert full == chunked == [damerau_levenshtein(x, y) for x, y in pairs]


def test_dl_unicode_codepoint_semantics():
    """Our kernel is CODEPOINT-based — the same semantics as Spark's
    native levenshtein — while DuckDB's edit distances operate on UTF-8
    BYTES. Pin both facts: batch == scalar on codepoints, and the DuckDB
    divergence equals the byte-level computation (which is why the
    er_*_scores oracles run over ASCII document text)."""
    a, b = "café", "céaf"
    assert damerau_levenshtein_batch([a], [b])[0] == damerau_levenshtein(a, b)
    con = duckdb.connect()
    duck = con.sql(
        "SELECT damerau_levenshtein(?, ?)", params=[a, b]
    ).fetchone()[0]
    byte_level = damerau_levenshtein(
        a.encode().decode("latin-1"), b.encode().decode("latin-1")
    )
    assert duck == byte_level != damerau_levenshtein(a, b)

"""Approximate string join via q-gram filtering (edit-distance join).

Gravano, Ipeirotis, Jagadish, Koudas, Muthukrishnan & Srivastava,
"Approximate string joins in a database (almost) for free" (VLDB 2001):
to find ALL pairs with edit distance <= d WITHOUT a quadratic scan,
join an inverted index of positional q-grams and apply three provably
LOSSLESS filters before the exact verification:

- **length filter**: ed(a, b) <= d implies ||a| - |b|| <= d;
- **position filter**: a q-gram of a can only correspond to a q-gram of
  b whose position differs by at most d;
- **count filter**: one edit operation destroys at most q q-grams, so
  ed(a, b) <= d implies the strings share at least
  max(|a|, |b|) - q + 1 - d*q position-compatible q-grams.

Survivors are verified with the EXACT edit distance (Spark's native
``levenshtein``), so the output is exact; the filters only bound the
work. This is the classical scale path for edit-distance joins — the
gram index IS the blocking, as opposed to the comparator battery
(`editsim.py`) which scores pairs some other blocking already produced.

The count filter is vacuous for strings shorter than (d+1)*q + 1 —
below that, ed-close pairs may share ZERO grams and the index join
cannot see them (Gravano et al. handle short strings out of band).
``qgram_edit_join`` therefore REQUIRES min_len >= (d+1)*q + 1 and
filters both sides to it; callers route shorter strings to a direct
comparator.

Scale shape: one map-only gram explode per side, one equi-join on the
gram string (hot grams fan out — the count filter then prunes, and the
join is AQE-skew-eligible; at corpus scale pair the gram index with a
stopgram cap the way TF-IDF drops its broadcast), one count aggregate
keyed by the pair, and an exact verify on the tiny survivor set. The
oracle is the NAIVE quadratic levenshtein join — value parity proves
the three filters lost nothing.

Semantics note (pinned in editsim tests): Spark ``levenshtein`` is
codepoint-based, DuckDB's is UTF-8-byte-based — oracle queries run on
ASCII text where they coincide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def positional_qgrams(
    df: DataFrame, text_col: str, id_col: str, q: int = 2
) -> DataFrame:
    """(id, len, pos, gram) — the positional q-gram inverted index
    (unpadded, 1-based positions); map-only explode."""
    s = F.col(text_col)
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.length(s).cast("int").alias("len"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.length(s) - q + 1),
                    lambda i: s.substr(i, F.lit(q)),
                )
            ).alias("pos0", "gram"),
        )
        .withColumn("pos", (F.col("pos0") + 1).cast("int"))
        .drop("pos0")
    )


def qgram_edit_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    d: int = 1,
    q: int = 2,
) -> DataFrame:
    """All pairs (id_a < id_b) with exact edit distance <= ``d``, found
    through the q-gram index + lossless filters + exact verify. Strings
    shorter than (d+1)*q + 1 are excluded (count-filter validity bound,
    see module docstring). Output: (id_a, id_b, ed)."""
    min_len = (d + 1) * q + 1
    eligible = df.filter(F.length(F.col(text_col)) >= min_len).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("s")
    )
    idx = positional_qgrams(eligible, "s", "id", q)
    a = idx.select(
        F.col("id").alias("id_a"),
        F.col("len").alias("len_a"),
        F.col("pos").alias("pos_a"),
        "gram",
    )
    b = idx.select(
        F.col("id").alias("id_b"),
        F.col("len").alias("len_b"),
        F.col("pos").alias("pos_b"),
        "gram",
    )
    hits = a.join(b, "gram").filter(
        (F.col("id_a") < F.col("id_b"))
        # length filter
        & (F.abs(F.col("len_a") - F.col("len_b")) <= d)
        # position filter
        & (F.abs(F.col("pos_a") - F.col("pos_b")) <= d)
    )
    threshold = F.greatest(F.col("len_a"), F.col("len_b")) - q + 1 - d * q
    survivors = (
        hits.groupBy("id_a", "id_b", "len_a", "len_b")
        .agg(F.count(F.lit(1)).alias("_n"))
        # count filter (join rows upper-bound the optimal gram matching,
        # so ed-close pairs always clear it — soundness, not tightness)
        .filter(F.col("_n") >= threshold)
        .select("id_a", "id_b")
    )
    sa = eligible.select(F.col("id").alias("id_a"), F.col("s").alias("_sa"))
    sb = eligible.select(F.col("id").alias("id_b"), F.col("s").alias("_sb"))
    return (
        survivors.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("ed", F.levenshtein("_sa", "_sb").cast("int"))
        .filter(F.col("ed") <= d)
        .select("id_a", "id_b", "ed")
    )

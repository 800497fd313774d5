"""Phonetic encodings for blocking keys.

Names that sound alike should block together even when spelled apart —
the oldest blocking-key trick in record linkage (Odell & Russell 1918;
Christen 2012 ch.4 uses Soundex as the canonical phonetic blocking key).
The reference's alias dictionary plays the same role lexically (many
surface forms -> one candidate set, `hash/AbstractEntityHash.java`
normalization); phonetic keys extend that to spelling variation.

Two implementations of American Soundex, value-equal by construction:

- :func:`soundex_col` — a pure-column Spark expression chain (translate +
  chained run-collapses + rpad). Whole-stage codegen, no UDF.
- :func:`soundex_sql` — the SAME chain rendered as DuckDB SQL (RE2 has no
  backreferences, hence the per-digit run-collapse chain in both engines).

The chain is additionally pinned against Spark's JVM built-in
``F.soundex`` (Apache Commons lineage — canonical American Soundex with
the H/W merge rule) in tests, so the oracle comparison checks two
independent engines running a THIRD-party-validated algorithm.

Algorithm (American Soundex): keep the first letter; map the rest
B F P V->1, C G J K Q S X Z->2, D T->3, L->4, M N->5, R->6; letters with
equal codes separated only by H/W collapse (H/W deleted BEFORE the
adjacent-run collapse); vowels A E I O U Y separate (coded 0, removed
AFTER the collapse); emit letter + first 3 digits, zero-padded.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# 24 coded letters; H and W carry no 'to' char -> translate deletes them,
# which is exactly the H/W-merge ordering the algorithm requires.
_FROM = "BFPVCGJKQSXZDTLMNRAEIOUY" + "HW"
_TO = "1111" + "22222222" + "33" + "4" + "55" + "6" + "000000"
_DIGITS = "0123456"


def soundex_col(c: Column) -> Column:
    """American Soundex as pure Spark columns. NULL/empty/non-alpha-only
    input yields NULL (callers filter or coalesce)."""
    u = F.regexp_replace(F.upper(c), "[^A-Z]", "")
    first = F.substring(u, 1, 1)
    codes = F.translate(u, _FROM, _TO)
    collapsed = codes
    for d in _DIGITS:
        collapsed = F.regexp_replace(collapsed, f"{d}{d}+", d)
    # the first letter's own code leads `collapsed` — unless the first
    # letter is H/W, which translate deleted (it has no code to drop).
    tail = F.when(
        first.isin("H", "W"), collapsed
    ).otherwise(F.substring(collapsed, 2, 1 << 30))
    digits = F.translate(tail, "0", "")
    return F.when(
        F.length(u) > 0, F.rpad(F.concat(first, F.substring(digits, 1, 3)), 4, "0")
    )


def soundex_sql(expr: str) -> str:
    """The identical chain as a DuckDB SQL scalar expression over
    ``expr`` (emits NULL for empty/non-alpha input, like the column)."""
    u = f"regexp_replace(upper({expr}), '[^A-Z]', '', 'g')"
    collapsed = f"translate({u}, '{_FROM}', '{_TO}')"
    for d in _DIGITS:
        collapsed = f"regexp_replace({collapsed}, '{d}{d}+', '{d}', 'g')"
    tail = (
        f"CASE WHEN substr({u}, 1, 1) IN ('H', 'W') THEN {collapsed} "
        f"ELSE substr({collapsed}, 2) END"
    )
    return (
        f"CASE WHEN length({u}) > 0 THEN "
        f"rpad(substr({u}, 1, 1) || substr(translate({tail}, '0', ''), 1, 3), "
        f"4, '0') END"
    )


# ---------------------------------------------------------------------------
# Caverphone 2.0

# The revised Caverphone (David Hood, "Caverphone Revisited", Technical
# Paper CTP150804, University of Otago 2004) is SPECIFIED as an ordered
# list of regex replacements — which makes it the ideal second phonetic
# key here: ONE rule table drives both engines (the Spark column chain
# and the DuckDB SQL rendering fold over the same list), so there is no
# transcription to drift. Where Soundex keys on consonant classes,
# Caverphone was designed on real matched-pair data (NZ electoral rolls)
# and keeps vowel POSITIONS (the 3-placeholders) through the rule chain,
# giving a finer blocking key for oral/dialect variation.
#
# Rules verbatim from the paper's step list (lowercase alpha input; the
# uppercase letters the rules emit are FINAL — later lowercase-pattern
# rules cannot rematch them, which is what makes the ordered chain
# confluent in any regex engine with case-sensitive, left-to-right,
# non-overlapping global replacement — Java and RE2 both).
_CAVERPHONE2_RULES = [
    ("e$", ""),
    ("^cough", "cou2f"),
    ("^rough", "rou2f"),
    ("^tough", "tou2f"),
    ("^enough", "enou2f"),
    ("^trough", "trou2f"),
    ("^gn", "2n"),
    ("mb$", "m2"),
    ("cq", "2q"),
    ("ci", "si"),
    ("ce", "se"),
    ("cy", "sy"),
    ("tch", "2ch"),
    ("c", "k"),
    ("q", "k"),
    ("x", "k"),
    ("v", "f"),
    ("dg", "2g"),
    ("tio", "sio"),
    ("tia", "sia"),
    ("d", "t"),
    ("ph", "fh"),
    ("b", "p"),
    ("sh", "s2"),
    ("z", "s"),
    ("^[aeiou]", "A"),
    ("[aeiou]", "3"),
    ("j", "y"),
    ("^y3", "Y3"),
    ("^y", "A"),
    ("y", "3"),
    ("3gh3", "3kh3"),
    ("gh", "22"),
    ("g", "k"),
    ("s+", "S"),
    ("t+", "T"),
    ("p+", "P"),
    ("k+", "K"),
    ("f+", "F"),
    ("m+", "M"),
    ("n+", "N"),
    ("w3", "W3"),
    ("wh3", "Wh3"),
    ("w$", "3"),
    ("w", "2"),
    ("^h", "A"),
    ("h", "2"),
    ("r3", "R3"),
    ("r$", "3"),
    ("r", "2"),
    ("l3", "L3"),
    ("l$", "3"),
    ("l", "2"),
    ("2", ""),
    ("3$", "A"),
    ("3", ""),
]


def caverphone2_col(c: Column) -> Column:
    """Caverphone 2.0 as pure Spark columns (10-char code, padded with
    1s). NULL/empty/non-alpha-only input yields NULL — the
    :func:`soundex_col` convention (the paper pads the empty string to
    '1111111111'; callers wanting that coalesce)."""
    u = F.regexp_replace(F.lower(c), "[^a-z]", "")
    x = u
    for pat, rep in _CAVERPHONE2_RULES:
        x = F.regexp_replace(x, pat, rep)
    return F.when(
        F.length(u) > 0,
        F.substring(F.concat(x, F.lit("1111111111")), 1, 10),
    )


def caverphone2_sql(expr: str) -> str:
    """The identical chain rendered as a DuckDB SQL scalar expression
    over ``expr`` (NULL for empty/non-alpha input, like the column)."""
    u = f"regexp_replace(lower({expr}), '[^a-z]', '', 'g')"
    x = u
    for pat, rep in _CAVERPHONE2_RULES:
        x = f"regexp_replace({x}, '{pat}', '{rep}', 'g')"
    return (
        f"CASE WHEN length({u}) > 0 THEN "
        f"substr({x} || '1111111111', 1, 10) END"
    )

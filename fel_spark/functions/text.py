"""Text normalization and tokenization as native column expressions.

Semantics mirror the reference's fast normalizer
(`utils/Normalize.java:77-90` normalizeFast: lowercase, keep letters/digits,
collapse separator runs to single spaces) — this is the per-row invariant the
whole pipeline hangs off: every stage keys mentions by the *normalized* form,
and the raw `text` column is carried through untouched so per-turn text
equality under (conv_id, turn_idx) ordering holds end-to-end.

All functions are pure Column expressions → whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# SQL fragment duplicated in __spark_entry__.oracle_sql() — keep in sync.
NORMALIZE_SQL = "trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ', 'g'))"


def normalize_fast(col: Column | str) -> Column:
    """Lowercase, strip non-alphanumerics to spaces, collapse runs, trim.

    Bit-compatible with `Normalize.normalizeFast` for ASCII input and with
    the DuckDB expression in :data:`NORMALIZE_SQL`.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


# utils/Normalize.java:30 — the stopwords getIntentPart strips from both
# the canonical entity form and the query before substring removal
ID_STOPWORDS = [" the ", " of ", " a ", " at ", " in "]


def intent_part(query: Column, entity_result: Column) -> Column:
    """P7 intent-part extraction (`utils/Normalize.java:131-140`): strip the
    linked entity's canonical form from the query; what survives is the
    query's "modifier" (intent). Steps mirror the reference exactly:
    drop a URL-encoded parenthetical suffix (``%28...%29``), remove
    ``%3A``, normalize, strip ID_STOPWORDS from both strings, then remove
    the canonical form from the query as a literal substring. Output keeps
    the reference's raw-removal semantics (no re-trim)."""
    nid = F.regexp_replace(entity_result, r"(.*?)(%28)(.*?)(%29.*)", r"$1")
    nid = F.replace(nid, F.lit("%3A"), F.lit(""))
    nid = normalize_fast(F.regexp_replace(nid, "[^A-Za-z0-9]", " "))
    q = query
    for sw in ID_STOPWORDS:
        nid = F.replace(nid, F.lit(sw), F.lit(" "))
        q = F.replace(q, F.lit(sw), F.lit(" "))
    return F.when(F.length(nid) > 0, F.replace(q, nid, F.lit(""))).otherwise(q)


def normalize_tokens(col: Column | str) -> Column:
    """Normalized token array (empty tokens removed)."""
    toks = F.split(normalize_fast(col), " ")
    return F.filter(toks, lambda t: F.length(t) > 0)


def token_ngrams(tokens: Column, n: int) -> Column:
    """All contiguous token n-grams (space-joined) of a token array.

    This is the span-enumeration primitive (reference
    `FastEntityLinker.java:246-271` enumerates all O(n^2) token spans; we
    bound span length and explode — data-parallel per row).

    Built as zip_with over n shifted slices, not transform(sequence, i ->
    slice(tokens, i, n)): a non-lambda-variable expression inside a HOF
    lambda is re-evaluated PER ELEMENT, so when callers pass an expression
    (e.g. ``F.split(...)``) the old shape re-ran it per gram — O(len²) per
    row. Here ``tokens`` is evaluated n times per row, top-level.
    """
    glen = F.size(tokens) - (n - 1)  # number of n-grams when size >= n
    grams = F.slice(tokens, 1, glen)
    for i in range(1, n):
        grams = F.zip_with(
            grams, F.slice(tokens, i + 1, glen), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.when(F.size(tokens) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def all_spans(tokens: Column, max_len: int) -> Column:
    """All contiguous spans up to ``max_len`` tokens as
    array<struct<span:string, start:int, length:int>> (1-based start).

    Mirrors FEL's all-candidate span enumeration
    (`FastEntityLinker.java:418-439`) with the bounded n-gram scan of the
    corpus-frequency counter (`io/ExtractWikipediaAnchorText.java:322-445`,
    15-token bound).
    """
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(tokens), F.lit(1))),
            lambda start: F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        F.least(F.lit(max_len), F.size(tokens) - start + 1), F.lit(1)
                    ),
                ),
                lambda ln: F.struct(
                    F.array_join(F.slice(tokens, start, ln), " ").alias("span"),
                    start.cast("int").alias("start"),
                    ln.cast("int").alias("length"),
                ),
            ),
        )
    )


# --- P5: full punctuation + diacritics folding -----------------------------
#
# Mirrors `io/PunctuationDiacriticsFolder.normalize` (:28-36): ASCII
# punctuation runs -> space, space/control runs -> space, NFD decomposition
# with combining-diacritical-marks (U+0300-U+036F) + Lm + Sk stripped,
# lowercase, trim. normalize_fast (above) stays the ASCII hot path — this is
# the fidelity path for accented text ("café" == "cafe").

_PUNCT_RE = r"[!-/:-@\[-`{-~]+"  # Java \p{Punct} = POSIX ASCII punctuation
_SPACE_CNTRL_RE = r"[\s\x00-\x1f\x7f]+"

_FOLD_STRIP_RE = None  # lazily built per process


def _fold_strip_regex():
    """Regex matching Java's [\\p{InCombiningDiacriticalMarks}\\p{IsLm}\\p{IsSk}]+:
    the U+0300-U+036F block plus BMP chars of category Lm / Sk (supplementary
    planes omitted — no Lm/Sk there that survive NFD in practice)."""
    global _FOLD_STRIP_RE
    if _FOLD_STRIP_RE is None:
        import re
        import unicodedata

        chars = [
            chr(c)
            for c in range(0x10000)
            if unicodedata.category(chr(c)) in ("Lm", "Sk")
        ]
        _FOLD_STRIP_RE = re.compile(
            "[\\u0300-\\u036f" + re.escape("".join(chars)) + "]+"
        )
    return _FOLD_STRIP_RE


def fold_punct_diacritics_series(s):
    """pandas-Series implementation (shared by the UDF and the parity test)."""
    import unicodedata

    import pandas as pd

    s = s.astype(object).where(s.notna(), None)
    out = s.str.replace(_PUNCT_RE, " ", regex=True)
    out = out.str.replace(_SPACE_CNTRL_RE, " ", regex=True)
    out = out.map(
        lambda x: None if x is None else unicodedata.normalize("NFD", x)
    )
    out = out.str.replace(_fold_strip_regex(), "", regex=True)
    return out.str.lower().str.strip()


def normalize_full(col: Column | str) -> Column:
    """Full NFD/diacritics normalization (`PunctuationDiacriticsFolder.java:
    28-36`) as an Arrow-batched pandas UDF (the JVM has no NFD expression).
    Use :func:`normalize_fast` on the hot path; this one where accent
    folding matters (alias dictionaries built from mixed-script text)."""
    c = F.col(col) if isinstance(col, str) else col

    def _udf(s):
        return fold_punct_diacritics_series(s)

    return F.pandas_udf(_udf, "string")(c)


def url_decode(col: Column | str) -> Column:
    """P6: URL form-decoding (`udf/NormalizeText.java:39-41`,
    java.net.URLDecoder UTF-8 — '+' means space). Spark's built-in
    url_decode implements exactly those semantics."""
    return F.url_decode(F.col(col) if isinstance(col, str) else col)


def url_encode(col: Column | str) -> Column:
    """P6: URL form-encoding (`udf/NormalizeText.java:35-37`,
    java.net.URLEncoder UTF-8 — space becomes '+')."""
    return F.url_encode(F.col(col) if isinstance(col, str) else col)


_TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]+|fbclid|gclid|msclkid|ref|ref_src)="


def canonicalize_url(col: Column | str) -> Column:
    """Crawl-dedup URL canonicalization, pure column expressions:

    - drop the fragment; lowercase scheme and host
    - strip default ports (http:80, https:443); keep explicit others
    - empty path -> '/'
    - drop tracking params (utm_*, fbclid, gclid, msclkid, ref, ref_src),
      sort the survivors so param order stops splitting duplicates

    Scheme-less strings pass through trimmed (not URLs, nothing to do).
    The canonical form is the dedup KEY for crawl pipelines — two fetches
    of the same page via different tracking links must collide before
    exact/near dedup ever sees the text."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    no_frag = F.regexp_replace(c, r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    rest = F.regexp_replace(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]+)", 1)
    host = F.lower(F.regexp_replace(hostport, r":[0-9]+$", ""))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    port_part = (
        F.when((scheme == "http") & (port == "80"), "")
        .when((scheme == "https") & (port == "443"), "")
        .when(port != "", F.concat(F.lit(":"), port))
        .otherwise("")
    )
    pathq = F.regexp_replace(rest, r"^[^/?]+", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", "/").otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
        )
    )
    q_part = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise("")
    canon = F.concat(scheme, F.lit("://"), host, port_part, path, q_part)
    return F.when(scheme == "", c).otherwise(canon)


def char_bigrams(col: Column | str) -> Column:
    """Per-word adjacent character pairs, flattened over the string.

    Reference: `w2v/CompressedSingleFileEntitySimilarityUtil.java:115-142`
    (letter pairs per word, used by the char-bigram Dice similarity).
    Single-char words contribute no pairs.
    """
    toks = normalize_tokens(col) if isinstance(col, str) else F.filter(
        F.split(col, " "), lambda t: F.length(t) > 0
    )
    return F.flatten(
        F.transform(
            toks,
            lambda t: F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length(t) - 1, F.lit(1))),
                    lambda i: t.substr(i, F.lit(2)),
                ),
                lambda p: F.length(p) == 2,
            ),
        )
    )


# ---------------------------------------------------------------------------
# Unicode homoglyph (confusables) folding

# Curated 1:1 homoglyph -> ASCII table (a focused subset of Unicode
# TR#39's confusables data, public): Cyrillic and Greek letters whose
# glyphs are visually identical to Latin ones — the classic spoofing
# vector for usernames/domains/entity aliases that defeats every string
# comparator because codepoints differ while glyphs do not. Single
# source of truth for both engines (the phonetic.py convention):
# translate() is char-for-char in Spark AND DuckDB, so one FROM/TO
# string pair drives both renderings.
_CONFUSABLES = {
    # Cyrillic lowercase
    "а": "a", "е": "e", "о": "o", "р": "p",
    "с": "c", "у": "y", "х": "x", "і": "i",
    "ј": "j", "ѕ": "s",
    # Cyrillic uppercase
    "А": "A", "В": "B", "Е": "E", "К": "K",
    "М": "M", "Н": "H", "О": "O", "Р": "P",
    "С": "C", "Т": "T", "Х": "X",
    # Greek lookalikes
    "ο": "o", "α": "a", "ρ": "p", "ν": "v",
    "ι": "i", "Ο": "O", "Α": "A", "Β": "B",
    "Ε": "E", "Η": "H", "Κ": "K", "Μ": "M",
    "Ν": "N", "Ρ": "P", "Τ": "T", "Χ": "X",
    "Ζ": "Z",
}
_CONF_FROM = "".join(_CONFUSABLES)
_CONF_TO = "".join(_CONFUSABLES.values())


def fold_confusables(c: Column) -> Column:
    """Fold homoglyph codepoints to their ASCII lookalikes (UTS #39
    "skeleton" idea restricted to the curated 1:1 table) — run BEFORE
    any comparator/blocking key so a Cyrillic 'а' cannot split an
    entity from its Latin-'a' twin. Pure translate: codegen, no UDF."""
    return F.translate(c, _CONF_FROM, _CONF_TO)


def fold_confusables_sql(expr: str) -> str:
    """The identical folding rendered for DuckDB (same FROM/TO pair)."""
    return f"translate({expr}, '{_CONF_FROM}', '{_CONF_TO}')"

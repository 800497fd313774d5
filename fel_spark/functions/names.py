"""Given-name bridging: nickname canonicalization + initials matching.

Two name-variation classes that defeat every string comparator in
`operators/editsim.py` because the SURFACE overlap is near zero while
the referent is identical (Christen 2012 ch.3.2 lists both among the
standard name variations a linkage system must bridge):

* **nicknames / hypocorisms** — "bill" vs "william" share 2 of 7
  letters; no edit or phonetic measure recovers them. The standard fix
  is a lookup table; the table here is a small curated set of common
  public English hypocorism pairs (the same shipped-data posture as
  `models/langmodels.py` — swap in a larger public table, e.g. the
  pd-nickname lists shipped by open RL toolkits, without touching the
  operators).
* **initialisms** — "j r smith" vs "james robert smith": token
  initials must be compared against single-letter tokens.

One table drives both engines (the `functions/phonetic.py` Caverphone
convention): `canonical_given_name_col` folds the dict into a Spark
CASE chain, `canonical_given_name_sql` renders the SAME dict as a
DuckDB CASE expression — zero transcription drift.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# curated common-English hypocorism -> canonical given name (public
# knowledge; lowercase on both sides). Deliberately small and boring —
# the CONTRACT (one dict, two renderings) is the deliverable; swap the
# data freely.
NICKNAMES: dict[str, str] = {
    "abby": "abigail",
    "al": "albert",
    "alex": "alexander",
    "andy": "andrew",
    "beth": "elizabeth",
    "bill": "william",
    "billy": "william",
    "bob": "robert",
    "bobby": "robert",
    "cathy": "catherine",
    "charlie": "charles",
    "chris": "christopher",
    "chuck": "charles",
    "dan": "daniel",
    "danny": "daniel",
    "dave": "david",
    "dick": "richard",
    "ed": "edward",
    "eddie": "edward",
    "fred": "frederick",
    "greg": "gregory",
    "hank": "henry",
    "harry": "henry",
    "jim": "james",
    "jimmy": "james",
    "joe": "joseph",
    "johnny": "john",
    "jon": "jonathan",
    "kate": "katherine",
    "katie": "katherine",
    "ken": "kenneth",
    "larry": "lawrence",
    "liz": "elizabeth",
    "maggie": "margaret",
    "matt": "matthew",
    "meg": "margaret",
    "mike": "michael",
    "nick": "nicholas",
    "pat": "patricia",
    "peggy": "margaret",
    "pete": "peter",
    "rick": "richard",
    "rob": "robert",
    "ron": "ronald",
    "sam": "samuel",
    "steve": "steven",
    "sue": "susan",
    "ted": "theodore",
    "tom": "thomas",
    "tony": "anthony",
    "will": "william",
}


def canonical_given_name_col(c: Column) -> Column:
    """Map a lowercase given-name token through :data:`NICKNAMES`
    (identity for everything else). Pure CASE chain — codegen, no UDF,
    no map-literal broadcast."""
    expr = None
    for nick, canon in sorted(NICKNAMES.items()):
        cond = c == nick
        expr = F.when(cond, canon) if expr is None else expr.when(cond, canon)
    return expr.otherwise(c)


def canonical_given_name_sql(expr: str) -> str:
    """The identical mapping rendered as a DuckDB CASE expression."""
    whens = "".join(
        f" WHEN '{nick}' THEN '{canon}'"
        for nick, canon in sorted(NICKNAMES.items())
    )
    return f"CASE {expr}{whens} ELSE {expr} END"


def initials_col(tokens: Column) -> Column:
    """Concatenated first letters of a token array ("james robert
    smith" tokens -> 'jrs') — the initialism key."""
    return F.array_join(
        F.transform(tokens, lambda t: F.substring(t, 1, 1)), ""
    )

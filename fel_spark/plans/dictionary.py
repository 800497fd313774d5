"""Alias-dictionary build — the datapack pipeline as one DataFrame job.

Re-expresses the reference's offline Pig dataflow (the `aggregate` ->
`compute` -> `join/gen` chain of `mine-datapack.sh:157-219`) over a corpus
of observed (alias, entity) events:

- filter bogus rows               (P1,  pig/aggregate-...pig:17-22)
- pair-count aggregation          (A1,  pig/aggregate-...pig:48-55)
- alias marginals                 (A2,  pig/aggregate-...pig:60-67)
- entity marginals                (A3,  pig/aggregate-...pig:93-100)
- multi-stage count joins         (J1-J3, pig/compute-...pig:68-80)
- global totals via GROUP ALL + CROSS (A5/J4, pig/compute-...pig:97-139)
- per-alias candidate packing     (A8,  pig/join-...pig:285-291)
- dense entity-id assignment      (W6,  bash sort|uniq|awk, mine-datapack.sh:157-162)

Input: an observations DataFrame (alias string, entity_name string,
clicked boolean, from_query boolean) — e.g. gold mentions, click logs, or
anchor text. Output: the FIXTURES.md §2 alias_dict + entity_names tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from fel_spark.functions.text import normalize_fast


def assign_entity_ids(observations: DataFrame) -> DataFrame:
    """Dense deterministic entity ids (W6): distinct names sorted,
    row_number. The global sort runs on the distinct-name set (dictionary
    scale), never on the corpus."""
    names = observations.select("entity_name").distinct()
    w = W.orderBy("entity_name")
    return names.withColumn("entity_id", (F.row_number().over(w) - 1).cast("int"))


def build_alias_dict(observations: DataFrame) -> tuple[DataFrame, DataFrame]:
    """observations -> (alias_dict, entity_names).

    Count semantics (FIXTURES.md §2 / FormatReader.java:88-130):
      QAT  = times alias observed in queries
      QAF  = times alias observed in queries leading to an entity (clicked)
      QAC  = clicks on alias
      LAT  = times alias observed in corpus (anchor space)
      LAF  = times alias observed as a link
      QAEF/LAET = pair counts; QEF/LET = entity marginals.
    """
    obs = (
        observations.withColumn("alias", normalize_fast("alias"))
        .filter((F.length("alias") > 0) & F.col("entity_name").isNotNull())
    )

    q = F.col("from_query").cast("long")
    c = (F.col("from_query") & F.col("clicked")).cast("long")
    a = (~F.col("from_query")).cast("long")
    al = ((~F.col("from_query")) & F.col("clicked")).cast("long")

    # A1: pair counts — ONE corpus pass carrying every partial sum, keyed
    # on the raw entity NAME so the dense-id assignment and its join both
    # run at dictionary scale afterwards. The alias/entity marginals
    # (A2/A3) are then re-aggregations of this dictionary-scale table, so
    # the corpus-scale observations (and the alias normalization) are
    # scanned once, not once per aggregate (the former shape re-ran the
    # scan + normalize 8x and broadcast-joined ids against the corpus).
    pair_n = obs.groupBy("alias", "entity_name").agg(
        F.sum(q).alias("_q"),
        F.sum(c).alias("QAEF"),
        F.sum(a).alias("_a"),
        F.sum(al).alias("LAET"),
    )
    ids = assign_entity_ids(pair_n)
    pair = pair_n.join(F.broadcast(ids), "entity_name").drop("entity_name")
    # A2: alias marginals (dictionary-scale re-agg)
    alias_m = pair.groupBy("alias").agg(
        F.sum("_q").alias("QAT"),
        F.sum("QAEF").alias("QAF"),
        F.sum("QAEF").alias("QAC"),
        F.sum("_a").alias("LAT"),
        F.sum("LAET").alias("LAF"),
    )
    # A3: entity marginals (dictionary-scale re-agg)
    ent_m = pair.groupBy("entity_id").agg(
        F.sum("QAEF").alias("QEF"), F.sum("LAET").alias("LET")
    )
    pair = pair.drop("_q", "_a")
    # J1/J3: attach marginals to pair counts
    out = (
        pair.join(alias_m, "alias")
        .join(ent_m, "entity_id")
        .withColumn("type", F.lit(0).cast("smallint"))
        .select(
            "alias",
            "QAF",
            "QAT",
            "QAC",
            "LAF",
            "LAT",
            "entity_id",
            "type",
            "QEF",
            "QAEF",
            "LET",
            "LAET",
        )
    )
    entity_names = ids.select("entity_id", F.col("entity_name").alias("name"))
    return out, entity_names


def propagate_qat_to_subngrams(
    aliases: DataFrame,
    alias_col: str = "alias",
    qat_col: str = "QAT",
    out_col: str = "QAT_sub",
    max_len: int = 8,
) -> DataFrame:
    """A12: alias-QAT propagation to contained sub-n-grams
    (`hash/CountNGramsFromQueries.java:96-115`): every alias receives the
    summed QAT of ALL dictionary aliases whose token sequence contains it as
    a contiguous sub-n-gram (including itself).

    Plan: explode each alias into its contiguous token spans (the reference
    enumerates all i..j spans; dictionary aliases are short — ``max_len``
    caps the span enumeration), hash-aggregate the emitted QAT per span,
    join back on the alias set. Two shuffles at dictionary scale, never
    corpus scale.
    """
    from fel_spark.functions.text import all_spans

    # materialize the token array before span enumeration: all_spans slices
    # its input inside nested HOF lambdas, which re-evaluate a non-column
    # argument per enumerated span
    subs = aliases.select(
        F.col(qat_col).alias("_q"),
        F.split(F.col(alias_col), " ").alias("_toks"),
    ).select(
        "_q",
        F.explode(all_spans(F.col("_toks"), max_len)).alias("_sp"),
    ).select(F.col("_sp.span").alias("_sub"), "_q")
    agg = subs.groupBy("_sub").agg(F.sum("_q").alias(out_col))
    return aliases.join(
        agg, aliases[alias_col] == agg["_sub"], "inner"
    ).drop("_sub")


def global_totals(alias_dict: DataFrame) -> DataFrame:
    """A5/J4: the 1-row GROUP ALL totals attached back via broadcast cross
    (pig/compute-graph-alias-entity-counts.pig:97-139)."""
    from fel_spark.operators.ranking import global_stats

    return global_stats(alias_dict)


def pack_candidates(alias_dict: DataFrame) -> DataFrame:
    """A8: one row per alias with the candidate entity group packed as an
    ordered array of structs — the datapack line shape
    (pig/join-alias-entity-counts.pig:285-291)."""
    return alias_dict.groupBy("alias", "QAF", "QAT", "QAC", "LAF", "LAT").agg(
        F.sort_array(
            F.collect_list(
                F.struct("entity_id", "type", "QEF", "QAEF", "LET", "LAET")
            )
        ).alias("entities"),
        F.count("*").alias("n_candidates"),
    )

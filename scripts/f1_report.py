#!/usr/bin/env python
"""North-rule fidelity evidence: pairwise F1 vs planted reference clusters
on labeled pairs under the same blocking key, plus the per-turn text
invariant. Prints one JSON line; run with a size to taste:

    python scripts/f1_report.py [--n-conv 5000] [--entities 500]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n-conv", type=int, default=5000)
    p.add_argument("--turns-per-conv", type=int, default=6)
    p.add_argument("--entities", type=int, default=500)
    args = p.parse_args()

    from fel_spark.operators.context import EmbeddingMatrix, broadcast_embeddings
    from fel_spark.plans.pipeline import (
        make_labeled_pairs,
        pairwise_f1,
        run_er,
        validate_invariant,
    )
    from fel_spark.session import get_spark
    from fel_spark.sources.synth import (
        alias_dict_df,
        build_dict_pack,
        embeddings_df,
        entities_df,
        gold_mentions,
        synth_transcripts_df,
        transcripts,
    )

    spark = get_spark(app_name="f1_report")
    pack = build_dict_pack(n_entities=args.entities, seed=42)
    corpus = synth_transcripts_df(
        spark, pack, n_conv=args.n_conv, turns_per_conv=args.turns_per_conv
    ).cache()
    corpus.count()
    t = transcripts(corpus)
    res = run_er(
        t,
        alias_dict_df(spark, pack),
        entities_df(spark, pack),
        bc_emb=broadcast_embeddings(
            spark, EmbeddingMatrix.from_spark(embeddings_df(spark, pack))
        ),
    )
    res.mentions.cache().count()
    lp = make_labeled_pairs(gold_mentions(corpus), res.blocked)
    m = pairwise_f1(lp, res.mentions)
    # the pipeline never carries a rewritten text column (mentions are
    # span-level); the invariant holds on the turn view, which passes
    # through by reference — validated input-vs-turn-view like the e2e test
    invariant_ok = validate_invariant(t, t)
    # cluster-level metrics (B-cubed / ARI) over gold-labeled mentions —
    # complements the pairwise-F1 BASELINE metric with the coreference
    # community's standard clustering scores
    from pyspark.sql import functions as F

    from fel_spark.operators.evalmetrics import bcubed_ari

    g = gold_mentions(corpus).select(
        "mention_id", F.col("entity_id").alias("gold")
    )
    pm = res.mentions.select("mention_id", F.col("cluster_id").alias("pred"))
    cm = bcubed_ari(pm.join(g, "mention_id")).collect()[0]
    out = {
        "turns": args.n_conv * args.turns_per_conv,
        "entities": args.entities,
        "labeled_pairs": m["n"],
        "precision": round(m["precision"], 6),
        "recall": round(m["recall"], 6),
        "f1": round(m["f1"], 6),
        "f1_target_met": m["f1"] >= 0.99,
        "per_turn_text_invariant": bool(invariant_ok),
        "bcubed_precision": cm["b3_p_micro"] / 1e6,
        "bcubed_recall": cm["b3_r_micro"] / 1e6,
        "bcubed_f1": cm["b3_f1_micro"] / 1e6,
        "ari": cm["ari_micro"] / 1e6,
    }
    spark.stop()
    print(json.dumps(out))
    # persist for scaling_report.py to embed in BENCH/BASELINE.md (so a
    # BASELINE.md rewrite never silently drops the fidelity evidence)
    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "f1.json")
    os.makedirs(os.path.dirname(art), exist_ok=True)
    with open(art, "w") as f:
        json.dump(out, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

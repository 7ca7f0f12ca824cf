"""Skew evidence: LSH hot-bucket salting bounds candidate-pair fan-out.

Boilerplate pages (or canonical-entity aliases) that share one MinHash
signature all land in one LSH band bucket — the self-join over that
bucket is quadratic. ``lsh_candidate_pairs(max_bucket=K)`` salts hot
buckets into sub-buckets of at most K, turning the hot bucket's
quadratic blow-up into ~cnt/K groups of ≤K² pairs (a recall trade:
cross-sub-bucket pairs are dropped; connected components re-merge the
survivors transitively).

This script builds a deliberately skewed entity table — one hot alias
family holding ``--hot-frac`` of all rows plus a uniform tail — and
measures candidate-pair counts and wall time with salting off
(max_bucket = table size) vs on (max_bucket 256). Prints one JSON line.

Usage: python scripts/skew_bench.py [--n 20000] [--hot-frac 0.3]
       [--max-bucket 256]
(NOTE: the unsalted pass is quadratic in n*hot_frac — 20k is ~19 s on
this VM; 200k would be a multi-hour blow-up.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--hot-frac", type=float, default=0.3)
    ap.add_argument("--max-bucket", type=int, default=256)
    args = ap.parse_args()

    from easyner_spark.session import get_spark
    from easyner_spark.stages.canonical import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    spark = get_spark(app_name="skew_bench", master="local[16]", shuffle_partitions=32)
    n_hot = int(args.n * args.hot_frac)
    # hot family: identical name -> identical signature -> one bucket;
    # tail: unique names spread across buckets
    ents = spark.range(args.n).select(
        F.concat(F.lit("E"), F.col("id")).alias("ent_id"),
        F.when(F.col("id") < n_hot, F.lit("acute respiratory syndrome"))
        .otherwise(F.concat(F.lit("entity name variant "), F.col("id")))
        .alias("name"),
    )
    sigs = minhash_signatures(ents).persist()
    sigs.count()

    out: dict = {"n": args.n, "n_hot": n_hot}
    for label, cap in (("unsalted", args.n + 1), ("salted", args.max_bucket)):
        t0 = time.time()
        pairs = lsh_candidate_pairs(sigs, max_bucket=cap).count()
        out[label] = {"pairs": pairs, "sec": round(time.time() - t0, 2)}
    out["fanout_reduction"] = round(
        out["unsalted"]["pairs"] / max(out["salted"]["pairs"], 1), 1
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""Scaling evidence: the same KG job at N and 4N local cores.

The target contract requires >=0.8 throughput scaling efficiency from
N to 4N executors. No multi-node cluster exists in this sandbox, so
(per the driver's instruction) we run the identical job at two local
parallelism levels in separate JVMs and report throughput at both plus
efficiency = throughput(4N) / (4 * throughput(N)).

Usage: python scripts/scaling_bench.py [--low 8 --high 32 --docs 24000]
Writes SCALING.json at the repo root and prints a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
cpus, n_docs = int(sys.argv[1]), int(sys.argv[2])
from easyner_spark.session import get_spark
from easyner_spark.corpus import GAZETTEER, NEL_LOOKUP, pages_df
from easyner_spark.stages.extract import extract_documents
from easyner_spark.stages.split import split_documents
from easyner_spark.stages.ner_dict import dict_ner
from easyner_spark.stages.nel import link_entities
from easyner_spark.stages.triples import cooccurrence_triples
from pyspark.sql import functions as F

spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
pages = pages_df(spark, n_docs=n_docs, n_partitions=cpus * 4).persist()
pages.count()
# warm-up pass compiles codegen + loads UDF workers so the measured
# pass sees steady-state costs at BOTH parallelism levels equally
def pipeline():
    docs = extract_documents(pages, n_batches=64).persist()
    stats = docs.agg(F.count("*").alias("n"), F.sum(F.length("text")).alias("c")).first()
    sents = split_documents(docs).persist()
    m = dict_ner(sents, GAZETTEER)
    lookup = spark.createDataFrame([{"entity": e, "id": i, "name": nm} for e, i, nm in NEL_LOOKUP])
    linked, _ = link_entities(m, lookup)
    linked = linked.persist()
    tr = cooccurrence_triples(linked, sents)
    nt = tr.count()
    for df in (docs, sents, linked):
        df.unpersist()
    return stats["n"], stats["c"], nt

pipeline()  # warm-up (small fraction of wall time, same for both levels)
t0 = time.time()
n, c, nt = pipeline()
dt = time.time() - t0
print(json.dumps({"cpus": cpus, "sec": round(dt, 3), "docs": n, "chars": int(c),
                  "triples": nt, "chars_per_sec": round(c / dt, 1),
                  "triples_per_sec": round(nt / dt, 1)}))
"""


def run_level(cpus: int, n_docs: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(n_docs)],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=1800,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--docs", type=int, default=24000)
    ap.add_argument(
        "--repeats",
        type=int,
        default=3,
        help="interleaved repeats per level; best run wins (this sandbox "
        "VM shows sporadic multi-second scheduler spikes — min filters them)",
    )
    args = ap.parse_args()

    runs: dict[int, list[dict]] = {args.low: [], args.high: []}
    for _ in range(args.repeats):
        runs[args.low].append(run_level(args.low, args.docs))
        runs[args.high].append(run_level(args.high, args.docs))
    lo = min(runs[args.low], key=lambda r: r["sec"])
    hi = min(runs[args.high], key=lambda r: r["sec"])
    lo["all_secs"] = [r["sec"] for r in runs[args.low]]
    hi["all_secs"] = [r["sec"] for r in runs[args.high]]
    ratio = args.high / args.low
    eff = (hi["chars_per_sec"] / lo["chars_per_sec"]) / ratio
    eff_t = (hi["triples_per_sec"] / lo["triples_per_sec"]) / ratio
    result = {
        "job": "kg_pipeline_synthetic",
        "docs": args.docs,
        "low": lo,
        "high": hi,
        "core_ratio": ratio,
        "scaling_efficiency_chars": round(eff, 3),
        "scaling_efficiency_triples": round(eff_t, 3),
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    print(
        f"\n| cores | sec | chars/s | triples/s |\n|---|---|---|---|\n"
        f"| {lo['cpus']} | {lo['sec']} | {lo['chars_per_sec']} | {lo['triples_per_sec']} |\n"
        f"| {hi['cpus']} | {hi['sec']} | {hi['chars_per_sec']} | {hi['triples_per_sec']} |\n"
        f"\nefficiency (chars): {eff:.3f}   efficiency (triples): {eff_t:.3f}"
    )


if __name__ == "__main__":
    main()

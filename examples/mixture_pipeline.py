#!/usr/bin/env python
"""Training-mixture pipeline: solve domain weights, admit documents to
the solved mixture, ship deterministic shards, audit the round trip.

    python examples/mixture_pipeline.py [sf_dir] [out_dir]

Stages (each documented where it is implemented):

1. solve the mixture   operators/dsir.py:doremi_domain_weights —
                       Group-DRO multiplicative weights over per-domain
                       excess loss under the corpus's own unigram LM
                       (DoReMi, Xie et al. 2023): domains the model
                       finds HARD get upweighted until the
                       mixture-weighted reference catches up
2. admit to mixture    operators/sampling.py:host_cap_sample_bucketed
                       with a per-domain Column cap — the deterministic
                       hash-rank admission every sampler here shares
                       (re-runs admit the SAME documents, no RNG), in
                       its few-groups form: no domain-only window
3. shard export        sinks/shard_export.py:export_training_shards —
                       md5 % N assignment, read-back manifest
4. trainer audit       sinks/shard_export.py:audit_shards — recount
                       the written files against the manifest before
                       burning GPU hours

At 100 TB the shuffles are: one tokenize + Zipf vocab join folding to
domain grain (1 — the solver itself iterates over the DOMAIN frame,
never rows), one (domain, hash-bucket) count pass plus a broadcast
admission join with an exact rank only inside each domain's cut
bucket (2), one shard exchange (3). The streaming sibling
(streaming/pipeline.py:shard_epoch_writer) appends micro-batches to the
same layout with an epoch-atomic manifest.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_mixture(spark, sf_dir: str, out_dir: str,
                  total_budget: int = 1000, n_shards: int = 4) -> dict:
    from dativo_ingest_spark.operators.dsir import doremi_domain_weights
    from dativo_ingest_spark.queries import load
    from dativo_ingest_spark.sinks.shard_export import (
        audit_shards, export_training_shards)

    docs = load(spark, sf_dir, "documents")

    # 1. solve the mixture (domain-grain frame; bounded)
    weights = doremi_domain_weights(docs, "source", "text",
                                    n_rounds=5, eta_milli=200)
    wrows = {r.domain: r for r in weights.collect()}

    # 2. per-domain budgets from the solved shares, admitted through
    #    the FEW-GROUPS form of the shared hash-rank sampler: with
    #    5-50 domains a Window.partitionBy(domain) row_number is one
    #    whole-domain sort task at 100x, so admission buckets rows by
    #    the admission hash's prefix, admits whole buckets via a
    #    broadcast semi-join, and ranks exactly only inside each
    #    domain's single cut bucket — the byte-identical admitted set,
    #    no domain-only window
    from dativo_ingest_spark.operators.sampling import (
        host_cap_sample_bucketed)

    budgets = {d: max(1, (r.weight_micro * total_budget) // 1_000_000)
               for d, r in wrows.items()}
    budget_expr = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in kv])
    # domains absent from the solved weights (all-empty text) map to
    # NULL — floor to 1 admitted doc, never a silent drop
    admitted = host_cap_sample_bucketed(
        docs, "source", "doc_id",
        cap=F.coalesce(budget_expr[F.col("source")], F.lit(1)),
        salt="mixture")

    # 3-4. ship + audit
    manifest = export_training_shards(
        admitted.withColumn(
            "n_tokens", F.size(F.split(F.trim(F.regexp_replace(
                F.lower(F.coalesce("text", F.lit(""))),
                r"\s+", " ")), " "))),
        "doc_id", "n_tokens", out_dir, n_shards=n_shards)
    manifest.coalesce(1).write.mode("overwrite").parquet(
        f"{out_dir}/manifest")
    audit = audit_shards(spark, out_dir)

    n_admitted = admitted.count()
    return {
        "domains": len(wrows),
        "weights": {d: int(r.weight_micro) for d, r in wrows.items()},
        "budgets": budgets,
        "admitted": n_admitted,
        "shards": audit["shards"],
        "audit_ok": audit["ok"],
    }


def main() -> int:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mixture_out"
    spark = (SparkSession.builder.master("local[*]")
             .config("spark.sql.shuffle.partitions", "32")
             .appName("mixture-pipeline").getOrCreate())
    try:
        report = build_mixture(spark, sf_dir, out)
        import json

        print(json.dumps(report, indent=1))
        return 0 if report["audit_ok"] else 1
    finally:
        spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""End-to-end training-corpus curation: the full operator stack in one
runnable script.

    python examples/curate_corpus.py [sf_dir] [out_dir]

Stages (each one documented where it is implemented):

0. blocklist + rules   operators/textops.py:blocklist_gate (C4-style
                       whole-token bad-word gate) then gopher_rules
                       (published Gopher heuristics) — both scan-stage
1. quality gate        operators/textops.py:classifier_score
2. outlier clip        operators/quality.py:quantile_clip (p1/p99 length)
3. exact dedup         operators/dedup.py:exact_dedup (survivor filter)
3b. passage excision   operators/dedup.py:remove_duplicate_passages
                       (cross-doc 8-gram spans keep one canonical copy)
4. near-dup resolve    minhash_lsh_pairs -> connected_components
5. decontamination     operators/dedup.py:benchmark_contamination
5b. DSIR targeting     operators/dsir.py (importance weights vs an
                       exemplar sample, Gumbel top-k keep)
6. mixture shaping     operators/sampling.py:temperature_mixture_sample
                       (alpha-smoothed per-language token shares)
7. leakage-safe split  operators/sampling.py:group_aware_split
                       (split by near-dup component, never by row)
8. chunk + pack        operators/chunking.py + sampling.pack_sequences
9. snapshot commit     sinks/table_commit.py (atomic, branch "curated")

Every stage is a lazy DataFrame transform; nothing executes until the
final writes, so Catalyst plans the whole flow together. At 100 TB the
shuffles are: one md5-fingerprint agg (3), signatures + banded buckets
(4), one tiny group aggregate (6), one group-key hash (7), one shard
exchange (8) — all documented in the operators' docstrings.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def curate(spark, sf_dir: str, out_root: str) -> dict:
    from dativo_ingest_spark.operators import (
        chunking, dedup, quality, sampling, textops)
    from dativo_ingest_spark.queries import load
    from dativo_ingest_spark.sinks.table_commit import FsTable

    docs = load(spark, sf_dir, "documents")
    n0 = docs.count()

    # 0a. blocklist gate: whole-token match (substring matching would
    #     flag 'classic' for 'ass' — the documented C4 false positive);
    #     report-then-enforce, so audits can count drops first
    bl = textops.blocklist_gate(docs, "doc_id", "text")
    docs = docs.join(bl.filter(~F.col("blocked")).select("id"),
                     docs.doc_id == F.col("id"), "left_semi")

    # 0. Gopher rule gate: the published heuristic set, scan-stage
    #    (thresholds relaxed to this corpus's short synthetic docs;
    #    production uses the operator defaults)
    rules = textops.gopher_rules(docs, "doc_id", "text",
                                 min_words=30, min_stopword_hits=1)
    docs = docs.join(rules.filter("gopher_ok").select("id"),
                     docs.doc_id == F.col("id"), "left_semi")
    n0b = docs.count()

    # 1. quality gate: distilled linear classifier, scan-stage
    scored = textops.classifier_score(docs, "doc_id", "text")
    docs = docs.join(scored.filter("keep").select("id"),
                     docs.doc_id == F.col("id"), "left_semi").persist()
    n1 = docs.count()   # materializes the barrier too

    # 1b. clip length outliers at data-driven percentiles; the fitted
    #     bounds are literals a production pipeline would persist and
    #     re-apply to every later batch (quality.apply_bounds)
    docs, _bounds = quality.quantile_clip(
        docs.withColumn("_len", F.length("text")), ["_len"], 0.01, 0.99)
    docs = docs.drop("_len")
    n1b = docs.count()

    # 2. exact dedup: min-id survivor per content fingerprint
    survivors = dedup.exact_dedup(docs, "doc_id", "text") \
        .select(F.col("survivor_id").alias("doc_id"))
    docs = docs.join(survivors, "doc_id", "left_semi")
    n2 = docs.count()

    # 2b. span-level passage excision (Lee et al. order: doc-level dedup
    #     first, then substring-level): cross-doc 8-gram passages keep
    #     one canonical copy, the rest rebuild without them
    cleaned = dedup.remove_duplicate_passages(docs, "doc_id", "text")
    docs = (
        docs.drop("text")
        .join(cleaned.select(F.col("id").alias("doc_id"), "text"),
              "doc_id")
    )
    n2b = docs.count()

    # 3. near-dup groups (MinHash-LSH), resolved to components; the
    #    component id doubles as the leakage-safety group for stage 5
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text")
    comp = dedup.connected_components(pairs, "id_a", "id_b")
    docs = (
        docs.join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .withColumn("group", F.coalesce("component", "doc_id"))
        .drop("component")
    )
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id"))
    docs = docs.join(F.broadcast(losers), "doc_id", "left_anti").persist()
    n3 = docs.count()   # barrier: downstream stages reuse, not re-derive

    # 4. benchmark decontamination: drop docs overlapping the eval set
    #    (here: a tiny planted benchmark built from the corpus tail)
    bench = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 97 == 0)
    contaminated = dedup.benchmark_contamination(
        docs, bench, "doc_id", "text"
    ).select(F.col("id").alias("doc_id")).distinct()
    # barrier: the mixture stage below runs three more actions over this
    # frame (token total, per-group sizes, count) — without the persist
    # each one would re-derive the contamination scan and re-broadcast
    docs = docs.join(F.broadcast(contaminated), "doc_id", "left_anti") \
        .persist()
    n4 = docs.count()

    # 4b. DSIR targeting: keep the 90% of survivors that most resemble
    #     an exemplar sample (here: every 89th doc stands in for the
    #     "books/wiki" target) — hashed-bigram importance weights,
    #     deterministic Gumbel top-k (operators/dsir.py)
    from dativo_ingest_spark.operators import dsir as dsir_mod

    exemplar = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 89 == 0).select("text")
    weights = dsir_mod.importance_weights(
        docs, "doc_id", "text", exemplar)
    chosen = dsir_mod.gumbel_topk_sample(
        weights, k=max(int(n4 * 0.9), 1)).select(
        F.col("id").alias("doc_id"))
    docs = docs.join(F.broadcast(chosen), "doc_id", "left_semi").persist()
    n4b = docs.count()

    # 4c. mixture shaping: alpha-smoothed per-language token shares at
    #     80% of the remaining volume (lifts low-resource languages)
    docs = docs.withColumn(
        "_tok", F.size(F.split(F.col("text"), r"\s+")))
    total_tokens = docs.agg(F.sum("_tok")).collect()[0][0] or 0
    docs = sampling.temperature_mixture_sample(
        docs, "doc_id", "lang", "_tok",
        budget_tokens=max(int(total_tokens * 0.8), 1), alpha=0.3,
    ).drop("_tok").persist()
    n5 = docs.count()

    # 5. leakage-safe split: hash the GROUP, so near-dup survivors and
    #    any future cluster members land on one side
    docs = sampling.group_aware_split(
        docs, "group", {"train": 0.95, "heldout": 0.05})

    # 6. chunk the train side and pack into fixed token budgets
    train = docs.filter(F.col("split") == "train")
    chunks = chunking.chunk_documents(train, "doc_id", "text",
                                      chunk_size=256, stride=192)
    staged = chunks.select(
        (F.col("id") * 10000 + F.col("chunk_id")).alias("cid"), "n_tokens")
    packed = sampling.pack_sequences(staged, "cid", "n_tokens",
                                     budget_tokens=4096, n_shards=8)

    # 7. atomic snapshot commits on a curated branch
    table = FsTable.create(out_root)
    table.create_branch("curated")
    table.write_append(docs.drop("text"), branch="curated")
    packs = packed.count()
    return {"input": n0, "gopher_kept": n0b,
            "quality_kept": n1, "length_clipped": n1b,
            "exact_deduped": n2, "passages_excised": n2b,
            "neardup_resolved": n3,
            "decontaminated": n4, "dsir_selected": n4b,
            "mixture_sampled": n5,
            "train_packs": packs,
            "table_version": table.current_version("curated")}


if __name__ == "__main__":  # pragma: no cover - exercised by tests
    import json
    import tempfile

    from dativo_ingest_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="curated_")
    spark = get_spark("curate-corpus", master="local[8]",
                      shuffle_partitions=8,
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "4g"})
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(curate(spark, sf_dir, out)))

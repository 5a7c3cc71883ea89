#!/usr/bin/env python
"""Quality-classifier pipeline: train the head in-engine, persist the
weights as a vendorable artifact, grade the corpus, gate a stream.

    python examples/classifier_pipeline.py [sf_dir] [out_dir]

Stages (each documented where it is implemented):

1. label              any deterministic rule or human/LLM labels; this
                      example uses lang == 'en' on the documents table
2. train              operators/training.py:train_quality_logreg —
                      full-batch logistic descent under the hard-sigmoid
                      surrogate; each round is ONE map-side-combinable
                      aggregate over a persisted scan-stage feature
                      frame, the 5-integer update runs driver-side
3. persist artifact   the weights land in a JSON file shaped like the
                      vendored models/quality_grades_v1.json precedent —
                      a retrained head ships by swapping the file
4. batch grade        operators/training.py:predict_quality_logreg —
                      the same integer margin + hard sigmoid, exact
                      train/serve score parity by construction
5. stream gate        streaming/pipeline.py:quality_admission_gate —
                      the frozen weights admit epochs scan-stage (zero
                      Python), composed with the deterministic shard
                      writer exactly like the mixture/KS/PSI gates

At 100 TB the shuffles are: the per-round gradient aggregate (partial →
final, one Exchange per round over a PERSISTED 6-column frame — the
corpus text is featurized once), and nothing else: grading and the
streaming gate are scan-stage filters. The gradient sums hold in int64
to ~9e11 documents (per-doc per-feature magnitude <= 1e7).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_classifier(spark, sf_dir: str, out_dir: str,
                     n_rounds: int = 4, lr_milli: int = 2000,
                     threshold_milli: int | None = None) -> dict:
    from dativo_ingest_spark.operators.training import (
        FEATURES, predict_quality_logreg, train_quality_logreg)
    from dativo_ingest_spark.queries import load
    from dativo_ingest_spark.streaming.pipeline import (
        quality_admission_gate, shard_epoch_writer, stream_from_files)

    os.makedirs(out_dir, exist_ok=True)
    docs = load(spark, sf_dir, "documents")

    # 1-2. label + train (one aggregate per round; driver sees 5 ints)
    labeled = docs.withColumn("y", (F.col("lang") == "en").cast("long"))
    trained = train_quality_logreg(labeled, "doc_id", "text", "y",
                                   n_rounds=n_rounds, lr_milli=lr_milli)
    wmap = {r.feature: int(r.weight_micro) for r in trained.collect()}
    weights = [wmap[f] for f in FEATURES]

    # 3. calibrate the admission threshold on the reference corpus
    #    (production heads are calibrated to a target admit-rate, not
    #    to the raw 0.5 boundary — an all-negative prior would
    #    otherwise gate everything out); the exact median is
    #    deterministic, computed ONCE, and frozen into the artifact
    graded0 = predict_quality_logreg(docs, "doc_id", "text", weights)
    if threshold_milli is None:
        threshold_milli = int(graded0.agg(
            F.expr("percentile(score_milli, 0.5)")).first()[0])

    # persist the artifact (the vendored-model precedent)
    artifact = {
        "kind": "quality_logreg_v1",
        "feature_names": list(FEATURES),
        "weights_micro": weights,
        "threshold_milli": threshold_milli,
        "trainer": {"n_rounds": n_rounds, "lr_milli": lr_milli,
                    "surrogate": "hard_sigmoid"},
    }
    with open(os.path.join(out_dir, "quality_logreg_v1.json"), "w") as fh:
        json.dump(artifact, fh, indent=2)

    # 4. batch grade under the trained head (scan-stage)
    n_docs = docs.count()
    n_admit_batch = graded0.filter(
        F.col("score_milli") >= threshold_milli).count()

    # 5. stream the corpus through the SAME frozen weights into the
    #    deterministic shard layout (one epoch; epoch-atomic manifest)
    src = os.path.join(out_dir, "spool")
    docs.select("doc_id", "text", "n_chars").coalesce(1) \
        .write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    gate = quality_admission_gate(
        weights, "text",
        shard_epoch_writer(os.path.join(out_dir, "shards"), "doc_id",
                           "n_chars", n_shards=2,
                           checkpoint_dir=os.path.join(out_dir, "ckpt")),
        threshold_milli=threshold_milli)
    q = (stream_from_files(spark, src, schema)
         .writeStream.foreachBatch(gate)
         .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    n_admit_stream = spark.read.parquet(
        os.path.join(out_dir, "shards")).count()

    return {
        "weights": wmap,
        "n_docs": int(n_docs),
        "admitted_batch": int(n_admit_batch),
        "admitted_stream": int(n_admit_stream),
        "artifact": os.path.join(out_dir, "quality_logreg_v1.json"),
    }


def main() -> int:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/classifier_out"
    spark = (SparkSession.builder.master("local[*]")
             .config("spark.sql.shuffle.partitions", "32")
             .appName("classifier-pipeline").getOrCreate())
    try:
        report = build_classifier(spark, sf_dir, out)
        print(json.dumps(report, indent=2))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

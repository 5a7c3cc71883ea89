"""Empirical scaling probe for the heavy near-dup family (r11 verdict
Next #4): the no-pair-join / linear-work claims are plan-gated, but plan
shape is not a growth curve. This module GENERATES synthetic corpora at
1×, 4× and 8× the sf0.1 documents table (the driver's testdata is
read-only) and times four operators end-to-end, asserting sub-quadratic
growth: t(8×) ≤ 12 × t(1×). A quadratic operator would show ≥64× on the
8× corpus minus fixed overhead — far outside the bound; the 12× slack
absorbs fixed job overhead, GC and scheduling noise on a 32-thread local
box.

Skip-marked by default (several minutes of deliberate load): run with

    SPARK_GRAFT_SCALING_PROBE=1 python -m pytest tests/test_scaling_probe.py -s

Numbers from the r12 run are recorded in SURVEY.md §6.
"""

from __future__ import annotations

import os
import random
import time

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALING_PROBE"),
    reason="deliberate multi-minute load; set SPARK_GRAFT_SCALING_PROBE=1",
)

#: sf0.1 documents is 5 000 rows × ~50 words; the probe scales that shape
BASE_DOCS = 5_000
SCALES = (1, 4, 8)
GROWTH_BOUND = 12.0  # t(8x) / t(1x) must stay under this


def _synth_docs(spark, n_docs: int, seed: int = 20260816):
    """Deterministic corpus with the duplication structure the operators
    are built for: a 250-word vocabulary, ~50-word documents, 20% of
    rows are near-duplicates of an earlier row (3 words swapped) and 5%
    exact duplicates — so candidate generation, CC resolution and
    passage stitching all do real work at every scale."""
    rng = random.Random(seed)
    vocab = [f"w{i:03d}" for i in range(250)]
    rows = []
    for i in range(n_docs):
        r = rng.random()
        if i > 10 and r < 0.05:
            src = rows[rng.randrange(len(rows))][1]
            rows.append((f"d{i:06d}", src))
        elif i > 10 and r < 0.25:
            words = rows[rng.randrange(len(rows))][1].split(" ")
            for _ in range(3):
                words[rng.randrange(len(words))] = rng.choice(vocab)
            rows.append((f"d{i:06d}", " ".join(words)))
        else:
            rows.append((f"d{i:06d}",
                         " ".join(rng.choice(vocab) for _ in range(50))))
    return spark.createDataFrame(rows, "doc_id string, text string")


def _time(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def _probe(spark, tmp_path, build):
    # untimed warmup on a tenth-size corpus: the first execution of each
    # operator pays ~10s of codegen/JIT that would otherwise inflate the
    # 1x point and flatter the ratio (measured: 19.9s cold vs 5.3s warm)
    warm = _synth_docs(spark, BASE_DOCS // 10, seed=1).persist()
    warm.count()
    build(warm, 0)
    warm.unpersist()
    spark.catalog.clearCache()
    timings = {}
    for scale in SCALES:
        df = _synth_docs(spark, BASE_DOCS * scale).persist()
        df.count()  # materialize generation outside the timer
        timings[scale] = _time(lambda: build(df, scale))
        df.unpersist()
        spark.catalog.clearCache()
    ratio = timings[8] / max(timings[1], 0.5)  # floor tiny denominators
    print(f"  timings {timings}  ratio(8x/1x) {ratio:.1f}")
    assert ratio <= GROWTH_BOUND, timings
    return timings


def test_ngram_jaccard_plus_cc_scaling(spark, tmp_path):
    from dativo_ingest_spark.operators import dedup

    def run(df, scale):
        pairs = dedup.ngram_jaccard_pairs(df, "doc_id", "text",
                                          threshold=0.5)
        comps = dedup.connected_components(pairs)
        comps.write.format("noop").mode("overwrite").save()

    _probe(spark, tmp_path, run)


def test_setsim_prefix_pairs_scaling(spark, tmp_path):
    from dativo_ingest_spark.operators import dedup

    def run(df, scale):
        sets = dedup.gram_sets(df, "doc_id", "text")
        dedup.setsim_prefix_pairs(sets, "id", "grams", threshold=0.7) \
            .write.format("noop").mode("overwrite").save()

    _probe(spark, tmp_path, run)


def test_remove_duplicate_passages_scaling(spark, tmp_path):
    from dativo_ingest_spark.operators import dedup

    def run(df, scale):
        dedup.remove_duplicate_passages(df, "doc_id", "text", n=8) \
            .write.format("noop").mode("overwrite").save()

    _probe(spark, tmp_path, run)


def test_minhash_ingest_dedup_scaling(spark, tmp_path):
    from dativo_ingest_spark.operators import dedup
    from dativo_ingest_spark.sinks.table_commit import FsTable

    def run(df, scale):
        table = FsTable.create(str(tmp_path / f"mh_ix_{scale}_{df.count()}"))
        kept, _, _ = dedup.dedup_minhash_against_index(
            df.sparkSession, df, "doc_id", "text", table)
        kept.unpersist()

    _probe(spark, tmp_path, run)


# --- embedding family (r12 verdict Next #4) --------------------------------

#: sf0.1 embeddings is 2 000 rows × 64 dims; the probe scales that shape
BASE_EMB = 2_000
EMB_DIM = 64


def _synth_emb(spark, n_rows: int, seed: int = 20260816):
    """Deterministic embeddings with the near-dup structure the banded
    index is built for: diverse random directions (real embeddings
    spread across sign patterns; a handful of shared directions would
    manufacture hot cells no production corpus has), 20% of rows are
    tiny-jitter copies of an earlier row (real near-dups for the
    cosine joins)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_rows):
        if i > 10 and rng.random() < 0.2:
            src = rows[rng.randrange(len(rows))][1]
            rows.append((i, [x + rng.uniform(-1e-4, 1e-4) for x in src]))
        else:
            rows.append((i, [rng.uniform(-1, 1) for _ in range(EMB_DIM)]))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>")


def _band_width(scale: int) -> int:
    """The documented operating discipline (dedup_embeddings_against_
    index docstring): grow band_width ~ log2(N) so per-band cells stay
    constant-sized as the corpus grows — the probe measures the
    operator UNDER its discipline, not a fixed-cell misconfiguration
    (which is quadratic-in-cell by design and warned about in-code)."""
    return 8 + {1: 0, 4: 2, 8: 3}.get(scale, 0)


def _probe_emb(spark, build):
    warm = _synth_emb(spark, BASE_EMB // 10, seed=1).persist()
    warm.count()
    build(warm, 0)
    warm.unpersist()
    spark.catalog.clearCache()
    timings = {}
    for scale in SCALES:
        df = _synth_emb(spark, BASE_EMB * scale).persist()
        df.count()
        timings[scale] = _time(lambda: build(df, scale))
        df.unpersist()
        spark.catalog.clearCache()
    ratio = timings[8] / max(timings[1], 0.5)
    print(f"  timings {timings}  ratio(8x/1x) {ratio:.1f}")
    assert ratio <= GROWTH_BOUND, timings
    return timings


@pytest.mark.parametrize("codec", ["raw", "pq", "pq_residual"])
def test_embedding_ingest_dedup_scaling(spark, tmp_path, codec):
    from dativo_ingest_spark.operators import quantization as Q
    from dativo_ingest_spark.operators import similarity
    from dativo_ingest_spark.sinks.table_commit import FsTable

    def run(df, scale):
        table = FsTable.create(
            str(tmp_path / f"emb_ix_{codec}_{scale}_{df.count()}"))
        kw: dict = {"index_codec": codec,
                    "band_width": _band_width(scale)}
        if codec == "pq":
            kw["codebooks"] = Q.pq_train(df, "vec_id", "embedding",
                                         m=4, k=8, n_iter=1)
        elif codec == "pq_residual":
            kw["artifact"] = Q.ivfpq_train_artifact(
                df, "vec_id", "embedding", m=4, k_codes=8, n_cells=8,
                n_iter=1)
        kept, _, _ = similarity.dedup_embeddings_against_index(
            df.sparkSession, df, "vec_id", "embedding", table,
            threshold=0.95, **kw)
        kept.unpersist()

    _probe_emb(spark, run)


def test_bucketed_neardup_pairs_scaling(spark, tmp_path):
    from pyspark.sql import functions as F

    from dativo_ingest_spark.operators import similarity

    def run(df, scale):
        # bucket count grows with the corpus (the IVF discipline: more
        # cells, constant cell size) — a fixed bucket count is
        # quadratic-in-bucket by construction and guarded in-code
        bucketed = df.withColumn(
            "bucket", F.col("vec_id") % (64 * max(scale, 1)))
        similarity.bucketed_neardup_pairs(
            bucketed, "vec_id", "embedding", "bucket", threshold=0.95
        ).write.format("noop").mode("overwrite").save()

    _probe_emb(spark, run)


def test_kcenter_coreset_scaling_k40(spark, tmp_path):
    from dativo_ingest_spark.operators import coreset

    def run(df, scale):
        # the operator quantizes to micro codes itself
        coreset.kcenter_select(df, "embedding", "vec_id", k=40)

    _probe_emb(spark, run)


def test_ivfpq_persistent_serve_scaling(spark, tmp_path):
    """Serve-path probe under the operating discipline (r13 verdict
    Next #5): n_cells grows ~√N with the corpus (constant expected cell
    size per √N shard, the FAISS rule of thumb), n_probe fixed. Records
    per scale: serve wall time, files-read fraction after the manifest
    prune, recall@k vs the exact integer-grid truth. The claims under
    test: serve latency grows sub-linearly (the probed slice, not the
    corpus) and the files-read fraction does NOT grow (more cells →
    smaller probed slice)."""
    from dativo_ingest_spark.operators import quantization as Q
    from dativo_ingest_spark.operators.clustering import _spark_round9
    from dativo_ingest_spark.sinks.table_commit import FsTable

    N_PROBE, TOPK = 4, 10
    report = {}
    for scale in SCALES:
        n = BASE_EMB * scale
        df = _synth_emb(spark, n).persist()
        df.count()
        n_cells = max(8, int(round((n ** 0.5) / 5)))  # ~sqrt(N) cells
        art = Q.ivfpq_train_artifact(
            df, "vec_id", "embedding", m=4, k_codes=8,
            n_cells=n_cells, n_iter=1, coarse_n_iter=1)
        t = FsTable.create(str(tmp_path / f"serve_ix_{scale}"))
        # two appends: the realistic incremental shape
        Q.ivfpq_index_build(df.filter(F.col("vec_id") % 2 == 0),
                            "vec_id", "embedding", t, artifact=art)
        Q.ivfpq_index_append(df.filter(F.col("vec_id") % 2 == 1),
                             "vec_id", "embedding", t, art)
        queries = {int(r["vec_id"]): [float(x) for x in r["embedding"]]
                   for r in df.filter(F.col("vec_id") < 4).collect()}
        # warm the serve plan untimed, then time it
        Q.ivfpq_index_topk(spark, t, art, queries, n_probe=N_PROBE,
                           k=TOPK).collect()
        serve_s = _time(lambda: Q.ivfpq_index_topk(
            spark, t, art, queries, n_probe=N_PROBE, k=TOPK).collect())
        # files-read fraction: replicate the serve path's probed hull
        probed: set = set()
        for qv in queries.values():
            qq = [Q._quantize_driver(x, art["scale"]) for x in qv]
            dists = []
            for cid, cv in enumerate(art["cells"]):
                acc = 0.0
                for a, b in zip(qq, cv):
                    acc += (a - b) * (a - b)
                dists.append((_spark_round9(acc), cid))
            dists.sort()
            probed.update(c for _, c in dists[:N_PROBE])
        snap = t.snapshot(t.current_version())
        statful = [f for f in snap.files if f.get("num_rows")]
        pruned = t.matching_files(snap, [("cell", ">=", min(probed)),
                                         ("cell", "<=", max(probed))])
        frac = len([f for f in pruned if f.get("num_rows")]) \
            / max(len(statful), 1)
        # recall@k vs the exact grid truth
        truth = Q.exact_grid_topk(df, "vec_id", "embedding",
                                  list(queries), k=TOPK)
        approx = Q.ivfpq_index_topk(spark, t, art, queries,
                                    n_probe=N_PROBE, k=TOPK)
        rec = Q.recall_at_k(
            approx.select("query_id", F.col("id").alias("vec_id")),
            truth, TOPK).collect()
        recall = sum(int(r["recall_micro"]) for r in rec) / len(rec) / 1e6
        report[scale] = {"n": n, "n_cells": n_cells,
                         "serve_s": serve_s,
                         "files_frac": round(frac, 3),
                         "recall": round(recall, 3)}
        df.unpersist()
        spark.catalog.clearCache()
    print(f"  serve probe {report}")
    assert report[8]["serve_s"] <= GROWTH_BOUND * max(
        report[1]["serve_s"], 0.5)
    # the prune's whole point: the read fraction must not grow with N
    assert report[8]["files_frac"] <= report[1]["files_frac"] + 0.05, \
        report

#!/usr/bin/env python
"""End-to-end retrieval/serving pipeline: the round-9 search stack in
one runnable script.

    python examples/retrieval_pipeline.py [sf_dir]

Stages (each documented where it is implemented):

0. canonicalize     operators/textops.py:unicode_normalize — NFC +
                    accent fold so lexical hashing is well-defined
1. lexical leg      operators/textops.py:bm25_topk — exact-integer
                    Okapi BM25 over the normalized corpus
2. semantic leg     operators/quantization.py — the PERSISTED IVF-PQ
                    index (r13): a frozen artifact (coarse cells +
                    residual codebooks) trains once, half the corpus
                    commits as (cell, codes) rows to an FsTable
                    range-clustered by cell, the rest APPENDS
                    incrementally, and top-k serves against the
                    committed snapshot reading only the probed cells'
                    files (manifest-stats pruning)
3. fusion           operators/similarity.py:rrf_fuse — exact-integer
                    reciprocal-rank fusion of the two legs
4. health gates     operators/similarity.py:embedding_isotropy (the
                    vectors' own drift monitor) and
                    operators/profiling.py:ks_drift (score-distribution
                    drift between the two legs' candidate pools)

Every stage is a lazy DataFrame transform until the collects at the
end; at 100 TB the semantic leg scans the ~384x-smaller codes frame
(probed cells only) and the lexical leg's cost scales with matched
query terms, never the corpus vocabulary.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def search(spark: SparkSession, sf_dir: str) -> dict:
    from dativo_ingest_spark.operators import quantization as pq
    from dativo_ingest_spark.operators import similarity, textops
    from dativo_ingest_spark.queries import load

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")

    # 0. canonicalize text once; every lexical stage reads norm_text
    norm = textops.unicode_normalize(docs, "doc_id", "text")
    corpus = norm.select(F.col("id").alias("doc_id"),
                         F.col("norm_text").alias("text"))

    # 1. lexical candidates
    queries_lex = {"h0": ["hash", "join", "table"],
                   "h1": ["stream", "window", "batch"]}
    lex = textops.bm25_topk(corpus, "doc_id", "text", queries_lex, k=20)

    # 2. semantic candidates served from the PERSISTED IVF-PQ index:
    #    train the frozen artifact, commit half the corpus, append the
    #    rest (the incremental production shape), then serve from the
    #    committed snapshot — the read opens only files whose [min,max]
    #    cell stats intersect the probed cells
    import shutil
    import tempfile

    from dativo_ingest_spark.sinks.table_commit import FsTable

    qvecs = {int(r["vec_id"]): [float(x) for x in r["embedding"]]
             for r in emb.filter(F.col("vec_id").isin(0, 1)).collect()}
    ix_root = tempfile.mkdtemp(prefix="retrieval_ivfpq_ix_")
    index = FsTable.create(ix_root + "/ix")
    # coarse_n_iter=1 (r14): Lloyd-train the coarse quantizer on the
    # integer grid — balanced cells keep the manifest prune and the
    # residual code budget honest at realistic cell counts
    art = pq.ivfpq_train_artifact(emb, "vec_id", "embedding",
                                  m=2, k_codes=4, n_cells=4, n_iter=1,
                                  coarse_n_iter=1)
    pq.ivfpq_index_build(emb.filter(F.col("vec_id") % 2 == 0),
                         "vec_id", "embedding", index, artifact=art)
    pq.ivfpq_index_append(emb.filter(F.col("vec_id") % 2 == 1),
                          "vec_id", "embedding", index, art)
    sem = pq.ivfpq_index_topk(spark, index, art, qvecs, n_probe=2, k=20)

    # 3. fuse: map both legs onto shared hybrid query ids
    lex_r = lex.select("query_id", F.col("id").alias("neighbor_id"),
                       "rank")
    sem_r = sem.select(
        F.when(F.col("query_id") == 0, "h0").otherwise("h1")
        .alias("query_id"),
        F.col("id").alias("neighbor_id"), "rank")
    fused = similarity.rrf_fuse([lex_r, sem_r], k=10)

    # 4. health gates
    iso = similarity.embedding_isotropy(emb, "vec_id", "embedding") \
        .collect()[0]

    try:
        results = [r.asDict() for r in fused.collect()]
    finally:
        shutil.rmtree(ix_root, ignore_errors=True)
    assert results, "fusion produced no candidates"
    per_q = {}
    for r in results:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == {"h0", "h1"}
    for rows in per_q.values():
        ranks = sorted(x["fused_rank"] for x in rows)
        assert ranks == list(range(1, len(rows) + 1))
        # consensus candidates (both legs) outrank single-leg ones at
        # equal contribution counts by construction of RRF
        assert any(x["n_lists"] == 2 for x in rows) or len(rows) <= 10

    return {
        "queries": len(per_q),
        "fused_candidates": len(results),
        "anisotropy_micro": int(iso.anisotropy_micro),
        "n_vectors": int(iso.n_vectors),
    }


if __name__ == "__main__":  # pragma: no cover - exercised by tests
    import json

    from dativo_ingest_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("retrieval-pipeline", master="local[8]",
                      shuffle_partitions=8,
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.driver.memory": "4g"})
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(search(spark, sf_dir)))

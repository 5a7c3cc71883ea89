#!/usr/bin/env python
"""Headline benchmark: runs representative queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": headline_sec, "unit": "sec",
"queries": {name: sec}, "extended": {name: sec}, "ingest": {...}, "sf": ...}.

Structure (r9, per the r8 verdict's ask):

- ``queries`` is the FROZEN headline — the heaviest shape per operator
  family, best-of-2, stable across rounds so round-over-round deltas mean
  code, not list growth. Do NOT add to HEADLINE; new operators go in
  EXTENDED.
- ``extended`` is the full per-family sweep (single pass). Skip it with
  ``SPARK_GRAFT_BENCH_HEADLINE_ONLY=1`` while iterating.
- ``ingest`` runs FIRST, in a FRESH subprocess JVM: r8 measured in-process
  post-headline parquet trials degraded 5x by JVM remnants while the same
  phase in an isolated JVM sat in the idle band. The subprocess also runs
  before any headline load, so its per-trial loadavg columns reflect
  external machine state, not our own decay.

Each query executes end-to-end into the noop sink (full plan runs, nothing
collected to the driver), which measures engine throughput rather than
driver serialization.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dativo_ingest_spark import get_spark  # noqa: E402
from dativo_ingest_spark.queries import QUERIES  # noqa: E402

#: FROZEN r9 headline — the heaviest representative per operator family.
#: This list is the round-over-round comparison surface: do not grow it
#: (new operators belong in EXTENDED), do not reorder it. Chosen from the
#: r8 full-sweep timings as the most expensive shape in each family whose
#: 100 TB cost claim needs a per-round pin.
HEADLINE = [
    # scan-agg / TPC-H shapes: the wide aggregate, the widest broadcast
    # tree, the one legitimate fact-fact shuffle join, and the
    # EXISTS/NOT-EXISTS decorrelated self-join
    "q1_pricing_summary",
    "q8_market_share",
    "q12_late_shipments",
    "q21_waiting_suppliers",
    # distinct-agg and window families
    "agg_distinct_users_by_type",
    "window_topn_orders_per_customer",
    "events_session_windows",
    "sliding_distinct_users",
    # dedup: md5 fold, LSH banding, pair-join + connected components +
    # quality argmax, the lossless PPJoin (heaviest dedup shape), and the
    # two persistent-index ingest paths (per-batch cost must stay flat)
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_quality_resolved",
    "setsim_prefix_pairs_docs",
    "dedup_ingest_exact",
    "dedup_ingest_embedding",
    # similarity/clustering: exact baseline, IVF, Lloyd iteration, the
    # composed SemDeDup pipeline, and the k-scan Gonzalez coreset
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "kmeans_corpus_clusters",
    "semantic_dedup_pipeline",
    "kcenter_coreset_embeddings",
    # corpus statistics / tokenization: the two-Zipf-join bigram LM, the
    # positioned-8-gram passage excision, BPE counting and training
    "bigram_logprob_quality",
    "passage_removal_docs",
    "token_count_bpe_docs",
    "bpe_train_merges_docs",
    # linkage (deletion-variant equi-join + candidate-only levenshtein)
    "entity_resolution_customers",
    # table-format MERGE (snapshot commit machinery) and the SCD2
    # point-in-time interval join
    "merge_upsert_orders",
    "scd2_pit_join_events",
    # temporal: user-keyed as-of join + decayed attribution rollup
    "attribution_time_decay",
]

#: Full per-family sweep (single pass, skippable). Everything formerly in
#: the growing r8 headline that isn't in the frozen list above, plus new
#: r9 operators as they land. Order groups families.
EXTENDED = [
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_revenue_forecast",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q11_important_stock",
    "q14_promo_effect",
    "q16_supplier_part_count",
    "events_tumbling_window",
    "events_interval_join",
    "dedup_simhash",
    "dedup_ingest_minhash",
    "dedup_lines_docs",
    "dedup_bloom_index_docs",
    "duplicate_passage_ngrams",
    "ann_topk_quantized",
    "pq_adc_topk_embeddings",
    "ivfpq_topk_embeddings",
    "ivfpq_residual_embeddings",
    "embedding_isotropy_report",
    "hybrid_retrieval_docs",
    "rrf_fusion_topk",
    "embedding_prototypicality",
    "hard_negatives_embeddings",
    "random_projection_embeddings",
    "text_quality_features",
    "token_counts_docs",
    "pii_scrub_docs",
    "tfidf_top_terms",
    "unigram_logprob_quality",
    "kneser_ney_quality",
    "unigram_drift_docs",
    "quality_classifier_score",
    "classifier_infer_docs",
    "gopher_rules_docs",
    "html_strip_docs",
    "unicode_normalize_docs",
    "char_entropy_docs",
    "dsir_weights_docs",
    "perplexity_bucket_mix",
    "feature_hash_docs",
    "frequent_words_docs",
    "pmi_collocations_docs",
    "blocklist_gate_docs",
    "credit_card_luhn_docs",
    "flesch_reading_ease_docs",
    "mdkv_row_per_kv",
    "multimodal_byte_stats",
    "image_dhash_pairs",
    "audio_fingerprint_dups",
    "chunk_documents_sliding",
    "chunk_sentences_docs",
    "chunk_pack_pipeline",
    "sample_token_budget",
    "sample_token_budget_sharded",
    "temperature_mixture_docs",
    "group_aware_split_docs",
    "epoch_shuffle_order",
    "host_cap_sample_docs",
    "systematic_sample_docs",
    "hash_sample_exact_n_docs",
    "fuzzy_name_match",
    "range_join_error_purchase",
    "gapfill_locf_event_value",
    "rollup_incremental_events",
    "scd2_user_event_history",
    "approx_distinct_users",
    "sliding_distinct_hll_events",
    "quantile_clip_events",
    "dq_expectations_events",
    "join_fanout_orders",
    "referential_orders_customer",
    "mad_outlier_events",
    "anomaly_zscore_events",
    "equi_depth_bins_events",
    "weighted_median_docs",
    "profile_columns_events",
    "dataset_card_docs",
    "gini_sources_docs",
    "fd_discovery_orders",
    "psi_drift_events",
    "ks_drift_events",
    "bm25_topk_docs",
    "corr_by_type_events",
    "skew_report_events",
    "cm_sketch_users",
    "sketch_rollup_serving",
    "sorted_export_orders",
    "export_shards_docs",
    "funnel_view_click_purchase",
    "cohort_retention_weekly",
    "attribution_last_touch",
    "event_transitions_markov",
    "cusum_changepoint_events",
    "cumulative_new_users_daily",
    "ab_test_events",
    "mannwhitney_events",
    "chi_square_events",
    "sprt_events",
    "basket_lift_events",
    "benford_orders",
    "pareto_abc_parts",
    "grouped_topk_spenders",
    "ohlc_daily_events",
    "zorder_keys_events",
    "skew_salted_join_events",
    # r10 operators
    "doremi_weights_docs",
    "ann_recall_ivfpq_embeddings",
    # r11: token accounting under the vendored 3,588-merge table (the
    # rank-dict kernel — production-shape proof next to the frozen
    # 64-merge headline row)
    "token_count_bpe_v1_docs",
    # r11: learned pair-scorer rerank of the fused retrieval top-k
    "cross_encoder_rerank_docs",
    # r11: exact-substring >= L passage removal (Lee et al. contract)
    "passage_exact_substring_docs",
    # r11: streaming mixture admission (two availableNow epochs)
    "streaming_mixture_admission_docs",
    # r11: rerank quality meter (recall@5 + top-1 RR vs exact)
    "rerank_quality_embeddings",
    # r11: exact bucketed per-group cap (mixture-admission topology)
    "host_cap_bucketed_docs",
    # r11: distributed plugin reader through the mapInPandas seam
    "plugin_partitioned_read",
    # r11: live JDBC incremental read over embedded Derby
    "jdbc_cursor_read_nation",
    # r11: live Airbyte-protocol subprocess bridge
    "airbyte_engine_read",
    # r11: Drive CSV extraction through the injectable client seam
    "gdrive_csv_extract",
    # r11: Sheets A1-range extraction (ragged pad, mtime skip)
    "gsheets_extract",
    # r11: JSONL contract source (key union, nested degradation)
    "jsonl_contract_read",
    # r11 batch 3: in-engine classifier training (3 GD rounds, one
    # aggregate each over the persisted fixed-point feature frame)
    "logreg_train_quality_docs",
    # r11 batch 3: the config/lifecycle proof sweep (each drives real
    # machinery — subprocess engines, the jail, the runner — so their
    # cost is harness-honest, not plan-bound)
    "stripe_engine_read",
    "singer_engine_read",
    "runner_csv_lifecycle",
    "engine_state_passthrough",
    "plugin_sandbox_jail_read",
    "writer_plugin_roundtrip",
    "mysql_blob_coercion",
    "s3_upload_directory",
    "secrets_resolve_config",
    "secrets_env_manager",
    "catalog_push_openmetadata",
    "cron_next_fires",
    "registry_mode_gate_matrix",
    "mtime_skip_files",
    "retry_backoff_plan",
    "recipe_odcs_job_resolve",
    "jdbc_probe_sql",
    # r11 batch 4: frozen-weights quality gate through a real
    # two-epoch writeStream; one-vs-rest multiclass grade training
    "streaming_quality_admission_docs",
    "multiclass_grades_train_docs",
    # r12: PQ-coded persistent embedding index (train + two ingest
    # lifecycles with in-plan reconstruction scoring)
    "dedup_ingest_embedding_pq",
    # r13: residual codec ingest lifecycle; persisted IVF-PQ retrieval
    # index (build + incremental append + pruned serve)
    "dedup_ingest_embedding_pqr",
    "ivfpq_persistent_serve",
]


def loadavg1() -> float:
    """1-minute load average at this instant (-1 where unsupported) —
    recorded per trial so a load-contaminated record is self-evident."""
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover - non-unix
        return -1.0


#: wait-for-idle bounds: the bench refuses to START while external load is
#: high (FOUR recorded rounds were visibly contaminated by co-running
#: work), but never waits unboundedly — after IDLE_WAIT_MAX_S it proceeds
#: and the per-trial loadavg columns make the contamination self-evident.
#: r9 raised the cap 120s -> 600s: the 120s cap lost to the driver's own
#: preceding work four rounds running (r8 started at loadavg 3.42 with the
#: wait exhausted).
IDLE_LOADAVG_THRESHOLD = 1.5
IDLE_WAIT_MAX_S = 600.0

#: r12 (r11 verdict "What's wrong #1"): the headline phase gets its own
#: bounded wait pool. Two sources of headline contamination were visible
#: in the r8-r11 records: (a) the ingest subprocess immediately precedes
#: pass 1, so the 1-minute loadavg at pass-1 start is partly OUR OWN
#: decaying load — a short wait clears it; (b) external load that
#: outlives the start gate. Both are handled the same way: wait (bounded,
#: shared pool) before EACH pass, and if every pass still started above
#: the gate, re-run instead of booking (up to MAX_HEADLINE_PASSES).
HEADLINE_MIN_PASSES = 2
HEADLINE_MAX_PASSES = 4
#: 300 s, not another 600: self-load decays with the 1-minute loadavg
#: time constant (measured 100 s + 45 s waits sufficed from a full
#: full-load ingest phase), while external load that outlives 300 s would
#: outlive 600 s too — the smaller pool bounds the bench's worst-case
#: wall-clock on a hot box (the start gate already spends up to 600 s)
HEADLINE_WAIT_POOL_S = 300.0


#: r13 (r12 verdict "What's wrong #1"): loadavg alone cannot see a host
#: whose CPUs are simply SLOWER (cgroup throttling, co-tenant steal) — r12
#: stamped an 87s headline "clean" at loadavg 1.39 while the same record's
#: CSV trial ran 21x the idle band. The canary is an in-band host-SPEED
#: probe: a fixed, pure-JVM, whole-stage-codegen workload (range + modulo
#: fold, 32 partitions, no I/O, no Python, no shuffle) timed best-of-3
#: immediately before each headline pass and each ingest phase. A pass
#: whose canary exceeds the in-repo reference band is stamped dirty even
#: if loadavg is quiet. Reference = best-of-3 on the calibration host,
#: idle (r13: trials 1.06-1.28s, best-of-3 stable at 1.06 across windows).
#: Gate at 1.5x, not the verdict's literal 15%: single trials on the SAME
#: idle host measured a 1.8x spread (0.44-1.13s at 2e9 scale), so a 15%
#: gate on best-of-3 would false-positive on scheduler jitter; 1.5x still
#: catches every real degradation seen to date (the r12 slow host ran 21x).
CANARY_ROWS = 8_000_000_000
CANARY_REF_S = 1.06
CANARY_SLOW_RATIO = 1.5
CANARY_TRIALS = 3

#: r14 (r13 verdict "What's wrong #1" / Next #4): the CPU canary is
#: blind to DISK pressure — a 1.3 GB stale tmp dir measurably degraded
#: r13 parquet writes to 1.73 s under perfectly clean CPU canaries. The
#: I/O canary is a fixed 256 MiB buffered write + fsync + read-back on
#: the bench's own work filesystem, best-of-2, bracketing the parquet
#: WRITE phase the same way the CPU canary brackets compute. Reference
#: = best-of-2 on the calibration host with a clean tmp (r14: 0.80 to
#: 0.90 s across four idle trials — fsync-bound, tight spread). Gate at
#: 3x: write-cache flush timing is noisier than the codegen loop, and
#: the observed degradation mode (stale-dir page-cache pressure) showed
#: >5x on the affected write trials.
IO_CANARY_BYTES = 256 * 1024 * 1024
IO_CANARY_REF_S = 0.85
IO_CANARY_SLOW_RATIO = 3.0


def run_io_canary(work_dir: str) -> float:
    """Best-of-2 wall time of the fixed disk probe: 256 MiB buffered
    write + fsync + sequential read-back under ``work_dir`` (the same
    filesystem the timed parquet trials hit)."""
    buf = b"\x5a" * (8 * 1024 * 1024)
    best = None
    for i in range(2):
        path = os.path.join(work_dir, f"_io_canary_{i}.bin")
        t0 = time.perf_counter()
        with open(path, "wb") as fh:
            for _ in range(IO_CANARY_BYTES // len(buf)):
                fh.write(buf)
            fh.flush()
            os.fsync(fh.fileno())
        with open(path, "rb") as fh:
            while fh.read(64 * 1024 * 1024):
                pass
        dt = time.perf_counter() - t0
        os.remove(path)
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def io_canary_slow(io_s: float) -> bool:
    return io_s > IO_CANARY_REF_S * IO_CANARY_SLOW_RATIO


def clean_stale_tmp(min_age_s: float = 1800.0) -> int:
    """Remove leftover bench/query scratch dirs (``dativo_bench_*``,
    ``sg_*`` — every mkdtemp prefix this repo creates) older than
    ``min_age_s`` from the system tmp dir. r13 found a 1.3 GB stale dir
    from a crashed run silently degrading parquet-write trials; the
    booking recipe said "clean it by hand" — this makes the cleanup
    part of the harness (r13 verdict Next #4). The age gate protects a
    CONCURRENT run's live scratch."""
    import glob
    import shutil
    import tempfile

    now = time.time()
    n = 0
    for pat in ("dativo_bench_*", "sg_*"):
        for path in glob.glob(os.path.join(tempfile.gettempdir(), pat)):
            try:
                if now - os.path.getmtime(path) < min_age_s:
                    continue
                if os.path.isdir(path):
                    shutil.rmtree(path, ignore_errors=True)
                else:
                    os.remove(path)
                n += 1
            except OSError:
                continue
    return n


def run_canary(spark) -> float:
    """Best-of-3 wall time of the fixed pure-JVM canary workload; the
    codegen-compile warm runs once per JVM (tracked on the session)."""
    def one() -> float:
        t0 = time.perf_counter()
        spark.range(0, CANARY_ROWS, 1, 32).selectExpr(
            "sum(id % 1000003) as s"
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    if not getattr(spark, "_canary_warm", False):
        one()  # codegen compile + executor-thread spin-up, untimed
        spark._canary_warm = True
    return round(min(one() for _ in range(CANARY_TRIALS)), 3)


def canary_slow(canary_s: float) -> bool:
    return canary_s > CANARY_REF_S * CANARY_SLOW_RATIO


def wait_for_idle(threshold: float = IDLE_LOADAVG_THRESHOLD,
                  max_wait_s: float = IDLE_WAIT_MAX_S) -> float:
    """Block (bounded) until the 1-minute loadavg drops under
    ``threshold``; returns seconds actually waited. Set
    ``SPARK_GRAFT_NO_IDLE_WAIT=1`` to skip (CI loops that own the box)."""
    if os.environ.get("SPARK_GRAFT_NO_IDLE_WAIT"):
        return 0.0
    start = time.time()
    while loadavg1() > threshold and time.time() - start < max_wait_s:
        time.sleep(5.0)
    return round(time.time() - start, 1)


def _bench_spark(cpus: str):
    spark = get_spark(
        "dativo-ingest-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
            # commit by direct task-attempt rename (v2): the v1 driver-side
            # sequential job-commit rename is pure overhead at bench scale
            # and an O(files) serial step at production scale
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version":
                "2",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_ingest(spark, sf_dir: str) -> dict:
    """Ingestion throughput vs BASELINE.md rows 1/3 (CSV scan, Parquet
    write). Measured at the baseline's own scale (10M rows — sf0.1
    lineitem x16) so the ~1s of fixed job overhead doesn't dominate: at
    2.4M rows the same writer measured 1.5M rows/s where the marginal rate
    is >5M (overhead was >60% of wall). Data prep (CSV materialization,
    cache fill) and one full-size warmup write run outside the timers.

    SELF-DEFENSE (r5 verdict): best-of-FIVE trials per metric, each trial
    carrying the 1-minute loadavg sampled at its start, so a contaminated
    run is visibly contaminated instead of silently below-bar. r9 moved
    the whole phase into a FRESH subprocess JVM run before the headline:
    r8 measured in-process post-headline parquet trials degraded 5x by
    broadcast/cache remnants that clearCache+System.gc() only partially
    recovered, while the same phase in an isolated JVM sat in the
    0.87-0.96s idle band.
    """
    import shutil
    import tempfile

    from dativo_ingest_spark.queries import load

    work = tempfile.mkdtemp(prefix="dativo_bench_")
    try:
        li = load(spark, sf_dir, "lineitem")
        scaled = li
        for _ in range(4):
            scaled = scaled.union(scaled)
        staged = scaled.repartition(32).cache()
        n_rows = staged.count()

        csv_dir = f"{work}/lineitem_csv"
        staged.write.option("header", "true").csv(csv_dir)
        # full-size untimed warmup: the ingest phase now runs in a FRESH
        # JVM (isolation fix), so without this the first timed trials pay
        # the CSV parser's JIT tier-up that the old post-headline runs
        # got for free (measured: cold-child best 1.27s vs 1.07s warm)
        spark.read.option("header", "true").csv(csv_dir).write.format(
            "noop").mode("overwrite").save()
        # r10 lesson: the START gate passed at 1.41 but load landed on
        # the box MID-RUN (trial loadavgs 2.3-8.6) — re-check idleness
        # before EACH trial phase, bounded like the start gate
        wait_for_idle()
        # r13: host-SPEED probe per phase — loadavg can be quiet on a
        # throttled host (see run_canary docstring)
        csv_start_load = loadavg1()
        csv_canary_s = run_canary(spark)
        csv_trials, csv_loads = [], []
        for _ in range(5):
            csv_loads.append(loadavg1())
            t0 = time.perf_counter()
            spark.read.option("header", "true").csv(csv_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            csv_trials.append(round(time.perf_counter() - t0, 3))
        csv_canary_end_s = run_canary(spark)
        csv_scan_s = min(csv_trials)

        # write timing isolates the writer (BASELINE row 3 times PyArrow's
        # write alone): the input is cached pre-shuffled, so each trial is
        # scan-cache → encode → write with no exchange.
        staged.limit(100_000).write.mode("overwrite").parquet(
            f"{work}/pq_warm")  # warm the writer path, untimed
        wait_for_idle()         # idle re-check between phases (r10)
        pq_start_load = loadavg1()
        pq_canary_s = run_canary(spark)
        # r14: disk-speed probe bracketing the WRITE phase — CPU
        # canaries were blind to the stale-tmp disk pressure r13 hit
        pq_io_s = run_io_canary(work)
        pq_trials, pq_loads = [], []
        for i in range(5):
            out = f"{work}/pq_out{i}"
            pq_loads.append(loadavg1())
            t0 = time.perf_counter()
            staged.write.option("compression", "snappy").parquet(out)
            pq_trials.append(round(time.perf_counter() - t0, 3))
            shutil.rmtree(out, ignore_errors=True)
        pq_io_end_s = run_io_canary(work)
        pq_canary_end_s = run_canary(spark)
        pq_write_s = min(pq_trials)
        staged.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    def _clean_best(trials, start_load, canary_start, canary_end,
                    io_brackets=()):
        """(phase contaminated?, best trial if the phase was clean).

        A phase is clean iff it STARTED quiet (loadavg gate, after the
        bounded wait) AND the host-speed canary ran in-band both
        immediately before and immediately after the trials. The
        canary BRACKET is the r13 redesign: per-trial loadavg gating
        (r10-r12) mis-stamped the bench's OWN back-to-back 32-thread
        trials as contamination — the 1-minute loadavg after two ~1 s
        full-rate trials reads 4-6 on an otherwise idle box, so only a
        phase's FIRST (coldest) trial could ever elect as 'clean'.
        External load or throttling arriving mid-phase still gets
        caught: it would slow the closing canary. Per-trial loadavgs
        stay recorded for transparency; they no longer gate."""
        dirty = (start_load > IDLE_LOADAVG_THRESHOLD
                 or canary_slow(canary_start) or canary_slow(canary_end)
                 or any(io_canary_slow(s) for s in io_brackets))
        return dirty, (None if dirty else min(trials))

    csv_dirty, csv_clean_s = _clean_best(
        csv_trials, csv_start_load, csv_canary_s, csv_canary_end_s)
    pq_dirty, pq_clean_s = _clean_best(
        pq_trials, pq_start_load, pq_canary_s, pq_canary_end_s,
        io_brackets=(pq_io_s, pq_io_end_s))
    return {
        "rows": n_rows,
        "csv_scan_s": csv_scan_s,
        "csv_scan_trials": csv_trials,
        "csv_scan_trial_loadavg1": csv_loads,
        "csv_scan_rows_per_s": round(n_rows / csv_scan_s),
        "csv_scan_contaminated": csv_dirty,
        "csv_scan_s_clean": csv_clean_s,
        "csv_scan_rows_per_s_clean": (
            round(n_rows / csv_clean_s) if csv_clean_s else None),
        "parquet_write_s": pq_write_s,
        "parquet_write_trials": pq_trials,
        "parquet_write_trial_loadavg1": pq_loads,
        "parquet_write_rows_per_s": round(n_rows / pq_write_s),
        "parquet_write_contaminated": pq_dirty,
        "parquet_write_s_clean": pq_clean_s,
        "parquet_write_rows_per_s_clean": (
            round(n_rows / pq_clean_s) if pq_clean_s else None),
        "ingest_contaminated": csv_dirty or pq_dirty,
        "canary_s_csv": csv_canary_s,
        "canary_s_csv_end": csv_canary_end_s,
        "canary_s_parquet": pq_canary_s,
        "canary_s_parquet_end": pq_canary_end_s,
        "io_canary_s_parquet": pq_io_s,
        "io_canary_s_parquet_end": pq_io_end_s,
        "io_canary_ref_s": IO_CANARY_REF_S,
        "io_canary_slow_ratio": IO_CANARY_SLOW_RATIO,
        "io_canary_bytes": IO_CANARY_BYTES,
        "phase_start_loadavg1": [csv_start_load, pq_start_load],
        "canary_ref_s": CANARY_REF_S,
        "canary_slow_ratio": CANARY_SLOW_RATIO,
        "isolated_jvm": os.environ.get("SPARK_GRAFT_INGEST_CHILD") == "1",
    }


def _ingest_child_main(sf_dir: str, cpus: str) -> None:
    """Subprocess entry: fresh JVM, ingest phase only, JSON on stdout."""
    n_cleaned = clean_stale_tmp()  # r14: disk state is part of the phase
    spark = _bench_spark(cpus)
    rec = run_ingest(spark, sf_dir)
    rec["stale_tmp_cleaned"] = n_cleaned
    print(json.dumps(rec))
    spark.stop()


def _run_ingest_subprocess(sf_dir: str, cpus: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_INGEST_CHILD="1")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--ingest"],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"ingest subprocess failed (rc={proc.returncode}):\n"
            f"{proc.stderr[-2000:]}")
    # last stdout line is the JSON payload (Spark may log above it)
    line = [ln for ln in proc.stdout.strip().splitlines() if
            ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if "--ingest" in sys.argv:
        _ingest_child_main(sf_dir, cpus)
        return

    idle_waited = wait_for_idle()
    la_start = loadavg1()
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # Ingest first, in a fresh subprocess JVM: cleanest machine state
    # (right after the idle wait, before any headline load) and no JVM
    # remnants from the query sweep.
    ingest = _run_ingest_subprocess(sf_dir, cpus)

    spark = _bench_spark(cpus)

    # Warm the JVM/codegen paths and the Python worker pool once on the
    # smallest inputs so per-query numbers measure the plan, not first-call
    # JIT or the 32 Python daemon spawns (one-time costs on a long-lived
    # cluster). r13 (r12 verdict "What's wrong #2"): warm EVERY timed row
    # at sf0.001 — pennies of data, uniform treatment. The old 9-name warm
    # list left 130+ extended rows paying first-call plan compile inside
    # their timed run: the r12 record booked rrf_fusion_topk at 33.7s
    # where the warm-path cost is 2.1s. One sf0.001 pass per row absorbs
    # codegen compile + Arrow/Python worker spin-up for every family.
    warm_failures: dict[str, str] = {}
    warm_names = list(HEADLINE)
    if not os.environ.get("SPARK_GRAFT_BENCH_HEADLINE_ONLY"):
        warm_names += EXTENDED
    for warm in list(dict.fromkeys(warm_names)):
        try:
            QUERIES[warm].fn(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception as ex:  # a warm failure must not kill the bench
            warm_failures[warm] = f"{type(ex).__name__}: {ex}"[:200]
    spark.catalog.clearCache()

    def run_once(name: str) -> float:
        # per-query isolation: drop caches left by prior queries (dedup
        # pipelines cache their gram/signature frames)
        spark.catalog.clearCache()
        # plan construction rides INSIDE the timer: operators that probe
        # eagerly at build time (minhash's hot-bucket guard, IVF's
        # centroid collect) must pay their cost in the measured number
        t0 = time.perf_counter()
        df = QUERIES[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # Headline per-query best-of-N (N>=2): the first run of the suite's
    # first queries has repeatedly absorbed external-load / JIT noise
    # (r01→r02 showed 2.6× swings on q1 with zero plan change). min over
    # back-to-back passes pins the plan cost; all raw runs are recorded
    # for transparency. r12: each pass first waits (bounded, shared pool)
    # for the box to go quiet — pass 1 otherwise inherits the ingest
    # subprocess's own decaying load — and if EVERY pass still started
    # above the idle gate, the bench re-runs (up to HEADLINE_MAX_PASSES)
    # rather than booking a dirty record (r11 verdict: "re-run, don't
    # book").
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    headline_loads: list[float] = []
    headline_waits: list[float] = []
    headline_canaries: list[float] = []
    wait_pool = HEADLINE_WAIT_POOL_S

    def _pass_clean(i: int) -> bool:
        return (headline_loads[i] <= IDLE_LOADAVG_THRESHOLD
                and not canary_slow(headline_canaries[i]))

    while len(headline_loads) < HEADLINE_MAX_PASSES:
        waited = wait_for_idle(max_wait_s=min(IDLE_WAIT_MAX_S, wait_pool))
        wait_pool = max(0.0, wait_pool - waited)
        headline_waits.append(waited)
        headline_loads.append(loadavg1())
        # r13: host-speed canary per pass — a pass on a throttled/slow
        # host is dirty even at loadavg 0 (r12's 87s "clean" headline)
        headline_canaries.append(run_canary(spark))
        for name in HEADLINE:
            runs[name].append(run_once(name))
        done_min = len(headline_loads) >= HEADLINE_MIN_PASSES
        any_clean = any(_pass_clean(i) for i in range(len(headline_loads)))
        if done_min and (any_clean or wait_pool <= 0.0):
            break
    timings = {name: min(ts) for name, ts in runs.items()}
    headline_contaminated = not any(
        _pass_clean(i) for i in range(len(headline_loads)))
    # best CLEAN total: per-query min restricted to passes that started
    # under the loadavg gate AND whose canary ran in-band — the defensible
    # round-over-round number when the official min rides a dirty pass
    clean_ix = [i for i in range(len(headline_loads)) if _pass_clean(i)]
    total_clean = (
        round(sum(min(ts[i] for i in clean_ix) for ts in runs.values()), 3)
        if clean_ix else None)

    # Extended sweep: best-of-2 over every other benched operator (r13:
    # a single pass booked dedup_ingest_minhash at 38.5 s where direct
    # re-measurement gives 7-9 s — one slow moment on a 141-row sweep
    # reads as a 4x regression; min-of-2 kills one-off noise for ~4 min
    # of extra wall). Both raw runs are recorded.
    extended: dict[str, float] = {}
    extended_runs: dict[str, list[float]] = {}
    if not os.environ.get("SPARK_GRAFT_BENCH_HEADLINE_ONLY"):
        for name in EXTENDED:
            if name in timings:
                continue
            extended_runs[name] = [run_once(name)]
        for name in list(extended_runs):
            extended_runs[name].append(run_once(name))
            extended[name] = min(extended_runs[name])

    total = round(sum(timings.values()), 3)
    full_record = {
        "metric": "headline_query_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_runs": runs,
        "extended": extended,
        "extended_runs": extended_runs,
        "extended_total_s": round(sum(extended.values()), 3),
        "sf": sf,
        "ingest": ingest,
        "headline_contaminated": headline_contaminated,
        "headline_total_s_clean": total_clean,
        "canary": {
            "headline_passes_s": headline_canaries,
            "ref_s": CANARY_REF_S,
            "slow_ratio": CANARY_SLOW_RATIO,
            "rows": CANARY_ROWS,
        },
        "warm_failures": warm_failures,
        "loadavg": {
            "start": la_start,
            "idle_waited_s": idle_waited,
            "headline_runs": headline_loads,
            "headline_waits_s": headline_waits,
            "end": loadavg1(),
            "ncpu": os.cpu_count(),
        },
    }
    print(json.dumps(full_record))
    # r13 (r12 verdict "What's wrong #3"): the driver's tail capture
    # truncates the stdout dump, losing the per-row `extended` dict from
    # the official BENCH_r{N} artifact — persist the COMPLETE record
    # in-repo so every round keeps its full evidence.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_full_latest.json"), "w") as fh:
            json.dump(full_record, fh, indent=1)
    except OSError:
        pass  # read-only checkout: stdout record still carries the summary
    # Compact summary as the LAST stdout line: the driver's tail capture
    # truncates the full dump above (BENCH_r8 AND r9 both recorded
    # parsed: null), so the headline numbers must also ride in a line
    # small enough to always survive the tail buffer.
    print(
        json.dumps(
            {
                "metric": "headline_query_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "headline_total_s": total,
                "extended_total_s": round(sum(extended.values()), 3),
                "csv_rows_per_s": ingest.get("csv_scan_rows_per_s"),
                "parquet_rows_per_s": ingest.get(
                    "parquet_write_rows_per_s"),
                "csv_rows_per_s_clean": ingest.get(
                    "csv_scan_rows_per_s_clean"),
                "parquet_rows_per_s_clean": ingest.get(
                    "parquet_write_rows_per_s_clean"),
                "ingest_contaminated": ingest.get("ingest_contaminated"),
                "headline_contaminated": headline_contaminated,
                "headline_total_s_clean": total_clean,
                "isolated_jvm": ingest.get("isolated_jvm"),
                "loadavg_start": la_start,
                "canary_headline_s": headline_canaries,
                "canary_ingest_s": [ingest.get("canary_s_csv"),
                                    ingest.get("canary_s_parquet")],
                "io_canary_parquet_s": [
                    ingest.get("io_canary_s_parquet"),
                    ingest.get("io_canary_s_parquet_end")],
                "canary_ref_s": CANARY_REF_S,
                "n_headline": len(timings),
                "n_extended": len(extended),
                "n_warm_failures": len(warm_failures),
            }
        )
    )


if __name__ == "__main__":
    main()

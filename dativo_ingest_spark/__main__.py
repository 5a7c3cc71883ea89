"""``python -m dativo_ingest_spark`` — the ``dativo`` CLI analog.

Reference surface (``/root/reference/src/dativo_ingest/cli.py:285-1228``):
``dativo run --config job.yaml`` / ``--job-dir dir`` with exit codes
0 = success, 1 = partial (warn-mode invalids), 2 = failure (config/
validation/source error); ``dativo check`` / ``dativo discover`` probe a
source without ingesting. The 2,084-LoC reference CLI collapses to thin
argument routing here because the lifecycle lives in ``runner.py`` and
Spark replaces the hand-rolled batch loop.
"""

from __future__ import annotations

import argparse
import json
import sys

from dativo_ingest_spark import get_spark
from dativo_ingest_spark.config.contracts import ConfigError, SourceConfig
from dativo_ingest_spark.runner import (
    EXIT_FAILURE,
    run_job_dir,
    run_job_file,
)


def _spark(args):
    return get_spark(
        "dativo-ingest-spark",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )


def _result_doc(res) -> dict:
    return {
        "exit_code": res.exit_code,
        "records_in": res.records_in,
        "records_valid": res.records_valid,
        "records_invalid": res.records_invalid,
        "output_path": res.output_path,
        "state_value": res.state_value,
        "skipped": res.skipped,
        "duration_s": round(res.duration_s, 3),
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="dativo-ingest-spark")
    ap.add_argument("--master", default="local[*]")
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    ap.add_argument("--log-level", default="INFO")
    sub = ap.add_subparsers(dest="cmd", required=True)

    run_p = sub.add_parser("run", help="execute job(s) (cli.py:285 analog)")
    g = run_p.add_mutually_exclusive_group(required=True)
    g.add_argument("--config")
    g.add_argument("--job-dir")
    run_p.add_argument("--state-root")
    run_p.add_argument("--secret-manager",
                       help="env|filesystem|vault|aws|gcp (cli.py:201-217)")
    run_p.add_argument("--secrets-dir", default="/secrets")
    run_p.add_argument("--validate-schema", action="store_true",
                       help="check job YAML against schemas/job-config"
                            ".schema.json before running (exit 2 on "
                            "violation; reference config.py:331-337)")

    plan_p = sub.add_parser(
        "plan", help="plan-quality summary for a registered query "
                     "(shuffles, join strategies, pushdown, codegen)")
    plan_p.add_argument("--query", required=True)
    plan_p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    plan_p.add_argument("--full", action="store_true",
                        help="include the formatted physical plan")
    plan_p.add_argument("--execute", action="store_true",
                        help="run the query (noop sink) so AQE finalizes "
                             "and codegen/runtime join choices are real")

    maint_p = sub.add_parser(
        "maintain", help="table maintenance on a snapshot-commit table: "
                         "compaction, snapshot expiry, metadata listing")
    maint_p.add_argument("--table-root", required=True)
    maint_p.add_argument("--branch", default="main")
    maint_p.add_argument("--compact", action="store_true",
                         help="bin-pack small files (rewrite_data_files "
                              "analog)")
    maint_p.add_argument("--target-file-size-mb", type=int, default=150)
    maint_p.add_argument("--vacuum-keep", type=int,
                         help="expire snapshots beyond the newest N per "
                              "branch + reclaim unreferenced files")
    maint_p.add_argument("--vacuum-min-age-s", type=float,
                         default=24 * 3600.0)
    maint_p.add_argument("--snapshots", action="store_true",
                         help="print the branch's commit history")
    maint_p.add_argument("--files", action="store_true",
                         help="print the head snapshot's file manifest")
    maint_p.add_argument("--zorder",
                         help="rewrite clustered on a Z-curve: "
                              "'col=lo:hi,col2=lo:hi' (per-file ranges "
                              "land in the manifest for pruned reads)")
    maint_p.add_argument("--zorder-files", type=int, default=8)
    maint_p.add_argument("--ivfpq-compact", action="store_true",
                         help="re-cluster a persisted IVF-PQ retrieval "
                              "index by cell range (replace_files + "
                              "re-plan commit — concurrent appends are "
                              "never dropped)")
    maint_p.add_argument("--max-files-per-cell", type=int,
                         help="with --ivfpq-compact: compact ONLY cell "
                              "ranges covered by more than this many "
                              "files (default: whole-table recluster)")
    maint_p.add_argument("--aggregate",
                         help="comma-separated columns: print COUNT(*) "
                              "+ per-column MIN/MAX answered from the "
                              "manifest alone (zero data I/O)")
    maint_p.add_argument("--rollback-to", type=int,
                         help="roll the branch back to this version by "
                              "committing a NEW head re-pointing at its "
                              "file list (forward history, audit trail "
                              "kept; never a ref rewind)")

    audit_p = sub.add_parser(
        "audit-shards", help="trainer-side shard audit: recompute every "
                             "shard's (rows, tokens, hash_sum) from the "
                             "shard files and compare against the "
                             "published manifest (exit 2 on mismatch); "
                             "detects batch (manifest/ parquet) vs "
                             "streaming (manifest.json, epoch=K dirs) "
                             "layouts automatically")
    audit_p.add_argument("--shards-dir", required=True,
                         help="a shard_export target directory — batch "
                              "(shard=K dirs + manifest/) or streaming "
                              "(epoch=K/shard=K dirs + manifest.json)")

    cdiff_p = sub.add_parser(
        "contract-diff", help="schema-drift probe: observed source "
                              "columns vs the job's asset contract "
                              "(exit 2 when a required column is absent)")
    cdiff_p.add_argument("--config", required=True)
    cdiff_p.add_argument("--mode", default="self_hosted",
                         choices=("self_hosted", "cloud"))

    for name in ("check", "discover"):
        p = sub.add_parser(name)
        p.add_argument("--type", required=True)
        p.add_argument("--path")
        p.add_argument("--option", action="append", default=[],
                       metavar="K=V")
        p.add_argument("--mode", default="self_hosted",
                       choices=("self_hosted", "cloud"),
                       help="deployment mode; cloud force-jails "
                            "custom_python probes")

    args = ap.parse_args(argv)
    # structured JSON logs with credential redaction for the whole run
    # (reference cli.py:184 setup_logging(redact_secrets=True))
    from dativo_ingest_spark import obs

    obs.setup_logging(level=args.log_level)
    try:
        spark = _spark(args)
        if args.cmd == "run":
            if args.config:
                res = run_job_file(spark, args.config, args.state_root,
                                   secret_manager=args.secret_manager,
                                   secrets_dir=args.secrets_dir,
                                   validate_schema=args.validate_schema)
                print(json.dumps(_result_doc(res)))
                return res.exit_code
            results = run_job_dir(spark, args.job_dir, args.state_root,
                                  secret_manager=args.secret_manager,
                                  secrets_dir=args.secrets_dir,
                                  validate_schema=args.validate_schema)
            print(json.dumps({p: _result_doc(r)
                              for p, r in results.items()}, indent=1))
            # combined exit = worst job (reference cli.py:121-323)
            return max((r.exit_code for r in results.values()), default=0)

        if args.cmd == "maintain":
            from dativo_ingest_spark.sinks.table_commit import FsTable

            table = FsTable.create(args.table_root)
            doc: dict = {"table_root": args.table_root,
                         "branch": args.branch}
            if args.rollback_to is not None:
                # rollback first: maintenance passes below should run
                # against the restored content, not the bad head
                try:
                    snap = table.rollback(args.rollback_to,
                                          branch=args.branch)
                except LookupError as exc:
                    raise ConfigError(str(exc))
                doc["rolled_back_to"] = args.rollback_to
                doc["rollback_version"] = snap.version
            if args.compact and args.zorder:
                # the clustered rewrite already bin-packs into n_files;
                # compacting first would be a whole table pass whose
                # output the zorder overwrite discards milliseconds later
                doc["compact"] = "skipped (zorder rewrite subsumes it)"
            elif args.compact:
                snap = table.compact(
                    spark, target_file_size_mb=args.target_file_size_mb,
                    branch=args.branch)
                doc["compacted_to_version"] = (
                    snap.version if snap is not None else None)
            if args.zorder:
                cols = {}
                try:
                    for spec in args.zorder.split(","):
                        name, eq, rng = spec.partition("=")
                        lo, colon, hi = rng.partition(":")
                        if not (eq and colon and name.strip()):
                            raise ValueError(spec)
                        if name.strip() in cols:  # silent last-wins is a
                            raise ValueError(spec)  # near-certain typo
                        cols[name.strip()] = (float(lo), float(hi))
                except ValueError:
                    raise ConfigError(
                        f"malformed --zorder spec {args.zorder!r}: "
                        "expected 'col=lo:hi,col2=lo:hi' with distinct "
                        "columns")
                try:
                    snap = table.rewrite_zorder(
                        spark, cols, n_files=args.zorder_files,
                        branch=args.branch)
                except ValueError as exc:  # unknown branch/column/range
                    raise ConfigError(str(exc))
                doc["zordered_to_version"] = (
                    snap.version if snap is not None else None)
            if args.ivfpq_compact:
                from dativo_ingest_spark.operators.quantization import (
                    ivfpq_index_compact)

                n_files = ivfpq_index_compact(
                    spark, table, branch=args.branch,
                    max_files_per_cell=args.max_files_per_cell)
                doc["ivfpq_compact"] = (
                    {"files_after": n_files} if n_files >= 0
                    else "skipped (nothing fragmented)")
            if args.vacuum_keep is not None:
                doc["vacuum"] = table.vacuum(
                    keep_history=args.vacuum_keep,
                    min_age_seconds=args.vacuum_min_age_s)
            if args.aggregate is not None:
                cols = [c.strip() for c in args.aggregate.split(",")
                        if c.strip()]
                doc["aggregate"] = table.manifest_aggregate(
                    cols, branch=args.branch)
            if args.snapshots:
                doc["snapshots"] = [
                    r.asDict() for r in
                    table.snapshots_df(spark, args.branch).collect()]
            if args.files:
                doc["files"] = [
                    r.asDict() for r in
                    table.files_df(spark, args.branch).collect()]
            print(json.dumps(doc, indent=1))
            return 0

        if args.cmd == "audit-shards":
            import os as _os

            from dativo_ingest_spark.sinks.shard_export import (
                audit_shards, audit_streaming_shards)

            # streaming layouts publish manifest.json (epoch-atomic
            # refold); batch layouts publish a manifest/ parquet dir
            if _os.path.exists(
                    _os.path.join(args.shards_dir, "manifest.json")):
                doc = audit_streaming_shards(spark, args.shards_dir)
            else:
                doc = audit_shards(spark, args.shards_dir)
            print(json.dumps(doc, indent=1))
            return 0 if doc["ok"] else EXIT_FAILURE

        from dativo_ingest_spark import inspect_cmd

        if args.cmd == "contract-diff":
            from dativo_ingest_spark.config.contracts import JobConfig

            job = JobConfig.from_yaml(args.config)
            doc = inspect_cmd.contract_diff(spark, job, mode=args.mode)
            print(json.dumps(doc, indent=1))
            return 0 if doc.get("ok") else EXIT_FAILURE

        if args.cmd == "plan":
            doc = inspect_cmd.plan_query(spark, args.query, args.sf_dir,
                                         full=args.full,
                                         execute=args.execute)
            print(json.dumps(doc, indent=1))
            return 0

        opts = dict(kv.split("=", 1) for kv in args.option)
        src = SourceConfig.from_dict(
            {"type": args.type, "path": args.path, "options": opts})
        if args.cmd == "check":
            doc = inspect_cmd.check_source(spark, src, mode=args.mode)
            print(json.dumps(doc))
            return 0 if doc.get("ok") else EXIT_FAILURE
        doc = inspect_cmd.discover(spark, src, mode=args.mode)
        print(json.dumps(doc))
        return 0
    except ConfigError as exc:
        print(f"config error: {exc}", file=sys.stderr)
        return EXIT_FAILURE


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())

"""S3/MinIO/Azure object-store publishing: metadata/tag upload + s3a conf.

Reference behavior (``/root/reference/src/dativo_ingest/iceberg_committer.py
:695-870``): parquet files upload to ``s3://bucket/key`` with object
metadata (asset name/version/domain, data product, tenant, branch, owner,
retention, classification, record count, ingest timestamp, format,
compression) and an S3 tag set — max 10 tags, unique keys, ``key:value``
split, URL-encoded — via a boto3 client built from endpoint/keys/region
config.

Spark-first split of responsibilities:

* **Bulk data never moves through this module.** At scale Spark writes
  parquet straight to ``s3a://`` from the executors — the driver uploading
  files one by one is the reference's single-node bottleneck. Use
  :func:`s3a_conf` to point Spark at the store (MinIO endpoint,
  path-style, credentials) and the staging committer for atomic-ish
  commits.
* This module covers what the *committer* still does driver-side: small
  artifact uploads (manifests, properties sidecars) and the
  metadata/tagging decoration S3 objects carry for governance — the part
  ``s3a`` cannot express.

The client is injectable (anything with ``upload_fileobj(fileobj, bucket,
key, ExtraArgs=...)``; boto3's client satisfies it) — no boto3 in this
environment, so tests drive fakes and production passes the real one.
"""

from __future__ import annotations

import datetime as _dt
import os
import urllib.parse
from typing import Any

from dativo_ingest_spark.config.contracts import AssetDefinition

MAX_S3_TAGS = 10  # S3 object-tag limit (reference :827)


def parse_s3_path(s3_path: str) -> tuple[str, str]:
    """``s3://bucket/a/b`` (or ``bucket/a/b``) → (bucket, normalized key):
    empty segments squashed, no leading slash (reference :717-737)."""
    raw = s3_path[5:] if s3_path.startswith("s3://") else s3_path
    bucket, _, key = raw.partition("/")
    key = "/".join(p for p in key.split("/") if p)
    if not bucket:
        raise ValueError(f"no bucket in s3 path '{s3_path}'")
    if not key:
        raise ValueError(
            f"Invalid S3 key derived from path '{s3_path}': key should be "
            "the full path after the bucket name"
        )
    return bucket, key


def object_metadata(
    asset: AssetDefinition,
    branch: str,
    file_metadata: dict[str, Any] | None = None,
    asset_tags: list[str] | str | None = None,
    now: _dt.datetime | None = None,
) -> tuple[dict[str, str], list[str]]:
    """(metadata, tags) decoration for one uploaded object
    (reference :748-816)."""
    md: dict[str, str] = {"asset-name": asset.name,
                          "asset-version": str(asset.version or "1.0")}
    tags: list[str] = []
    if asset.domain:
        md["asset-domain"] = asset.domain
        tags.append(f"domain:{asset.domain}")
    if asset.data_product:
        md["data-product"] = asset.data_product
        tags.append(f"data-product:{asset.data_product}")
    if asset.tenant:
        md["tenant-id"] = asset.tenant
        tags.append(f"tenant:{asset.tenant}")
    md["branch"] = branch
    tags.append(f"branch:{branch}")
    owner = (asset.team or {}).get("owner")
    if owner:
        md["owner"] = str(owner)
        tags.append(f"owner:{owner}")
    if isinstance(asset_tags, str):
        asset_tags = [asset_tags]
    for t in asset_tags or []:
        tags.append(f"asset-tag:{t}")
    comp = asset.compliance or {}
    if comp.get("retention_days"):
        md["retention-days"] = str(comp["retention_days"])
    if comp.get("classification"):
        md["classification"] = ",".join(comp["classification"])
    fm = file_metadata or {}
    if fm.get("record_count"):
        md["record-count"] = str(fm["record_count"])
    if fm.get("size_bytes"):
        md["file-size-bytes"] = str(fm["size_bytes"])
    if fm.get("partition"):
        md["partition"] = str(fm["partition"])
        tags.append(f"partition:{fm['partition']}")
    stamp = now or _dt.datetime.now(_dt.timezone.utc)
    md["ingest-timestamp"] = stamp.replace(tzinfo=None).isoformat() + "Z"
    md["file-format"] = "parquet"
    md["compression"] = "snappy"
    return md, tags


def tag_set(tags: list[str]) -> list[dict[str, str]]:
    """S3 TagSet: first 10 ``key:value`` tags, unique keys win first
    (reference :822-835)."""
    out: list[dict[str, str]] = []
    seen: set[str] = set()
    for tag in tags[:MAX_S3_TAGS]:
        if ":" not in tag:
            continue
        k, v = tag.split(":", 1)
        if k not in seen:
            out.append({"Key": k, "Value": v})
            seen.add(k)
    return out


def tagging_string(tag_entries: list[dict[str, str]]) -> str:
    """URL-encoded ``Tagging`` header value (reference :840-846)."""
    return "&".join(
        f"{urllib.parse.quote(t['Key'])}={urllib.parse.quote(t['Value'])}"
        for t in tag_entries
    )


def upload_file(
    client,
    local_path: str,
    s3_path: str,
    asset: AssetDefinition,
    branch: str = "main",
    file_metadata: dict[str, Any] | None = None,
    asset_tags: list[str] | str | None = None,
    now: _dt.datetime | None = None,
) -> dict[str, Any]:
    """One decorated object upload. Returns the ExtraArgs actually sent
    (for logging/assertions)."""
    bucket, key = parse_s3_path(s3_path)
    md, tags = object_metadata(asset, branch, file_metadata, asset_tags, now)
    extra: dict[str, Any] = {"ContentType": "application/x-parquet",
                             "Metadata": md}
    entries = tag_set(tags)
    if entries:
        extra["Tagging"] = tagging_string(entries)
    with open(local_path, "rb") as fh:
        client.upload_fileobj(fh, bucket, key, ExtraArgs=extra)
    return extra


def upload_directory(
    client,
    local_dir: str,
    s3_prefix: str,
    asset: AssetDefinition,
    branch: str = "main",
    now: _dt.datetime | None = None,
) -> list[str]:
    """Driver-side publish of a staged local dir (committer artifacts /
    small outputs — bulk data should be written by Spark over s3a). The
    hive layout is preserved in the keys; per-file metadata carries the
    partition dir and size. Returns the uploaded keys."""
    todo: list[tuple[str, str, str]] = []  # (rel_key, local, partition_dir)
    for root, dirs, files in os.walk(local_dir):
        dirs.sort()  # deterministic publish order
        rel_root = os.path.relpath(root, local_dir)
        for name in sorted(files):
            if name.startswith(("_", ".")):
                continue
            rel = name if rel_root == "." else f"{rel_root}/{name}"
            todo.append((rel, os.path.join(root, name),
                         "" if rel_root == "." else rel_root))
    keys: list[str] = []
    for rel, local, part in todo:
        fm: dict[str, Any] = {"size_bytes": os.path.getsize(local)}
        if part:
            fm["partition"] = part
        upload_file(client, local, f"{s3_prefix.rstrip('/')}/{rel}",
                    asset, branch, file_metadata=fm, now=now)
        keys.append(rel)
    return keys


def s3a_conf(
    endpoint: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    region: str | None = None,
    path_style: bool | None = None,
    committer: str = "directory",
) -> dict[str, str]:
    """Spark/Hadoop conf for executor-side object-store writes — the scale
    path the reference's driver upload loop cannot take. MinIO needs
    ``endpoint`` + ``path_style=True``; ``committer`` selects the s3a
    staging committer family (task-attempt uploads, single-visibility
    commit — no rename-on-object-store)."""
    conf: dict[str, str] = {
        "spark.hadoop.fs.s3a.committer.name": committer,
        "spark.sql.sources.commitProtocolClass":
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol",
        "spark.sql.parquet.output.committer.class":
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter",
    }
    if endpoint:
        conf["spark.hadoop.fs.s3a.endpoint"] = endpoint
    if access_key:
        conf["spark.hadoop.fs.s3a.access.key"] = access_key
    if secret_key:
        conf["spark.hadoop.fs.s3a.secret.key"] = secret_key
    if region:
        conf["spark.hadoop.fs.s3a.endpoint.region"] = region
    if path_style is not None:
        conf["spark.hadoop.fs.s3a.path.style.access"] = str(path_style).lower()
    return conf

"""Google Drive CSV + Google Sheets sources with injectable API clients.

Reference behavior re-expressed (``/root/reference/src/dativo_ingest/
connectors/gdrive_csv_extractor.py:158-377`` and
``google_sheets_extractor.py:184-375``):

* Drive listing: mime-type query (default ``text/csv``), optional extra
  query and ``'<folder>' in parents`` filter, 100-per-page pagination via
  ``nextPageToken`` until exhausted; fields id/name/modifiedTime/size.
* Per-file modified-time skip: ISO-8601 string comparison against stored
  state — skip iff ``current <= last`` AND ``lookback_days == 0``
  (``validator.py:309-350``); state updated only after successful
  processing.
* Sheets: A1-notation range read (default ``A1:Z1000``), optional
  ``Sheet!`` prefix, UNFORMATTED_VALUE rendering; first row is the header
  unless ``has_header=False``, then columns are generated ``column_{i+1}``;
  ragged rows pad with null (``:257-287``).
* Spreadsheet modified-time comes from the Drive file metadata
  (``:184-218``) and uses the same skip rule.

Spark-first: the Drive/Sheets APIs are driver-side by nature (OAuth'd HTTP
client), so the bridge keeps ONLY the listing + byte-shuttling on the
driver: CSV bytes spool to local files and ``spark.read.csv`` (the repo's
contract-driven reader — all-string schema, NA sentinels, header-drift
union) parses them distributed; sheet ranges are bounded by the A1 range
(≤ thousands of rows) and load via ``createDataFrame``. Clients are
constructor-injected (any object with the 3-method surface below), so
tests — and alternative transports — need no google-api packages, which
this environment doesn't ship.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Protocol

from pyspark.sql import DataFrame, SparkSession

from dativo_ingest_spark.config.contracts import AssetDefinition
from dativo_ingest_spark.sources import csv_source
from dativo_ingest_spark.operators.util import local_df

PAGE_SIZE = 100  # reference gdrive_csv_extractor.py:192


class DriveClient(Protocol):
    """Injectable Drive surface (googleapiclient in production)."""

    def list_files(self, query: str, page_token: str | None,
                   page_size: int) -> dict[str, Any]:
        """→ {"files": [{id,name,modifiedTime,size,mimeType}],
        "nextPageToken": str|None}"""
        ...

    def download(self, file_id: str) -> bytes: ...

    def get_modified_time(self, file_id: str) -> str | None:
        """ISO-8601 modifiedTime from file metadata (Sheets mtime rides
        the Drive API — reference google_sheets_extractor.py:193-218)."""
        ...


class SheetsClient(Protocol):
    def read_range(self, spreadsheet_id: str, range_name: str) -> list[list]:
        """→ rows of cell values (``values`` of the API response)."""
        ...


def drive_query(mime_type: str = "text/csv", query: str | None = None,
                folder_id: str | None = None) -> str:
    """Search-query assembly (reference gdrive_csv_extractor.py:170-180)."""
    q = (f"mimeType='{mime_type}' and ({query})" if query
         else f"mimeType='{mime_type}'")
    if folder_id:
        q += f" and '{folder_id}' in parents"
    return q


def list_drive_files(client: DriveClient, mime_type: str = "text/csv",
                     query: str | None = None,
                     folder_id: str | None = None) -> list[dict[str, Any]]:
    """Exhaustive paged listing (reference :182-207)."""
    q = drive_query(mime_type, query, folder_id)
    files: list[dict[str, Any]] = []
    token: str | None = None
    while True:
        resp = client.list_files(q, token, PAGE_SIZE)
        files.extend(resp.get("files", []))
        token = resp.get("nextPageToken")
        if not token:
            return files


def should_skip(file_id: str, modified_iso: str | None,
                seen: dict[str, Any], lookback_days: int = 0) -> bool:
    """The reference skip rule (validator.py:309-350): ISO strings compare
    lexicographically; unchanged files skip only when lookback is off; an
    unknown or unparseable state never skips."""
    if not modified_iso:
        return False
    last = seen.get(file_id)
    if not last:
        return False
    return modified_iso <= str(last) and lookback_days == 0


@dataclass
class DriveExtractResult:
    df: DataFrame | None            # None when every file was skipped
    processed: dict[str, str]       # file_id -> modifiedTime (state update)
    skipped: list[str]


def extract_drive_csv(
    spark: SparkSession,
    client: DriveClient,
    spool_dir: str,
    asset: AssetDefinition | None = None,
    options: dict | None = None,
    mime_type: str = "text/csv",
    query: str | None = None,
    folder_id: str | None = None,
    files: list[dict[str, Any]] | None = None,
    seen: dict[str, Any] | None = None,
    lookback_days: int = 0,
) -> DriveExtractResult:
    """List (or take the job's explicit ``files``), mtime-skip, download
    changed files into ``spool_dir``, and hand the spool to the repo's
    contract CSV reader (all-string schema + NA sentinels + header-drift
    union — sources/csv_source.py). State writes stay with the caller:
    commit-then-state, unlike the reference's update-during-extract."""
    listing = files if files is not None else list_drive_files(
        client, mime_type, query, folder_id)
    seen = seen or {}
    os.makedirs(spool_dir, exist_ok=True)
    paths: list[str] = []
    processed: dict[str, str] = {}
    skipped: list[str] = []
    for f in listing:
        fid = f.get("id") or f.get("path")
        if not fid:
            continue
        mtime = f.get("modifiedTime")
        if should_skip(str(fid), mtime, seen, lookback_days):
            skipped.append(str(fid))
            continue
        local = os.path.join(spool_dir, f"{fid}.csv")
        with open(local, "wb") as fh:
            fh.write(client.download(str(fid)))
        paths.append(local)
        if mtime:
            processed[str(fid)] = mtime
    if not paths:
        return DriveExtractResult(df=None, processed={}, skipped=skipped)
    df = csv_source.read_csv(spark, paths, asset=asset, options=options)
    return DriveExtractResult(df=df, processed=processed, skipped=skipped)


def rows_to_records(rows: list[list], has_header: bool = True
                    ) -> tuple[list[str], list[list]]:
    """Header split + ragged-row padding (reference :257-287): generated
    ``column_{i+1}`` names when headerless; short rows pad with None."""
    if not rows:
        return [], []
    if has_header:
        headers = [str(c) for c in rows[0]]
        data = rows[1:]
    else:
        width = max(len(r) for r in rows)
        headers = [f"column_{i + 1}" for i in range(width)]
        data = rows
    n = len(headers)
    padded = [[(r[i] if i < len(r) else None) for i in range(n)]
              for r in data]
    return headers, padded


def extract_sheet(
    spark: SparkSession,
    sheets: SheetsClient,
    spreadsheet_id: str,
    range_name: str = "A1:Z1000",
    sheet: str | None = None,
    has_header: bool = True,
) -> DataFrame:
    """One spreadsheet range → DataFrame (all-string columns; the contract
    cast types them downstream exactly like the CSV path). Bounded by the
    A1 range, so ``createDataFrame`` is appropriate — there is no 100 TB
    spreadsheet."""
    full_range = f"{sheet}!{range_name}" if sheet else range_name
    rows = sheets.read_range(spreadsheet_id, full_range)
    headers, data = rows_to_records(rows, has_header)
    if not headers:
        raise ValueError(f"spreadsheet {spreadsheet_id} range "
                         f"{full_range} returned no rows")
    str_rows = [[None if v is None else str(v) for v in r] for r in data]
    schema = ", ".join(f"`{h}` string" for h in headers)
    return local_df(spark, str_rows, schema)


@dataclass
class SheetExtractResult:
    frames: dict[str, DataFrame]
    processed: dict[str, str]
    skipped: list[str]


def extract_sheets(
    spark: SparkSession,
    sheets: SheetsClient,
    drive: DriveClient,
    spreadsheets: list[dict[str, Any]],
    seen: dict[str, Any] | None = None,
    lookback_days: int = 0,
) -> SheetExtractResult:
    """Multi-spreadsheet extraction with spreadsheet_modified_time skip
    (reference google_sheets_extractor.py:295-375). Each config dict:
    ``{"id": ..., "range": "A1:Z1000", "sheet": "Sheet1",
    "has_header": True}``."""
    seen = seen or {}
    frames: dict[str, DataFrame] = {}
    processed: dict[str, str] = {}
    skipped: list[str] = []
    for cfg in spreadsheets:
        sid = cfg.get("id") or cfg.get("spreadsheet_id")
        if not sid:
            continue
        mtime = drive.get_modified_time(str(sid))
        if should_skip(str(sid), mtime, seen, lookback_days):
            skipped.append(str(sid))
            continue
        frames[str(sid)] = extract_sheet(
            spark, sheets, str(sid),
            range_name=cfg.get("range", "A1:Z1000"),
            sheet=cfg.get("sheet"),
            has_header=bool(cfg.get("has_header", True)),
        )
        if mtime:
            processed[str(sid)] = mtime
    return SheetExtractResult(frames=frames, processed=processed,
                              skipped=skipped)

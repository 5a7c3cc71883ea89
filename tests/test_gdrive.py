"""Drive CSV / Sheets extractors against fake API clients: pagination,
query assembly, mtime skip, range read, header handling."""

from __future__ import annotations

import pytest

from dativo_ingest_spark.sources import gdrive


class FakeDrive:
    """Paginates a canned file list 2-per-page and records queries."""

    def __init__(self, files, contents=None, mtimes=None):
        self.files = files
        self.contents = contents or {}
        self.mtimes = mtimes or {}
        self.queries: list[str] = []
        self.downloads: list[str] = []

    def list_files(self, query, page_token, page_size):
        self.queries.append(query)
        start = int(page_token or 0)
        page = self.files[start:start + 2]
        nxt = start + 2 if start + 2 < len(self.files) else None
        return {"files": page,
                "nextPageToken": str(nxt) if nxt is not None else None}

    def download(self, file_id):
        self.downloads.append(file_id)
        return self.contents[file_id]

    def get_modified_time(self, file_id):
        return self.mtimes.get(file_id)


class FakeSheets:
    def __init__(self, ranges):
        self.ranges = ranges
        self.requests: list[tuple[str, str]] = []

    def read_range(self, spreadsheet_id, range_name):
        self.requests.append((spreadsheet_id, range_name))
        return self.ranges[(spreadsheet_id, range_name)]


FILES = [
    {"id": f"f{i}", "name": f"data{i}.csv",
     "modifiedTime": f"2025-07-0{i + 1}T00:00:00Z"}
    for i in range(5)
]


def test_listing_paginates_and_builds_query():
    drive = FakeDrive(FILES)
    got = gdrive.list_drive_files(drive, folder_id="folder9",
                                  query="name contains 'data'")
    assert [f["id"] for f in got] == ["f0", "f1", "f2", "f3", "f4"]
    assert len(drive.queries) == 3  # 5 files, 2 per page
    assert drive.queries[0] == (
        "mimeType='text/csv' and (name contains 'data') "
        "and 'folder9' in parents")


def test_should_skip_semantics():
    seen = {"f1": "2025-07-02T00:00:00Z"}
    # unchanged (equal) → skip; only when lookback is off
    assert gdrive.should_skip("f1", "2025-07-02T00:00:00Z", seen)
    assert not gdrive.should_skip("f1", "2025-07-02T00:00:00Z", seen,
                                  lookback_days=3)
    # newer → process; unknown file → process; missing mtime → process
    assert not gdrive.should_skip("f1", "2025-07-03T00:00:00Z", seen)
    assert not gdrive.should_skip("f9", "2025-07-01T00:00:00Z", seen)
    assert not gdrive.should_skip("f1", None, seen)


def test_extract_drive_csv_end_to_end(spark, tmp_path):
    files = FILES[:2]
    drive = FakeDrive(
        files,
        contents={"f0": b"id,name\n1,alice\n2,NULL\n",
                  "f1": b"id,name,extra\n3,carol,x\n"},
    )
    res = gdrive.extract_drive_csv(
        spark, drive, str(tmp_path / "spool"))
    rows = {(r.id, r.name) for r in res.df.select("id", "name").collect()}
    # NA sentinel nulled; header drift unioned by name
    assert rows == {("1", "alice"), ("2", None), ("3", "carol")}
    assert "extra" in res.df.columns
    assert res.processed == {"f0": "2025-07-01T00:00:00Z",
                             "f1": "2025-07-02T00:00:00Z"}

    # second run with the processed map as state: everything skips,
    # nothing downloads, df is None
    drive2 = FakeDrive(files, contents={})
    res2 = gdrive.extract_drive_csv(
        spark, drive2, str(tmp_path / "spool2"), seen=res.processed)
    assert res2.df is None and res2.skipped == ["f0", "f1"]
    assert drive2.downloads == []


SHEET_ROWS = [
    ["id", "amount", "region"],
    [1, 10.5, "emea"],
    [2, 20.0],              # ragged: region missing
    [3, 30.25, "apac"],
]


def test_extract_sheet_header_and_padding(spark):
    sheets = FakeSheets({("s1", "Orders!A1:Z1000"): SHEET_ROWS})
    df = gdrive.extract_sheet(spark, sheets, "s1", sheet="Orders")
    assert sheets.requests == [("s1", "Orders!A1:Z1000")]
    assert df.columns == ["id", "amount", "region"]
    got = {(r.id, r.amount, r.region) for r in df.collect()}
    assert got == {("1", "10.5", "emea"), ("2", "20.0", None),
                   ("3", "30.25", "apac")}


def test_extract_sheet_headerless_generates_columns(spark):
    sheets = FakeSheets({("s2", "A1:B3"): [[1, 2], [3]]})
    df = gdrive.extract_sheet(spark, sheets, "s2", range_name="A1:B3",
                              has_header=False)
    assert df.columns == ["column_1", "column_2"]
    assert df.count() == 2


def test_extract_sheets_mtime_skip(spark):
    drive = FakeDrive([], mtimes={"s1": "2025-07-01T00:00:00Z",
                                  "s2": "2025-07-05T00:00:00Z"})
    sheets = FakeSheets({("s2", "A1:Z1000"): SHEET_ROWS})
    res = gdrive.extract_sheets(
        spark, sheets, drive,
        [{"id": "s1"}, {"id": "s2"}],
        seen={"s1": "2025-07-01T00:00:00Z", "s2": "2025-07-04T00:00:00Z"},
    )
    assert res.skipped == ["s1"]          # unchanged
    assert set(res.frames) == {"s2"}      # modified since state
    assert res.processed == {"s2": "2025-07-05T00:00:00Z"}
    assert res.frames["s2"].count() == 3


def test_empty_sheet_raises(spark):
    sheets = FakeSheets({("s3", "A1:Z1000"): []})
    with pytest.raises(ValueError, match="returned no rows"):
        gdrive.extract_sheet(spark, sheets, "s3")

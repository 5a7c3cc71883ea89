"""Bench harness self-defense guards (r14 — r13 verdict Next #4).

The CPU canary (r13) is blind to DISK pressure: r13's booking found a
1.3 GB stale tmp dir degrading parquet writes to 1.73 s under perfectly
clean CPU canaries. r14 adds (a) an I/O canary bracketing the write
phase — a fixed 256 MiB write+fsync+read probe whose slow bracket
stamps the phase dirty — and (b) automated stale-scratch cleanup inside
bench.py (age-gated so a concurrent run's live dirs survive). These
tests pin the gating logic and the cleanup's safety; the planted
disk-pressure case is the gate test (a slow I/O bracket → dirty stamp),
since real sustained disk pressure can't be staged deterministically in
a unit test.
"""

from __future__ import annotations

import os
import time

import bench


class TestIoCanaryGate:
    def test_in_band_is_clean(self):
        assert not bench.io_canary_slow(bench.IO_CANARY_REF_S)
        assert not bench.io_canary_slow(
            bench.IO_CANARY_REF_S * bench.IO_CANARY_SLOW_RATIO * 0.99)

    def test_planted_disk_pressure_stamps_dirty(self):
        # the planted case: a write bracket past the band must gate
        slow = bench.IO_CANARY_REF_S * bench.IO_CANARY_SLOW_RATIO * 1.01
        assert bench.io_canary_slow(slow)

    def test_probe_runs_and_is_positive(self, tmp_path):
        s = bench.run_io_canary(str(tmp_path))
        assert s > 0
        # probe files are cleaned up
        assert not any(n.startswith("_io_canary")
                       for n in os.listdir(tmp_path))


class TestStaleTmpCleanup:
    def test_removes_old_scratch_only(self, tmp_path, monkeypatch):
        import tempfile

        monkeypatch.setattr(tempfile, "gettempdir",
                            lambda: str(tmp_path))
        old = tmp_path / "dativo_bench_stale"
        old.mkdir()
        (old / "junk.bin").write_bytes(b"x" * 1024)
        older = time.time() - 7200
        os.utime(old, (older, older))
        live = tmp_path / "sg_shards_live"
        live.mkdir()  # fresh mtime: a concurrent run's scratch
        unrelated = tmp_path / "keepme"
        unrelated.mkdir()
        os.utime(unrelated, (older, older))

        n = bench.clean_stale_tmp(min_age_s=1800.0)
        assert n == 1
        assert not old.exists()        # stale scratch reclaimed
        assert live.exists()           # age gate protects live runs
        assert unrelated.exists()      # only our own prefixes touched

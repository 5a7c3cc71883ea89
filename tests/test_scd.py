"""SCD type-2 construction + maintenance: hand-computed interval
expectations, collapse semantics, tie handling, and the rebuild-affected-
keys merge (out-of-order and duplicate batches land correctly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dativo_ingest_spark.operators import scd

COLS = "id bigint, ts bigint, seq bigint, color string"


def _hist(df):
    rows = sorted(
        df.collect(), key=lambda r: (r["id"], r["version_n"]))
    return [(r["id"], r["color"], r["effective_from"], r["effective_to"],
             r["is_current"], r["version_n"]) for r in rows]


def test_intervals_and_collapse(spark):
    changes = spark.createDataFrame(
        [(1, 10, 1, "red"), (1, 20, 2, "red"), (1, 30, 3, "blue"),
         (2, 15, 4, "green")], COLS)
    out = scd.scd2_from_changelog(
        changes, ["id"], "ts", ["color"], tiebreaker="seq")
    assert _hist(out) == [
        # (1, red @20) collapsed into the @10 version
        (1, "red", 10, 30, False, 1),
        (1, "blue", 30, None, True, 2),
        (2, "green", 15, None, True, 1),
    ]


def test_no_collapse_keeps_every_change(spark):
    changes = spark.createDataFrame(
        [(1, 10, 1, "red"), (1, 20, 2, "red")], COLS)
    out = scd.scd2_from_changelog(
        changes, ["id"], "ts", ["color"], tiebreaker="seq",
        collapse_unchanged=False)
    assert len(out.collect()) == 2


def test_null_attribute_versions(spark):
    changes = spark.createDataFrame(
        [(1, 10, 1, None), (1, 20, 2, None), (1, 30, 3, "red")], COLS)
    out = scd.scd2_from_changelog(
        changes, ["id"], "ts", ["color"], tiebreaker="seq")
    # NULL == NULL collapses (eqNullSafe); NULL -> red is a real change
    assert _hist(out) == [
        (1, None, 10, 30, False, 1),
        (1, "red", 30, None, True, 2),
    ]


def test_timestamp_ties_break_on_tiebreaker(spark):
    changes = spark.createDataFrame(
        [(1, 10, 2, "blue"), (1, 10, 1, "red")], COLS)
    out = scd.scd2_from_changelog(
        changes, ["id"], "ts", ["color"], tiebreaker="seq")
    assert _hist(out) == [
        (1, "red", 10, 10, False, 1),
        (1, "blue", 10, None, True, 2),
    ]


class TestMerge:
    def _base(self, spark):
        changes = spark.createDataFrame(
            [(1, 10, 1, "red"), (1, 30, 2, "blue"), (2, 10, 3, "green")],
            COLS)
        return scd.scd2_from_changelog(
            changes, ["id"], "ts", ["color"], tiebreaker="seq")

    def test_new_version_closes_open_row(self, spark):
        dim = self._base(spark)
        batch = spark.createDataFrame([(1, 50, 4, "black")], COLS)
        out = scd.scd2_merge(dim, batch, ["id"], "ts", ["color"],
                             tiebreaker="seq")
        assert _hist(out) == [
            (1, "red", 10, 30, False, 1),
            (1, "blue", 30, 50, False, 2),
            (1, "black", 50, None, True, 3),
            (2, "green", 10, None, True, 1),   # untouched pass-through
        ]

    def test_out_of_order_update_lands_inside_history(self, spark):
        dim = self._base(spark)
        batch = spark.createDataFrame([(1, 20, 4, "white")], COLS)
        out = scd.scd2_merge(dim, batch, ["id"], "ts", ["color"],
                             tiebreaker="seq")
        assert _hist(out) == [
            (1, "red", 10, 20, False, 1),
            (1, "white", 20, 30, False, 2),
            (1, "blue", 30, None, True, 3),
            (2, "green", 10, None, True, 1),
        ]

    def test_merge_is_idempotent_for_duplicate_batches(self, spark):
        dim = self._base(spark)
        batch = spark.createDataFrame([(2, 40, 4, "grey")], COLS)
        once = scd.scd2_merge(dim, batch, ["id"], "ts", ["color"],
                              tiebreaker="seq")
        twice = scd.scd2_merge(once, batch, ["id"], "ts", ["color"],
                               tiebreaker="seq")
        assert _hist(once) == _hist(twice)

    def test_merge_equals_full_rebuild(self, spark):
        full = spark.createDataFrame(
            [(i, t, i * 100 + t, c)
             for i in (1, 2, 3)
             for t, c in ((10, "a"), (20, "b"), (30, "b"), (40, "c"))],
            COLS)
        rebuilt = scd.scd2_from_changelog(
            full, ["id"], "ts", ["color"], tiebreaker="seq")
        first = full.filter(F.col("ts") <= 20)
        rest = full.filter(F.col("ts") > 20)
        dim = scd.scd2_from_changelog(
            first, ["id"], "ts", ["color"], tiebreaker="seq")
        merged = scd.scd2_merge(dim, rest, ["id"], "ts", ["color"],
                                tiebreaker="seq")
        assert _hist(merged) == _hist(rebuilt)


# --- property: operator == pure-python reference model on random logs ----

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_changelog = st.lists(
    st.tuples(st.integers(1, 3),            # entity id
              st.integers(0, 20),           # ts (ties likely)
              st.sampled_from("rgb")),      # tracked attribute
    min_size=1, max_size=12,
).map(lambda rows: [(i, t, seq, c)
                    for seq, (i, t, c) in enumerate(rows)])


def _model(rows):
    """Reference SCD2: order by (ts, seq) per id, collapse, close, rank."""
    out = []
    by_id: dict = {}
    for i, t, seq, c in rows:
        by_id.setdefault(i, []).append((t, seq, c))
    for i, changes in by_id.items():
        changes.sort()
        versions = [ch for k, ch in enumerate(changes)
                    if k == 0 or ch[2] != changes[k - 1][2]]
        for k, (t, seq, c) in enumerate(versions):
            nxt = versions[k + 1][0] if k + 1 < len(versions) else None
            out.append((i, c, t, nxt, nxt is None, k + 1))
    return sorted(out, key=lambda r: (r[0], r[5]))  # (id, version_n)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_changelog, split=st.integers(0, 20))
def test_random_changelogs_match_model_and_merge(spark, rows, split):
    df = spark.createDataFrame(rows, COLS)
    full = scd.scd2_from_changelog(df, ["id"], "ts", ["color"],
                                   tiebreaker="seq")
    assert _hist(full) == _model(rows)
    # merge invariant: fold the log in two arbitrary halves == one shot
    first = [r for r in rows if r[1] <= split]
    rest = [r for r in rows if r[1] > split]
    if first and rest:
        dim = scd.scd2_from_changelog(
            spark.createDataFrame(first, COLS), ["id"], "ts", ["color"],
            tiebreaker="seq")
        merged = scd.scd2_merge(
            dim, spark.createDataFrame(rest, COLS), ["id"], "ts",
            ["color"], tiebreaker="seq")
        assert _hist(merged) == _model(rows)


def test_collapsed_run_insertion_semantics(spark):
    """Documented loss case: an update landing inside a CLOSED collapsed
    run takes effect until the next recorded transition (the re-assertion
    red@20 was discarded by collapse and cannot be resurrected)."""
    raw = spark.createDataFrame(
        [(1, 10, 1, "red"), (1, 20, 2, "red"), (1, 30, 3, "blue")], COLS)
    dim = scd.scd2_from_changelog(raw, ["id"], "ts", ["color"],
                                  tiebreaker="seq")
    merged = scd.scd2_merge(
        dim, spark.createDataFrame([(1, 15, 9, "green")], COLS),
        ["id"], "ts", ["color"], tiebreaker="seq")
    assert _hist(merged) == [
        (1, "red", 10, 15, False, 1),
        (1, "green", 15, 30, False, 2),   # until the next RECORDED change
        (1, "blue", 30, None, True, 3),
    ]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_changelog, data=st.data())
def test_lossless_mode_merge_equals_rebuild_any_split(spark, rows, data):
    """collapse_unchanged=False keeps every raw event as a version, so
    merge == full rebuild for an ARBITRARY row-subset split (including
    batches landing inside existing history)."""
    picks = data.draw(st.lists(st.booleans(), min_size=len(rows),
                               max_size=len(rows)))
    first = [r for r, p in zip(rows, picks) if p]
    rest = [r for r, p in zip(rows, picks) if not p]
    if not first or not rest:
        return
    kw = dict(tiebreaker="seq", collapse_unchanged=False)
    rebuilt = scd.scd2_from_changelog(
        spark.createDataFrame(rows, COLS), ["id"], "ts", ["color"], **kw)
    dim = scd.scd2_from_changelog(
        spark.createDataFrame(first, COLS), ["id"], "ts", ["color"], **kw)
    merged = scd.scd2_merge(
        dim, spark.createDataFrame(rest, COLS), ["id"], "ts", ["color"],
        **kw)
    assert _hist(merged) == _hist(rebuilt)


class TestScd2TargetMode:
    """target.options.mode=scd2: the ingestion job maintains a type-2
    dimension from an incremental changelog."""

    def _cfg(self, src, root, incremental=None):
        from tests.test_runner import job_dict

        cfg = job_dict(src, root, incremental=incremental)
        cfg["source"]["type"] = "parquet"
        cfg["asset"]["schema"] = [
            {"name": "id", "type": "integer", "required": True},
            {"name": "ts", "type": "integer", "required": True},
            {"name": "seq", "type": "integer", "required": True},
            {"name": "color", "type": "string"},
        ]
        cfg["target"]["options"] = {
            "mode": "scd2", "commit": "table",
            "scd2": {"keys": ["id"], "tracked": ["color"],
                     "ts_field": "ts", "tiebreaker": "seq"},
        }
        return cfg

    def test_incremental_changelog_builds_history(self, spark, tmp_path):
        from dativo_ingest_spark import runner
        from dativo_ingest_spark.config.contracts import JobConfig
        from dativo_ingest_spark.sinks.table_commit import FsTable

        rows = [(1, 10, 1, "red"), (1, 30, 2, "blue"), (2, 10, 3, "green"),
                (1, 50, 4, "black"), (2, 40, 5, "grey")]
        src = str(tmp_path / "src")
        root = str(tmp_path / "dim")
        state = str(tmp_path / "state")
        inc = {"enabled": True, "cursor_field": "seq"}

        spark.createDataFrame([r for r in rows if r[3] != "black"
                               and r[3] != "grey"], COLS)\
            .write.mode("overwrite").parquet(src)
        cfg = self._cfg(src, root, incremental=inc)
        r1 = runner.run_job(spark, JobConfig.from_dict(cfg),
                            state_root=state)
        assert r1.exit_code == runner.EXIT_SUCCESS

        spark.createDataFrame(rows, COLS).write.mode("overwrite")\
            .parquet(src)
        r2 = runner.run_job(spark, JobConfig.from_dict(cfg),
                            state_root=state)
        assert r2.exit_code == runner.EXIT_SUCCESS

        got = _hist(FsTable(root).read(spark, branch="acme"))
        exp = _hist(scd.scd2_from_changelog(
            spark.createDataFrame(rows, COLS), ["id"], "ts", ["color"],
            tiebreaker="seq"))
        assert got == exp

        # replay (same source, >= cursor re-read): history unchanged
        r3 = runner.run_job(spark, JobConfig.from_dict(cfg),
                            state_root=state)
        assert r3.exit_code == runner.EXIT_SUCCESS
        assert _hist(FsTable(root).read(spark, branch="acme")) == exp

    def test_wrong_commit_mode_is_config_error(self, spark, tmp_path):
        import pytest as _pytest

        from dativo_ingest_spark import runner
        from dativo_ingest_spark.config.contracts import (ConfigError,
                                                          JobConfig)

        src = str(tmp_path / "src")
        spark.createDataFrame([(1, 10, 1, "red")], COLS).write.parquet(src)
        cfg = self._cfg(src, str(tmp_path / "dim"))
        cfg["target"]["options"]["commit"] = "hive"
        with _pytest.raises(ConfigError, match="commit: table"):
            runner.run_job(spark, JobConfig.from_dict(cfg))


class TestStreamingScd2:
    def test_epoch_merges_match_single_shot(self, spark, tmp_path):
        from dativo_ingest_spark.sinks.table_commit import FsTable
        from dativo_ingest_spark.streaming.pipeline import scd2_epoch_writer

        rows = [(1, 10, 1, "red"), (2, 10, 2, "green"), (1, 30, 3, "blue"),
                (2, 40, 4, "grey"), (1, 50, 5, "black")]
        table = FsTable.create(str(tmp_path / "dim"))
        write = scd2_epoch_writer(table, ["id"], "ts", ["color"],
                                  tiebreaker="seq", query_id="q-scd")
        for i in range(3):
            batch = [r for r in rows if (r[2] - 1) % 3 == i]
            write(spark.createDataFrame(batch, COLS), epoch_id=i)
        # replayed epoch: no-op (marker) and harmless regardless
        write(spark.createDataFrame([rows[0]], COLS), epoch_id=0)
        got = _hist(table.read(spark))
        exp = _hist(scd.scd2_from_changelog(
            spark.createDataFrame(rows, COLS), ["id"], "ts", ["color"],
            tiebreaker="seq"))
        assert got == exp


def test_lossless_merge_is_replay_idempotent(spark):
    """Replaying an already-applied batch (>= cursor boundary re-read)
    must not grow a lossless (collapse-off) history: full-row duplicate
    events drop before the rebuild."""
    kw = dict(tiebreaker="seq", collapse_unchanged=False)
    full = spark.createDataFrame(
        [(1, 10, 1, "red"), (1, 20, 2, "red"), (1, 30, 3, "blue")], COLS)
    dim = scd.scd2_from_changelog(full, ["id"], "ts", ["color"], **kw)
    replay = spark.createDataFrame([(1, 30, 3, "blue")], COLS)
    merged = scd.scd2_merge(dim, replay, ["id"], "ts", ["color"], **kw)
    assert _hist(merged) == _hist(dim)


def test_scd2_target_mode_rejects_ts_in_tracked(spark, tmp_path):
    import pytest as _pytest

    from dativo_ingest_spark import runner
    from dativo_ingest_spark.config.contracts import ConfigError, JobConfig
    from tests.test_scd import TestScd2TargetMode

    src = str(tmp_path / "src")
    spark.createDataFrame([(1, 10, 1, "red")], COLS).write.parquet(src)
    cfg = TestScd2TargetMode()._cfg(src, str(tmp_path / "dim"))
    cfg["target"]["options"]["scd2"]["tracked"] = ["ts", "color"]
    with _pytest.raises(ConfigError, match="ts_field"):
        runner.run_job(spark, JobConfig.from_dict(cfg))


def test_streaming_scd2_end_to_end_file_stream(spark, tmp_path):
    from dativo_ingest_spark.sinks.table_commit import FsTable
    from dativo_ingest_spark.streaming.pipeline import scd2_epoch_writer

    rows = [(1, 10, 1, "red"), (2, 10, 2, "green"), (1, 30, 3, "blue"),
            (2, 40, 4, "grey")]
    df = spark.createDataFrame(rows, COLS)
    src = str(tmp_path / "src")
    df.repartition(2).write.parquet(src)
    table = FsTable.create(str(tmp_path / "dim"))
    q = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .writeStream
        .foreachBatch(scd2_epoch_writer(
            table, ["id"], "ts", ["color"], tiebreaker="seq",
            checkpoint_dir=str(tmp_path / "ckpt")))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    assert _hist(table.read(spark)) == _hist(scd.scd2_from_changelog(
        df, ["id"], "ts", ["color"], tiebreaker="seq"))


def test_lossless_no_tiebreaker_keeps_legit_duplicate_events(spark):
    """Without a unique tiebreaker, a raw log may legitimately repeat a
    full row; the merge must NOT drop it (dedup only engages when a
    tiebreaker makes duplicates provably replays)."""
    cols3 = "id bigint, ts bigint, color string"
    kw = dict(collapse_unchanged=False)
    full = [(1, 10, "red"), (1, 20, "red"), (1, 20, "red")]
    rebuilt = scd.scd2_from_changelog(
        spark.createDataFrame(full, cols3), ["id"], "ts", ["color"], **kw)
    dim = scd.scd2_from_changelog(
        spark.createDataFrame(full[:2], cols3), ["id"], "ts", ["color"],
        **kw)
    merged = scd.scd2_merge(
        dim, spark.createDataFrame(full[2:], cols3), ["id"], "ts",
        ["color"], **kw)
    assert sorted(r["version_n"] for r in merged.collect()) == \
        sorted(r["version_n"] for r in rebuilt.collect()) == [1, 2, 3]


class TestPitJoin:
    def _dim(self, spark):
        from dativo_ingest_spark.operators import scd
        changes = spark.createDataFrame(
            [(1, 10, "bronze", 100), (1, 20, "gold", 101),
             (2, 15, "silver", 102)],
            "uid bigint, t bigint, tier string, cid bigint")
        changes = changes.withColumn(
            "ts", F.timestamp_micros(F.col("t") * 1000000))
        return scd.scd2_from_changelog(
            changes, ["uid"], "ts", ["tier"], tiebreaker="cid")

    def _facts(self, spark, rows):
        df = spark.createDataFrame(rows, "uid bigint, fid bigint, t bigint")
        return df.withColumn("fts", F.timestamp_micros(F.col("t") * 1000000))

    def test_picks_version_valid_at_fact_time(self, spark):
        from dativo_ingest_spark.operators import scd
        facts = self._facts(spark, [
            (1, 1, 12),   # inside bronze [10, 20)
            (1, 2, 20),   # exactly at gold start -> gold
            (1, 3, 99),   # open gold row
            (2, 4, 15),   # silver from its first instant
        ])
        out = {r.fid: r.tier for r in scd.pit_join(
            facts, self._dim(spark), ["uid"], "fts").collect()}
        assert out == {1: "bronze", 2: "gold", 3: "gold", 4: "silver"}

    def test_never_fans_out_and_left_marks_prehistory(self, spark):
        from dativo_ingest_spark.operators import scd
        facts = self._facts(spark, [(1, 1, 5), (1, 2, 50), (3, 3, 50)])
        inner = scd.pit_join(facts, self._dim(spark), ["uid"], "fts")
        assert inner.count() == 1  # pre-history and unknown key drop
        left = scd.pit_join(facts, self._dim(spark), ["uid"], "fts",
                            how="left")
        rows = {r.fid: r.tier for r in left.collect()}
        assert rows == {1: None, 2: "gold", 3: None}
        # at most one row per fact even with multiple versions
        assert left.count() == 3

    def test_same_timestamp_tie_matches_last_version_only(self, spark):
        from dativo_ingest_spark.operators import scd
        changes = spark.createDataFrame(
            [(1, 10, "a", 1), (1, 10, "b", 2)],
            "uid bigint, t bigint, tier string, cid bigint"
        ).withColumn("ts", F.timestamp_micros(F.col("t") * 1000000))
        dim = scd.scd2_from_changelog(
            changes, ["uid"], "ts", ["tier"], tiebreaker="cid")
        facts = self._facts(spark, [(1, 1, 10)])
        out = scd.pit_join(facts, dim, ["uid"], "fts").collect()
        # the zero-length [10,10) "a" version matches nothing
        assert [r.tier for r in out] == ["b"]

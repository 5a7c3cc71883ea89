"""Deterministic-sampling invariants: layout independence, split coverage,
stratified independence. These are the properties rand()/sample() lack and
the reason the operator exists (operators/sampling.py docstring)."""

from pyspark.sql import functions as F

from dativo_ingest_spark.operators import sampling
from dativo_ingest_spark.queries import load

SF = "/root/testdata/sf0.001"


def test_split_partition_layout_invariant(spark):
    docs = load(spark, SF, "documents")
    a = sampling.hash_split(docs, "doc_id", {"train": 0.8, "val": 0.2})
    b = sampling.hash_split(
        docs.repartition(7), "doc_id", {"train": 0.8, "val": 0.2}
    )
    left = {(r.doc_id, r.split) for r in a.select("doc_id", "split").collect()}
    right = {(r.doc_id, r.split) for r in b.select("doc_id", "split").collect()}
    assert left == right


def test_split_covers_every_row_exactly_once(spark):
    docs = load(spark, SF, "documents")
    out = sampling.hash_split(
        docs, "doc_id", {"train": 0.8, "test": 0.1, "val": 0.1}
    )
    assert out.count() == docs.count()
    assert out.filter(F.col("split").isNull()).count() == 0
    names = {r.split for r in out.select("split").distinct().collect()}
    assert names <= {"train", "test", "val"}
    # weights are roughly respected (hash uniformity; generous tolerance
    # for the tiny sf0.001 corpus)
    n = out.count()
    train = out.filter(F.col("split") == "train").count()
    assert 0.6 * n < train < 0.95 * n


def test_sample_is_subset_and_deterministic(spark):
    docs = load(spark, SF, "documents")
    s1 = {r.doc_id for r in sampling.hash_sample(docs, "doc_id", 0.3).collect()}
    s2 = {r.doc_id for r in sampling.hash_sample(docs, "doc_id", 0.3).collect()}
    assert s1 == s2
    assert s1 <= {r.doc_id for r in docs.select("doc_id").collect()}
    # growing the fraction only adds rows (thresholds nest)
    s_half = {r.doc_id for r in sampling.hash_sample(docs, "doc_id", 0.5).collect()}
    assert s1 <= s_half


def test_stratified_fractions_differ_by_stratum(spark):
    docs = load(spark, SF, "documents")
    out = sampling.stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 1.0}, default_fraction=0.0
    )
    got = {r.lang for r in out.select("lang").distinct().collect()}
    assert got == {"en"}
    n_en = docs.filter(F.col("lang") == "en").count()
    assert out.count() == n_en


def test_stratified_salt_independence(spark):
    """A row's draw changes with its stratum value: sampling must not reuse
    the bare-id draw across strata, or per-stratum fractions correlate."""
    docs = load(spark, SF, "documents")
    flat = sampling.hash_sample(docs, "doc_id", 0.3, salt="strata")
    strat = sampling.stratified_hash_sample(
        docs, "doc_id", "lang",
        {r.lang: 0.3 for r in docs.select("lang").distinct().collect()},
    )
    assert {r.doc_id for r in flat.collect()} != {
        r.doc_id for r in strat.collect()
    }


def test_pack_sequences_chunks_on_budget(spark):
    from pyspark.sql import functions as F

    # one shard (n_shards=1): docs in id order with 60 tokens each,
    # budget 100 -> packs break when the running sum crosses 100
    df = spark.createDataFrame([(i, 60) for i in range(5)], "id long, toks long")
    out = {r["id"]: r.asDict() for r in sampling.pack_sequences(
        df, "id", "toks", budget_tokens=100, n_shards=1).collect()}
    # cum-before: 0, 60, 120, 180, 240 -> packs 0, 0, 1, 1, 2
    assert [out[i]["pack_id"] for i in range(5)] == [0, 0, 1, 1, 2]
    assert all(out[i]["shard"] == 0 for i in range(5))


def test_pack_sequences_packs_never_span_shards(spark):
    df = spark.createDataFrame([(i, 10) for i in range(40)], "id long, toks long")
    rows = sampling.pack_sequences(df, "id", "toks",
                                   budget_tokens=50, n_shards=4).collect()
    # every (shard, pack) group draws only from its own shard's ids
    for r in rows:
        assert r["shard"] == r["id"] % 4
    # shard-local packing: 10 docs x 10 tokens per shard, budget 50 -> 2 packs
    packs = {(r["shard"], r["pack_id"]) for r in rows}
    assert len(packs) == 8


def test_pack_sequences_rejects_bad_budget(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, 5)], "id long, toks long")
    with _pytest.raises(ValueError):
        sampling.pack_sequences(df, "id", "toks", budget_tokens=0)


def test_epoch_shuffle_layout_invariant_and_redeal(spark):
    docs = load(spark, SF, "documents")
    a = sampling.epoch_shuffle(docs, "doc_id", epoch=1, n_shards=8)
    b = sampling.epoch_shuffle(docs.repartition(5), "doc_id", epoch=1,
                               n_shards=8)
    left = {(r.id, r.shard, r.position) for r in a.collect()}
    right = {(r.id, r.shard, r.position) for r in b.collect()}
    assert left == right
    # a different epoch re-deals the order
    c = sampling.epoch_shuffle(docs, "doc_id", epoch=2, n_shards=8)
    other = {(r.id, r.shard, r.position) for r in c.collect()}
    assert left != other


def test_epoch_shuffle_positions_are_dense_per_shard(spark):
    docs = load(spark, SF, "documents")
    out = sampling.epoch_shuffle(docs, "doc_id", epoch=1, n_shards=8)
    assert out.count() == docs.count()
    per_shard = (
        out.groupBy("shard")
        .agg(F.count("*").alias("n"), F.max("position").alias("mx"),
             F.min("position").alias("mn"))
        .collect()
    )
    assert per_shard  # at least one shard populated
    for r in per_shard:
        assert 0 <= r.shard < 8
        assert r.mn == 1 and r.mx == r.n  # dense 1..n ranks, no gaps


# --- temperature mixture -------------------------------------------------

def test_mixture_fractions_alpha_one_is_proportional():
    # alpha=1: target share == natural share, so every group keeps the
    # same fraction budget/total (no saturation possible).
    sizes = {"en": 8000, "fr": 1500, "sw": 500}
    f = sampling.temperature_mixture_fractions(sizes, alpha=1.0,
                                               budget_tokens=5000)
    for g in sizes:
        assert abs(f[g] - 0.5) < 1e-12


def test_mixture_fractions_alpha_zero_waterfills_uniform():
    # alpha=0: uniform targets of budget/3 ≈ 1667 tokens each; "sw" only
    # has 500 so it saturates at 1.0 and the deficit re-splits evenly
    # over en/fr: (5000-500)/2 = 2250 each.
    sizes = {"en": 8000, "fr": 4000, "sw": 500}
    f = sampling.temperature_mixture_fractions(sizes, alpha=0.0,
                                               budget_tokens=5000)
    assert f["sw"] == 1.0
    assert abs(f["en"] - 2250 / 8000) < 1e-9
    assert abs(f["fr"] - 2250 / 4000) < 1e-9


def test_mixture_fractions_smoothing_lifts_low_resource():
    sizes = {"en": 90000, "sw": 10000}
    nat = sampling.temperature_mixture_fractions(sizes, 1.0, 50000)
    smooth = sampling.temperature_mixture_fractions(sizes, 0.3, 50000)
    # alpha<1 moves tokens from the high-resource to the low-resource group
    assert smooth["sw"] > nat["sw"]
    assert smooth["en"] < nat["en"]
    # expected totals still hit the budget
    got = sum(smooth[g] * sizes[g] for g in sizes)
    assert abs(got - 50000) < 1e-6


def test_mixture_fractions_edges():
    import pytest

    assert sampling.temperature_mixture_fractions(
        {"en": 100, "zz": 0}, 0.3, 10_000) == {"en": 1.0, "zz": 0.0}
    assert sampling.temperature_mixture_fractions({}, 0.3, 10) == {}
    with pytest.raises(ValueError):
        sampling.temperature_mixture_fractions({"en": 1}, 0.3, 0)
    with pytest.raises(ValueError):
        sampling.temperature_mixture_fractions({"en": 1}, -0.1, 10)


def test_mixture_sample_deterministic_and_budget_shaped(spark):
    docs = load(spark, SF, "documents").withColumn(
        "n_tokens", F.size(F.split(F.col("text"), r"\s+"))
    )
    total = docs.agg(F.sum("n_tokens")).collect()[0][0]
    budget = int(total * 0.5)
    a = sampling.temperature_mixture_sample(
        docs, "doc_id", "lang", "n_tokens", budget, alpha=0.3)
    b = sampling.temperature_mixture_sample(
        docs.repartition(7), "doc_id", "lang", "n_tokens", budget, alpha=0.3)
    left = {r.doc_id for r in a.select("doc_id").collect()}
    right = {r.doc_id for r in b.select("doc_id").collect()}
    assert left == right and left
    # admitted token volume lands near the budget (hash-uniform draw over
    # a small corpus — generous tolerance)
    got = a.agg(F.sum("n_tokens")).collect()[0][0]
    assert 0.7 * budget < got < 1.3 * budget


def test_mixture_sample_alpha_zero_evens_group_shares(spark):
    docs = load(spark, SF, "documents").withColumn(
        "n_tokens", F.size(F.split(F.col("text"), r"\s+"))
    )
    total = docs.agg(F.sum("n_tokens")).collect()[0][0]
    budget = int(total * 0.4)
    natural = dict(
        (r.lang, r.s) for r in
        docs.groupBy("lang").agg(F.sum("n_tokens").alias("s")).collect()
    )
    out = sampling.temperature_mixture_sample(
        docs, "doc_id", "lang", "n_tokens", budget, alpha=0.0)
    sampled = dict(
        (r.lang, r.s) for r in
        out.groupBy("lang").agg(F.sum("n_tokens").alias("s")).collect()
    )
    # the spread between the biggest and smallest group share shrinks
    def spread(d):
        tot = sum(d.values())
        shares = [v / tot for v in d.values()]
        return max(shares) - min(shares)

    assert spread(sampled) < spread(natural)


def test_host_cap_respects_cap_and_is_subset(spark):
    docs = load(spark, SF, "documents")
    kept = sampling.host_cap_sample(docs, "source", "doc_id", cap=3)
    per_host = {r.source: r.n for r in
                kept.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
                .collect()}
    assert per_host and all(n <= 3 for n in per_host.values())
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert ids <= all_ids
    assert kept.columns == docs.columns  # rank column dropped


def test_host_cap_layout_invariant(spark):
    docs = load(spark, SF, "documents")
    a = {r.doc_id for r in sampling.host_cap_sample(
        docs, "source", "doc_id", cap=4).select("doc_id").collect()}
    b = {r.doc_id for r in sampling.host_cap_sample(
        docs.repartition(11), "source", "doc_id", cap=4)
        .select("doc_id").collect()}
    assert a == b


def test_host_cap_above_group_size_keeps_all(spark):
    docs = load(spark, SF, "documents")
    kept = sampling.host_cap_sample(docs, "source", "doc_id", cap=10 ** 6)
    assert kept.count() == docs.count()


def test_host_cap_salt_redeals_and_validates(spark):
    import pytest as _pytest

    docs = load(spark, SF, "documents")
    a = {r.doc_id for r in sampling.host_cap_sample(
        docs, "source", "doc_id", cap=3).select("doc_id").collect()}
    b = {r.doc_id for r in sampling.host_cap_sample(
        docs, "source", "doc_id", cap=3, salt="other")
        .select("doc_id").collect()}
    assert a != b  # different salt -> different (deterministic) draw
    with _pytest.raises(ValueError):
        sampling.host_cap_sample(docs, "source", "doc_id", cap=0)


class TestHostCapSampleBucketed:
    """The few-groups scale form: byte-identical admitted set, no
    group-only window (the mixture-admission fix — a Window.partitionBy
    (domain) row_number over ~10 domains is one whole-domain sort task
    at 100x)."""

    def test_identical_set_to_single_window_form(self, spark):
        docs = load(spark, SF, "documents")
        for cap in (1, 3, 37):
            base = {r.doc_id for r in sampling.host_cap_sample(
                docs, "source", "doc_id", cap=cap)
                .select("doc_id").collect()}
            # tiny n_buckets forces real cut buckets (need < bucket
            # size); large n_buckets exercises one-row buckets
            for nb in (2, 4, 1024):
                got = {r.doc_id for r in sampling.host_cap_sample_bucketed(
                    docs, "source", "doc_id", cap=cap, n_buckets=nb)
                    .select("doc_id").collect()}
                assert got == base, (cap, nb)

    def test_identical_set_with_column_budget_map(self, spark):
        docs = load(spark, SF, "documents")
        hosts = [r.source for r in
                 docs.select("source").distinct().collect()]
        budgets = {h: 1 + (i * 7) % 23 for i, h in enumerate(hosts)}
        bexpr = F.create_map(
            *[F.lit(x) for kv in budgets.items() for x in kv])
        cap = F.coalesce(bexpr[F.col("source")], F.lit(1))
        base = {r.doc_id for r in sampling.host_cap_sample(
            docs, "source", "doc_id", cap=cap, salt="mix")
            .select("doc_id").collect()}
        got = {r.doc_id for r in sampling.host_cap_sample_bucketed(
            docs, "source", "doc_id", cap=cap, salt="mix", n_buckets=8)
            .select("doc_id").collect()}
        assert got == base
        # per-host counts honor each host's own budget
        per = {r.source: r.n for r in sampling.host_cap_sample_bucketed(
            docs, "source", "doc_id", cap=cap, salt="mix", n_buckets=8)
            .groupBy("source").agg(F.count(F.lit(1)).alias("n"))
            .collect()}
        assert all(n <= budgets[h] for h, n in per.items())

    def test_schema_and_layout_invariance(self, spark):
        docs = load(spark, SF, "documents")
        kept = sampling.host_cap_sample_bucketed(
            docs, "source", "doc_id", cap=5, n_buckets=16)
        assert kept.columns == docs.columns
        a = {r.doc_id for r in kept.select("doc_id").collect()}
        b = {r.doc_id for r in sampling.host_cap_sample_bucketed(
            docs.repartition(11), "source", "doc_id", cap=5,
            n_buckets=16).select("doc_id").collect()}
        assert a == b

    def test_cap_above_group_size_keeps_all(self, spark):
        docs = load(spark, SF, "documents")
        kept = sampling.host_cap_sample_bucketed(
            docs, "source", "doc_id", cap=10 ** 6, n_buckets=4)
        assert kept.count() == docs.count()

    def test_null_group_capped_not_dropped(self, spark):
        # the window form treats NULL as one group and caps it; the
        # bucketed form must do the same (a plain equi-join would drop
        # every NULL-group row — NULL never equi-joins)
        rows = [(i, None if i % 5 == 0 else f"d{i % 3}")
                for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, dom string")
        a = {r.doc_id for r in sampling.host_cap_sample(
            df, "dom", "doc_id", cap=4).collect()}
        b = {r.doc_id for r in sampling.host_cap_sample_bucketed(
            df, "dom", "doc_id", cap=4, n_buckets=4).collect()}
        assert a == b
        assert any(i % 5 == 0 for i in b)     # NULL group represented
        assert sum(1 for i in b if i % 5 == 0) == 4

    def test_no_group_only_windowspec_in_plan(self, spark):
        # the scale contract this function exists for: every window in
        # the admission plan partitions by (group, bucket), never the
        # group alone — the SPRT gate pattern
        import re

        docs = load(spark, SF, "documents")
        out = sampling.host_cap_sample_bucketed(
            docs, "source", "doc_id", cap=3, n_buckets=4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
            assert "_hc_b" in spec, f"group-only window found: {spec}"

    def test_validation(self, spark):
        import pytest as _pytest

        docs = load(spark, SF, "documents")
        with _pytest.raises(ValueError):
            sampling.host_cap_sample_bucketed(
                docs, "source", "doc_id", cap=0)
        with _pytest.raises(ValueError):
            sampling.host_cap_sample_bucketed(
                docs, "source", "doc_id", cap=3, n_buckets=0)


class TestSystematicSample:
    def test_bucket_count_invariant_and_layout_invariant(self, spark):
        docs = load(spark, SF, "documents")
        base = {r.doc_id for r in sampling.systematic_sample(
            docs, "doc_id", "n_chars", step=2048)
            .select("doc_id").collect()}
        for variant in (
            sampling.systematic_sample(
                docs, "doc_id", "n_chars", step=2048, n_buckets=1),
            sampling.systematic_sample(
                docs, "doc_id", "n_chars", step=2048, n_buckets=7),
            sampling.systematic_sample(
                docs.repartition(13), "doc_id", "n_chars", step=2048),
        ):
            got = {r.doc_id for r in variant.select("doc_id").collect()}
            assert got == base

    def test_matches_single_pass_cumsum(self, spark):
        # ground truth: global cumulative sum computed driver-side
        docs = load(spark, SF, "documents")
        rows = sorted(
            (r.doc_id, max(r.n_chars or 0, 0))
            for r in docs.select("doc_id", "n_chars").collect())
        step, c, expect = 2048, 0, set()
        for doc_id, w in rows:
            prev = c
            c += w
            if c // step > prev // step:
                expect.add(doc_id)
        got = {r.doc_id for r in sampling.systematic_sample(
            docs, "doc_id", "n_chars", step=step)
            .select("doc_id").collect()}
        assert got == expect

    def test_heavy_row_kept_once_and_sampling_rate(self, spark):
        df = spark.createDataFrame(
            [(i, 10) for i in range(1000)] + [(2000, 100000)],
            "id long, w long")
        kept = sampling.systematic_sample(df, "id", "w", step=100)
        ids = [r.id for r in kept.select("id").collect()]
        assert len(ids) == len(set(ids))  # no row twice
        assert 2000 in ids  # over-step weight always sampled
        # 1000 light rows of weight 10 -> ~100 expected at step 100
        n_light = sum(1 for i in ids if i != 2000)
        assert 80 <= n_light <= 120

    def test_null_and_zero_weights_never_sampled(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, 0), (3, 10 ** 6)], "id long, w long")
        kept = sampling.systematic_sample(df, "id", "w", step=100)
        assert {r.id for r in kept.collect()} == {3}

    def test_validates_args(self, spark):
        import pytest as _pytest

        df = spark.createDataFrame([(1, 1)], "id long, w long")
        with _pytest.raises(ValueError):
            sampling.systematic_sample(df, "id", "w", step=0)
        with _pytest.raises(ValueError):
            sampling.systematic_sample(df, "id", "w", step=10, n_buckets=0)

    def test_empty_input(self, spark):
        df = spark.createDataFrame([], "id long, w long")
        assert sampling.systematic_sample(df, "id", "w", step=10).count() == 0


class TestHashSampleExactN:
    def test_exact_count_layout_invariant_bounded_churn(self, spark):
        docs = load(spark, SF, "documents")
        a = [r.doc_id for r in sampling.hash_sample_exact_n(
            docs, "doc_id", 50).select("doc_id").collect()]
        assert len(a) == 50 and len(set(a)) == 50
        b = [r.doc_id for r in sampling.hash_sample_exact_n(
            docs.repartition(9), "doc_id", 50).select("doc_id").collect()]
        assert sorted(a) == sorted(b)
        # growing the corpus: the old draw stays a superset-filtered
        # prefix — new rows only DISPLACE, never reshuffle survivors
        bigger = docs.union(docs.selectExpr(
            "doc_id + 1000000 AS doc_id", "text", "lang", "source",
            "n_chars"))
        c = {r.doc_id for r in sampling.hash_sample_exact_n(
            bigger, "doc_id", 50).select("doc_id").collect()}
        assert c & set(a)                 # overlap survives
        assert set(a) - c == set(a) - c   # displaced ones simply gone
        kept_old = [x for x in a if x in c]
        assert kept_old == [x for x in a if x in c]  # order preserved

    def test_plan_is_take_ordered_not_global_sort(self, spark):
        docs = load(spark, SF, "documents")
        plan = (sampling.hash_sample_exact_n(docs, "doc_id", 10)
                ._jdf.queryExecution().executedPlan().toString())
        assert "TakeOrderedAndProject" in plan, plan[:600]
        assert "Exchange" not in plan

    def test_validates_and_edge_cases(self, spark):
        docs = load(spark, SF, "documents")
        assert sampling.hash_sample_exact_n(docs, "doc_id", 0).count() == 0
        over = sampling.hash_sample_exact_n(docs, "doc_id", 10_000)
        assert over.count() == docs.count()
        import pytest as _pytest

        with _pytest.raises(ValueError):
            sampling.hash_sample_exact_n(docs, "doc_id", -1)
        with _pytest.raises(ValueError):
            # per-task n-slot heap: a billion-row limit OOMs executors
            # (measured), so the cap is a hard error, not a docstring
            sampling.hash_sample_exact_n(
                docs, "doc_id", sampling.MAX_EXACT_N + 1)

"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need samples and train/test/val splits that are
(a) reproducible across runs, retries, and engines — a task re-run after an
executor loss must land every row in the same split — and (b) free of
coordination. ``df.sample``/``rand()`` give neither: the draw depends on
seed + partition layout, and changes whenever the scan splits differently.

The scalable design is a pure function of the row key: a row's uniform
value is ``u(id) = int(md5(salt|id)[:8 hex]) / 2^32`` — a scan-stage
projection (no shuffle, no state, no Python) that any engine reproduces
bit-identically. Splits are threshold intervals over ``u``; sampling is the
predicate ``u < fraction``; stratified sampling salts the hash with the
stratum so per-stratum draws are independent.

At 100 TB: assignment and filter both live inside the parquet scan stage —
the sample is applied before any exchange, so downstream shuffles see only
the sampled fraction. No reference analog (the reference has no sampling
surface); standard technique (e.g. mod-hash holdout splits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from dativo_ingest_spark.operators.util import local_df

_U32_SPAN = float(1 << 32)


def hash_uniform(key: Column, salt: str = "") -> Column:
    """Deterministic uniform [0, 1) value for a key: the md5's leading
    8 hex chars as a 32-bit integer, scaled by 2^-32.

    2^-32 scaling is exact in IEEE doubles (<= 32-bit mantissa, power-of-two
    divisor), so threshold comparisons are engine-portable.
    """
    keyed = F.concat(F.lit(salt), F.lit("|"), key.cast("string"))
    return (
        F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("long")
        / F.lit(_U32_SPAN)
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash-thresholding its id.

    ``weights`` maps split name -> weight (normalized internally; iteration
    order fixes the interval layout, so pass an ordered dict). Adding rows
    never moves existing rows between splits; changing ``salt`` re-deals.
    """
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = hash_uniform(F.col(id_col), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows with u(id) < fraction."""
    return df.filter(hash_uniform(F.col(id_col), salt) < F.lit(fraction))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sample.

    ``fractions`` maps stratum value -> keep fraction; strata not listed
    keep ``default_fraction``. The hash is salted with the stratum value so
    draws are independent across strata (a row moving between strata gets a
    fresh draw). Pure scan-stage predicate — no per-stratum pass, no
    shuffle; contrast with ``DataFrame.sampleBy`` which is seed- but not
    layout-stable.
    """
    frac = None
    for value, f in fractions.items():
        cond = F.col(stratum_col) == F.lit(value)
        frac = F.when(cond, f) if frac is None else frac.when(cond, f)
    frac = (
        F.lit(float(default_fraction))
        if frac is None
        else frac.otherwise(F.lit(float(default_fraction)))
    )
    # salt the draw with the stratum: u over md5(salt|stratum|id)
    u = hash_uniform(
        F.concat(F.col(stratum_col), F.lit("|"), F.col(id_col).cast("string")),
        salt,
    )
    return df.filter(u < frac)


def _resolve_token_count(token_count_col: Column | str,
                         mode: str) -> Column:
    """The samplers' ``token_count_mode`` knob: ``"column"`` takes the
    given count column as-is (whitespace words, chunk sizes, whatever
    the caller measured); ``"bpe"`` reinterprets ``token_count_col`` as
    the TEXT column and counts demo-vocabulary (64-merge) BPE tokens;
    ``"bpe_v1"`` counts under the vendored production-shaped table
    (``models/bpe_merges_v1.json``, 3,588 merges — the rank-dict
    kernel, so per-word cost is table-size-independent). Both BPE
    modes are scan-stage Arrow kernels cached per distinct word per
    executor (``operators/tokenize.py``)."""
    col = (F.col(token_count_col) if isinstance(token_count_col, str)
           else token_count_col)
    if mode == "column":
        return col
    if mode == "bpe":
        from dativo_ingest_spark.operators import tokenize

        return tokenize.bpe_token_count_col(col)
    if mode == "bpe_v1":
        from dativo_ingest_spark.operators import tokenize

        return tokenize.bpe_token_count_col(
            col, merges=tokenize.load_merges_v1())
    raise ValueError(
        f"token_count_mode must be 'column', 'bpe' or 'bpe_v1', "
        f"got {mode!r}")


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    token_count_col: Column | str,
    budget_tokens: int,
    salt: str = "budget",
    token_count_mode: str = "column",
) -> DataFrame:
    """Per-group token-budget quota — the dataset-MIXING primitive
    ("at most N tokens per source/language" when composing a training
    mixture). Documents are admitted in deterministic salted-md5 order
    until the group's running token total reaches the budget; the first
    document crossing the line is kept, so a group with enough material
    always reaches >= ``budget_tokens``.

    Returns (``group_col``, id, n_tokens, cum_tokens) with cum_tokens the
    group-wise running total INCLUDING the row. Determinism: the md5
    order is a uniform shuffle of each group (unbiased sample of its
    documents), stable across retries/engines — the same portability
    contract as :func:`hash_split`.

    Scale: one shuffle on the group key; the admission rule is a running
    sum over an unbounded-preceding frame (WindowExec's O(1) accumulator).
    BOUND (document the skew honestly): the window partitions by
    ``group_col``, so a 100 TB mixture with FEW groups (3 languages, say)
    concentrates the sort+scan on that many window partitions — each
    group's full candidate set funnels through one task regardless of
    cluster size. That is fine up to ~tens of GB per group; past that use
    :func:`token_budget_sample_sharded`, which splits every group across
    ``n_shards`` deterministic sub-partitions with a shard-local quota
    (the same coordination-free move as :func:`pack_sequences`).

    ``token_count_mode``: ``"column"`` (default) uses ``token_count_col``
    as the per-document token count; ``"bpe"`` instead treats
    ``token_count_col`` as the TEXT column and counts tokenizer (BPE)
    tokens with the vendored merges table — real budgets are tokenizer
    tokens, and the ~1.3–1.7× word→token skew misallocates a 100 TB
    mixture (see ``operators/tokenize.py``)."""
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    from pyspark.sql.window import Window

    tok = _resolve_token_count(token_count_col, token_count_mode)
    staged = df.select(
        F.col(group_col),
        F.col(id_col).alias("id"),
        tok.cast("long").alias("n_tokens"),
        F.md5(F.concat(F.lit(salt), F.lit("|"),
                       F.col(id_col).cast("string"))).alias("_ord"),
    )
    w = (Window.partitionBy(group_col).orderBy("_ord", "id")
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        staged.select(
            group_col, "id", "n_tokens",
            (cum_before + F.col("n_tokens")).alias("cum_tokens"),
            cum_before.alias("_before"),
        )
        .filter(F.col("_before") < budget_tokens)
        .drop("_before")
    )


def token_budget_sample_sharded(
    df: DataFrame,
    id_col: str,
    group_col: str,
    token_count_col: Column | str,
    budget_tokens: int,
    n_shards: int = 64,
    salt: str = "budget",
    token_count_mode: str = "column",
) -> DataFrame:
    """Skew-proof :func:`token_budget_sample`: each group is split across
    ``n_shards`` deterministic sub-partitions (md5 of the id — uniform,
    retry-stable) and every shard enforces a local quota of
    ``budget_tokens / n_shards``. The window partitions on
    (group, shard), so the widest window partition is 1/``n_shards`` of
    the hottest group — a 3-language 100 TB mixture spreads over
    ``3 * n_shards`` tasks instead of 3.

    Trade-off vs the exact form: admission order is md5-uniform WITHIN
    each shard, so the admitted set is a union of ``n_shards`` unbiased
    subsamples rather than one globally md5-ordered prefix — still
    unbiased, still deterministic, but a different (equally valid) sample.
    Each shard keeps its crossing row, so a group with enough material
    reaches >= ``budget_tokens`` total; per-shard overshoot is bounded by
    one document each. Same output schema as the exact form, plus
    ``shard``. ``token_count_mode`` as in :func:`token_budget_sample`
    (``"bpe"`` counts tokenizer tokens over the text column)."""
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    from pyspark.sql.window import Window

    shard_budget = max(budget_tokens // n_shards, 1)
    tok = _resolve_token_count(token_count_col, token_count_mode)
    ordv = F.md5(F.concat(F.lit(salt), F.lit("|"),
                          F.col(id_col).cast("string")))
    staged = df.select(
        F.col(group_col),
        F.col(id_col).alias("id"),
        tok.cast("long").alias("n_tokens"),
        ordv.alias("_ord"),
        F.pmod(F.conv(F.substring(ordv, 1, 8), 16, 10).cast("long"),
               F.lit(n_shards)).cast("int").alias("shard"),
    )
    w = (Window.partitionBy(group_col, "shard").orderBy("_ord", "id")
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        staged.select(
            group_col, "id", "n_tokens", "shard",
            (cum_before + F.col("n_tokens")).alias("cum_tokens"),
            cum_before.alias("_before"),
        )
        .filter(F.col("_before") < shard_budget)
        .drop("_before")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: Column | str,
    budget_tokens: int = 512,
    n_shards: int = 64,
) -> DataFrame:
    """Concat-and-chunk sequence packing (GPT-style batch construction).

    Documents are concatenated in a deterministic order and cut into
    training sequences every ``budget_tokens`` tokens; a doc's ``pack_id``
    is the sequence its first token lands in. Returns
    (id, shard, n_tokens, pack_id) with pack ids unique per (shard, pack).

    Determinism/scale: docs shard by ``id % n_shards`` (layout-stable,
    engine-portable), and each shard's packing is a running sum over the
    id order — WindowExec keeps a running accumulator for an
    unbounded-preceding frame, so memory is O(1) per task and the only
    cost is the per-shard sort. ``n_shards`` bounds sort width and sets
    packing parallelism: packs never span shards, so each shard is an
    independently constructible unit of training data (the property that
    lets 1000 executors build batches without coordination).
    """
    from pyspark.sql.window import Window

    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    tok = (
        F.col(token_count_col)
        if isinstance(token_count_col, str)
        else token_count_col
    )
    staged = df.select(
        F.col(id_col).alias("id"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("long").alias("shard"),
        tok.cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return staged.select(
        "id",
        "shard",
        "n_tokens",
        F.floor(cum_before / budget_tokens).cast("long").alias("pack_id"),
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int,
    n_shards: int = 64,
    salt: str = "epoch",
) -> DataFrame:
    """Deterministic per-epoch global shuffle + shard assignment — the
    training-ORDER primitive (each epoch must visit the corpus in a fresh
    uniform order, reproducibly, without a global sort of 100 TB).

    Every row gets an order key ``md5(salt|epoch|id)``; its shard is the
    key's leading 32 bits mod ``n_shards`` and its position is the
    order-key rank WITHIN the shard. The global epoch order is
    "shard-interleaved": readers consume shards round-robin by position,
    which is how multi-worker data loaders shard an epoch anyway — no
    single task ever sees more than 1/``n_shards`` of the data. Changing
    ``epoch`` re-deals everything; re-running the same epoch reproduces it
    bit-for-bit (same portability contract as :func:`hash_split`).

    Returns (id, shard, position) with position 1-based per shard.

    Scale: one shuffle keyed on the shard + a per-shard sort on the md5
    key — sort width is corpus/``n_shards``, tunable to the cluster. No
    reference analog; standard technique (tf.data / torchdata shard+shuffle).
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    from pyspark.sql.window import Window

    ordv = F.md5(
        F.concat(F.lit(salt), F.lit("|"), F.lit(str(int(epoch))), F.lit("|"),
                 F.col(id_col).cast("string"))
    )
    staged = df.select(
        F.col(id_col).alias("id"),
        ordv.alias("_ord"),
        F.pmod(F.conv(F.substring(ordv, 1, 8), 16, 10).cast("long"),
               F.lit(n_shards)).cast("long").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("_ord", "id")
    return staged.select(
        "id", "shard", F.row_number().over(w).cast("long").alias("position")
    )


def group_aware_split(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/test split: hash the GROUP id, not the row id.

    Near-duplicate documents that straddle a train/test boundary leak the
    test set into training — the standard contamination failure of naive
    row-level splits. Here every row carries a group key (e.g. the
    resolved dedup-cluster survivor id from
    operators/dedup.py:dedup_corpus, or a source/domain id) and the split
    is decided by hash-thresholding THAT key, so a whole near-dup cluster
    always lands on one side. Same determinism contract as
    :func:`hash_split`: adding rows never moves existing groups, changing
    ``salt`` re-deals.

    Scan-stage expression over the already-joined group column — zero
    shuffles beyond whatever produced the grouping.
    """
    return hash_split(df, group_col, weights, salt=salt, out_col=out_col)


def temperature_mixture_fractions(
    sizes: dict, alpha: float, budget_tokens: int
) -> dict:
    """Per-group keep fractions realizing a temperature-smoothed mixture.

    Given per-group token counts ``sizes`` (language / domain / source),
    the target share of group *i* in the sampled corpus is
    ``q_i = p_i^alpha / sum_j p_j^alpha`` where ``p_i`` is the group's raw
    proportion — the standard multilingual-corpus rebalancing (alpha=1
    keeps natural proportions, alpha=0 is uniform across groups, ~0.3 is
    the common compromise that lifts low-resource groups without drowning
    high-resource ones). Target token counts are ``q_i * budget``
    waterfilled against availability: a group whose target exceeds its
    size contributes everything it has and the deficit re-distributes over
    the remaining groups proportional to their ``q`` (at most one pass per
    group, so the loop is O(n_groups^2) driver-side arithmetic on a
    small-by-construction dict — never row data).

    Pure Python so the math is unit-testable without Spark; group
    iteration is sorted for bit-stable float accumulation. Groups with
    non-positive size get fraction 0. Fractions are exact expectations:
    keeping each document with probability ``f_i`` yields ``f_i * s_i``
    expected tokens from group *i*.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    pos = {g: float(s) for g, s in sizes.items() if s is not None and s > 0}
    if not pos:
        return {g: 0.0 for g in sizes}
    total = sum(pos[g] for g in sorted(pos))
    budget = min(float(budget_tokens), total)
    q = {g: (pos[g] / total) ** alpha for g in pos}
    targets: dict = {}
    free = sorted(pos)
    remaining = budget
    while free:
        qsum = sum(q[g] for g in free)
        saturated = [g for g in free if pos[g] <= remaining * q[g] / qsum]
        if not saturated:
            for g in free:
                targets[g] = remaining * q[g] / qsum
            break
        for g in saturated:
            targets[g] = pos[g]
            remaining -= pos[g]
        free = [g for g in free if g not in targets]
    return {
        g: (min(max(targets.get(g, 0.0), 0.0) / pos[g], 1.0) if g in pos
            else 0.0)
        for g in sizes
    }


def temperature_mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    token_count_col: Column | str,
    budget_tokens: int,
    alpha: float = 0.3,
    salt: str = "mixture",
) -> DataFrame:
    """Build an ~``budget_tokens`` training mixture whose group shares
    follow the alpha-smoothed distribution of
    :func:`temperature_mixture_fractions` — the sampling-side complement
    of :func:`token_budget_sample` (which enforces a hard per-group cap;
    this one shapes the WHOLE mixture toward a target distribution).

    Plan: one partial-aggregated shuffle over the group key produces the
    per-group token totals (n_groups rows — the collect is
    small-by-construction, same bound as the dedup guards), the fractions
    solve driver-side, and admission is the scan-stage stratum-salted
    hash predicate of :func:`stratified_hash_sample` — so on the second
    pass the filter sits inside the parquet scan and downstream stages
    see only the sampled fraction. Two passes over the corpus total;
    zero row-data shuffles beyond the tiny group aggregate. Rows with a
    NULL group are dropped (no target share). Deterministic under
    retries/repartitioning: both passes are pure functions of row values.

    No reference analog; standard technique (XLM-R / mT5 temperature
    sampling, reproducibility contract as :func:`hash_split`).
    """
    tok = (F.col(token_count_col) if isinstance(token_count_col, str)
           else token_count_col)
    sizes_rows = (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.sum(tok.cast("long")).alias("_s"))
        .collect()
    )
    sizes = {row[group_col]: row["_s"] for row in sizes_rows}
    fractions = temperature_mixture_fractions(sizes, alpha, budget_tokens)
    return stratified_hash_sample(
        df, id_col, group_col, fractions, default_fraction=0.0, salt=salt
    )


def host_cap_sample(
    df: DataFrame,
    host_col: str,
    id_col: str,
    cap,
    salt: str = "hostcap",
) -> DataFrame:
    """Per-host document cap (web-crawl balancing, the C4/FineWeb 'at
    most N pages per host' step): keep a deterministic hash-random
    ``cap``-subset of each host's rows. ``cap`` is an int (uniform) or
    a Column expression (per-group budgets — e.g. a solved-mixture
    budget map keyed by the group column; see
    examples/mixture_pipeline.py).

    Admission ranks rows within a host by ``(md5(salt|id), id)`` — a
    layout/retry-stable pseudo-random order, so the kept set is a
    uniform-without-replacement draw that never changes when the scan
    splits differently, and appending rows can only displace rows with
    larger hashes (bounded churn, unlike rand()).

    Shape: ONE window (`row_number` per host) — a single repartition+sort
    on the host key. Hot hosts bound the sort partition, not memory
    (row_number is O(1) state). At crawl scale with million-page hosts,
    thin first with the scan-stage predicate ``u(host|id) <
    cap/estimated_host_count * slack`` (hash_uniform salted by host)
    and rank exactly inside the survivors — two-phase, same kept set
    distributionally, no giant sort partitions. With FEW groups
    (a solved training mixture's 5-50 domains) this window is one
    whole-domain sort task — use :func:`host_cap_sample_bucketed`,
    which returns the byte-identical admitted set with no group-only
    window.
    """
    from pyspark.sql import Column as _Column

    if not isinstance(cap, _Column):
        if cap < 1:
            raise ValueError("cap must be >= 1")
        cap = F.lit(int(cap))
    from pyspark.sql.window import Window as _W

    order_hash = F.md5(F.concat(
        F.lit(salt), F.lit("|"), F.col(id_col).cast("string")))
    w = _W.partitionBy(host_col).orderBy(order_hash, F.col(id_col))
    return (
        df.withColumn("_hc_rank", F.row_number().over(w))
        .filter(F.col("_hc_rank") <= cap)
        .drop("_hc_rank")
    )


def host_cap_sample_bucketed(
    df: DataFrame,
    host_col: str,
    id_col: str,
    cap,
    salt: str = "hostcap",
    n_buckets: int = 1024,
) -> DataFrame:
    """:func:`host_cap_sample` for the FEW-GROUPS regime (solved
    training mixtures, languages — 5-50 keys), where the single
    ``Window.partitionBy(group)`` would sort an entire domain's corpus
    in ONE task at 100x. Returns the BYTE-IDENTICAL admitted set via
    exact distributed selection — the SPRT two-level-scan pattern:

    1. rows bucket by the numeric value of the admission hash's first
       8 hex chars (``md5`` strings are lowercase fixed-width hex, so
       lexicographic order == 128-bit numeric order == (bucket asc,
       within-bucket hash asc) — bucketing never reorders admission);
    2. one partial-agg pass counts per (group, bucket) — a bounded
       groups x ``n_buckets`` frame collected to the driver (the
       codebook-sized-collect contract; this function is for FEW
       groups — millions of hosts should stay on
       :func:`host_cap_sample`, whose per-host partitions are small
       precisely because hosts are many);
    3. a driver prefix per group admits whole buckets while they fit
       under the cap and finds the single CUT bucket holding the
       cap-th smallest hash;
    4. full buckets admit via a broadcast semi-join (scan-stage, no
       window at all); ONLY the cut bucket — ~1/``n_buckets`` of one
       group — ranks exactly, under a window partitioned by (group,
       bucket), never by the group alone.

    The kept set equals ``host_cap_sample(df, ...)``'s exactly (same
    (md5, id) top-``cap`` per group), so the two forms are drop-in
    swaps; a property test pins the equality. ``cap`` is an int or a
    Column that must be a pure function of ``host_col`` (e.g. a budget
    map lookup) — it is evaluated once per group on the counts frame.
    """
    from pyspark.sql import Column as _Column

    if not isinstance(cap, _Column):
        if cap < 1:
            raise ValueError("cap must be >= 1")
        cap = F.lit(int(cap))
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    from pyspark.sql.types import LongType, StructField, StructType
    from pyspark.sql.window import Window as _W

    spark = df.sparkSession
    width = max(1, (1 << 32) // n_buckets)
    order_hash = F.md5(F.concat(
        F.lit(salt), F.lit("|"), F.col(id_col).cast("string")))
    staged = (df.withColumn("_hc_h", order_hash)
              .withColumn("_hc_b",
                          F.expr(f"CAST(conv(substring(_hc_h, 1, 8), 16, "
                                 f"10) AS BIGINT) div {width}L")))

    # level 1: per-(group, bucket) counts + the group's cap — bounded
    # collect (groups x <= n_buckets rows), the only driver-side state
    counts = (staged.groupBy(host_col, "_hc_b")
              .agg(F.count(F.lit(1)).alias("_c"))
              .select(F.col(host_col), "_hc_b", "_c",
                      cap.cast("long").alias("_cap"))
              .persist())
    try:
        n_cells = counts.count()    # materializes the cached cells
        if n_cells > 2_000_000:
            # the few-groups contract, enforced BEFORE the collect:
            # millions of groups x buckets is a corpus-shaped frame,
            # not a control plane — that regime belongs to
            # host_cap_sample (many small per-host partitions)
            raise ValueError(
                f"host_cap_sample_bucketed: {n_cells} (group, bucket) "
                "cells exceed the driver-collect budget (2e6) — this "
                "function is for FEW groups (mixtures, languages); "
                "use host_cap_sample for many-host corpora or lower "
                "n_buckets")
        rows = counts.collect()
    finally:
        counts.unpersist()
    by_host: dict = {}
    for r in rows:
        by_host.setdefault(r[host_col], []).append(
            (int(r._hc_b), int(r._c), int(r._cap)))

    # level 2 (driver prefix in bucket == hash order): whole buckets
    # admit while they fit; the first overflowing bucket is the CUT
    full, cuts = [], []             # (host, bkt) / (host, bkt, need)
    for host, lst in by_host.items():
        capv = lst[0][2]
        run = 0
        for bkt, c, _ in sorted(lst):
            if run + c <= capv:
                full.append((host, bkt))
                run += c
                if run == capv:
                    break
            else:
                need = capv - run
                if need > 0:
                    cuts.append((host, bkt, need))
                break               # later buckets are all rejected

    h_field = df.schema[host_col]
    full_df = local_df(spark, full, StructType([
        StructField("_hc_host", h_field.dataType, True),
        StructField("_hc_b2", LongType(), False)]))
    cut_df = local_df(spark, cuts, StructType([
        StructField("_hc_host", h_field.dataType, True),
        StructField("_hc_b2", LongType(), False),
        StructField("_need", LongType(), False)]))

    # NULL-safe group key: host_cap_sample's window treats the NULL
    # group as one partition and caps it — a plain equi-join here
    # would silently DROP every NULL-group row (NULL never equi-joins)
    on = (F.col(host_col).eqNullSafe(F.col("_hc_host"))
          & (F.col("_hc_b") == F.col("_hc_b2")))
    admitted_full = staged.join(F.broadcast(full_df), on, "leftsemi")
    in_cut = (staged.join(F.broadcast(cut_df), on)
              .drop("_hc_host", "_hc_b2"))
    w_cut = (_W.partitionBy(host_col, "_hc_b")
             .orderBy("_hc_h", F.col(id_col)))
    admitted_cut = (in_cut
                    .withColumn("_hc_rank", F.row_number().over(w_cut))
                    .filter(F.col("_hc_rank") <= F.col("_need"))
                    .drop("_need", "_hc_rank"))
    # joins reorder columns (join keys first) — restore the input shape
    return (admitted_full.unionByName(
        admitted_cut.select(*admitted_full.columns))
        .select(*df.columns))


def mixture_admission_rates(
    weights_micro: dict,
    domain_counts: dict,
    total_budget: int,
) -> dict:
    """Per-domain admission rates (micro-fractions) that steer a stream
    toward a solved mixture — the frozen-weights contract behind
    ``streaming/pipeline.py:mixture_admission_gate``: solve
    ``doremi_domain_weights`` once on a reference corpus, convert here,
    freeze.

    ``rate_d = min(1e6, total_budget * weight_d / count_d)`` in pure
    integer arithmetic — the expected admitted count is
    ``total_budget * weight_d`` docs for every domain that can supply
    it. A domain too SMALL for its target share saturates at rate 1e6
    (admit everything — a stream cannot upsample); the shortfall is the
    caller's signal to re-solve or extend the reference window, never a
    silent redistribution to other domains (which would skew the
    mixture the weights were solved FOR). Domains present in
    ``domain_counts`` but absent from the solved weights get rate 0
    (match the gate's explicit-decision stance).
    """
    if total_budget <= 0:
        raise ValueError("total_budget must be positive")
    rates: dict = {}
    for d, n in domain_counts.items():
        w = int(weights_micro.get(d, 0))
        n = int(n)
        if n <= 0 or w <= 0:
            rates[d] = 0
            continue
        # rate in micro: (budget * w_micro) docs-worth over n docs
        rates[d] = min(1_000_000, (total_budget * w) // n)
    return rates


def systematic_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    step: int,
    n_buckets: int = 256,
) -> DataFrame:
    """Weighted systematic (probability-proportional-to-size) sampling:
    lay the rows end-to-end on a weight axis in ``id_col`` order and keep
    every row whose weight interval contains a multiple of ``step``.

    Each row is kept with probability ``min(weight/step, 1)`` — the
    classic PPS systematic design (Madow 1949; the sampler behind DDSketch
    -style weighted telemetry and token-budgeted corpus draws where long
    documents must be over-represented proportionally). Unlike
    exponential-key A-ES reservoir draws, selection is PURE INTEGER
    arithmetic over the cumulative weight, so the kept set is bit-exact
    across engines, retries, and partition layouts — the property every
    other sampler in this module guarantees via md5, achieved here with
    no hashing at all. Rows heavier than ``step`` are kept exactly once
    (truncated PPS; callers wanting with-replacement multiplicity can
    take ``(cum div step) - ((cum - w) div step)`` as the copy count).

    Scale shape — the global cumulative sum, done distributively:
    a global ``sum() OVER (ORDER BY id)`` window is a SINGLE-TASK sort at
    100 TB, so instead (1) rows bucket by an id-range split (pure
    function of the id — layout-independent, unlike
    ``spark_partition_id``), (2) one window per bucket computes the
    bucket-local cumsum (shuffle keyed on ~``n_buckets`` × even-width
    keys), (3) the per-bucket totals — ``n_buckets`` rows — aggregate,
    collect to the driver (control-plane frame, bytes not data), prefix-
    sum in Python, and broadcast-join back as bucket offsets. Total cost:
    one bucket-keyed exchange of the data + one broadcast; identical
    output for ANY ``n_buckets``.

    Weights must be non-negative; null weights count as 0 (never
    sampled). Returns the input schema (sampled rows only).
    """
    if step < 1:
        raise ValueError("step must be >= 1")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    from pyspark.sql.window import Window as _W

    bounds = df.agg(
        F.min(F.col(id_col)).alias("lo"),
        F.max(F.col(id_col)).alias("hi"),
    ).first()
    if bounds.lo is None:
        return df
    span = int(bounds.hi) - int(bounds.lo) + 1
    width = max(1, -(-span // n_buckets))
    w = F.coalesce(
        F.greatest(F.col(weight_col).cast("long"), F.lit(0)), F.lit(0))
    bucketed = df.withColumn(
        "_ss_b",
        F.expr(
            f"(CAST(`{id_col}` AS BIGINT) - {int(bounds.lo)}) div {width}"
        ),
    ).withColumn("_ss_w", w)
    win = _W.partitionBy("_ss_b").orderBy(F.col(id_col))
    local = bucketed.withColumn("_ss_lc", F.sum("_ss_w").over(win))
    totals = {
        r._ss_b: r.t
        for r in local.groupBy("_ss_b")
        .agg(F.max("_ss_lc").alias("t"))
        .collect()
    }
    off, offsets = 0, []
    for b in sorted(totals):
        offsets.append((int(b), off))
        off += int(totals[b])
    odf = local_df(df.sparkSession,
                   offsets, "_ss_b long, _ss_off long")
    kept = (
        local.join(F.broadcast(odf), "_ss_b")
        .filter(
            F.expr(f"(_ss_lc + _ss_off) div {step}")
            > F.expr(f"(_ss_lc + _ss_off - _ss_w) div {step}")
        )
    )
    return kept.drop("_ss_b", "_ss_w", "_ss_lc", "_ss_off")


#: TakeOrderedAndProject keeps an n-slot heap in EVERY task — beyond
#: this, exact-n draws must go threshold-and-trim (hash_sample)
MAX_EXACT_N = 10_000_000


def hash_sample_exact_n(
    df: DataFrame,
    id_col: str,
    n: int,
    salt: str = "",
) -> DataFrame:
    """Exactly-``n`` deterministic sample: the n rows with the smallest
    ``md5(salt|id)`` — the reproducible answer to "give me exactly 100k
    documents" where :func:`hash_sample`'s threshold draw only hits the
    target in expectation. Same stability contract as every sampler
    here: layout/retry/engine-independent, and growing the corpus only
    displaces rows whose hash falls out of the top n (bounded churn —
    a fresh rand() ranking redeals everything).

    Scale: Spark plans orderBy+limit as TakeOrderedAndProject — each
    partition keeps a local n-heap and the driver merges partition
    tops, so cost is one scan + O(n) memory PER TASK and on the
    driver, NO global sort and no shuffle of the data. That per-task
    heap is exactly why ``n`` is hard-capped at
    :data:`MAX_EXACT_N`: a billion-row limit allocates a billion-slot
    priority queue in every task and OOMs the executor (measured) —
    past the cap, use :func:`hash_sample` with a threshold slightly
    above n/N and trim the overshoot.
    """
    if n < 0:
        raise ValueError("n must be >= 0")
    if n > MAX_EXACT_N:
        raise ValueError(
            f"n={n} exceeds MAX_EXACT_N={MAX_EXACT_N}: "
            "TakeOrderedAndProject keeps an n-slot heap per task; use "
            "hash_sample(fraction ~ n/N) + trim for draws this large")
    ranked = df.withColumn(
        "_hs", F.md5(F.concat(F.lit(salt), F.lit("|"),
                              F.col(id_col).cast("string"))))
    return (ranked.orderBy("_hs", F.col(id_col)).limit(n)
            .drop("_hs"))

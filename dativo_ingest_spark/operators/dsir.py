"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023).

Selects corpus documents that LOOK LIKE a target sample: both corpus and
target are modeled as bag-of-hashed-ngram multinomials, every document
gets an importance weight ``log p_target(doc) - log p_raw(doc)`` under
those models, and selection resamples by weight (Gumbel top-k — the
paper's sampled variant — or a plain threshold). This is the standard
pretraining-data targeting move ("give me web text that looks like
Wikipedia/books") and composes in front of the quality/dedup gates.
Beyond-reference operator (the reference has no scoring of any kind);
paper: arXiv:2302.03169.

Feature space: word unigrams + bigrams of the normalized text
(``functions/text.words``), hashed to ``n_buckets`` buckets via the
engine's portable-hash convention (leading 8 hex chars of md5 → uint32,
mod buckets) — hashing makes the model size a CONSTANT (buckets), not
vocabulary-sized.

Determinism discipline (the unigram-LM micro-nats trick,
``textops.unigram_logprob``): each bucket's two smoothed log-probs
quantize to integer micro-nats INDEPENDENTLY, the ratio is their bigint
difference, and a document's weight is a bigint SUM of per-bucket
ratios — no floating accumulation anywhere, so partial-agg order cannot
perturb a bit and a SQL oracle reproduces the weights exactly.

Scale shape (100 TB corpus, small target):

* corpus features explode ~2×words rows but immediately fold to
  ``n_buckets`` partial-aggregated counts — the model is KBs;
* the ratio table (≤ ``n_buckets`` rows) BROADCASTS into the per-doc
  weight join — the corpus-sized side never shuffles on a low-card key;
* per-doc fold is one aggregate on the doc id;
* Gumbel top-k is a global ``orderBy(...).limit(k)`` — Spark's
  TakeOrdered tournament, no single-partition sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dativo_ingest_spark.functions import text
from dativo_ingest_spark.operators.util import local_df

DEFAULT_BUCKETS = 10_000
MICRO_UNITS = 1_000_000


def _features(df: DataFrame, text_col: str,
              id_col: str | None = None) -> DataFrame:
    """(id?, f) — one row per unigram/bigram occurrence. Without
    ``id_col`` only the feature column is emitted (the target-side
    model needs counts, not provenance)."""
    w = text.words(F.coalesce(F.col(text_col), F.lit(""))).alias("_w")
    base = (df.select(F.col(id_col).alias("id"), w)
            if id_col else df.select(w))
    f = F.explode(
        F.concat(F.col("_w"), text.word_ngrams(F.col("_w"), 2))
    ).alias("f")
    return base.select("id", f) if id_col else base.select(f)


def _bucket(col, n_buckets: int):
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    ).cast("long")


def importance_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: DataFrame,
    target_text_col: str | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
    micro_units: int = MICRO_UNITS,
) -> DataFrame:
    """(id, n_feats, weight_micro) per corpus document.

    ``weight_micro`` is the DSIR importance weight in integer micro-nats:
    ``sum over the doc's hashed features of [lpq_target(b) - lpq_raw(b)]``
    where ``lpq_x(b) = floor(ln((c_x(b)+1)/(T_x+n_buckets))*1e6 + 0.5)``
    — Laplace-smoothed bucket log-probs, quantized before any summation.
    Positive = looks more like the target than the raw corpus. Every
    input document appears (empty docs weigh 0).

    ``target`` is the (small) exemplar frame; its text column defaults
    to ``text_col``.
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    # fold occurrences to (doc, bucket) grain FIRST: the md5 explode runs
    # once (not once per consumer), and both the corpus model and the
    # weight join downstream operate on the much smaller folded grain
    # cache the folded grain: doc_b feeds BOTH the corpus model (raw)
    # and the per-doc weight join — uncached, the md5 feature explode
    # over the full corpus evaluates once per consumer (no ReusedExchange
    # fires across the branches; the plan showed THREE corpus Generate
    # passes). The cache is (doc, bucket) grain — bounded by corpus
    # tokens and by docs*n_buckets, the same materialization the dedup
    # pipelines make of their gram frames.
    doc_b = (
        _features(df, text_col, id_col)
        .select("id", _bucket(F.col("f"), n_buckets).alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .cache()
    )
    tgt_b = _features(target, target_text_col or text_col).select(
        _bucket(F.col("f"), n_buckets).alias("bucket"))

    # model tables: <= n_buckets rows each, but each has two consumers
    # (the ratio join and its own total) — cache so the corpus/target
    # subtree under them runs once, not once per consumer
    raw = doc_b.groupBy("bucket").agg(F.sum("c").alias("cr")).cache()
    tgt = tgt_b.groupBy("bucket").agg(F.count(F.lit(1)).alias("ct")).cache()
    t_raw = raw.agg(F.sum("cr").alias("tr"))
    t_tgt = tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("tt"))

    def lpq(c, total):
        return F.floor(
            F.log(
                (c.cast("double") + F.lit(1.0))
                / (total.cast("double") + F.lit(float(n_buckets)))
            ) * micro_units + 0.5
        ).cast("long")

    ratio = (
        raw.join(tgt, "bucket", "left")
        .join(F.broadcast(t_raw))
        .join(F.broadcast(t_tgt))
        .select(
            "bucket",
            (lpq(F.coalesce(F.col("ct"), F.lit(0)), F.col("tt"))
             - lpq(F.col("cr"), F.col("tr"))).alias("lr"),
        )
    )
    per_doc = (
        doc_b.join(F.broadcast(ratio), "bucket")
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_feats"),
            F.sum(F.col("c") * F.col("lr")).alias("weight_micro"),
        )
    )
    every = df.select(F.col(id_col).alias("id")).distinct()
    return every.join(per_doc, "id", "left").select(
        "id",
        F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce("weight_micro", F.lit(0)).cast("long")
        .alias("weight_micro"),
    )


def gumbel_topk_sample(
    weights: DataFrame,
    k: int,
    temperature: float = 1.0,
    salt: str = "dsir",
    micro_units: int = MICRO_UNITS,
) -> DataFrame:
    """DSIR's resampling step: top ``k`` documents by perturbed weight
    ``w/temperature + Gumbel(0,1)`` — equivalent to sampling k docs
    without replacement with probability ∝ exp(w/temperature)
    (Gumbel-top-k). The Gumbel noise derives from the id's salted md5
    (uniform in (0,1) from the leading 8 hex chars), so the sample is
    DETERMINISTIC and engine-portable — no ``rand()``, retries and
    oracle replicas agree. ``temperature → 0`` degenerates to exact
    top-k by weight.

    Input: the :func:`importance_weights` frame (or anything with
    ``id`` + ``weight_micro``). One global orderBy().limit(k) — Spark's
    distributed TakeOrdered, never a single-partition sort."""
    if k <= 0:
        raise ValueError("k must be positive")
    if temperature < 0:
        raise ValueError("temperature must be >= 0")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.lit("|"),
                               F.col("id").cast("string"))), 1, 8),
            16, 10,
        ).cast("double") + F.lit(1.0)
    ) / F.lit(4294967297.0)            # (hex32+1)/(2^32+1) in (0,1)
    g = -F.log(-F.log(u))
    score = (
        F.col("weight_micro").cast("double") / F.lit(float(micro_units))
        / F.lit(temperature) + g
        if temperature > 0
        else F.col("weight_micro").cast("double")
    )
    return (
        weights.withColumn("_score", score)
        .orderBy(F.col("_score").desc(), F.col("id"))
        .limit(k)
        .drop("_score")
    )


def _doremi_rounds(stats: list[tuple], n_rounds: int,
                   eta_milli: int, average_rounds: bool = False) -> dict:
    """The DoReMi multiplicative-weights fixed point over collected
    per-domain aggregates — pure integers so a SQL oracle replays every
    round bit-for-bit (Python //, Spark DIV and DuckDB integer // all
    agree on the non-negative operands used here).

    ``stats``: [(domain, nll_micro), ...]; returns {domain: weight_micro}
    with weights renormalized to micro shares after every round.

    Per round (Group-DRO with the mixture itself as the reference
    model — domains harder than the CURRENT mixture get upweighted
    until the weighted reference catches up, a genuine coupled fixed
    point, not a closed form: the truncating renormalization feeds
    round t's integer shares into round t+1):

    1. shares   s_d = (W_d * 1e6) // sum(W)
    2. reference ref = (sum_d s_d * nll_d) // 1e6         (micro-nats)
    3. excess   e_d = max(0, nll_d - ref)                 (DoReMi clip)
    4. update   W_d = (W_d * (1e6 + (eta_milli * e_d) // 1000)) // 1e6
    5. renorm   W_d = max(1, (W_d * 1e6) // sum(W))       (floor keeps
       every domain alive — a 0 weight could never recover)

    ``average_rounds=True`` returns the mean of the per-round
    normalized weights instead of the final round — the paper's actual
    published mixture (DoReMi averages the per-step domain weights,
    which smooths the early-round transient); still pure integers
    (sum of micro shares // n_rounds, final floor renorm), so an
    oracle unrolls it the same way.
    """
    if n_rounds < 0:
        raise ValueError("n_rounds must be >= 0")
    if eta_milli < 0:
        raise ValueError("eta_milli must be >= 0")
    w = {d: MICRO_UNITS for d, _ in stats}
    nll = dict(stats)
    acc = {d: 0 for d in w}
    for _ in range(n_rounds):
        tot = sum(w.values())
        s = {d: (w[d] * MICRO_UNITS) // tot for d in w}
        ref = sum(s[d] * nll[d] for d in w) // MICRO_UNITS
        for d in w:
            exc = nll[d] - ref
            if exc < 0:
                exc = 0
            w[d] = (w[d] * (MICRO_UNITS + (eta_milli * exc) // 1000)) \
                // MICRO_UNITS
        tot2 = sum(w.values())
        w = {d: max(1, (w[d] * MICRO_UNITS) // tot2) for d in w}
        for d in w:
            acc[d] += w[d]
    if average_rounds and n_rounds > 0:
        avg = {d: acc[d] // n_rounds for d in w}
        tot3 = sum(avg.values())
        return {d: max(1, (avg[d] * MICRO_UNITS) // max(1, tot3))
                for d in avg}
    return w


def _doremi_domain_stats(df: DataFrame, domain_col: str,
                         text_col: str) -> DataFrame:
    """The corpus-scale stage of DoReMi, as a lazy domain-grain frame:
    (domain, n_docs, n_tokens, nll) with nll the mean per-token NLL in
    micro-nats under the corpus's own unigram LM. Domain rides the
    tokenize scan directly — no corpus-scale self-join to recover
    provenance; the only shuffles are the word-count aggregate, the
    Zipf vocab join, and the domain fold (plan-gated in
    tests/test_plans.py)."""
    base = df.select(
        F.col(domain_col).alias("domain"),
        text.words(F.coalesce(F.col(text_col), F.lit(""))).alias("_w"))
    words = base.select("domain", F.explode("_w").alias("word"))
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("total"))
    lp = (counts.join(F.broadcast(total))
          .select("word",
                  F.floor(F.log(F.col("c").cast("double")
                                / F.col("total").cast("double"))
                          * MICRO_UNITS + 0.5)
                  .cast("long").alias("lpq")))
    dom = (words.join(lp, "word")
           .groupBy("domain")
           .agg(F.count(F.lit(1)).alias("n_tokens"),
                F.sum("lpq").alias("sum_lpq")))
    n_docs = (base.filter(F.size("_w") > 0)
              .groupBy("domain").agg(F.count(F.lit(1)).alias("n_docs")))
    return (dom.join(n_docs, "domain")
            .select("domain", "n_docs", "n_tokens",
                    F.expr("(-sum_lpq) DIV n_tokens").alias("nll")))


def doremi_domain_weights(
    df: DataFrame,
    domain_col: str,
    text_col: str,
    n_rounds: int = 5,
    eta_milli: int = 200,
    average_rounds: bool = False,
) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023,
    arXiv:2305.10429): solve for a training mixture that upweights the
    domains the reference model finds HARD, instead of sampling by raw
    token share. The paper's minimax loop retrains a proxy model per
    step; this engine variant keeps the Group-DRO multiplicative-weights
    solver and plugs in the corpus's own unigram LM as the loss model —
    per-domain mean NLL in micro-nats (the ``unigram_logprob``
    discipline), with each round's reference loss being the
    CURRENT-mixture-weighted mean, so weights and reference co-evolve
    to an equilibrium. Completes the mixture story next to DSIR
    (targeted selection), temperature mixtures and perplexity buckets.

    One row per domain: (domain, n_docs, n_tokens, nll_micro,
    baseline_micro, weight_micro) — baseline is the natural token
    share, weight the solved mixture share (both micro, summing to
    ~1e6 up to floor truncation). Only documents with >= 1 word score.

    Determinism: per-word log-probs quantize to integer micro-nats
    BEFORE any sum; domain NLL is one integer division; every solver
    round is pure integer arithmetic (see :func:`_doremi_rounds`) — a
    SQL oracle replays the rounds as unrolled CTEs exactly.

    Scale: the corpus is scanned by ONE tokenize + vocab join (the
    proven Zipf-join shape) folding straight to domain grain; the
    solver iterates driver-side over the collected DOMAIN frame
    (domains number 10s-1000s — the codebook-sized-collect contract
    from quantization.py, never row-scaled).
    """
    rows = _doremi_domain_stats(df, domain_col, text_col) \
        .collect()                           # domain-grain: bounded
    total_tokens = sum(int(r.n_tokens) for r in rows)
    weights = _doremi_rounds(
        [(r.domain, int(r.nll)) for r in rows], n_rounds, eta_milli,
        average_rounds=average_rounds)
    out = [(r.domain, int(r.n_docs), int(r.n_tokens), int(r.nll),
            (int(r.n_tokens) * MICRO_UNITS) // max(1, total_tokens),
            weights[r.domain])
           for r in sorted(rows, key=lambda r: r.domain)]
    return local_df(df.sparkSession, 
        out, "domain string, n_docs bigint, n_tokens bigint, "
             "nll_micro bigint, baseline_micro bigint, "
             "weight_micro bigint")

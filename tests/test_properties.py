"""Property-based tests (hypothesis) over the pure-Python kernels: the
Markdown-KV parser round-trip, the POSIX-cron subset, retry backoff, tag
precedence, and the S3 tag cap. The reference ships no property tests
(SURVEY §5 'Absent'); these cover the surfaces where hand-picked examples
miss edge cases, without spinning Spark jobs per example."""

from __future__ import annotations

import datetime as dt
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from dativo_ingest_spark.config import tags as tagmod
from dativo_ingest_spark.config.contracts import AssetDefinition
from dativo_ingest_spark.operators import mdkv
from dativo_ingest_spark.orchestrate import Schedule, cron_matches, next_fire
from dativo_ingest_spark.retry import RetryConfig, RetryPolicy

# --- Markdown-KV round-trip ------------------------------------------------

_key = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)
_val = st.text(
    alphabet=string.ascii_letters + string.digits + " .,;:!?/@#$%&*()[]{}'\"-=+",
    max_size=30,
).map(str.strip)
_section = st.from_regex(r"[A-Za-z][A-Za-z0-9 ]{0,15}", fullmatch=True).map(
    str.strip
).filter(bool)
_kvs = st.lists(st.tuples(_key, _val), max_size=4)


def _doc(front: list[tuple[str, str]], sections: list[tuple[str, list]]) -> str:
    lines: list[str] = []
    if front:
        lines.append("---")
        lines += [f"{k}: {v}" for k, v in front]
        lines.append("---")
    for name, kvs in sections:
        lines.append(f"# {name}")
        lines += [f"{k}:: {v}" for k, v in kvs]
    # trailing newline: the closing-fence regex (reference
    # markdown_kv.py:19, mirrored in mdkv._FENCE_RE) requires a newline
    # after the closing ---; see test_front_matter_requires_trailing_newline
    return "\n".join(lines) + "\n"


@settings(max_examples=60, deadline=None)
@given(
    front=st.lists(st.tuples(_key, _val), max_size=3, unique_by=lambda t: t[0]),
    sections=st.lists(st.tuples(_section, _kvs), max_size=3),
)
def test_mdkv_row_per_kv_roundtrip(front, sections):
    content = _doc(front, sections)
    rows = mdkv.parse_row_per_kv(content, "d1", "2026-01-01T00:00:00")
    expected = [("_front_matter", k, v) for k, v in front] + [
        (name, k, v) for name, kvs in sections for k, v in kvs
    ]
    got = [(r["section"], r["key"], r["value"]) for r in rows]
    assert got == expected
    # ord is the document-global 0..n-1 sequence
    assert [r["ord"] for r in rows] == list(range(len(rows)))


@settings(max_examples=60, deadline=None)
@given(kvs=_kvs)
def test_mdkv_headerless_block_lands_in_default_section(kvs):
    content = "\n".join(f"{k}:: {v}" for k, v in kvs)
    rows = mdkv.parse_row_per_kv(content, "d1", "t")
    assert [(r["section"], r["key"], r["value"]) for r in rows] == [
        ("_default", k, v) for k, v in kvs
    ]


def test_mdkv_indented_continuation_joins_value():
    rows = mdkv.parse_row_per_kv("k:: a\n  b\nplain line\nk2:: c", "d", "t")
    assert [(r["key"], r["value"]) for r in rows] == [("k", "a\n  b"),
                                                      ("k2", "c")]


# --- cron subset -----------------------------------------------------------

_cron_minute = st.one_of(
    st.just("*"), st.integers(0, 59).map(str),
    st.tuples(st.integers(0, 29), st.integers(30, 59)).map(
        lambda t: f"{t[0]}-{t[1]}"),
    st.sampled_from(["*/5", "*/15", "0,30", "7/10"]),
)
_cron_hour = st.one_of(st.just("*"), st.integers(0, 23).map(str),
                       st.sampled_from(["*/6", "8-18"]))
_cron = st.tuples(
    _cron_minute, _cron_hour,
    st.one_of(st.just("*"), st.integers(1, 28).map(str)),
    st.one_of(st.just("*"), st.integers(1, 12).map(str)),
    st.one_of(st.just("*"), st.integers(0, 6).map(str)),
).map(" ".join)

_after = st.datetimes(
    min_value=dt.datetime(2026, 1, 1), max_value=dt.datetime(2026, 12, 1)
)


@settings(max_examples=30, deadline=None)  # the horizon scan dominates runtime
@given(cron=_cron, after=_after)
def test_next_fire_matches_and_is_future(cron, after):
    s = Schedule(name="s", job_config="j", cron=cron)
    t = next_fire(s, after)
    if t is None:  # unsatisfiable within horizon (e.g. Feb 30)
        return
    assert t > after
    assert t.second == 0 and t.microsecond == 0
    assert cron_matches(cron, t)
    # minimality on a bounded sample: no earlier minute also matches
    probe = after.replace(second=0, microsecond=0) + dt.timedelta(minutes=1)
    for _ in range(60):
        if probe >= t:
            break
        assert not cron_matches(cron, probe)
        probe += dt.timedelta(minutes=1)


@settings(max_examples=40, deadline=None)
@given(after=_after, seconds=st.integers(1, 86400))
def test_interval_fire_is_exact(after, seconds):
    s = Schedule(name="s", job_config="j", interval_seconds=seconds)
    assert next_fire(s, after) == after + dt.timedelta(seconds=seconds)


# --- retry backoff ---------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(
    initial=st.floats(0.01, 30, allow_nan=False),
    mult=st.floats(1.0, 5.0, allow_nan=False),
    cap=st.floats(1.0, 600.0, allow_nan=False),
    attempts=st.integers(0, 20),
)
def test_backoff_monotone_and_capped(initial, mult, cap, attempts):
    p = RetryPolicy(RetryConfig(initial_delay_seconds=initial,
                                backoff_multiplier=mult,
                                max_delay_seconds=cap))
    delays = [p.calculate_delay(a) for a in range(attempts + 1)]
    assert all(d <= cap for d in delays)
    assert all(b >= a for a, b in zip(delays, delays[1:]))
    assert delays[0] == min(initial, cap)


# --- tag precedence --------------------------------------------------------

_cls = st.sampled_from(["pii", "internal", "public", "Sensitive"])


@settings(max_examples=60, deadline=None)
@given(
    contract=st.dictionaries(_key, st.one_of(st.none(), _cls),
                             min_size=1, max_size=5),
    overrides=st.dictionaries(_key, _cls, max_size=5),
    source=st.dictionaries(_key, _cls, max_size=5),
)
def test_field_classification_precedence(contract, overrides, source):
    asset = AssetDefinition.from_dict({
        "name": "t",
        "schema": [
            {"name": k, "type": "string",
             **({"classification": c} if c else {})}
            for k, c in contract.items()
        ],
    })
    got = tagmod.field_classifications(asset, overrides, source)
    for name, declared in contract.items():
        if name in overrides:
            assert got[name] == overrides[name].lower()
        elif declared:
            assert got[name] == declared.lower()
        elif name in source:
            assert got[name] == source[name].lower()
        else:
            assert name not in got
    # undeclared columns never leak in from source tags or overrides
    assert set(got) <= set(contract)


@settings(max_examples=60, deadline=None)
@given(props=st.dictionaries(
    st.text(string.ascii_lowercase + ".", min_size=1, max_size=12),
    st.text(string.ascii_lowercase, max_size=8), max_size=25))
def test_s3_tag_cap_and_dedup(props):
    out = tagmod.s3_object_tags(props)
    assert len(out) <= 10
    keys = [k for k, _ in out]
    assert len(keys) == len(set(keys))
    assert all(props[k] == v for k, v in out)


def test_front_matter_requires_trailing_newline():
    """Characterization (hypothesis-found, reference-faithful): a doc that
    ends exactly at the closing --- fence with no trailing newline parses
    as having NO front matter — the reference's own fence regex
    (markdown_kv.py:19 `^---\\s*\\n(.*?)\\n---\\s*\\n`) requires the
    newline, and mdkv mirrors it bug-for-bug. The encoder always emits a
    body after the fence, so encoded docs never hit this."""
    assert mdkv.parse_row_per_kv("---\na: 1\n---", "d", "t") == []
    rows = mdkv.parse_row_per_kv("---\na: 1\n---\n", "d", "t")
    assert [(r["section"], r["key"], r["value"]) for r in rows] == [
        ("_front_matter", "a", "1")]


# --- secrets kernels (r5) ---------------------------------------------------

_name = st.text(string.ascii_lowercase + "_", min_size=1, max_size=8)
# excluded: quotes/backslash (stripped by the parser) and every
# str.splitlines boundary (\n \r \v \f \x1c-\x1e) — a .env line cannot
# contain its own line terminator
_val = st.text(st.characters(codec="ascii",
                             exclude_characters='"\'\\\n\r\x0b\x0c'
                                                '\x1c\x1d\x1e'),
               min_size=1, max_size=20)


@given(st.dictionaries(_name, _val, min_size=1, max_size=5))
@settings(max_examples=50, deadline=None)
def test_env_blob_roundtrip(env):
    """KEY=VALUE serialization parses back to the same mapping (modulo
    surrounding whitespace, which the parser strips)."""
    from dativo_ingest_spark import secrets

    blob = "\n".join(f"{k}={v}" for k, v in env.items())
    assert secrets.parse_env_blob(blob) == {
        k: v.strip() for k, v in env.items()}


@given(st.dictionaries(_name, _val, min_size=1, max_size=5), _name)
@settings(max_examples=50, deadline=None)
def test_placeholder_resolution_total(loaded, extra_key):
    """Every ${secret:k} for a known k resolves to the stored value; the
    document's non-placeholder parts are untouched."""
    from dativo_ingest_spark import secrets

    doc = {k: "${secret:%s}" % k for k in loaded}
    doc["plain"] = "no placeholders here"
    out = secrets.resolve_placeholders(doc, loaded)
    assert {k: out[k] for k in loaded} == loaded
    assert out["plain"] == "no placeholders here"


@given(st.dictionaries(
    st.sampled_from(["password", "token", "api_key", "note", "path"]),
    _val, min_size=1, max_size=5))
@settings(max_examples=50, deadline=None)
def test_redact_text_preserves_json_validity(doc):
    """Field-level credential scrubbing keeps every JSON document
    parseable and never touches non-credential keys' values."""
    import json as _json

    from dativo_ingest_spark import obs

    encoded = _json.dumps(doc)
    red = _json.loads(obs.redact_text(encoded))
    for k, v in doc.items():
        if k in ("note", "path"):
            assert red[k] == v


# --- data-quality kernels ----------------------------------------------------

@given(st.integers(min_value=0, max_value=10**6),
       st.sampled_from(["seconds", "minutes", "hours", "days"]))
def test_age_seconds_unit_table(n, unit):
    from dativo_ingest_spark.operators.quality import _age_seconds

    mult = {"seconds": 1, "minutes": 60, "hours": 3600, "days": 86400}[unit]
    assert _age_seconds(f"{n} {unit}") == n * mult
    assert _age_seconds(n) == float(n)


@given(st.builds(dict,
                 name=st.from_regex(r"[a-z][a-z0-9_]{0,12}", fullmatch=True),
                 status=st.sampled_from(["draft", "active", "deprecated"]),
                 version=st.from_regex(r"[0-9]\.[0-9]", fullmatch=True)))
def test_odcs_normalization_idempotent_and_preserving(asset):
    from dativo_ingest_spark.config.schema_validation import (
        normalize_asset_to_odcs,
    )

    asset = {**asset, "schema": [{"name": "id"}]}
    once = normalize_asset_to_odcs(asset)
    twice = normalize_asset_to_odcs(once)
    assert once == twice                       # idempotent
    assert once["status"] == asset["status"]   # explicit fields preserved
    assert once["version"] == asset["version"]
    assert once["kind"] == "DataContract"
    assert once["id"]                          # deterministic mint
    assert once["id"] == normalize_asset_to_odcs(asset)["id"]


class TestDoremiRoundsProperties:
    """Invariants of the pure-integer DoReMi solver
    (operators/dsir.py:_doremi_rounds) under arbitrary domain losses."""

    @given(
        nlls=st.lists(st.integers(min_value=0, max_value=30_000_000),
                      min_size=1, max_size=12),
        n_rounds=st.integers(min_value=0, max_value=8),
        eta_milli=st.integers(min_value=0, max_value=1000),
    )
    @settings(max_examples=60, deadline=None)
    def test_normalized_alive_and_order_preserving(
            self, nlls, n_rounds, eta_milli):
        from dativo_ingest_spark.operators.dsir import _doremi_rounds

        stats = [(f"d{i}", v) for i, v in enumerate(nlls)]
        w = _doremi_rounds(stats, n_rounds=n_rounds, eta_milli=eta_milli)
        # every domain stays alive
        assert all(v >= 1 for v in w.values())
        # weights are normalized micro shares (floor truncation only)
        if n_rounds > 0:
            assert 1_000_000 - len(nlls) <= sum(w.values()) <= 1_000_000 \
                + len(nlls)
        # monotone: a harder domain never ends below an easier one
        # (uniform start, per-round multiplier monotone in nll, floor
        # renorm preserves weak order)
        by_nll = sorted(stats, key=lambda t: t[1])
        for (da, va), (db, vb) in zip(by_nll, by_nll[1:]):
            assert w[da] <= w[db] or va == vb
        # int64 safety: the solver's intermediates bounded
        assert all(v <= 1_000_000 for v in w.values())


class TestRecallAtKProperties:
    """Invariants of the ANN recall meter
    (operators/quantization.py:recall_at_k) under arbitrary rankings."""

    @given(
        truth_ids=st.lists(st.integers(min_value=0, max_value=40),
                           min_size=1, max_size=8, unique=True),
        approx_ids=st.lists(st.integers(min_value=0, max_value=40),
                            min_size=0, max_size=8, unique=True),
        k=st.integers(min_value=1, max_value=8),
    )
    @settings(max_examples=20, deadline=None)
    def test_bounds_and_exact_intersection(self, spark, truth_ids,
                                           approx_ids, k):
        from dativo_ingest_spark.operators.quantization import recall_at_k

        truth = spark.createDataFrame(
            [(0, int(v)) for v in truth_ids[:k]],
            "query_id bigint, vec_id bigint")
        approx = spark.createDataFrame(
            [(0, int(v)) for v in approx_ids[:k]],
            "query_id bigint, vec_id bigint") if approx_ids else \
            spark.createDataFrame([], "query_id bigint, vec_id bigint")
        rows = recall_at_k(approx, truth, k=k).collect()
        assert len(rows) == 1                  # one row per truth query
        r = rows[0]
        expected = len(set(truth_ids[:k]) & set(approx_ids[:k]))
        assert r.n_hits == expected
        assert r.recall_micro == (expected * 1_000_000) // k
        assert 0 <= r.recall_micro <= 1_000_000

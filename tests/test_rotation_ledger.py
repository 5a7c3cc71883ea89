"""Machine-check of the driver-window rotation ledger (r11 verdict Next #3).

The registry holds far more oracle-backed queries than the driver's 50-row
proof window, so proven queries rotate out (``_GATE_DEMOTED``) to admit new
ones. The standing discipline is keep-each-family-in-window: every demotion
must leave an in-window anchor that exercises the same machinery. With 190
demoted entries that mapping can no longer live in prose — ``_DEMOTION_ANCHOR``
makes it explicit and this module keeps it honest as the registry grows.
"""

from dativo_ingest_spark.queries import (
    _DEMOTION_ANCHOR,
    _GATE_DEMOTED,
    QUERIES,
)

WINDOW_SIZE = 50


def _window() -> list[str]:
    demoted = set(_GATE_DEMOTED)
    return [name for name in QUERIES if name not in demoted]


def test_window_is_exactly_fifty() -> None:
    # the driver proves the FIRST 50 insertion-order entries; fewer than
    # 50 non-demoted queries would waste proof slots on already-green
    # tail entries, more than 50 silently drops the newest registrations
    # (the module-level RuntimeError guard catches only the > case)
    assert len(_window()) == WINDOW_SIZE


def test_window_is_the_first_fifty_insertion_order() -> None:
    # demotion works by popping+reinserting, so every demoted name must
    # sit strictly AFTER the window in registry order — if this breaks,
    # the driver window and the non-demoted set silently diverge
    names = list(QUERIES)
    assert set(names[:WINDOW_SIZE]) == set(_window())
    assert names[WINDOW_SIZE:] == list(_GATE_DEMOTED)


def test_no_duplicate_demotions() -> None:
    assert len(_GATE_DEMOTED) == len(set(_GATE_DEMOTED))


def test_every_demotion_has_an_anchor() -> None:
    missing = set(_GATE_DEMOTED) - set(_DEMOTION_ANCHOR)
    extra = set(_DEMOTION_ANCHOR) - set(_GATE_DEMOTED)
    assert not missing, f"demoted without a family anchor: {sorted(missing)}"
    assert not extra, f"anchor entries no longer demoted: {sorted(extra)}"


def test_every_anchor_is_registered_and_in_window() -> None:
    window = set(_window())
    bad = {
        demoted: anchor
        for demoted, anchor in _DEMOTION_ANCHOR.items()
        if anchor not in QUERIES or anchor not in window
    }
    assert not bad, (
        "anchors must be registered, NON-demoted queries (rotate the "
        f"anchor map when demoting an anchor): {bad}"
    )


def test_no_anchor_self_reference() -> None:
    assert all(d != a for d, a in _DEMOTION_ANCHOR.items())


def test_every_window_query_has_an_oracle_or_documented_gap() -> None:
    # every windowed query should carry a DuckDB oracle — the driver's
    # weaker rows-only check is reserved for genuinely non-SQL ops, of
    # which the current window has none
    missing = [name for name in _window() if QUERIES[name].oracle is None]
    assert not missing, f"windowed queries missing oracles: {missing}"

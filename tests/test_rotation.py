"""Driver-contract rotation: least-externally-checked first, with
queries whose LATEST driver check was red jumping the queue.

The driver samples the first 50 entries of ``queries()`` each round;
CORRECTNESS_r05.json recorded the registry's first-ever red rows
(hash-only mismatches, root-caused to pandas dtype rendering — see
tests/test_dtype_parity.py). A fix is only closed when the DRIVER
re-verifies it, so a failed-last-check query must lead the very next
sample regardless of how many times it has been checked before."""

from __future__ import annotations

import json

from reddit_can_bigdata_spark import registry


def _write(tmp_path, fname, results):
    (tmp_path / fname).write_text(json.dumps(results))


def _row(ok=True, hash_ok=None):
    return {
        "rows_match": ok,
        "schema_match": ok,
        "hash_match": ok if hash_ok is None else hash_ok,
        "err": None,
    }


def test_failed_last_check_jumps_queue(tmp_path):
    registry._ensure_loaded()
    names = list(registry.REGISTRY)
    a, b, c = names[0], names[1], names[2]
    # a: checked twice, green both times. b: checked twice, red the
    # second time. c: checked once, green.
    _write(tmp_path, "CORRECTNESS_r01.json", {a: _row(), b: _row()})
    _write(
        tmp_path,
        "CORRECTNESS_r02.json",
        {a: _row(), b: _row(hash_ok=False), c: _row()},
    )
    order = list(registry.rotated_queries(str(tmp_path)))
    # b failed its latest check -> first, ahead of every never-checked
    # query; a (count 2) sorts after c (count 1).
    assert order[0] == b
    assert order.index(c) < order.index(a)


def test_red_then_green_clears_priority(tmp_path):
    registry._ensure_loaded()
    names = list(registry.REGISTRY)
    a, b = names[0], names[1]
    _write(tmp_path, "CORRECTNESS_r01.json", {a: _row(hash_ok=False)})
    _write(tmp_path, "CORRECTNESS_r02.json", {a: _row(), b: _row()})
    order = list(registry.rotated_queries(str(tmp_path)))
    # a's red was superseded by a green re-check: no longer first; both
    # a and b (count 1 vs 2... a=2, b=1) sort by count so b precedes a.
    assert order[0] != a
    assert order.index(b) < order.index(a)


def test_current_repo_rotation_leads_with_r05_reds():
    """Pin the real state: the two r05 hash mismatches lead round 6.
    (Set comparison, not list: their relative order is a name
    tiebreak, the leading-position property is what matters.)"""
    order = list(registry.rotated_queries("/root/repo"))
    counts, failed = registry._driver_check_counts("/root/repo")
    if failed == {"table_checksum_lineitem", "curate_token_budget"}:
        assert set(order[:2]) == {"table_checksum_lineitem", "curate_token_budget"}
    # whatever the artifact state, the sample always has 50 distinct
    # heads and covers every registered query
    assert len(order) == len(registry.REGISTRY)
    assert len(set(order[:50])) == 50


def test_rotated_oracles_follow_query_order():
    rq = list(registry.rotated_queries("/root/repo"))
    ro = list(registry.rotated_oracles("/root/repo"))
    assert ro == [n for n in rq if registry.REGISTRY[n].oracle is not None]

"""Pin the bench stdout contract: ONE JSON line, hard-capped < 1 KiB.

Three rounds (4/5 spreads, 7 full-medians+cpu_s) lost the driver bench
artifact (``parsed: null``) because the single stdout line outgrew the
driver's tail-capture window. ``build_stdout_line`` now enforces the cap
by construction; these tests make the regression impossible to land
silently a fourth time.

No SparkSession needed — pure string/JSON logic.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import (
    REGRESSION_RATIO,
    STDOUT_LINE_BUDGET,
    build_stdout_line,
    compute_regressions,
    previous_round_cpu,
)
from reddit_can_bigdata_spark.registry import bench_queries


def test_budget_is_under_1k():
    assert STDOUT_LINE_BUDGET < 1024


def test_line_fits_for_current_registry_all_heavy():
    # Worst case: every registered bench query is heavy (>= 3s) with a
    # cpu_s reading AND a full regressions map — the line must still
    # fit under the cap.
    names = sorted(bench_queries().keys())
    timings = {n: 99.999 for n in names}
    cpu = {n: 999.999 for n in names}
    regressions = {n: 99.99 for n in names[:8]}
    line = build_stdout_line(timings, cpu, sf=0.1, reps=3, regressions=regressions)
    assert len(line.encode()) < 1024, len(line.encode())
    assert "\n" not in line
    assert json.loads(line)["regressions"] == regressions


def test_line_fits_for_huge_synthetic_registry():
    # Even a 500-query registry of long names can't breach the cap.
    timings = {f"a_very_long_query_name_number_{i:04d}": 50.0 + i for i in range(500)}
    cpu = {n: 400.0 for n in timings}
    line = build_stdout_line(timings, cpu, sf=0.1, reps=3)
    assert len(line.encode()) < 1024


def test_line_is_valid_json_with_required_keys():
    timings = {"q1": 1.0, "heavy": 12.5, "mid": 3.2}
    cpu = {"heavy": 120.0, "mid": 9.0}
    line = build_stdout_line(timings, cpu, sf=0.01, reps=3)
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["unit"] == "sec"
    assert parsed["value"] == round(1.0 + 12.5 + 3.2, 3)
    assert parsed["sf"] == 0.01
    assert parsed["n_queries"] == 3
    # heavy tier only (>= 3s) in the detail map
    assert set(parsed["queries"]) == {"heavy", "mid"}
    assert set(parsed["cpu_s"]) == {"heavy", "mid"}


def test_total_is_sum_of_all_queries_not_just_shown():
    timings = {f"q{i}": 1.0 for i in range(100)}  # none heavy
    line = build_stdout_line(timings, {}, sf=0.1, reps=1)
    parsed = json.loads(line)
    assert parsed["value"] == 100.0
    assert parsed["n_queries"] == 100
    assert len(parsed["queries"]) == 5  # top-5 fallback when none heavy


def test_trim_drops_lightest_first():
    timings = {f"name_{i:03d}": 3.0 + i for i in range(200)}
    cpu = {}
    line = build_stdout_line(timings, cpu, sf=0.1, reps=3)
    parsed = json.loads(line)
    shown = parsed["queries"]
    # every shown entry must be >= every hidden entry
    hidden_max = max(v for n, v in timings.items() if n not in shown)
    assert min(shown.values()) >= hidden_max


def test_regressions_flag_only_changed_queries_beyond_ratio():
    """Round-10 verdict item #4: a >1.5x cpu move is flagged ONLY when
    the query's defining code changed — an unchanged query's move is
    host noise and must not alarm; a changed query's move must not
    hide behind the variance narrative."""
    cpu = {"changed_slow": 30.0, "changed_ok": 10.4, "noise": 45.0}
    prev = {"changed_slow": 10.0, "changed_ok": 10.0, "noise": 15.0}
    changed = {"changed_slow", "changed_ok"}
    flagged = compute_regressions(cpu, prev, changed)
    assert flagged == {"changed_slow": 3.0}
    assert REGRESSION_RATIO == 1.5


def test_regressions_cap_keeps_largest_ratios():
    cpu = {f"q{i}": float(10 + i) for i in range(20)}
    prev = {f"q{i}": 1.0 for i in range(20)}
    flagged = compute_regressions(cpu, prev, set(cpu), cap=8)
    assert len(flagged) == 8
    assert min(flagged.values()) >= 22.0  # the 8 largest ratios


def test_regressions_key_always_present_and_empty_by_default():
    line = build_stdout_line({"q": 1.0}, {}, sf=0.01, reps=1)
    assert json.loads(line)["regressions"] == {}


def test_previous_round_cpu_reads_newest_parsed_artifact(tmp_path):
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"parsed": {"cpu_s": {"a": 1.0}, "sf": 0.1}})
    )
    (tmp_path / "BENCH_r10.json").write_text(
        json.dumps({"parsed": {"cpu_s": {"a": 7.5, "b": 2.0}, "sf": 0.1}})
    )
    # numeric round order, not lexicographic; unparsable files skipped
    (tmp_path / "BENCH_r11.json").write_text("not json")
    rnd, cpu = previous_round_cpu(tmp_path)
    assert (rnd, cpu) == (10, {"a": 7.5, "b": 2.0})
    # a cross-scale-factor ratio is meaningless: sf-filtered lookup
    # skips artifacts at other scales
    assert previous_round_cpu(tmp_path, sf=0.01) == (-1, {})
    assert previous_round_cpu(tmp_path, sf=0.1)[0] == 10


def test_previous_round_cpu_empty_repo(tmp_path):
    assert previous_round_cpu(tmp_path) == (-1, {})

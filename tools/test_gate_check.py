#!/usr/bin/env python3
"""Unit test for gate_check's self-adjudication (r10 verdict #1): a
synthetic over-gate artifact from a CONTENDED run must be annotated
"remeasure, not red", an idle-run regression must stay red, and a
high-spread row must be flagged noisy. Run: python3 tools/test_gate_check.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from gate_check import check, annotate

GATES = {"q01_project": 1.0, "q02_filter": 1.0, "ext01_exact_dedup": 2.0}


def run(bench):
    lines, n_over, n_red = check(bench, GATES)
    return "\n".join(lines), n_over, n_red


def test_contended_run_is_annotated():
    bench = {
        "queries": {"q01_project": 3.0, "q02_filter": 0.9},
        "loadavg_start": [17.5, 12.0, 6.0],
        "loadavg_end": [30.0, 20.0, 10.0],
        "spread": {"q01_project": "1.10"},
    }
    out, n_over, n_red = run(bench)
    assert n_over == 1 and n_red == 0, out
    assert "contended run (loadavg_start=17.50)" in out, out
    assert "remeasure, not red" in out, out


def test_idle_regression_stays_red():
    bench = {
        "queries": {"q01_project": 3.0, "q02_filter": 0.9},
        "loadavg_start": [0.5, 0.8, 1.0],
        "loadavg_end": [28.0, 15.0, 8.0],  # bench's own work — not contention
        "spread": {"q01_project": "1.10", "q02_filter": "1.05"},
    }
    out, n_over, n_red = run(bench)
    assert n_over == 1 and n_red == 1, out
    assert "remeasure" not in out, out


def test_noisy_spread_is_annotated_even_when_idle_at_start():
    bench = {
        "queries": {"ext01_exact_dedup": 5.0},
        "loadavg_start": [0.2, 0.3, 0.4],
        "loadavg_end": [25.0, 14.0, 7.0],
        "spread": {"ext01_exact_dedup": "3.40"},
    }
    out, n_over, n_red = run(bench)
    assert n_over == 1 and n_red == 0, out
    assert "noisy runs (max/min 3.40x)" in out, out


def test_legacy_artifact_without_load_fields_still_works():
    bench = {"queries": {"q01_project": 3.0}}
    out, n_over, n_red = run(bench)
    assert n_over == 1 and n_red == 1, out
    assert annotate(bench, "q01_project") == ""


def test_under_gate_rows_never_annotated():
    bench = {
        "queries": {"q01_project": 0.5},
        "loadavg_start": [20.0, 15.0, 9.0],
        "spread": {"q01_project": "4.00"},
    }
    out, n_over, n_red = run(bench)
    assert n_over == 0 and n_red == 0, out
    assert "OVER" not in out, out


if __name__ == "__main__":
    fns = [v for k, v in sorted(globals().items()) if k.startswith("test_")]
    for fn in fns:
        fn()
        print(f"ok {fn.__name__}")
    print(f"all {len(fns)} gate_check adjudication tests passed")

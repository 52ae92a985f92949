"""bench.py helper units: the committed-history growth cap."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_cap_history_keeps_first_and_newest_per_round():
    hist = [{"round_guess": r, "i": i}
            for r in range(1, 13) for i in range(5)]
    capped = bench._cap_history(hist)
    rounds = sorted({e["round_guess"] for e in capped})
    assert rounds == list(range(3, 13))  # last _HIST_MAX_ROUNDS rounds
    for r in rounds:
        es = [e for e in capped if e["round_guess"] == r]
        assert [e["i"] for e in es] == [0, 4]  # first + newest


def test_cap_history_passthrough_small():
    hist = [{"round_guess": 1, "i": 0}, {"round_guess": 2, "i": 0}]
    assert bench._cap_history(hist) == hist


def test_isolated_min_ignores_transient_failures():
    """A pass-1 failure must not poison later successful passes: best =
    min over SUCCESSFUL runs, -1 only when every pass failed."""
    ok = {"q1": [4.2, 3.9], "q3": []}
    names = ["q1", "q2", "q3"]
    qs = {"q1": 1, "q2": 1, "q3": 1}
    best = {name: (min(ok[name]) if ok.get(name) else -1.0)
            for name in names if name in qs}
    assert best == {"q1": 3.9, "q2": -1.0, "q3": -1.0}


def test_select_drifted_threshold_floor_and_cap():
    """Self-adjudication picks >1.5x drifts in either direction, floors
    sub-50ms walls (rounding noise is not drift), skips failures, and
    caps at the worst `cap` ratios."""
    prev = {"up": 1.0, "down": 3.0, "flat": 2.0, "tiny": 0.001,
            "prevfail": -1.0, "newq": 1.0, "big": 1.0, "huge": 1.0}
    cur = {"up": 1.6, "down": 1.9, "flat": 2.4, "tiny": 0.04,
           "prevfail": 5.0, "curfail": -1.0, "big": 2.0, "huge": 9.0}
    out = bench._select_drifted(cur, prev)
    assert set(out) == {"up", "down", "big", "huge"}
    assert out[0] == "huge"  # worst ratio first
    assert bench._select_drifted(cur, prev, cap=2) == ["huge", "big"]

"""bench.py's budget scheduler: the final JSON line must always land inside
the driver's wall-clock timeout (the round-4 driver run measured every row
and then lost ALL of them to rc=124 before the final print).  Pure host-side
logic — no accelerator, no subprocesses."""

import subprocess

import bench


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def _runner(durations, results=None, hang=()):
    """run_one stub advancing the fake clock by each item's duration."""
    results = results or {}

    def run_one(key, timeout_s, clock=None):
        dt = durations[key]
        if key in hang:
            clock.t += timeout_s
            raise subprocess.TimeoutExpired(cmd=key, timeout=timeout_s)
        clock.t += dt
        return results.get(key, {key + "_ms": dt})

    return run_one


def test_all_items_run_inside_budget():
    clock = FakeClock()
    durations = {"a": 10, "b": 20, "c": 30}
    run_one = _runner(durations)
    extras = bench._run_schedule(
        ["a", "b", "c"], lambda k, t: run_one(k, t, clock=clock),
        budget_s=1000, est={"a": 20, "b": 40, "c": 60}, timeouts={},
        now=clock,
    )
    assert set(extras) == {"a_ms", "b_ms", "c_ms"}
    assert "skipped" not in extras


def test_too_big_item_skipped_immediately_smaller_still_runs():
    """An item whose ESTIMATE exceeds the remaining budget is skipped without
    burning any clock, and a later, smaller item still runs."""
    clock = FakeClock()
    durations = {"big": 500, "small": 10}
    run_one = _runner(durations)
    extras = bench._run_schedule(
        ["big", "small"], lambda k, t: run_one(k, t, clock=clock),
        budget_s=100, est={"big": 400, "small": 20}, timeouts={},
        now=clock,
    )
    assert "big_ms" not in extras
    assert extras["small_ms"] == 10
    assert extras["skipped"] == ["big"]
    # the skip consumed no budget
    assert clock.t == 10


def test_item_timeout_capped_at_remaining_budget():
    """A hanging item is killed at the remaining budget, not its own (much
    larger) ceiling, so the final line still prints in time."""
    clock = FakeClock()
    durations = {"first": 50, "hangs": 0, "after": 10}
    run_one = _runner(durations, hang={"hangs"})
    extras = bench._run_schedule(
        ["first", "hangs", "after"], lambda k, t: run_one(k, t, clock=clock),
        budget_s=200, est={}, timeouts={"hangs": 3600}, now=clock,
    )
    assert extras["first_ms"] == 50
    assert extras["hangs_error"] == "timeout"
    # killed at remaining budget (200 - 50 - reserve), far below 3600
    assert clock.t <= 200
    assert extras["skipped"] == ["after"]


def test_estimates_cover_every_item():
    """Every registered item needs a warm estimate, or the scheduler falls
    back to the MIN_SLICE floor and may start something that cannot finish."""
    assert set(bench.ITEMS) == set(bench.ITEM_EST_S)


def test_hang_capped_at_multiple_of_estimate_later_items_survive():
    """A hanging item must not starve the rest of the ladder: its slice is
    capped at max(3x estimate, 300), leaving budget for later items."""
    clock = FakeClock()
    durations = {"hangs": 0, "after": 10}
    run_one = _runner(durations, hang={"hangs"})
    extras = bench._run_schedule(
        ["hangs", "after"], lambda k, t: run_one(k, t, clock=clock),
        budget_s=1000, est={"hangs": 50, "after": 20}, timeouts={"hangs": 3600},
        now=clock,
    )
    assert extras["hangs_error"] == "timeout"
    assert clock.t <= 300 + 10  # killed at the 300 s floor, not at 985
    assert extras["after_ms"] == 10
    assert "skipped" not in extras

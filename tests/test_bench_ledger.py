"""bench.py regression-ledger self-tests (VERDICT r6 task 7): the
flagging must normalize by the host's effective-core ratio when the
baseline recorded one, so a quiet host can't hide a real regression
behind headroom and a busy host can't flag phantoms.  Pure-function
tests — no Spark session."""

from __future__ import annotations

from bench import regression_flags


def test_quiet_host_cannot_hide_a_regression():
    """Baseline taken at 9 effective cores; today's run on a quiet
    32-core host reads 1.1 s raw (looks fine vs the 1.0 s baseline) —
    but at the baseline's host load that's ~3.9 s: a real regression,
    and core-normalization must surface it."""
    baseline = {"q": {"sec": 1.0, "cores": 9.0}}
    assert regression_flags({"q": 1.1}, baseline, cores_now=32.0) == ["q"]
    # without a recorded cores figure the raw comparison stands (legacy
    # entries), and 1.1 < 2.0 does not flag
    assert regression_flags({"q": 1.1}, {"q": {"sec": 1.0}}, 32.0) == []


def test_busy_host_does_not_flag_phantoms():
    """Baseline at 11 cores; today's host delivers 7 — the raw 2.1 s
    exceeds 2x, but it's entirely host dip (normalized ~1.34 s)."""
    baseline = {"q": {"sec": 1.0, "cores": 11.0}}
    assert regression_flags({"q": 2.1}, baseline, cores_now=7.0) == []
    # the same raw time against a legacy no-cores entry DOES flag
    assert regression_flags({"q": 2.1}, {"q": {"sec": 1.0}}, 7.0) == ["q"]


def test_flag_hygiene():
    """Failed runs (-1), names without baselines, and an unusable cores
    probe (-1.0 sentinel) must never flag or crash."""
    baseline = {"q": {"sec": 1.0, "cores": 9.0}}
    assert regression_flags({"q": -1.0, "other": 99.0}, baseline, 9.0) == []
    # cores probe failed (-1.0): fall back to the raw comparison
    assert regression_flags({"q": 1.9}, baseline, -1.0) == []
    assert regression_flags({"q": 2.1}, baseline, -1.0) == ["q"]
    # genuine same-host regression still flags with normalization active
    assert regression_flags({"q": 2.5}, baseline, 9.0) == ["q"]


def test_cores_probe_returns_calibration_yardstick():
    """host_effective_cores must report BOTH the parallelism ratio and
    the serial fixed-work calibration time (r9 verdict task 7): the
    ratio alone can't distinguish 'fewer cores delivered' from 'every
    core slower' — r9 read MORE cores than r8 yet ran uniformly 1.12x
    slower.  The probe is real work (~0.5 s serial), so this is the one
    slow test in the file."""
    from bench import host_effective_cores

    cores, calib = host_effective_cores(n=2)
    if cores <= 0.5:
        # The probe measures the HOST, not the code: a cold first call
        # (process-pool spawn + numpy import not yet in page cache) or a
        # transiently saturated box can legitimately read <= 0.5 with
        # n=2 (observed 0.5 exactly at suite start on a fresh boot,
        # r16).  One retry separates a broken probe from a busy host.
        cores, calib = host_effective_cores(n=2)
    assert cores > 0.5, cores
    assert 0.001 < calib < 30.0, calib


def test_baseline_ledger_covers_every_registered_name():
    """BASELINE_QUERIES.json must hold an entry for every registered
    query — a missing name means regressions_vs_r01 silently cannot
    flag it (the r8 discipline; re-broken by the 8 r9 additions and
    re-pinned here so it cannot regress silently again)."""
    import json
    import os

    from data_eng_iceberg_demo_spark.plans import registry

    registry._load_all_modules()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BASELINE_QUERIES.json")) as f:
        baseline = json.load(f)["queries"]
    missing = sorted(set(registry.REGISTRY) - set(baseline))
    assert not missing, f"names without a baseline entry: {missing}"


def test_bad_baseline_cores_sentinel_falls_back_to_raw():
    """A baseline entry that recorded the cores-probe failure sentinel
    (-1.0) must not flip the normalized time negative and permanently
    suppress flags (r7 advice): it falls back to the raw comparison,
    exactly like a legacy no-cores entry."""
    from bench import regression_flags

    baseline = {"q": {"sec": 1.0, "cores": -1.0}}
    assert regression_flags({"q": 2.1}, baseline, cores_now=9.0) == ["q"]
    assert regression_flags({"q": 1.9}, baseline, cores_now=9.0) == []
    # cores 0.0 is equally unusable
    assert regression_flags({"q": 2.1}, {"q": {"sec": 1.0, "cores": 0.0}},
                            cores_now=9.0) == ["q"]


def test_slow_cores_host_does_not_flag_phantoms_with_calibration():
    """r16 measurement fix: a host presenting MANY SLOW cores (high
    parallelism ratio, high per-core calibration time) must not flag
    phantom regressions.  Round-start r16: 16.3 effective cores at
    0.39 s calibration vs a 10.9-core/0.22 s baseline — cores-only
    normalization inflated a flat 1.3 s reading to ~1.9x+ and flagged
    33 names; the calibration factor (0.22/0.39) restores it."""
    baseline = {"q": {"sec": 1.0, "cores": 10.9}}
    # cores-only view (no calibration figures): 1.4 * 16.3/10.9 = 2.09 > 2
    assert regression_flags({"q": 1.4}, baseline, 16.3) == ["q"]
    # with calibration: 2.09 * (0.22/0.39) = 1.18 — host shape, not code
    assert regression_flags({"q": 1.4}, baseline, 16.3,
                            calib_now=0.39, ref_calib=0.22) == []
    # a genuinely regressed query still flags through the speed factor
    assert regression_flags({"q": 2.4}, baseline, 16.3,
                            calib_now=0.39, ref_calib=0.22) == ["q"]
    # fast cores penalize symmetrically: 1.1 raw on a 2x-fast-core box
    # of the same width is a real regression
    assert regression_flags({"q": 1.1}, baseline, 10.9,
                            calib_now=0.11, ref_calib=0.22) == ["q"]
    # sentinel calibration figures fall back to cores-only
    assert regression_flags({"q": 1.4}, baseline, 16.3,
                            calib_now=-1.0, ref_calib=0.22) == ["q"]
    assert regression_flags({"q": 1.4}, baseline, 16.3,
                            calib_now=0.39, ref_calib=-1.0) == ["q"]


def test_ledger_carries_reference_calibration():
    """BASELINE_QUERIES.json must hold the _ref_calibration_sec the
    capacity normalization reads; losing it silently reverts the r16
    measurement fix to cores-only flagging."""
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BASELINE_QUERIES.json")) as f:
        ledger = json.load(f)
    assert 0.05 < float(ledger["_ref_calibration_sec"]) < 1.0


def test_speed_factor_applies_to_legacy_no_cores_entries():
    """The calibration speed factor is a host attribute, so legacy
    ledger entries without a cores figure get it too: a 2.1s raw
    reading on a half-speed-core box is ~1.05s of work, not a flag —
    while the same reading with healthy calibration still flags."""
    legacy = {"q": {"sec": 1.0}}
    assert regression_flags({"q": 2.1}, legacy, 9.0,
                            calib_now=0.44, ref_calib=0.22) == []
    assert regression_flags({"q": 2.1}, legacy, 9.0,
                            calib_now=0.22, ref_calib=0.22) == ["q"]


def test_entry_calibration_overrides_global_reference():
    """r17 (r16 advisor): an entry that recorded its own per-core
    calibration normalizes against THAT, not the global reference — a
    rerun on an identical-speed host must get a plain 2x gate, neither
    the ~2.7x one the global 0.22 reference would grant a 0.297-calib
    entry, nor a tightened one for fast-recorded entries."""
    e = {"q": {"sec": 1.0, "cores": 12.0, "calib": 0.297}}
    # identical host shape: 2.05 raw is a real >2x regression; the
    # global-reference discount (0.22/0.297 = 0.74 -> tn 1.52) would
    # have silently passed it
    assert regression_flags({"q": 2.05}, e, 12.0,
                            calib_now=0.297, ref_calib=0.22) == ["q"]
    # the same raw time on a genuinely slower-core host is host shape
    assert regression_flags({"q": 2.05}, e, 12.0,
                            calib_now=0.45, ref_calib=0.22) == []
    # entries without the field keep the global-reference behavior
    legacy = {"q": {"sec": 1.0, "cores": 12.0}}
    assert regression_flags({"q": 2.05}, legacy, 12.0,
                            calib_now=0.297, ref_calib=0.22) == []

"""The driver's ~50-query correctness window samples the FIRST entries
of queries() in dict order, so the registry's self-advancing rotation
(plans/registry.py) is load-bearing: these tests pin its contract
without needing a Spark session."""

from __future__ import annotations

from data_eng_iceberg_demo_spark.plans import registry


def setup_module(_):
    registry._load_all_modules()


def test_round_window_names_all_registered():
    missing = [n for n in registry._ROUND_WINDOW if n not in registry.REGISTRY]
    assert not missing, f"window names not in registry: {missing}"


def test_never_sampled_names_front_the_ordering():
    """Every name the committed CORRECTNESS files have never recorded
    must sort before every already-recorded name (the _REVERIFY pins
    are the one sanctioned exception)."""
    sampled, latest = registry._correctness_name_sets()
    order = registry._ordered_names()
    assert sorted(order) == sorted(registry.REGISTRY), "order must be a permutation"
    seen_done = False
    for n in order:
        is_done = n in sampled and not (
            n in registry._REVERIFY and n not in latest)
        if is_done:
            seen_done = True
        else:
            assert not seen_done, (
                f"unsampled name {n} sorted after a driver-verified one")


def test_window_prefix_is_the_declared_round_window():
    """The explicit window names (minus any a CORRECTNESS file has since
    recorded) must be the exact head of the ordering, in order."""
    sampled, latest = registry._correctness_name_sets()
    expect = [n for n in registry._ROUND_WINDOW if n in registry.REGISTRY
              and (n not in sampled
                   or (n in registry._REVERIFY and n not in latest))]
    assert registry._ordered_names()[:len(expect)] == expect


def test_oracle_map_is_a_subset_with_identical_order_policy():
    q = registry.query_map()
    o = registry.oracle_map()
    assert set(o) <= set(q)
    # every oracle string is non-trivial SQL
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())

"""The driver's ~50-query correctness window samples the FIRST entries
of queries() in dict order, so the registry's self-advancing rotation
(plans/registry.py) is load-bearing: these tests pin its contract
without needing a Spark session."""

from __future__ import annotations

from data_eng_iceberg_demo_spark.plans import registry


def setup_module(_):
    registry._load_all_modules()


def _state():
    sampled, last_round, last_rec = registry._correctness_history()
    reverify = registry._reverify_names(sampled, last_round, last_rec)
    return sampled, reverify


def test_round_window_names_all_registered():
    missing = [n for n in registry._ROUND_WINDOW if n not in registry.REGISTRY]
    assert not missing, f"window names not in registry: {missing}"


def test_reverify_names_all_registered():
    missing = [n for n in registry._REVERIFY if n not in registry.REGISTRY]
    assert not missing, f"_REVERIFY names not in registry: {missing}"


def test_never_sampled_names_front_the_ordering():
    """Every name the committed CORRECTNESS files have never recorded
    must sort before every already-recorded name (the re-verify set —
    semantic-change pins plus oracle-kind upgrades — is the one
    sanctioned exception)."""
    sampled, reverify = _state()
    order = registry._ordered_names()
    assert sorted(order) == sorted(registry.REGISTRY), "order must be a permutation"
    seen_done = False
    for n in order:
        is_done = n in sampled and n not in reverify
        if is_done:
            seen_done = True
        else:
            assert not seen_done, (
                f"unsampled name {n} sorted after a driver-verified one")


def test_window_prefix_is_the_declared_round_window():
    """The explicit window names (minus any a CORRECTNESS file has since
    recorded) must be the exact head of the ordering, in order."""
    sampled, reverify = _state()
    expect = [n for n in registry._ROUND_WINDOW if n in registry.REGISTRY
              and (n not in sampled or n in reverify)]
    assert registry._ordered_names()[:len(expect)] == expect


def test_semantic_change_pins_front_until_recorded():
    """A _REVERIFY pin with a since-round NEWER than the name's latest
    CORRECTNESS record must appear in the window even though the name
    is 'ever sampled'; once a record of round >= since exists, the pin
    goes inert.  Exercised against synthetic history (no disk reads)."""
    sampled = frozenset({"join_asof"})
    stale = registry._reverify_names(
        sampled, {"join_asof": 4},
        {"join_asof": {"hash_match": True, "err": None}})
    assert "join_asof" in stale
    fresh = registry._reverify_names(
        sampled, {"join_asof": registry._REVERIFY["join_asof"]},
        {"join_asof": {"hash_match": True, "err": None}})
    assert "join_asof" not in fresh


def test_oracle_kind_upgrade_refronts_automatically():
    """A name whose latest driver record is a rows-only ``no_oracle``
    row but which NOW carries a hash oracle must re-front with no
    manual pin (r7 judge: llm_similarity_lsh).  A name whose latest
    record is already a hash row must not."""
    name = "llm_similarity_lsh"
    assert registry.REGISTRY[name].oracle is not None
    up = registry._reverify_names(
        frozenset({name}), {name: 4},
        {name: {"hash_match": None, "err": "no_oracle"}})
    assert name in up
    ok = registry._reverify_names(
        frozenset({name}), {name: 8},
        {name: {"hash_match": True, "err": None}})
    assert name not in ok


def test_current_round8_window_fronts_unsampled_and_reverify():
    """Against the committed artifacts: every never-sampled name and
    every re-verify name sits inside the window prefix the driver will
    sample in round 8."""
    sampled, reverify = _state()
    never = [n for n in registry.REGISTRY if n not in sampled]
    want = set(never) | set(reverify)
    head = registry._ordered_names()[:len(want)]
    assert want == set(head)


def test_done_tail_ordered_by_staleness():
    """With the whole registry driver-sampled, the already-verified tail
    IS the window — ordering it by last recorded round (oldest first)
    makes the driver's ~50-name sample continuously refresh the stalest
    certificates instead of re-recording the same registration-order
    head forever (r9 judge task 5)."""
    sampled, reverify = _state()
    order = registry._ordered_names()
    _, last_round, _ = registry._correctness_history()
    done = [n for n in order if n in sampled and n not in reverify]
    rounds = [last_round.get(n, -1) for n in done]
    assert rounds == sorted(rounds), (
        "driver-verified tail must be sorted stalest-first")
    # and with r3-era records on disk, the tail's head must actually be
    # older than its end (guards against a constant-key degenerate sort)
    if done and len(set(rounds)) > 1:
        assert rounds[0] < rounds[-1]


def test_oracle_map_is_a_subset_with_identical_order_policy():
    q = registry.query_map()
    o = registry.oracle_map()
    assert set(o) <= set(q)
    # every oracle string is non-trivial SQL
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())

"""Bench harness invariants (no TPU): the round-3 verdict's top item was
config ordering/budgeting — pin it so a refactor cannot silently regress.
"""

import bench


def test_cheap_configs_run_before_config5():
    # Config 5 starved the other four in round 3; it must stay LAST and
    # keep a reserved floor big enough for its geometry upload.
    assert bench.CHILD_GROUPS[-1] == ("5",)
    flat = [c for g in bench.CHILD_GROUPS[:-1] for c in g]
    assert set(flat) == {"3", "loop", "2", "4"}
    assert bench.CONFIGS["5"][1] >= 200


def test_group_budget_reserves_config5_floor():
    # The cheap group's budget is capped at (remaining - config 5's floor).
    floors = [bench.CONFIGS[g[0]][1] for g in bench.CHILD_GROUPS]
    remaining = 500.0
    later = sum(floors[1:])
    assert remaining - later >= bench.CONFIGS[bench.CHILD_GROUPS[0][0]][1]

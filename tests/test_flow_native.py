"""Native min-cost-flow solver (mg_mincostflow) vs the pure-Python one.

Both implement successive shortest augmenting paths with Johnson potentials
and IDENTICAL tie-breaking, so they must return the same flow vector — not
just the same cost — on every instance, including ones with alternate
optima.  The se_hard golden instance (575 arcs, captured from the reference
run) is the realistic case; random circulations probe tie-break parity.
"""

import os
import random
import re

import pytest

from metagenomics_tpu import native
from metagenomics_tpu.mincostflow import solve_min_cost_flow_py

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "golden")

needs_native = pytest.mark.skipif(native.get_lib() is None,
                                  reason="native library unavailable")


def parse_dimacs(path):
    n = m = None
    arcs = []
    for line in open(path):
        f = line.split()
        if not f:
            continue
        if f[0] == "p":
            n, m = int(f[2]), int(f[3])
        elif f[0] == "a":
            arcs.append((int(f[1]), int(f[2]), int(f[3]), int(f[4]),
                         int(f[5])))
    assert len(arcs) == m
    return n, arcs


@needs_native
def test_se_hard_golden_instance():
    n, arcs = parse_dimacs(os.path.join(GOLDEN, "out", "se_hard",
                                        "g__flow.input"))
    assert len(arcs) >= 500, "se_hard flow instance must be nontrivial"
    want = solve_min_cost_flow_py(n, arcs)
    got = native.solve_min_cost_flow_native(n, arcs)
    assert got == want


@needs_native
def test_all_golden_instances():
    for name in sorted(os.listdir(os.path.join(GOLDEN, "out"))):
        path = os.path.join(GOLDEN, "out", name, "g__flow.input")
        if not os.path.exists(path):
            continue
        n, arcs = parse_dimacs(path)
        assert (native.solve_min_cost_flow_native(n, arcs)
                == solve_min_cost_flow_py(n, arcs)), name


@needs_native
def test_random_circulations_tiebreak_parity():
    rng = random.Random(11)
    for trial in range(25):
        n = rng.randint(4, 24)
        arcs = []
        # random arcs with small caps and clustered costs (forces ties)
        for _ in range(rng.randint(n, 4 * n)):
            u = rng.randint(1, n)
            v = rng.randint(1, n)
            if u == v:
                continue
            lb = rng.choice([0, 0, 0, 1])
            ub = lb + rng.randint(0, 4)
            arcs.append((u, v, lb, ub, rng.choice([0, 1, 1, 5, 5, 100])))
        # make it feasible: a high-capacity zero-lb cycle through all nodes
        for u in range(1, n + 1):
            arcs.append((u, u % n + 1, 0, 1000, 3))
            arcs.append((u % n + 1, u, 0, 1000, 3))
        want = solve_min_cost_flow_py(n, arcs)
        got = native.solve_min_cost_flow_native(n, arcs)
        assert got == want, "trial %d" % trial


@needs_native
def test_infeasible_raises():
    # lb=1 arc into a node with no outlet
    arcs = [(1, 2, 1, 5, 1)]
    with pytest.raises(ValueError):
        solve_min_cost_flow_py(2, arcs)
    with pytest.raises(ValueError):
        native.solve_min_cost_flow_native(2, arcs)

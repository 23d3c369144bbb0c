"""Tests for the trajectory-faithful CS2 replay solver (cs2replay.py).

Byte-parity with the reference solver's solution files is pinned on all six
golden instances; the independent exact SSP solver (mincostflow.py) is the
optimality oracle: both must agree on the objective value and on the
per-(tail,head) flow totals for every instance.
"""

import os
import random

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "golden", "out")

NAMES = ["se_small", "se_mixlen", "pe_small", "pe_meta", "se_hard", "pe_hard"]


def _parse_dimacs(path):
    arcs = []
    v = None
    for line in open(path):
        t = line.split()
        if not t:
            continue
        if t[0] == "p":
            v = int(t[2])
        elif t[0] == "a":
            arcs.append((int(t[1]), int(t[2]), int(t[3]), int(t[4]),
                         int(t[5])))
    return v, arcs


@pytest.mark.parametrize("name", NAMES)
def test_replay_byte_equal_golden(name):
    from metagenomics_tpu.cs2replay import solve_cs2

    d = os.path.join(GOLDEN, name)
    v, arcs = _parse_dimacs(os.path.join(d, "g__flow.input"))
    triples, _ = solve_cs2(v, arcs)
    got = "".join("%d %d %d\n" % t for t in triples)
    want = open(os.path.join(d, "g__flow.output")).read()
    assert got == want


@pytest.mark.parametrize("name", NAMES)
def test_replay_agrees_with_ssp_oracle(name):
    from metagenomics_tpu.cs2replay import solve_cs2
    from metagenomics_tpu.mincostflow import solve_min_cost_flow

    d = os.path.join(GOLDEN, name)
    v, arcs = _parse_dimacs(os.path.join(d, "g__flow.input"))
    triples, obj = solve_cs2(v, arcs)
    flows = solve_min_cost_flow(v, arcs)
    obj_ssp = sum(f * a[4] for f, a in zip(flows, arcs))
    assert obj == obj_ssp
    # per-(tail, head) totals must match: that is what the assembler reads
    # back onto edges (findEdge first-match sums parallel arcs)
    tot_replay = {}
    for t, h, f in triples:
        tot_replay[(t, h)] = tot_replay.get((t, h), 0) + f
    tot_ssp = {}
    for (t, h, _, _, _), f in zip(arcs, flows):
        tot_ssp[(t, h)] = tot_ssp.get((t, h), 0) + f
    for k in set(tot_replay) | set(tot_ssp):
        assert tot_replay.get(k, 0) == tot_ssp.get(k, 0), k


def test_replay_infeasible_raises_error2():
    from metagenomics_tpu.cs2replay import CS2Error, solve_cs2

    # the assembler's empty-graph instance: only the lb=1 return arc
    with pytest.raises(CS2Error) as ei:
        solve_cs2(2, [(2, 1, 1, 1000000, 1000000)])
    assert ei.value.code == 2


def test_replay_fuzz_against_ssp():
    """Random feasible circulations in the assembler's instance shape:
    optimal objective must match the SSP oracle (the trajectory may pick a
    different optimum on ties, but never a different cost)."""
    from metagenomics_tpu.cs2replay import solve_cs2
    from metagenomics_tpu.mincostflow import solve_min_cost_flow

    rng = random.Random(17)
    for _ in range(25):
        nodes = rng.randrange(2, 8)
        v = 2 * nodes + 2
        arcs = [(v, 1, 1, 1000000, 1000000)]
        for i in range(1, nodes + 1):
            arcs.append((1, 2 * i, 0, 1000000, 0))
            arcs.append((1, 2 * i + 1, 0, 1000000, 0))
            arcs.append((2 * i, v, 0, 1000000, 0))
            arcs.append((2 * i + 1, v, 0, 1000000, 0))
        for _ in range(rng.randrange(1, 2 * nodes)):
            u = rng.randrange(1, nodes + 1)
            w = rng.randrange(1, nodes + 1)
            if u == w:
                continue
            composite = rng.random() < 0.5
            forced = composite and rng.random() < 0.4
            lb = [1, 0, 0] if forced else [0, 0, 0]
            ub = [1, 1, 8] if composite else [10, 10, 10]
            cost = ([1, 50000, 100000] if composite
                    else [500000, 500000, 500000])
            a, b = 2 * u, 2 * w + 1
            for k in range(3):
                arcs.append((a, b, lb[k], ub[k], cost[k]))
                arcs.append((b, a, lb[k], ub[k], cost[k]))
        try:
            flows = solve_min_cost_flow(v, arcs)
            feasible = True
        except ValueError:
            feasible = False
        if not feasible:
            continue
        triples, obj = solve_cs2(v, arcs)
        obj_ssp = sum(f * a[4] for f, a in zip(flows, arcs))
        assert obj == obj_ssp


REF_BIN = os.path.join(REPO, "golden", "metagenomics_ref_O0")


@pytest.mark.skipif(not os.path.exists(REF_BIN),
                    reason="reference binary unavailable")
def test_replay_matches_fresh_reference_runs(tmp_path):
    """Harvest fresh (flow.input, flow.output) pairs from the reference
    binary on small random repeat-bearing datasets and byte-compare the
    replay solver's solution files (not just the cached goldens)."""
    import subprocess

    from metagenomics_tpu.cs2replay import solve_cs2

    comp = str.maketrans("ACGT", "TGCA")
    for trial in range(3):
        rng = random.Random(5000 + trial)
        g = "".join(rng.choice("ACGT") for _ in range(4000))
        rep = g[1000:1260]
        g = g[:2500] + rep + g[2500:3100] + rep + g[3100:]
        reads = []
        for pos in range(0, len(g) - 100, 9):
            s = g[pos:pos + 100]
            if rng.random() < 0.5:
                s = s.translate(comp)[::-1]
            reads.append(s)
        d = tmp_path / ("t%d" % trial)
        d.mkdir()
        fa = d / "in.fasta"
        fa.write_text("".join(">r%d\n%s\n" % (i, s)
                              for i, s in enumerate(reads)))
        proc = subprocess.run(
            [REF_BIN, "-se", "1", str(fa), "-f", "g_", "-l", "40"],
            cwd=d, capture_output=True, timeout=600)
        fin = d / "g__flow.input"
        fout = d / "g__flow.output"
        assert fin.exists() and fout.exists(), proc.returncode
        v, arcs = _parse_dimacs(str(fin))
        triples, _ = solve_cs2(v, arcs)
        got = "".join("%d %d %d\n" % t for t in triples)
        assert got == fout.read_text(), "trial %d" % trial

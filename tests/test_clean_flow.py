"""--clean-flow mode: license-clean SSP solver as the flow phase.

The CS2-trajectory replay (cs2replay.py) is confined to the byte-parity
surface; production deployments that cannot accept cs2.h's evaluation-only
license run with --clean-flow, which solves the identical node-split
instances with the clean-room exact solver (mincostflow.py /
mg_mincostflow).  These tests pin: (a) the mode completes end-to-end and
emits every staged artifact, (b) its flow assignment has the SAME
objective value as the replay's (both are optima of one instance), and
(c) infeasible instances raise the typed FlowInfeasibleError for library
embedders while the CLI still exits "Error 2"/rc 2 (ADVICE r4).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "golden")

ARTIFACTS = [
    "_sortedReads.fasta", ".unitig", "_flow.input", "_flow.output",
    "graph1.gdl", "contigs1.fasta", "graph2.gdl", "contigs2.fasta",
    "graph3.gdl", "contigs3.fasta", "graph4.gdl", "contigs4.fasta",
]


def _parse_dimacs(path):
    arcs = []
    v = 0
    for line in open(path):
        f = line.split()
        if not f:
            continue
        if f[0] == "p":
            v = int(f[2])
        elif f[0] == "a":
            arcs.append(tuple(int(x) for x in f[1:6]))
    return v, arcs


def _objective(arcs, triples):
    """Total cost of a flow given as (tail, head, flow) triples.  Arcs are
    grouped per (tail, head) and filled cheapest-first — any optimal
    assignment of a (tail, head) total to its parallel arcs does this, so
    the value is comparable across solvers."""
    from collections import defaultdict
    by_pair = defaultdict(list)
    for t, h, lb, ub, c in arcs:
        by_pair[(t, h)].append([lb, ub, c])
    total = defaultdict(int)
    for t, h, fl in triples:
        total[(t, h)] += fl
    cost = 0
    for (t, h), fl in total.items():
        slots = sorted(by_pair[(t, h)], key=lambda s: s[2])
        for lb, ub, c in slots:
            take = min(fl, ub)
            cost += take * c
            fl -= take
        assert fl == 0, "flow exceeds capacity on (%d,%d)" % (t, h)
    return cost


def test_clean_flow_cli_end_to_end(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    args = ["-pe", "1", os.path.join(GOLDEN, "data", "pe_small.fasta")]
    proc = subprocess.run(
        [sys.executable, "-m", "metagenomics_tpu.cli", *args, "-f", "c_",
         "-l", "40", "--clean-flow"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    assert "Calling clean min-cost-flow solver" in proc.stdout
    assert "Calling CS2" not in proc.stdout
    for art in ARTIFACTS:
        assert (tmp_path / ("c_" + art)).exists(), art

    # same instance, same objective as the golden CS2 run
    v, arcs = _parse_dimacs(str(tmp_path / "c__flow.input"))
    golden_in = os.path.join(GOLDEN, "out", "pe_small", "g__flow.input")
    assert open(golden_in).read() == open(
        str(tmp_path / "c__flow.input")).read()
    ours = [tuple(int(x) for x in line.split())
            for line in open(str(tmp_path / "c__flow.output"))]
    ref = [tuple(int(x) for x in line.split())
           for line in open(os.path.join(GOLDEN, "out", "pe_small",
                                         "g__flow.output"))]
    assert _objective(arcs, ours) == _objective(arcs, ref)


def test_infeasible_raises_typed_error():
    """Library embedders get a catchable FlowInfeasibleError, not a
    process-killing SystemExit (ADVICE r4 low)."""
    from metagenomics_tpu.assembler import Assembler
    from metagenomics_tpu.config import AssemblerConfig
    from metagenomics_tpu.errors import FlowInfeasibleError
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        reads = os.path.join(d, "one.fasta")
        with open(reads, "w") as f:
            f.write(">a\n" + "ACGT" * 30 + "\n")
        cfg = AssemblerConfig(min_overlap=40, single_end_files=[reads],
                              output_prefix=os.path.join(d, "x_"))
        with pytest.raises(FlowInfeasibleError) as ei:
            Assembler(cfg, log=lambda *a, **k: None).run()
        assert ei.value.code == 2


def test_infeasible_clean_flow_raises_typed_error():
    from metagenomics_tpu.assembler import Assembler
    from metagenomics_tpu.config import AssemblerConfig
    from metagenomics_tpu.errors import FlowInfeasibleError
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        reads = os.path.join(d, "one.fasta")
        with open(reads, "w") as f:
            f.write(">a\n" + "ACGT" * 30 + "\n")
        cfg = AssemblerConfig(min_overlap=40, single_end_files=[reads],
                              output_prefix=os.path.join(d, "x_"),
                              clean_flow=True)
        with pytest.raises(FlowInfeasibleError):
            Assembler(cfg, log=lambda *a, **k: None).run()

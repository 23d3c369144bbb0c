"""Golden byte-equality tests against the reference assembler's artifacts.

The fixtures under golden/out/* were produced by the compiled reference
binary (see golden/make_testdata.py and the harness commit); every staged
artifact must match byte-for-byte.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "golden")

CONFIGS = {
    "se_small": ["-se", "1", os.path.join(GOLDEN, "data", "se_small.fasta")],
    "se_mixlen": ["-se", "1", os.path.join(GOLDEN, "data", "se_mixlen.fasta")],
    "pe_small": ["-pe", "1", os.path.join(GOLDEN, "data", "pe_small.fasta")],
    "pe_meta": ["-pe", "1", os.path.join(GOLDEN, "data", "pe_meta.fastq")],
}

ARTIFACTS = [
    "_sortedReads.fasta", ".unitig", "_flow.input",
    "graph1.gdl", "contigs1.fasta", "graph2.gdl", "contigs2.fasta",
    "graph3.gdl", "contigs3.fasta", "graph4.gdl", "contigs4.fasta",
]

# configs where CS2's solve makes no trajectory-dependent choice, so
# _flow.output is reproducible byte-for-byte from the parser's arc order
FLOW_BYTE_EQUAL = {"se_small", "se_mixlen"}


def check_flow_output(name, got_path, want_path):
    """_flow.output parity check.

    The line order of CS2's solution file is its parser's grouped-by-tail
    slot order (simulated exactly, graph/flow.py:_cs2_print_order) FURTHER
    permuted by the solver's price_in/price_out arc-suspension EXCHANGEs
    (cs2.h:227,835-851,1537), and the flow SPLIT among the three
    identical-cost parallel arcs of an edge is likewise an arbitrary
    optimum of its epsilon-scaling trajectory — neither is a function of
    the instance.  Where no such choice fires the files are byte-equal;
    elsewhere we assert the strongest solver-independent invariants: the
    same flow-triple multiset in the same grouped-by-ascending-tail layout.
    """
    got = open(got_path, "rb").read()
    want = open(want_path, "rb").read()
    if name in FLOW_BYTE_EQUAL:
        assert got == want, "_flow.output mismatch: %s" % name
        return
    import collections
    pg = [tuple(map(int, l.split())) for l in got.decode().splitlines()]
    pw = [tuple(map(int, l.split())) for l in want.decode().splitlines()]
    assert collections.Counter(pg) == collections.Counter(pw), \
        "_flow.output flow multiset mismatch: %s" % name
    tails = [t for t, _, _ in pg]
    assert tails == sorted(tails), \
        "_flow.output tails not grouped ascending: %s" % name


@pytest.mark.parametrize("engine", ["native", "python"])
@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden_config(name, engine, tmp_path):
    args = CONFIGS[name]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"   # don't contend for the TPU tunnel in tests
    if engine == "python":
        env["MGTPU_NO_NATIVE"] = "1"
    proc = subprocess.run(
        [sys.executable, "-m", "metagenomics_tpu.cli", *args, "-f", "t_",
         "-l", "40"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    for art in ARTIFACTS:
        got = (tmp_path / ("t_" + art)).read_bytes()
        want_path = os.path.join(GOLDEN, "out", name, "g_" + art)
        want = open(want_path, "rb").read()
        assert got == want, "artifact mismatch: %s %s" % (name, art)
    check_flow_output(name, str(tmp_path / "t__flow.output"),
                      os.path.join(GOLDEN, "out", name, "g__flow.output"))


def test_resume_from_unitig(tmp_path):
    """The -s resume path must reproduce the post-unitig artifacts."""
    args = CONFIGS["pe_small"]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"   # don't contend for the TPU tunnel in tests
    import shutil
    shutil.copy(os.path.join(GOLDEN, "out", "pe_small", "g_.unitig"),
                tmp_path / "t_.unitig")
    proc = subprocess.run(
        [sys.executable, "-m", "metagenomics_tpu.cli", *args, "-f", "t_",
         "-l", "40", "-s"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    for art in ["contigs1.fasta", "contigs2.fasta", "contigs3.fasta",
                "contigs4.fasta"]:
        got = (tmp_path / ("t_" + art)).read_bytes()
        want = open(os.path.join(GOLDEN, "out", "pe_small", "g_" + art),
                    "rb").read()
        assert got == want, "resume artifact mismatch: %s" % art

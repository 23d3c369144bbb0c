"""Degenerate-input hardening: the full CLI must end with a labeled
reference-style diagnostic on pathological inputs — never a traceback.

Reference behavior pinned here:
* empty / unknown-format file -> MYEXIT("Unknown input file format."),
  exit 0 (Dataset.cpp:135, Common.h:47)
* missing file -> MYEXIT("Unable to open file: ..."), exit 0 (Dataset.cpp:117)
* zero good reads -> the reference segfaults in HashTable::insertDataset;
  we stop with a labeled MyExit diagnostic instead (exit 0)
* graph with no edges (single read / all duplicates / all contained) ->
  CS2 declares the circulation infeasible and exits "Error 2" with status 2
  (cs2.h:346); ours does the same from the in-process solver
"""

import os
import random
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_cases(tmp_path):
    rng = random.Random(5)
    g = "".join(rng.choice("ACGT") for _ in range(200))
    cases = {}
    p = tmp_path / "empty.fasta"
    p.write_bytes(b"")
    cases["empty"] = p
    p = tmp_path / "tiny.fasta"          # one read, too short -> 0 good
    p.write_text(">a\nACGT\n")
    cases["tiny"] = p
    p = tmp_path / "one.fasta"           # a single good read, no edges
    p.write_text(">a\n%s\n" % g[:120])
    cases["one"] = p
    p = tmp_path / "dups.fasta"          # all duplicates -> 1 unique read
    p.write_text("".join(">d%d\n%s\n" % (i, g[:120]) for i in range(6)))
    cases["dups"] = p
    p = tmp_path / "cont.fasta"          # all short reads contained in one
    p.write_text(">L\n%s\n" % g
                 + "".join(">c%d\n%s\n" % (i, g[20 + i:90 + i])
                           for i in range(4)))
    cases["cont"] = p
    cases["missing"] = tmp_path / "missing.fasta"   # never created
    return cases


EXPECT = {
    "empty": (0, b"Message: Unknown input file format."),
    "tiny": (0, b"Message: No good reads in input"),
    "one": (2, b"Error 2"),
    "dups": (2, b"Error 2"),
    "cont": (2, b"Error 2"),
    "missing": (0, b"Message: Unable to open file:"),
}


def _run_cli(path, engine, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["MGTPU_OVERLAP_ENGINE"] = engine
    return subprocess.run(
        [sys.executable, "-m", "metagenomics_tpu.cli", "-se", "1", str(path),
         "-f", "d_", "-l", "40"],
        cwd=cwd, env=env, capture_output=True, timeout=300)


@pytest.mark.parametrize("case", sorted(EXPECT))
def test_degenerate_native(case, tmp_path):
    cases = _write_cases(tmp_path)
    rc, needle = EXPECT[case]
    proc = _run_cli(cases[case], "native", tmp_path)
    blob = proc.stdout + proc.stderr
    assert proc.returncode == rc, blob[-2000:]
    assert needle in blob, blob[-2000:]
    assert b"Traceback" not in blob, blob[-2000:]


@pytest.mark.parametrize("engine", ["host", "device", "hybrid"])
def test_degenerate_other_engines_spot(engine, tmp_path):
    """host/device/hybrid engines share the dataset + flow paths;
    spot-check the two engine-specific failure modes (0 good reads, empty
    candidate set).  hybrid falls back to the device pipeline below its
    read-count floor, which these tiny inputs exercise."""
    cases = _write_cases(tmp_path)
    for case in ("tiny", "one"):
        rc, needle = EXPECT[case]
        proc = _run_cli(cases[case], engine, tmp_path)
        blob = proc.stdout + proc.stderr
        assert proc.returncode == rc, blob[-2000:]
        assert needle in blob, blob[-2000:]
        assert b"Traceback" not in blob, blob[-2000:]

"""Exact per-1e6 ingest/mate heartbeat splits (VERDICT r4 item 8).

The reference prints a progress line whenever (good+bad) % 1e6 == 0 at the
top of its record loops, with the good/bad counts AT THAT RECORD
(Dataset.cpp:125-126 ingest, :228-231 mate store).  This test runs a
1,050,000-read paired-end dataset — tiny genome, so dedup keeps the graph
small and the reference binary finishes quickly — with ~5% QC-failing
reads scattered around the boundary so the boundary-time split differs
from the end-of-file ratio, and byte-compares every heartbeat line (and
the whole normalized log) against the reference binary."""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.path.join(REPO, "golden", "metagenomics_ref_O0")

pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference binary unavailable")

N_PAIRS = 525_000          # 1,050,000 reads: one ingest boundary at 1e6,
                           # one mate-store boundary at 500k pairs
READ_LEN = 100
GENOME = 50_000


@pytest.fixture(scope="module")
def boundary_input(tmp_path_factory):
    td = tmp_path_factory.mktemp("hb")
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    comp = np.zeros(256, np.uint8)
    for k, v in zip(b"ACGT", b"TGCA"):
        comp[k] = v
    g = bases[rng.integers(0, 4, GENOME)]
    starts = rng.integers(0, GENOME - 400, N_PAIRS)
    insert = rng.integers(280, 330, N_PAIRS)
    r1 = g[starts[:, None] + np.arange(READ_LEN)[None, :]]
    s2 = starts + insert - READ_LEN
    r2 = comp[g[s2[:, None] + np.arange(READ_LEN)[None, :]][:, ::-1]]
    reads = np.empty((2 * N_PAIRS, READ_LEN), np.uint8)
    reads[0::2] = r1
    reads[1::2] = r2
    # ~5% bad reads (an embedded 'N'), denser before the 1e6 boundary than
    # after it, so the boundary-time good/bad split differs measurably
    # from the end-of-file totals
    nbad = rng.random(2 * N_PAIRS)
    bad = (nbad < 0.08) & (np.arange(2 * N_PAIRS) < 1_000_000)
    bad |= (nbad < 0.02) & (np.arange(2 * N_PAIRS) >= 1_000_000)
    reads[bad, READ_LEN // 2] = ord("N")
    path = td / "hb.fasta"
    with open(path, "wb") as f:
        for i in range(2 * N_PAIRS):
            f.write(b">p%d\n" % i)
            f.write(reads[i].tobytes())
            f.write(b"\n")
    refdir = td / "ref"
    refdir.mkdir()
    proc = subprocess.run([REF, "-pe", "1", str(path), "-f", "r_",
                           "-l", "40"], cwd=refdir, capture_output=True,
                          text=True, timeout=3600)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    (refdir / "log.txt").write_text(proc.stdout)
    return path, refdir


HB_RE = re.compile(r"reads processed in (dataset|store mate-pair)")


def test_heartbeat_boundary_splits(boundary_input, tmp_path):
    path, refdir = boundary_input
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", "metagenomics_tpu.cli", "-pe", "1",
         str(path), "-f", "t_", "-l", "40"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]

    ref_log = (refdir / "log.txt").read_text()
    ref_hb = [l for l in ref_log.splitlines() if HB_RE.search(l)]
    got_hb = [l for l in proc.stdout.splitlines() if HB_RE.search(l)]
    assert ref_hb, "reference printed no heartbeats — dataset too small?"
    assert got_hb == ref_hb, "\nref: %r\ngot: %r" % (ref_hb, got_hb)

    # the split at the boundary must be non-trivial (guards against the
    # old behavior of printing end-of-file totals)
    final_good = re.search(r"(\d+)\s+good reads in current dataset",
                           ref_log).group(1)
    m = re.match(r"\s*(\d+) reads processed in dataset\s+\d+\.\s*(\d+) good",
                 ref_hb[0])
    assert m, ref_hb[0]
    assert m.group(2) != final_good

    from logutil import assert_log_equal
    assert_log_equal(proc.stdout, str(refdir / "log.txt"), "hb_boundary")
    for art in ("contigs1.fasta", "contigs4.fasta", ".unitig"):
        got = (tmp_path / ("t_" + art)).read_bytes()
        want = (refdir / ("r_" + art)).read_bytes()
        assert got == want, "artifact mismatch: %s" % art

"""Log + artifact parity above the BFS heartbeat threshold (>100k reads).

The reference prints mid-BFS progress lines every 100000 dequeues with the
LIVE node/edge counts (OverlapGraph.cpp:200-201); the threaded native
engine reconstructs them from per-component snapshots composed in global
component order.  This runs a ~130k-read input through our CLI and the
reference binary and asserts normalized-log equality plus artifact
byte-equality."""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.path.join(REPO, "golden", "metagenomics_ref_O0")

pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference binary unavailable")


@pytest.fixture(scope="module")
def big_input(tmp_path_factory):
    td = tmp_path_factory.mktemp("biglog")
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    comp = np.zeros(256, np.uint8)
    for k, v in zip(b"ACGT", b"TGCA"):
        comp[k] = v
    recs = []
    for gi in range(2):
        g = bases[rng.integers(0, 4, 800_000)]
        starts = rng.integers(0, len(g) - 100 + 1, 55_000)
        blocks = g[starts[:, None] + np.arange(100)[None, :]]
        flip = rng.random(len(blocks)) < 0.5
        blocks = np.where(flip[:, None], comp[blocks[:, ::-1]], blocks)
        recs.extend(blocks[t].tobytes() for t in range(len(blocks)))
    single = bases[rng.integers(0, 4, (20_000, 60))]
    recs.extend(single[t].tobytes() for t in range(len(single)))
    rng.shuffle(recs)
    path = td / "big.fasta"
    with open(path, "wb") as f:
        for i, r in enumerate(recs):
            f.write(b">r%d\n" % i)
            f.write(r)
            f.write(b"\n")
    refdir = td / "ref"
    refdir.mkdir()
    proc = subprocess.run([REF, "-se", "1", str(path), "-f", "r_",
                           "-l", "40"], cwd=refdir, capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0
    (refdir / "log.txt").write_text(proc.stdout)
    return path, refdir


def test_bfs_heartbeat_log_parity(big_input, tmp_path):
    from logutil import assert_log_equal

    path, refdir = big_input
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", "metagenomics_tpu.cli", "-se", "1",
         str(path), "-f", "r_", "-l", "40"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "counter:     100000 " in proc.stdout   # a mid-BFS heartbeat
    assert_log_equal(proc.stdout, str(refdir / "log.txt"), "bfs-heartbeat")
    for art in ("r_.unitig", "r_contigs4.fasta", "r__flow.output",
                "r__sortedReads.fasta"):
        assert (tmp_path / art).read_bytes() == \
            (refdir / art).read_bytes(), art

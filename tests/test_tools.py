"""Byte-parity of the eval/prep tooling against the reference perl scripts
(MetaGenomics/Debug/*.pl)."""

import os
import random
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_FAC = "/root/reference/MetaGenomics/Debug/abyss-fac.pl"

perl = shutil.which("perl")
needs_perl = pytest.mark.skipif(
    perl is None or not os.path.exists(REF_FAC),
    reason="perl or reference script unavailable")


def _run_ours(args):
    return subprocess.run(
        [sys.executable, "-m", "metagenomics_tpu.tools.fac", *args],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO}).stdout


def _run_ref(args):
    return subprocess.run([perl, REF_FAC, *args],
                          capture_output=True, text=True).stdout


@needs_perl
def test_fac_matches_reference_on_goldens():
    files = sorted(
        os.path.join(REPO, "golden", "out", d, "g_contigs%d.fasta" % k)
        for d in os.listdir(os.path.join(REPO, "golden", "out"))
        for k in (1, 4)
        if os.path.exists(os.path.join(REPO, "golden", "out", d,
                                       "g_contigs%d.fasta" % k)))
    assert files
    assert _run_ours(files) == _run_ref(files)


@needs_perl
def test_fac_matches_reference_options(tmp_path):
    rng = random.Random(9)
    # synthetic contig sets incl. >=1e7 totals (eng() notation) and short
    # contigs under various thresholds
    paths = []
    for fi in range(3):
        p = tmp_path / ("c%d.fasta" % fi)
        with open(p, "w") as f:
            for i in range(rng.randrange(3, 30)):
                ln = rng.choice([50, 150, 700, 5000, 800000])
                f.write(">c%d\n" % i)
                s = "".join(rng.choice("ACGTN") for _ in range(ln))
                for k in range(0, ln, 80):
                    f.write(s[k:k + 80] + "\n")
        paths.append(str(p))
    big = tmp_path / "big.fasta"
    with open(big, "w") as f:
        for i in range(14):
            f.write(">b%d\n" % i + "A" * 900000 + "\n")
    paths.append(str(big))
    for args in ([paths[0]], paths,
                 ["-t", "100", *paths],
                 ["-t", "1000", *paths],
                 ["-g", "2000000", *paths],
                 ["-j", *paths]):
        assert _run_ours(list(args)) == _run_ref(list(args)), args

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


REF_FMT = "/root/reference/MetaGenomics/Debug/format_fasta.pl"
REF_SHUF_FA = "/root/reference/MetaGenomics/Debug/shuffleSequences_fasta.pl"
REF_SHUF_FQ = "/root/reference/MetaGenomics/Debug/shuffleSequences_fastq.pl"


@needs_perl
def test_format_fasta_matches_perl(tmp_path):
    cases = [
        b">a\nacgt\nACGT\n>b desc\nttt\n",
        b"junk\nmore junk\n>a\nacg\ntac\n",               # preamble skipped
        b">a\r\nac\r\ngt\r\n>b\nTT\n",                    # carriage returns
        b">only_header\n",
        b">a\nACGT\n>b\nGG\n>c\nAAAA\nCCC\n",
        b">a\nACGT",                                      # no trailing \n
    ]
    for k, data in enumerate(cases):
        p = tmp_path / ("f%d.fa" % k)
        p.write_bytes(data)
        ours = subprocess.run(
            [sys.executable, "-m", "metagenomics_tpu.tools.format_fasta",
             str(p)], capture_output=True, text=True, cwd=REPO,
            env={**os.environ, "PYTHONPATH": REPO}).stdout
        ref = subprocess.run([perl, REF_FMT, str(p)],
                             capture_output=True, text=True).stdout
        assert ours == ref, (k, ours, ref)


@needs_perl
def test_shuffle_matches_perl(tmp_path):
    fa1 = tmp_path / "r1.fa"
    fa2 = tmp_path / "r2.fa"
    # multi-line records and uneven record counts
    fa1.write_text(">p1/1\nACGT\nTTTT\n>p2/1\nGGG\n>p3/1\nCC\n")
    fa2.write_text(">p1/2\nTTAA\n>p2/2\nAAA\nC\n")
    fq1 = tmp_path / "r1.fq"
    fq2 = tmp_path / "r2.fq"
    fq1.write_text("@p1/1\nACGT\n+\nIIII\n@p2/1\nGG\n+\nII\n")
    fq2.write_text("@p1/2\nTTAA\n+\nIIII\n")
    for a, b, ref_script in ((fa1, fa2, REF_SHUF_FA),
                             (fq1, fq2, REF_SHUF_FQ)):
        out_ours = tmp_path / "ours.out"
        out_ref = tmp_path / "ref.out"
        subprocess.run(
            [sys.executable, "-m", "metagenomics_tpu.tools.shuffle",
             str(a), str(b), str(out_ours)], cwd=REPO,
            env={**os.environ, "PYTHONPATH": REPO}, check=True)
        subprocess.run([perl, ref_script, str(a), str(b), str(out_ref)],
                       check=True)
        assert out_ours.read_bytes() == out_ref.read_bytes(), ref_script

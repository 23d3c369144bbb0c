"""Hybrid CPU+device engine: exact canonical shard merge.

The hybrid engine scans reads [1, a) on the CPU (native.scan_canon)
concurrently with the device pipeline probing [a, n]; canonical records
are keyed by their smaller endpoint, so the shards partition the overlap
set exactly and the concatenated word streams equal the full canonical
stream.  Mixed-length datasets resolve containment GLOBALLY on the host
from both shards' hit streams.  These tests pin byte-identical graphs
against the native engine across split fractions and dataset shapes."""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "golden", "data")
BENCH = os.path.join(REPO, "bench_data", "bench_se.fasta")


def _quiet(*a, **k):
    pass


def _mkreads(tmp_path, n=6000, glen=60_000, L=100, seed=9):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    comp = np.zeros(256, np.uint8)
    for k, v in zip(b"ACGT", b"TGCA"):
        comp[k] = v
    g = bases[rng.integers(0, 4, glen)]
    starts = rng.integers(0, glen - L + 1, n)
    reads = g[starts[:, None] + np.arange(L)[None, :]]
    flip = rng.random(n) < 0.5
    reads = np.where(flip[:, None], comp[reads[:, ::-1]], reads)
    path = tmp_path / "uniform.fasta"
    with open(path, "wb") as f:
        for i in range(n):
            f.write(b">r%d\n" % i)
            f.write(reads[i].tobytes())
            f.write(b"\n")
    return str(path)


def _unitig(se, engine, frac=None):
    from metagenomics_tpu.config import AssemblerConfig
    from metagenomics_tpu.dataset import Dataset
    from metagenomics_tpu.graph import OverlapGraph

    if frac is not None:
        os.environ["MGTPU_HYBRID_CPU_FRAC"] = str(frac)
    try:
        ds = Dataset([], [se], 40, log=_quiet)
        cfg = AssemblerConfig(min_overlap=40, single_end_files=[se])
        g = OverlapGraph(ds, cfg, log=_quiet)
        if engine == "hybrid":
            assert g.build_hybrid(), "hybrid refused dataset"
        else:
            assert g.build_full_native()
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".unitig") as tf:
            g.save_graph_to_file(tf.name)
            return (open(tf.name, "rb").read(),
                    tuple(ds.super_read_id.tolist()))
    finally:
        os.environ.pop("MGTPU_HYBRID_CPU_FRAC", None)


@pytest.mark.parametrize("frac", [0.25, 0.5, 0.85])
def test_hybrid_unitig_equal(tmp_path, frac):
    from metagenomics_tpu import native
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    se = _mkreads(tmp_path)
    a = _unitig(se, "hybrid", frac)
    b = _unitig(se, "native")
    assert a == b and len(a[0]) > 0


@pytest.mark.parametrize("name,frac", [
    ("se_mixlen.fasta", 0.5), ("se_mixlen.fasta", 0.9),
    ("se_heap.fasta", 0.7)])
def test_hybrid_mixed_lengths(name, frac):
    """Mixed-length datasets: containment resolved globally across the
    shards — supers and the unitig graph must match the native engine."""
    from metagenomics_tpu import native
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    se = os.path.join(GOLDEN, name)
    a = _unitig(se, "hybrid", frac)
    b = _unitig(se, "native")
    assert a[1] == b[1], "supers differ"
    assert a[0] == b[0] and len(a[0]) > 0


def test_hybrid_cli_engine(tmp_path):
    """MGTPU_OVERLAP_ENGINE=hybrid through the full CLI matches native."""
    import subprocess
    import sys
    from metagenomics_tpu import native
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    se = _mkreads(tmp_path, n=4000)
    outs = {}
    for engine in ("native", "hybrid"):
        d = tmp_path / engine
        d.mkdir()
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env["JAX_PLATFORMS"] = "cpu"
        env["MGTPU_OVERLAP_ENGINE"] = engine
        proc = subprocess.run(
            [sys.executable, "-m", "metagenomics_tpu.cli", "-se", "1", se,
             "-f", "h_", "-l", "40"],
            cwd=d, env=env, capture_output=True, text=True, timeout=900)
        assert proc.returncode == 0, proc.stdout[-2000:]
        outs[engine] = {
            a: (d / ("h_" + a)).read_bytes()
            for a in (".unitig", "contigs1.fasta", "contigs4.fasta",
                      "graph4.gdl")}
    assert outs["native"] == outs["hybrid"]

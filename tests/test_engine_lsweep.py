"""Cross-engine agreement sweep over min_overlap values.

Round-3 verdict found the native engine silently false-accepting containments
for min_overlap >= 66: the 128-bit l-mer key truncates to the last 64 seed
bases while verification skipped the seed entirely (the reference re-checks
the full string per hash slot, HashTable.cpp:207-219).  These tests pin the
fix: every engine must produce byte-identical graphs and containment calls
for l in {40, 64, 65, 66, 100}, including the judge's repro (two reads that
differ ONLY at seed position 0 of a 65-base window).
"""

import os
import random

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _quiet(*a, **k):
    pass


def _build(engine, pe, se, min_overlap):
    """Build the construction-phase graph with one engine; returns the
    (.unitig byte stream, sorted-reads dump) pair as the comparison key."""
    import io

    from metagenomics_tpu.config import AssemblerConfig
    from metagenomics_tpu.dataset import Dataset
    from metagenomics_tpu.graph import OverlapGraph
    from metagenomics_tpu.index import OverlapIndex

    ds = Dataset(list(pe), list(se), min_overlap, log=_quiet)
    cfg = AssemblerConfig(min_overlap=min_overlap,
                          paired_end_files=list(pe),
                          single_end_files=list(se))
    graph = OverlapGraph(ds, cfg, log=_quiet)
    if engine == "native":
        assert graph.build_full_native(), "native engine unavailable"
    elif engine == "host":
        graph.build_from_index(OverlapIndex(ds, min_overlap))
    elif engine == "device":
        from metagenomics_tpu.ops.device_overlap import DeviceOverlapPipeline
        graph.build_from_pipeline(DeviceOverlapPipeline(ds, min_overlap))
    elif engine == "sharded":
        from metagenomics_tpu.parallel.mesh import make_mesh
        from metagenomics_tpu.parallel.sharded import ShardedOverlapPipeline
        graph.build_from_pipeline(
            ShardedOverlapPipeline(ds, min_overlap, mesh=make_mesh(dp=4,
                                                                   ix=2)))
    else:
        raise AssertionError(engine)
    graph.sort_edges()
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        up = os.path.join(td, "u")
        sp = os.path.join(td, "s")
        graph.save_graph_to_file(up)
        ds.save_reads(sp)
        return open(up, "rb").read(), open(sp, "rb").read()


def _sweep_file(tmp_path, name, reads):
    p = tmp_path / name
    with open(p, "w") as f:
        for i, s in enumerate(reads):
            f.write(">r%d\n%s\n" % (i, s))
    return str(p)


@pytest.fixture(scope="module")
def sweep_reads():
    rng = random.Random(20240817)
    g = "".join(rng.choice("ACGT") for _ in range(3000))
    reads = []
    # overlapping tiling reads of mixed lengths so every l in the sweep has
    # genuine overlaps, containments and near-misses
    for pos in range(0, 2800, 23):
        ln = rng.choice([110, 120, 135, 150])
        frag = g[pos:pos + ln]
        if len(frag) > 105:
            reads.append(frag)
    # containments: shorter reads inside longer ones
    for pos in range(40, 2000, 310):
        reads.append(g[pos:pos + 90])
    # near-miss pair: identical except at one seed-window position, so a
    # truncated key that skips the seed would false-accept
    base = g[500:615]
    mut = "A" if base[10] != "A" else "C"
    reads.append(base[:10] + mut + base[11:])
    rng.shuffle(reads)
    return reads


@pytest.mark.parametrize("min_overlap", [40, 64, 65, 66, 100])
def test_engines_agree_across_l(tmp_path, sweep_reads, min_overlap):
    path = _sweep_file(tmp_path, "sweep.fasta", sweep_reads)
    engines = ("native", "host", "device", "sharded")
    results = {e: _build(e, [], [path], min_overlap) for e in engines}
    for e in engines[1:]:
        assert results[e] == results["native"], \
            "%s != native at -l %d" % (e, min_overlap)


def test_judge_repro_l66_native_containment(tmp_path):
    """Two reads (115bp / 85bp) differing only at seed position 0 of a
    65-base window: with -l 66 the pre-fix native engine marked the short
    read 'Contained in' the long one; every engine must say Noncontained."""
    rng = random.Random(99)
    # both reads must survive canonicalization unflipped (start 'A', end
    # 'A' => RC starts 'T'), otherwise the truncated-key window shifts and
    # the false match cannot fire
    mid = "".join(rng.choice("ACGT") for _ in range(113))
    long_read = "A" + mid + "A"
    long_read = (long_read[:20] + "G" + long_read[21:104] + "A"
                 + long_read[105:])
    window = long_read[20:105]
    # short read matches long_read[20:105] except at the very first base of
    # that window (= seed position 0 for the l=65 probe starting there)
    short_read = "A" + window[1:]
    assert window[0] == "G" and short_read[-1] == "A"
    assert len(short_read) == 85 and short_read != window
    path = _sweep_file(tmp_path, "repro.fasta", [long_read, short_read])
    out = {}
    for e in ("native", "host", "device"):
        _, sorted_reads = _build(e, [], [str(path)], 66)
        out[e] = sorted_reads
        assert b"Contained in" not in sorted_reads, \
            "%s engine false-accepted the containment" % e
    assert out["native"] == out["host"] == out["device"]


REF_BIN = os.path.join(REPO, "golden", "metagenomics_ref_O0")


@pytest.mark.skipif(not os.path.exists(REF_BIN),
                    reason="reference binary unavailable")
def test_full_pipeline_l66_matches_reference(tmp_path):
    """End-to-end byte + log parity against the reference at a non-default
    minimum overlap (the l > 64 truncated-key regime)."""
    import subprocess
    import sys
    data = os.path.join(REPO, "golden", "data", "se_mixlen.fasta")
    refdir = tmp_path / "ref"
    refdir.mkdir()
    pr = subprocess.run([REF_BIN, "-se", "1", data, "-f", "g_", "-l", "66"],
                       cwd=refdir, capture_output=True, text=True,
                       timeout=600)
    assert pr.returncode == 0
    ourdir = tmp_path / "ours"
    ourdir.mkdir()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    po = subprocess.run(
        [sys.executable, "-m", "metagenomics_tpu.cli", "-se", "1", data,
         "-f", "g_", "-l", "66"],
        cwd=ourdir, env=env, capture_output=True, text=True, timeout=600)
    assert po.returncode == 0, po.stdout[-2000:] + po.stderr[-2000:]
    for f in ("_sortedReads.fasta", ".unitig", "_flow.input",
              "_flow.output", "graph1.gdl", "contigs1.fasta",
              "graph4.gdl", "contigs4.fasta"):
        assert (ourdir / ("g_" + f)).read_bytes() == \
            (refdir / ("g_" + f)).read_bytes(), f
    from logutil import normalize_log
    assert normalize_log(po.stdout) == normalize_log(pr.stdout)

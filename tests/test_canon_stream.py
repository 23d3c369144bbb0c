"""Canonical-dedup stream replay equivalence.

The device pipeline can halve its device->host survivor stream by sending
each physical overlap once — the occurrence discovered from its smaller
endpoint — and letting the native replay reconstruct the mirror occurrence
and each read's probe discovery order arithmetically
(native/mg_native.cpp mg_build_stream_canon; twin algebra
OverlapGraph.cpp:407-419, probe order :534 + HashTable.cpp:88-104).

These tests prove the reconstruction is EXACT: for several golden datasets
(mixed lengths with contained reads, planted repeats with self-loop edges,
paired-end hard data) the graph built from the canonical stream must be
byte-identical — every edge field, serial, twin position, manifest and
read-location array — to the graph built from the full stream.
"""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "golden", "data")

DATASETS = {
    "se_small": ([], ["se_small.fasta"]),
    "se_mixlen": ([], ["se_mixlen.fasta"]),
    "se_heap": ([], ["se_heap.fasta"]),
    "se_hard": ([], ["se_hard.fasta"]),
    "pe_hard": (["pe_hard_a.fasta", "pe_hard_b.fasta"], []),
    "mix_ps": (["pe_small.fasta"], ["se_mixlen.fasta"]),
}


def _quiet(*a, **k):
    pass


@pytest.mark.parametrize("name", sorted(DATASETS))
def test_canon_stream_graph_identical(name):
    from metagenomics_tpu import native
    from metagenomics_tpu.dataset import Dataset
    from metagenomics_tpu.ops.device_overlap import DeviceOverlapPipeline

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    pe, se = DATASETS[name]
    pe = [os.path.join(GOLDEN, f) for f in pe]
    se = [os.path.join(GOLDEN, f) for f in se]
    min_overlap = 40
    ds = Dataset(pe, se, min_overlap, log=_quiet)
    mixed = ds.longest_read_length != ds.shortest_read_length

    pipeline = DeviceOverlapPipeline(ds, min_overlap)
    counts, r2, meta = pipeline.stream(check_cont=mixed)
    full = native.build_graph_stream(ds.lengths, counts, r2, meta, mixed, 10)
    assert full is not None

    # canonical subset: containment resolved first (the supers array from
    # the full replay is the reference semantics), then one record per
    # overlap from its smaller endpoint; self overlaps keep both records
    r1 = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    edge_ok = ((meta >> 2) & 1).astype(bool)
    sup = full["supers"]
    keep = (edge_ok & (r1 <= r2)
            & (sup[r1] == 0) & (sup[np.asarray(r2, np.int64)] == 0))
    ccounts = np.zeros(len(counts), np.int64)
    np.add.at(ccounts, r1[keep], 1)
    canon = native.build_graph_stream_canon(
        ds.lengths, ccounts, r2[keep], meta[keep], min_overlap - 1, 10)
    assert canon is not None

    # the halving is exact: every non-self overlap appears twice in the
    # kept full stream
    n_kept_full = int((edge_ok & (sup[r1] == 0)
                       & (sup[np.asarray(r2, np.int64)] == 0)).sum())
    n_self = int((keep & (r1 == np.asarray(r2, np.int64))).sum())
    assert n_kept_full == 2 * int(keep.sum()) - n_self

    for key in sorted(full):
        if key in ("supers", "cont_heartbeats"):
            continue
        va, vb = full[key], canon[key]
        if isinstance(va, np.ndarray):
            assert va.shape == vb.shape, "%s/%s shape" % (name, key)
            assert (va == vb).all(), "%s/%s values" % (name, key)
        else:
            assert va == vb, "%s/%s" % (name, key)


@pytest.mark.parametrize("name", ["se_mixlen", "se_heap", "mix_ps"])
def test_device_stream_canon(name):
    """The pipeline's own canonical stream (containment resolved ON device,
    ops/device_overlap._cont_canon) must agree record-for-record with the
    host-side canonical filter over the full stream, and its supers with
    the replay's containment pass."""
    from metagenomics_tpu import native
    from metagenomics_tpu.dataset import Dataset
    from metagenomics_tpu.ops.device_overlap import DeviceOverlapPipeline

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    pe, se = DATASETS[name]
    pe = [os.path.join(GOLDEN, f) for f in pe]
    se = [os.path.join(GOLDEN, f) for f in se]
    ds = Dataset(pe, se, 40, log=_quiet)
    mixed = ds.longest_read_length != ds.shortest_read_length

    pipeline = DeviceOverlapPipeline(ds, 40)
    counts, r2, meta = pipeline.stream(check_cont=mixed)
    full = native.build_graph_stream(ds.lengths, counts, r2, meta, mixed, 10)
    sup = full["supers"]

    got = pipeline.stream_canon(check_cont=mixed)
    assert got is not None
    ccounts, cwords, csup, cfh = got
    cr2, cmeta = pipeline._unpack_words(cwords)
    if mixed:
        assert (np.asarray(csup) == sup).all(), "device supers differ"
    else:
        assert csup is None

    r1 = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    edge_ok = ((meta >> 2) & 1).astype(bool)
    keep = (edge_ok & (r1 <= r2)
            & (sup[r1] == 0) & (sup[np.asarray(r2, np.int64)] == 0))
    want_counts = np.zeros(len(counts), np.int64)
    np.add.at(want_counts, r1[keep], 1)
    assert (ccounts == want_counts).all()
    assert (cr2 == r2[keep]).all()
    # flag bits are advisory on the canon path; orientation and offset
    # fields must match exactly
    assert ((cmeta & 3) == (meta[keep] & 3)).all()
    assert ((cmeta >> 4) == (meta[keep] >> 4)).all()


def test_multichunk_stream_canon():
    """The canonical stream must be invariant to chunking: forcing a tiny
    candidate buffer (many chunks) reproduces the single-chunk records
    exactly (counts and packed words)."""
    from metagenomics_tpu.dataset import Dataset
    from metagenomics_tpu.ops.device_overlap import DeviceOverlapPipeline

    se = os.path.join(GOLDEN, "se_hard.fasta")
    ds = Dataset([], [se], 40, log=_quiet)
    p1 = DeviceOverlapPipeline(ds, 40)
    c1, w1, _, _ = p1.stream_canon(check_cont=False)
    old_cap = DeviceOverlapPipeline.MAX_CAP
    try:
        DeviceOverlapPipeline.MAX_CAP = 1 << 14
        p2 = DeviceOverlapPipeline(ds, 40)
        _, _, chunks = p2._plan_chunks()
        assert len(chunks) > 1, "cap override produced a single chunk"
        c2, w2, _, _ = p2.stream_canon(check_cont=False)
    finally:
        DeviceOverlapPipeline.MAX_CAP = old_cap
    assert (c1 == c2).all()
    assert len(w1) == len(w2) and (w1 == w2).all()


def test_sharded_stream_canon():
    """The sharded pipeline's canonical stream must agree record-for-
    record with the host-side canonical filter over its full stream
    (uniform-length dataset, dp=4 x ix=2 mesh)."""
    import jax
    from metagenomics_tpu.dataset import Dataset
    from metagenomics_tpu.parallel.mesh import make_mesh
    from metagenomics_tpu.parallel.sharded import ShardedOverlapPipeline

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    se = os.path.join(GOLDEN, "se_hard.fasta")
    ds = Dataset([], [se], 40, log=_quiet)
    if ds.longest_read_length != ds.shortest_read_length:
        pytest.skip("dataset not uniform-length")
    mesh = make_mesh(dp=4, ix=2, devices=jax.devices()[:8])
    pipeline = ShardedOverlapPipeline(ds, 40, mesh=mesh)
    counts, r2, meta = pipeline.stream(check_cont=False)
    got = pipeline.stream_canon(check_cont=False)
    assert got is not None
    ccounts, cwords, csup, _ = got
    assert csup is None
    ob = pipeline.off_bits
    cr2 = (cwords >> np.uint32(4 + ob)).astype(np.int32)
    ceo = ((cwords >> np.uint32(ob)) & np.uint32(3)).astype(np.uint16)
    coff = (cwords & np.uint32((1 << ob) - 1)).astype(np.uint16)

    r1 = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    keep = (((meta >> 2) & 1).astype(bool)) & (r1 <= r2)
    want_counts = np.zeros(len(counts), np.int64)
    np.add.at(want_counts, r1[keep], 1)
    assert (ccounts == want_counts).all()
    assert (cr2 == r2[keep]).all()
    assert (ceo == (meta[keep] & 3)).all()
    assert (coff == (meta[keep] >> 4)).all()

"""Unit tests for the round-3 vectorized late-phase helpers: each one is
checked against a direct transliteration of the reference's scalar loop
(OverlapGraph.cpp / Dataset.cpp spans noted per test)."""

import random

import numpy as np
import pytest

from metagenomics_tpu.dataset import Dataset
from metagenomics_tpu.graph.simplify import edit_distance
from metagenomics_tpu.ops import packing
from metagenomics_tpu.ops.device_overlap import (pack_codes_host,
                                                 _unpack_codes)


def _ref_edit_distance(s1, s2):
    """Cell-loop Levenshtein (OverlapGraph.cpp:1736-1773)."""
    m, n = len(s1), len(s2)
    if m == 0:
        return n
    if n == 0:
        return m
    costs = list(range(n + 1))
    for i, c1 in enumerate(s1):
        costs[0] = i + 1
        corner = i
        for jj, c2 in enumerate(s2):
            upper = costs[jj + 1]
            if c1 == c2:
                costs[jj + 1] = corner
            else:
                costs[jj + 1] = min(upper, corner, costs[jj]) + 1
            corner = upper
    return costs[n]


def test_edit_distance_fuzz_vs_cell_loop():
    rng = random.Random(7)
    for _ in range(400):
        s1 = bytes(rng.choice(b"ACGT") for _ in range(rng.randrange(0, 50)))
        s2 = bytes(rng.choice(b"ACGT") for _ in range(rng.randrange(0, 50)))
        assert edit_distance(s1, s2) == _ref_edit_distance(s1, s2)


def test_pack_codes_host_roundtrip_and_device_layout():
    rng = np.random.default_rng(3)
    for lmax in (16, 37, 100):
        codes = rng.integers(0, 4, (40, lmax)).astype(np.uint8)
        words = pack_codes_host(codes)
        assert words.shape == (40, (lmax + 15) // 16)
        back = np.asarray(_unpack_codes(words, lmax))
        np.testing.assert_array_equal(back, codes)


def test_reverse_complement_out_param_matches_plain():
    rng = np.random.default_rng(4)
    # uniform-length fast path and the ragged slow path, with out= views
    for lens_spec in ([30] * 20, list(rng.integers(5, 30, 20))):
        lens = np.asarray(lens_spec, np.int64)
        lmax = int(lens.max())
        codes = np.full((len(lens), lmax), packing.PAD_CODE, np.uint8)
        for i, ln in enumerate(lens):
            codes[i, :ln] = rng.integers(0, 4, ln)
        plain = packing.reverse_complement_codes_np(codes, lens)
        dest = np.full((len(lens) + 1, lmax), 7, np.uint8)
        got = packing.reverse_complement_codes_np(codes, lens,
                                                  out=dest[1:])
        assert got.base is dest
        np.testing.assert_array_equal(dest[1:], plain)
        assert (dest[0] == 7).all()


def _toy_pe_dataset(tmp_path):
    """Small interleaved PE file with duplicate and RC'd reads."""
    rng = random.Random(11)
    comp = str.maketrans("ACGT", "TGCA")
    g = "".join(rng.choice("ACGT") for _ in range(800))
    reads = []
    for pos in range(0, 500, 9):
        frag = g[pos:pos + 260]
        r1, r2 = frag[:60], frag[-60:].translate(comp)[::-1]
        if rng.random() < 0.5:
            reads.append((r1, r2))
        else:
            reads.append((r2, r1))
    # palindromic (self-reverse-complement) reads: the canonicalize tie path
    # reports flipped=True but the forward string matches the stored string,
    # so the reference's substring probe yields orientation 1 (ADVICE r3)
    half = "".join(rng.choice("ACGT") for _ in range(30))
    pal = half + half.translate(comp)[::-1]
    assert pal == pal.translate(comp)[::-1]
    reads.append((pal, g[100:160]))
    reads.append((g[300:360], pal))
    path = tmp_path / "pe.fasta"
    with open(path, "w") as f:
        for i, (a, b) in enumerate(reads):
            f.write(">a%d\n%s\n>b%d\n%s\n" % (i, a, i, b))
    return str(path)


def test_store_mate_pairs_matches_scalar_reference(tmp_path):
    """The vectorized second pass must reproduce the reference's per-pair
    find/remap/orient/dedup semantics (Dataset.cpp:208-310) exactly."""
    from metagenomics_tpu.io.fastx import fastx_pairs

    path = _toy_pe_dataset(tmp_path)
    ds = Dataset([path], [], 40, log=lambda *a, **k: None)
    ds.super_read_id[:] = 0
    ds.read_mate_pairs_from_file()

    # scalar oracle
    def test_read(s):
        cnt = {c: 0 for c in "ACGT"}
        for ch in s:
            if ch not in cnt:
                return False
            cnt[ch] += 1
        thr = int(len(s) * 0.8)
        return not any(v >= thr for v in cnt.values())

    oracle = {}
    order = []
    for s1, s2 in fastx_pairs(path):
        if not (len(s1) > 40 and len(s2) > 40 and test_read(s1)
                and test_read(s2)):
            continue
        r1 = ds.find_read_id(s1)
        r2 = ds.find_read_id(s2)
        o1 = 1 if s1.encode() in ds.read_strs[r1] else 0
        o2 = 1 if s2.encode() in ds.read_strs[r2] else 0
        for rid, mate, orient in ((r1, r2, o1 * 2 + o2),
                                  (r2, r1, o1 + o2 * 2)):
            key = (rid, mate, orient, 0)
            if key not in oracle:
                oracle[key] = True
                order.append(key)

    got = []
    for i in range(1, ds.number_of_unique_reads + 1):
        for mp in ds.mate_pair_lists[i]:
            got.append((i, mp.mate_id, mp.orientation, mp.dataset))
    assert sorted(got) == sorted(order)

    # flattened arrays must be in reference iteration order
    flat = list(zip(ds.mp_rid.tolist(), ds.mp_mate.tolist(),
                    ds.mp_orient.tolist(), ds.mp_dataset.tolist()))
    assert flat == got


def _scalar_insert_size(ds):
    """Transliteration of calculateMeanAndSdOfInsertSize (OverlapGraph.cpp:
    1124-1211): walks the per-read fwd+rev location lists, including any
    stale entries left by the swap-with-last removal bug."""
    import math
    M64 = (1 << 64) - 1
    means, sds = [], []
    for d in range(len(ds.pe_files)):
        sizes = []
        for i in range(1, ds.number_of_unique_reads + 1):
            for mp in ds.mate_pair_lists[i]:
                if mp.dataset != d:
                    continue
                e1 = ds.edges_forward[i] + ds.edges_reverse[i]
                l1 = ds.loc_forward[i] + ds.loc_reverse[i]
                r2 = mp.mate_id
                e2 = ds.edges_forward[r2] + ds.edges_reverse[r2]
                l2 = ds.loc_forward[r2] + ds.loc_reverse[r2]
                for k in range(len(e1)):
                    for ll in range(len(e2)):
                        if (e1[k] is e2[ll] and l1[k] > l2[ll]
                                and l1[k] - l2[ll] < 1000):
                            sizes.append(l1[k] - l2[ll])
        if not sizes:
            means.append(0)
            sds.append(0)
            continue
        mean = sum(sizes) // len(sizes)
        var = 0
        for s in sizes:
            dev = (mean - s) & M64
            var = (var + dev * dev) & M64
        means.append(mean)
        sds.append(int(math.sqrt(var // len(sizes))))
    return means, sds


def test_insert_size_reads_materialized_location_lists(tmp_path):
    """The vectorized insert-size estimator must read the materialized
    per-read location lists (the reference's scan, OverlapGraph.cpp:
    1149-1161, concatenates exactly those), not re-derive the index from
    live adj edges: an entry for a dead (removed) edge still counts."""
    import os
    from metagenomics_tpu.config import AssemblerConfig
    from metagenomics_tpu.dataset import Dataset
    from metagenomics_tpu.graph import OverlapGraph
    from metagenomics_tpu.graph.core import Edge
    from metagenomics_tpu.index import OverlapIndex

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "golden", "data", "pe_small.fasta")
    quiet = lambda *a, **k: None
    ds = Dataset([path], [], 40, log=quiet)
    cfg = AssemblerConfig(min_overlap=40, paired_end_files=[path])
    graph = OverlapGraph(ds, cfg, log=quiet)
    graph.build_from_index(OverlapIndex(ds, 40))

    def run():
        graph.mean_of_insert_sizes = []
        graph.sd_of_insert_sizes = []
        graph.calculate_mean_and_sd_of_insert_size()
        return list(graph.mean_of_insert_sizes), list(graph.sd_of_insert_sizes)

    base = run()
    assert base == _scalar_insert_size(ds)

    # plant a dangling entry for a dead edge on both sides of a mate pair;
    # the reference's per-read scan counts it, a live-edge rebuild cannot
    r1 = next(i for i in range(1, ds.number_of_unique_reads + 1)
              if ds.mate_pair_lists[i])
    r2 = ds.mate_pair_lists[r1][0].mate_id
    for k in range(30):
        dead = Edge(graph, r1, r2, 1, 400)
        ds.edges_forward[r1].append(dead)
        ds.loc_forward[r1].append(999)
        ds.edges_reverse[r2].append(dead)
        ds.loc_reverse[r2].append(0)
    mutated = run()
    assert mutated == _scalar_insert_size(ds)
    assert mutated != base  # the planted entry changed the statistics


def test_batch_find_ids_matches_scalar_and_raises(tmp_path):
    path = _toy_pe_dataset(tmp_path)
    ds = Dataset([path], [], 40, log=lambda *a, **k: None)
    n = ds.number_of_unique_reads
    # every dataset read must be found at its own id
    q = ds.sort_limbs.astype(np.uint64)
    ids = ds._batch_find_ids(q)
    np.testing.assert_array_equal(ids, np.arange(1, n + 1))
    # a missing key raises like getReadFromString (Dataset.cpp:454)
    bad = q[:1].copy()
    bad[0, -1] ^= np.uint64(1)
    with pytest.raises(KeyError):
        ds._batch_find_ids(bad)


def _load(tmp_path, content, name="f.fasta"):
    p = tmp_path / name
    p.write_bytes(content)
    ds = Dataset([], [str(p)], 5, log=lambda *a, **k: None)
    return [ds.read_strs[i].decode()
            for i in range(1, ds.number_of_unique_reads + 1)]


def test_fast_fasta_matches_stream_parser(tmp_path):
    """The byte-level 2-line FASTA path and the stream parser must load the
    same canonical read set; deviant layouts must fall back cleanly."""
    two_line = b">a\nACGTACGTAC\n>b\nGGGTTTACCA\n"
    lower = b">a\nacgtacgtac\n>b\nggGtttACca\n"
    multi_line = b">a\nACGTA\nCGTAC\n>b\nGGGTTTACCA\n"
    no_trailing_nl = b">a\nACGTACGTAC\n>b\nGGGTTTACCA"
    base = _load(tmp_path, two_line, "a.fasta")
    assert base  # loaded something
    assert _load(tmp_path, lower, "b.fasta") == base
    # multi-line concatenates to the same sequences via the fallback
    assert _load(tmp_path, multi_line, "c.fasta") == base
    assert _load(tmp_path, no_trailing_nl, "d.fasta") == base
    # scan must reject the multi-line layout (fallback, not fast path)
    assert Dataset._scan_two_line_fasta(str(tmp_path / "c.fasta")) is None
    assert Dataset._scan_two_line_fasta(str(tmp_path / "a.fasta")) is not None
    # FASTQ: the 4-line fast path must load the same reads as the stream
    # parser (which appends the reference's phantom empty record)
    fq = b"@a\nACGTACGTAC\n+\nIIIIIIIIII\n@b\nGGGTTTACCA\n+\nIIIIIIIIII\n"
    (tmp_path / "q.fastq").write_bytes(fq)
    assert Dataset._scan_four_line_fastq(str(tmp_path / "q.fastq")) \
        is not None
    ds_q = Dataset([], [str(tmp_path / "q.fastq")], 5,
                   log=lambda *a, **k: None)
    strs_q = sorted(ds_q.read_strs[i].decode()
                    for i in range(1, ds_q.number_of_unique_reads + 1))
    assert strs_q == sorted(base)
    assert ds_q.number_of_reads == 2   # phantom record counted bad
    # deviant line counts (5-line record) must fall back
    bad_fq = b"@a\nACGT\n+\nIIII\nextra\n"
    (tmp_path / "b.fastq").write_bytes(bad_fq)
    assert Dataset._scan_four_line_fastq(str(tmp_path / "b.fastq")) is None
    # '>' embedded mid-line splits the record under the reference's
    # getline(file, '>') parse — the fast path must reject and fall back
    embedded = b">a\nAC>GT\n>b\nGGGTTTACCA\n"
    (tmp_path / "e.fasta").write_bytes(embedded)
    assert Dataset._scan_two_line_fasta(str(tmp_path / "e.fasta")) is None
    ds_e = Dataset([], [str(tmp_path / "e.fasta")], 2,
                   log=lambda *a, **k: None)
    strs = sorted(ds_e.read_strs[i].decode()
                  for i in range(1, ds_e.number_of_unique_reads + 1))
    # reference semantics: record 1 = "AC", the rest of the line becomes
    # record 2's header and "GGGTTTACCA" its sequence
    assert "GGGTTTACCA" in strs or "TGGTAAACCC" in strs
    assert not any(">" in s for s in strs)


def test_lex_order_matches_full_lexsort():
    """The two-stage sort must reproduce np.lexsort over all limbs exactly,
    including stability for fully-duplicate rows."""
    rng = np.random.default_rng(12)
    n = 1 << 17
    nlimb = 7
    limbs = rng.integers(0, 1 << 63, (n, nlimb), dtype=np.int64) \
        .astype(np.uint64)
    # force heavy (limb0, limb1) collisions and exact duplicates
    limbs[:, 0] = rng.integers(0, 8, n).astype(np.uint64)
    limbs[: n // 4, 1] = rng.integers(0, 4, n // 4).astype(np.uint64)
    limbs[n // 2:n // 2 + 5000] = limbs[:5000]          # duplicates
    got = Dataset._lex_order(limbs)
    want = np.lexsort(tuple(limbs[:, k] for k in range(nlimb - 1, -1, -1)))
    np.testing.assert_array_equal(limbs[got], limbs[want])
    # stability: identical rows keep ascending original index order
    sorted_limbs = limbs[got]
    eq = (sorted_limbs[1:] == sorted_limbs[:-1]).all(axis=1)
    runs = np.flatnonzero(eq)
    assert (got[runs] < got[runs + 1]).all()

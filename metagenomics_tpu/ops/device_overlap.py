"""Fully device-resident overlap detection: hash -> join -> verify -> compact.

This is the hot path of the assembler (the reference's insertDataset +
insertAllEdgesOfRead probe loops, HashTable.cpp:50-104 and
OverlapGraph.cpp:529-565) re-designed TPU-first:

* reads are uploaded ONCE as 2-bit packed uint32 words (16 bases/word,
  ~1/8 the bytes of the code arrays); the reverse complement and the uint8
  code views are derived on device,
* window keys come from a rolling polynomial hash (Pallas tile kernel on
  TPU, lax.scan elsewhere; bit-identical, tests/test_ops.py),
* the 4-entries-per-read index is sorted on device (stable, so buckets keep
  the reference's (read id, orient) order),
* a branchless vectorized binary search counts the hits of every
  (read, position) probe; ONE scalar comes back to the host to size the
  emission buffer (no capacity-doubling retries),
* candidate expansion is a scatter + cummax (no per-slot binary search),
* overlap AND containment verification compare 2-bit packed words — two
  row gathers and a shifted XOR per candidate instead of per-base gathers,
* survivors are compacted (stable, so the stream stays in the reference's
  discovery order: read asc, position asc, bucket order) and downloaded as
  a packed (r2:int32, meta:uint16) stream plus per-read counts — the exact
  input of the threaded native replay (native/mg_native.cpp mg_build_stream).

Hash collisions are harmless: verification compares the full window
including the seed, so the accepted candidate set is exactly the
reference's.  Work is tiled into row chunks whose candidate totals fit a
fixed-capacity buffer, so each (queries, cap) tier compiles once and
chunk downloads overlap the next chunk's compute via async dispatch.

meta layout (uint16): bits 0-1 edge orientation, bit 2 edge_ok,
bit 3 cont_ok, bits 4-15 overlap offset (lengths < 4096 enforced).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .overlap import CandidateBatch

# numpy scalars on purpose: module-level jnp constants would initialize the
# XLA backend at import time (breaks jax.distributed.initialize ordering)
_B1 = np.uint32(0x01000193)     # FNV prime
_B2 = np.uint32(0x9E3779B1)     # golden-ratio odd constant
_M1 = np.uint32(0x85EBCA6B)
_M2 = np.uint32(0xC2B2AE35)

PAD_HASH = np.uint32(0xFFFFFFFF)


def _pow_u32(base: int, exp: int) -> int:
    return pow(base, exp, 1 << 32)


@partial(jax.jit, static_argnames=("hash_len",))
def window_hashes_u32(codes, hash_len):
    """[N, npos] uint32 window hashes via two rolling polynomial hashes."""
    n, lmax = codes.shape
    l = hash_len
    c = (codes.astype(jnp.uint32) & 3) + 1   # avoid zero-absorbing prefixes

    def roll(base):
        def step(carry, col):
            h = carry * base + col
            return h, h
        cols = jnp.transpose(c)              # [lmax, n]
        h0 = jnp.zeros((n,), jnp.uint32)
        _, hs = jax.lax.scan(step, h0, cols)
        # prefix hashes H[p] = hash of c[:, :p+1]; prepend zero row
        return jnp.concatenate([jnp.zeros((1, n), jnp.uint32), hs], axis=0)

    h1 = roll(_B1)                           # [lmax+1, n]
    h2 = roll(_B2)
    p1 = jnp.uint32(_pow_u32(0x01000193, l))
    p2 = jnp.uint32(_pow_u32(0x9E3779B1, l))
    npos = lmax - l + 1
    w1 = h1[l:l + npos] - h1[:npos] * p1     # [npos, n]
    w2 = h2[l:l + npos] - h2[:npos] * p2
    mixed = w1 * _M1 ^ w2 * _M2
    return jnp.transpose(mixed)              # [n, npos]


@partial(jax.jit, static_argnames=("hash_len",))
def _index_kernel(hf, hr, lengths, hash_len):
    """Sorted (hash, rid, orient) index from the per-read window hashes."""
    n = hf.shape[0] - 1                      # row 0 is the unused dummy
    suf = (lengths[1:] - hash_len).astype(jnp.int32)
    rows = jnp.arange(1, n + 1)
    k0 = hf[1:, 0]
    k1 = jnp.take_along_axis(hf[1:], suf[:, None], axis=1)[:, 0]
    k2 = hr[1:, 0]
    k3 = jnp.take_along_axis(hr[1:], suf[:, None], axis=1)[:, 0]
    keys = jnp.stack([k0, k1, k2, k3], axis=1).reshape(-1)   # (rid, orient)
    rid = jnp.repeat(rows.astype(jnp.int32), 4)
    orient = jnp.tile(jnp.arange(4, dtype=jnp.int32), n)
    sk, srid, sorient = jax.lax.sort((keys, rid, orient), num_keys=1,
                                     is_stable=True)
    # run-length table aligned to each run's FIRST element: a query q with
    # left = lower_bound(sk, q) hits a bucket iff sk[left] == q, and the
    # bucket size is run_len[left] — one binary search per query instead of
    # left+right pairs.
    m = sk.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    is_new = jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]])
    start_next = jnp.where(is_new, idx, m)
    # next run start strictly after each position: reverse cumulative min of
    # start positions, shifted left by one
    rev_cummin = jnp.flip(jax.lax.cummin(jnp.flip(
        jnp.concatenate([start_next[1:], jnp.array([m], jnp.int32)]))))
    run_len = jnp.where(is_new, rev_cummin - idx, 0).astype(jnp.int32)
    return sk, srid, sorient, run_len


# --------------------------------------------------------------- bit packing

def pack_codes_host(codes):
    """2-bit pack [n, lmax] uint8 codes into [n, ceil(lmax/16)] uint32 words
    (LSB-first lanes).  Pad columns (PAD_CODE) pack as base 0 ('A'): the
    window hash maps both to the same symbol and verification masks to the
    compared length, so the padding value is immaterial."""
    n, lmax = codes.shape
    w = (lmax + 15) // 16
    c = np.zeros((n, 16 * w), np.uint32)
    c[:, :lmax] = codes & 3
    lanes = c.reshape(n, w, 16)
    sh = (2 * np.arange(16, dtype=np.uint32))[None, None, :]
    return (lanes << sh).sum(axis=2, dtype=np.uint32)


@partial(jax.jit, static_argnames=("lmax",))
def _unpack_codes(words, lmax):
    """Inverse of pack_codes_host: [n, w] uint32 -> [n, lmax] uint8 in 0..3
    (padding positions read as 0)."""
    n, w = words.shape
    sh = (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
    lanes = (words[:, :, None] >> sh) & 3
    return lanes.reshape(n, 16 * w)[:, :lmax].astype(jnp.uint8)


@jax.jit
def _rc_codes(codes, lengths):
    """Reverse complement of uint8 code rows (positions >= length -> 0)."""
    lmax = codes.shape[1]
    k = jnp.arange(lmax)[None, :]
    src = jnp.clip(lengths[:, None] - 1 - k, 0, lmax - 1).astype(jnp.int32)
    g = jnp.take_along_axis(codes, src, axis=1)
    return jnp.where(k < lengths[:, None], 3 - g, 0).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("w",))
def _pack_codes_device(codes, w):
    n, lmax = codes.shape
    c = jnp.pad(codes.astype(jnp.uint32) & 3, ((0, 0), (0, 16 * w - lmax)))
    lanes = c.reshape(n, w, 16)
    sh = (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
    return (lanes << sh).sum(axis=2, dtype=jnp.uint32)


# ------------------------------------------------------------------- kernels

@partial(jax.jit, static_argnames=("tbits",))
def _range_table(keys_p2, tbits):
    """rtab[b] = lower_bound(keys, b << (32-tbits)) over the top tbits of the
    sorted key array, plus the widest bucket span (controls bisection depth)."""
    bkt = (keys_p2 >> jnp.uint32(32 - tbits)).astype(jnp.int32)
    bounds = jnp.arange((1 << tbits) + 1, dtype=jnp.int32)
    rtab = jnp.searchsorted(bkt, bounds, side="left").astype(jnp.int32)
    return rtab, jnp.max(jnp.diff(rtab))


@partial(jax.jit, static_argnames=("hash_len", "rounds"))
def _probe_counts(hf, lengths, keys_p2, run_len_p2, rtab, hash_len, rounds):
    """Hit position + bucket size for every (read, j) probe.

    keys_p2 is the sorted index hash array padded with PAD_HASH (run_len_p2
    zero-padded).  rtab is a prefix range table over the top bits of the
    hash: rtab[b] = first index whose key >= b << S, so each query's
    lower_bound is confined to [rtab[b], rtab[b+1]) and needs only `rounds`
    branchless bisection rounds (rounds >= ceil(log2(max span))) — a few
    big-vector gathers instead of log2(index) of them.  Returns (left,
    counts, row_totals); only row_totals ([n+1] int32) crosses to the host.
    """
    n1, npos = hf.shape
    l = hash_len
    q = hf.reshape(-1)
    jj = jnp.arange(npos, dtype=jnp.int32)[None, :]
    valid = (jj >= 1) & (jj < (lengths[:, None] - l))
    tbits = (rtab.shape[0] - 1).bit_length() - 1
    shift = jnp.uint32(32 - tbits)
    b = (q >> shift).astype(jnp.int32)
    pos = rtab[b]
    hi = rtab[b + 1]
    step = jnp.int32(1 << (rounds - 1))
    for _ in range(rounds):                  # unrolled branchless bisection
        cand = pos + step
        v = keys_p2[jnp.minimum(cand, hi) - 1]
        pos = jnp.where((cand <= hi) & (v < q), cand, pos)
        step = step >> 1
    safe = jnp.minimum(pos, keys_p2.shape[0] - 1)
    hit = keys_p2[safe] == q
    counts = jnp.where(valid.reshape(-1) & hit, run_len_p2[safe], 0)
    return pos, counts, counts.reshape(n1, npos).sum(axis=1, dtype=jnp.int32)


def _expand_verify(packed2, lengths, left, counts, sorted_rid, sorted_orient,
                   row0, hash_len, cap, npos, w, wp, check_cont):
    """Shared expand + verify core (traced inside _emit_kernel and the
    sharded mesh kernel, parallel/sharded.py).

    left/counts are the probe results for a flat local query block whose
    first query is position 0 of global read row `row0`; sorted_rid/orient
    may be a key-range shard of the index (left indexes into them).
    Returns per-slot (keep, r1, r2, qidx, fe, eoff) with qidx the LOCAL
    query index of each candidate.
    """
    l = hash_len
    nq = left.shape[0]
    nrows = packed2.shape[0] // 2

    # ---- expansion: scatter each probe's first slot, fill with cummax ----
    cum = jnp.cumsum(counts, dtype=jnp.int32)
    total = cum[-1]
    starts = cum - counts
    qi = jnp.arange(nq, dtype=jnp.int32)
    dest = jnp.where(counts > 0, starts, cap)
    seed = jnp.zeros((cap,), jnp.int32).at[dest].max(qi, mode="drop")
    qidx = jax.lax.cummax(seed)
    k = jnp.arange(cap, dtype=jnp.int32)
    in_range = k < total
    within = k - starts[qidx]
    src = jnp.clip(left[qidx] + within, 0, sorted_rid.shape[0] - 1)
    r2 = sorted_rid[src]
    orient = sorted_orient[src]
    r1 = row0 + qidx // npos
    j = qidx - (qidx // npos) * npos

    len1 = lengths[r1]
    len2 = lengths[r2]
    is_pre = (orient == 0) | (orient == 2)

    # ---- packed-word window comparison ----------------------------------
    rows1 = packed2[r1]                                        # [cap, wp]
    rows2 = packed2[jnp.where(orient <= 1, r2, r2 + nrows)]

    def extract(rows, s):
        """16-base words of the row starting at base offset s (w words)."""
        qw = (s >> 4).astype(jnp.int32)
        idx = jnp.clip(qw[:, None] + jnp.arange(w + 1, dtype=jnp.int32),
                       0, wp - 1)
        x = jnp.take_along_axis(rows, idx, axis=1)             # [cap, w+1]
        sh = ((s & 15) << 1).astype(jnp.uint32)[:, None]
        lo = x[:, :w]
        hi = x[:, 1:]
        spill = jnp.where(sh == 0, jnp.uint32(0),
                          hi << ((jnp.uint32(32) - sh) & jnp.uint32(31)))
        return (lo >> sh) | spill

    wk16 = 16 * jnp.arange(w, dtype=jnp.int32)[None, :]

    def windows_equal(s1, s2, m):
        x = extract(rows1, s1) ^ extract(rows2, s2)
        nb = jnp.clip(m[:, None] - wk16, 0, 16)
        mask = jnp.where(
            nb >= 16, jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << (2 * nb).astype(jnp.uint32)) - jnp.uint32(1))
        return ((x & mask) == 0).all(axis=1)

    # edge mode (checkOverlap, OverlapGraph.cpp:354-383; seed included)
    ok_e = jnp.where(is_pre, len1 - j < len2, len2 - l >= j)
    s1_e = jnp.where(is_pre, j, 0)
    s2_e = jnp.clip(jnp.where(is_pre, 0, len2 - l - j), 0, None)
    m_e = jnp.where(ok_e, jnp.where(is_pre, len1 - j, j + l), 0)
    edge_ok = ok_e & windows_equal(s1_e, s2_e, m_e)

    if check_cont:
        # containment mode (checkOverlapForContainedRead, :302-340)
        m2 = len2 - l
        ok_c = jnp.where(is_pre, len1 - j - l >= m2, j >= m2) & (len1 > len2)
        s1_c = jnp.clip(jnp.where(is_pre, j, j - m2), 0, None)
        m_c = jnp.where(ok_c, len2, 0)
        cont_ok = ok_c & windows_equal(s1_c, jnp.zeros_like(s1_c), m_c)
    else:
        cont_ok = jnp.zeros_like(edge_ok)

    # edge orientation/offset derivation (OverlapGraph.cpp:550-557)
    eo = jnp.where(orient == 0, 3,
         jnp.where(orient == 1, 0,
         jnp.where(orient == 2, 2, 1)))
    eoff = jnp.where(is_pre, j, len1 - l - j)
    fe = (eo | (edge_ok.astype(jnp.int32) << 2)
          | (cont_ok.astype(jnp.int32) << 3))
    keep = in_range & (edge_ok | cont_ok)
    return keep, r1, r2, qidx, fe, eoff


@partial(jax.jit,
         static_argnames=("hash_len", "nq", "cap", "npos", "w", "wp",
                          "check_cont", "off_bits"))
def _emit_kernel(packed2, lengths, left_pad, counts_pad, sorted_rid,
                 sorted_orient, q0, nq_real, hash_len, nq, cap, npos, w, wp,
                 check_cont, off_bits):
    """Expand + verify + compact one query window [q0, q0+nq_real).

    packed2 = [2*(n+1), wp] uint32: forward rows then reverse rows, each
    2-bit packed with wp >= 2w+1 columns (shift spill padding).  Emits the
    survivor stream for the window compacted to the front of cap-sized
    buffers plus per-read survivor counts and the kept total.

    nq is the static tier size of the slice; nq_real (dynamic scalar) is the
    chunk's true query count — counts beyond it are zeroed so the
    tier-rounded window never double-emits the next chunk's rows.
    """
    nrows = packed2.shape[0] // 2
    left = jax.lax.dynamic_slice(left_pad, (q0,), (nq,))
    counts = jax.lax.dynamic_slice(counts_pad, (q0,), (nq,))
    counts = jnp.where(jnp.arange(nq, dtype=jnp.int32) < nq_real, counts, 0)
    keep, r1, r2, _, fe, eoff = _expand_verify(
        packed2, lengths, left, counts, sorted_rid, sorted_orient,
        q0 // npos, hash_len, cap, npos, w, wp, check_cont)

    # ---- stable compaction + per-read survivor counts --------------------
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dst = jnp.where(keep, pos, cap)
    n_keep = jnp.where(keep.any(), pos[-1] + 1, 0)
    keep_counts = jnp.zeros((nrows,), jnp.int32).at[
        jnp.clip(r1, 0, nrows - 1)].add(keep.astype(jnp.int32), mode="drop")
    if off_bits >= 0:
        # single uint32 word per survivor: [r2 | fe:4 | eoff:off_bits]
        word = ((r2.astype(jnp.uint32) << (4 + off_bits))
                | (fe.astype(jnp.uint32) << off_bits)
                | jnp.clip(eoff, 0, (1 << off_bits) - 1).astype(jnp.uint32))
        out = jnp.zeros((cap,), jnp.uint32).at[dst].set(word, mode="drop")
        return out, keep_counts, n_keep
    meta = (fe | (eoff << 4)).astype(jnp.uint16)
    r2_out = jnp.zeros((cap,), jnp.int32).at[dst].set(r2, mode="drop")
    meta_out = jnp.zeros((cap,), jnp.uint16).at[dst].set(meta, mode="drop")
    return (r2_out, meta_out), keep_counts, n_keep


def _tier(x, lo=1 << 16):
    """Smallest of {2^k, 3*2^(k-1)} >= x: bounds compile tiers to ~2/octave."""
    t = lo
    while t < x:
        t2 = t + (t >> 1)
        if t2 >= x:
            return t2
        t *= 2
    return t


class DeviceOverlapPipeline:
    """Host orchestration of the device overlap pipeline.

    Produces the packed survivor stream consumed by the native threaded
    replay (graph/build.py build_from_pipeline): per-read counts, r2 ids and
    uint16 meta words in reference discovery order.
    """

    MAX_CAP = 1 << 23      # upper bound on a chunk's candidate buffer

    def __init__(self, dataset, min_overlap, chunk_rows=None):
        self.ds = dataset
        self.hash_len = min_overlap - 1
        ds = dataset
        lmax = ds.codes_fwd.shape[1]
        if lmax >= 4096:
            raise ValueError("read length >= 4096 unsupported by meta packing")
        self.lmax = lmax
        self.w = (lmax + 15) // 16
        self.wp = 2 * self.w + 1
        self.lengths = jnp.asarray(ds.lengths.astype(np.int32))

        pf = jnp.asarray(pack_codes_host(ds.codes_fwd))   # the ONE upload
        codes_fwd = _unpack_codes(pf, lmax)
        codes_rev = _rc_codes(codes_fwd, self.lengths)
        pr = _pack_codes_device(codes_rev, self.w)
        pad = ((0, 0), (0, self.wp - self.w))
        self.packed2 = jnp.concatenate(
            [jnp.pad(pf, pad), jnp.pad(pr, pad)], axis=0)

        self.hf = self._window_hashes(codes_fwd)
        hr = self._window_hashes(codes_rev)
        sk, srid, sorient, run_len = _index_kernel(
            self.hf, hr, self.lengths, self.hash_len)
        m = sk.shape[0]
        p2 = 1 << max(1, (m - 1).bit_length())
        self.keys_p2 = jnp.concatenate(
            [sk, jnp.full((p2 - m,), PAD_HASH, jnp.uint32)])
        self.run_len_p2 = jnp.concatenate(
            [run_len, jnp.zeros((p2 - m,), jnp.int32)])
        self.sorted_rid = srid
        self.sorted_orient = sorient

        # prefix range table over the top tbits of the hash: rtab[b] =
        # lower_bound(keys, b << (32-tbits)); confines every probe's binary
        # search to one bucket span so the bisection needs only
        # bit_length(max span) rounds instead of log2(p2).  Built on device
        # (bucket ids of sorted keys are themselves sorted); only the scalar
        # max span crosses to the host.
        tbits = min(20, max(1, m.bit_length()))
        self.rtab, max_span = _range_table(self.keys_p2, tbits)
        self.rounds = max(1, int(max_span).bit_length())

        # survivor packing: one uint32 word per survivor when
        # (r2 bits + 4 flag/orient bits + offset bits) fit, else the
        # (r2 int32, meta uint16) pair — 6 bytes.  The packed word layout is
        # [r2 | edge_ok/cont_ok/eo (4b) | eoff (off_bits)].
        n = self.hf.shape[0] - 1
        bits_r2 = max(1, n.bit_length())
        bits_off = max(1, (lmax - min_overlap + 1).bit_length())
        self.off_bits = bits_off if bits_r2 + 4 + bits_off <= 32 else -1

    def _window_hashes(self, codes):
        """Window-hash kernel selection: the Pallas tile kernel on TPU
        (bit-identical, one HBM round-trip, ~15x faster compile than the
        unrolled scan), the jnp scan elsewhere."""
        import os
        if (jax.default_backend() == "tpu"
                and not os.environ.get("MGTPU_NO_PALLAS")):
            try:
                from .pallas_hash import window_hashes_pallas
                return window_hashes_pallas(codes, self.hash_len)
            except Exception:
                pass
        return window_hashes_u32(codes, self.hash_len)

    def stream(self, check_cont=True, download=True):
        """Survivor stream in reference discovery order (read asc, j asc,
        bucket order): (counts [n+1] int64, r2 int32, meta uint16).

        download=False executes the full device pipeline (probe + expand +
        verify + compact) but skips the bulk host transfers, forcing each
        chunk only through its n_keep scalar — the device-compute-only
        measurement mode (bench.py)."""
        npos = self.hf.shape[1]
        n1 = self.hf.shape[0]
        left, counts, row_totals = _probe_counts(
            self.hf, self.lengths, self.keys_p2, self.run_len_p2,
            self.rtab, self.hash_len, self.rounds)
        row_tot = np.asarray(row_totals).astype(np.int64)

        # row chunks whose candidate totals fit one fixed-cap buffer
        grand = int(row_tot.sum())
        cap = min(_tier(max(grand, 1)), self.MAX_CAP)
        cap = max(cap, int(row_tot.max()) if n1 else 1)
        bounds = [0]
        acc = 0
        for r in range(n1):
            if acc + row_tot[r] > cap and bounds[-1] != r:
                bounds.append(r)
                acc = 0
            acc += row_tot[r]
        bounds.append(n1)

        # zero-pad flat probe arrays once so every chunk's static-size
        # dynamic_slice stays in bounds
        maxq = max((bounds[i + 1] - bounds[i]) * npos
                   for i in range(len(bounds) - 1))
        nq_tier = _tier(maxq)
        left_pad = jnp.concatenate(
            [left, jnp.zeros((nq_tier,), jnp.int32)])
        counts_pad = jnp.concatenate(
            [counts, jnp.zeros((nq_tier,), jnp.int32)])

        # dispatch every chunk (async), device-accumulate the per-read
        # survivor counts, then fetch: all n_keep scalars in one sweep,
        # tier-sliced survivor buffers through a small thread pool (the
        # host link pipelines concurrent fetches), counts once.
        outs = []
        kc_total = None
        for i in range(len(bounds) - 1):
            q0 = bounds[i] * npos
            nq_real = (bounds[i + 1] - bounds[i]) * npos
            assert int(row_tot[bounds[i]:bounds[i + 1]].sum()) <= cap
            out, kc, n_keep = _emit_kernel(
                self.packed2, self.lengths, left_pad, counts_pad,
                self.sorted_rid, self.sorted_orient, q0,
                np.int32(nq_real), self.hash_len,
                nq_tier, cap, npos, self.w, self.wp, check_cont,
                self.off_bits)
            outs.append((out, n_keep))
            kc_total = kc if kc_total is None else kc_total + kc

        n_keeps = [int(nk) for _, nk in outs]
        if not download:
            return None
        slices = []
        for (out, _), nk in zip(outs, n_keeps):
            if nk == 0:
                continue
            if self.off_bits >= 0:
                sl = min(_tier(nk, lo=1 << 12), out.shape[0])
                slices.append((out[:sl], nk))
            else:
                sl = min(_tier(nk, lo=1 << 12), out[0].shape[0])
                slices.append(((out[0][:sl], out[1][:sl]), nk))

        import concurrent.futures as cf
        def fetch(item):
            buf, nk = item
            if self.off_bits >= 0:
                return np.asarray(buf)[:nk]
            return np.asarray(buf[0])[:nk], np.asarray(buf[1])[:nk]
        if len(slices) > 1:
            with cf.ThreadPoolExecutor(min(4, len(slices))) as ex:
                parts = list(ex.map(fetch, slices))
        else:
            parts = [fetch(s) for s in slices]
        keep_counts = np.asarray(kc_total).astype(np.int64)

        if self.off_bits >= 0:
            packed = (np.concatenate(parts) if parts
                      else np.zeros(0, np.uint32))
            ob = self.off_bits
            r2 = (packed >> np.uint32(4 + ob)).astype(np.int32)
            meta = ((((packed >> np.uint32(ob)) & np.uint32(15))
                     | ((packed & np.uint32((1 << ob) - 1)) << np.uint32(4)))
                    .astype(np.uint16))
        elif parts:
            r2 = np.concatenate([p[0] for p in parts])
            meta = np.concatenate([p[1] for p in parts])
        else:
            r2 = np.zeros(0, np.int32)
            meta = np.zeros(0, np.uint16)
        return keep_counts, r2, meta

    def candidates(self, check_cont=True):
        """Back-compat view of stream(): (CandidateBatch, edge_orient,
        edge_offset, edge_ok, cont_ok) with j unset (the downstream replay
        never uses j; offsets are derived in-kernel)."""
        counts, r2, meta = self.stream(check_cont)
        r1 = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        eo = (meta & 3).astype(np.int64)
        edge_ok = ((meta >> 2) & 1).astype(bool)
        cont_ok = ((meta >> 3) & 1).astype(bool)
        eoff = (meta >> 4).astype(np.int64)
        batch = CandidateBatch(
            r1=r1, j=np.zeros_like(r1),
            r2=r2.astype(np.int64), orient=np.zeros(len(r1), np.uint8))
        return batch, eo, eoff, edge_ok, cont_ok

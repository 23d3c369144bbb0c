"""SPMD overlap-detection over a ("dp", "ix") device mesh via shard_map.

This is the scaling path for the assembler's hot phase (the reference's
single-threaded probe loop, HashTable.cpp:202-221 + OverlapGraph.cpp:529-565,
re-expressed as an SPMD join): read/query batches are data-parallel over
"dp", the sorted l-mer index is sharded by position range over "ix", every
(dp, ix) device pair probes its query block against its index slice, local
survivors are verified in place (packed-word compares against the replicated
read matrix) and exchanged over the "ix" axis with all_gather; an on-device
stable merge sort restores the reference's global discovery order before a
single per-dp-shard stream crosses to the host.

ShardedOverlapPipeline is interface-compatible with
ops.device_overlap.DeviceOverlapPipeline (same stream() contract), so the
assembler's native threaded replay consumes either.  Scale notes: the read
matrix is replicated (2-bit packed, ~n*L/4 bytes — ring-exchange over "ix"
is the next step beyond HBM capacity); hit counts/canonicalization helpers
below are the original single-kernel building blocks kept for the dry-run
and unit tests.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.packing import PAD_CODE


def shard_map(f, mesh, in_specs, out_specs):
    return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)

# numpy scalar on purpose: a module-level jnp constant would initialize the
# XLA backend at import time, breaking jax.distributed.initialize ordering
PAD_KEY = np.uint32(0xFFFFFFFF)


def _rc_local(codes, lengths):
    lmax = codes.shape[1]
    k = jnp.arange(lmax)[None, :]
    src = jnp.clip(lengths[:, None] - 1 - k, 0, lmax - 1)
    g = jnp.take_along_axis(codes, src.astype(jnp.int32), axis=1)
    return jnp.where(k < lengths[:, None], 3 - g, PAD_CODE).astype(jnp.uint8)


def _canonical_local(codes, lengths):
    rc = _rc_local(codes, lengths)
    neq = codes != rc
    lmax = codes.shape[1]
    first = jnp.where(neq.any(axis=1), jnp.argmax(neq, axis=1), lmax)
    idx = jnp.clip(first, 0, lmax - 1)
    av = jnp.take_along_axis(codes, idx[:, None], axis=1)[:, 0]
    bv = jnp.take_along_axis(rc, idx[:, None], axis=1)[:, 0]
    fwd_less = (first < lmax) & (av < bv)
    return jnp.where(fwd_less[:, None], codes, rc).astype(jnp.uint8)


def _query_keys_local(codes, lengths, hash_len):
    """All l-mer keys (2-bit packed into uint32, requires hash_len <= 16) for
    every interior position of every read; invalid positions get PAD_KEY.
    Returns [n * npos] with npos = lmax - hash_len."""
    n, lmax = codes.shape
    l = hash_len
    npos = max(lmax - l, 1)
    win = jnp.clip(jnp.arange(npos)[:, None] + jnp.arange(l)[None, :],
                   0, lmax - 1)                      # [npos, l]
    windows = codes[:, win]                          # [n, npos, l]
    pow4 = (jnp.uint32(1) << (2 * jnp.arange(l - 1, -1, -1)).astype(jnp.uint32))
    keys = (windows.astype(jnp.uint32) * pow4[None, None, :]).sum(
        axis=-1, dtype=jnp.uint32)                   # [n, npos]
    j = jnp.broadcast_to(jnp.arange(npos)[None, :], (n, npos))
    valid = (j >= 1) & (j < lengths[:, None] - l)
    return jnp.where(valid, keys, PAD_KEY).reshape(n * npos)


def sharded_qc_canonicalize(mesh, codes, lengths, min_overlap: int):
    """QC + canonicalize, reads sharded over dp (pure data parallel)."""

    def kernel(c, ln):
        valid = jnp.arange(c.shape[1])[None, :] < ln[:, None]
        ok = jnp.where(valid, c <= 3, True).all(axis=1)
        counts = jnp.stack(
            [jnp.where(valid, c == b, False).sum(axis=1) for b in range(4)], 1)
        thr = jnp.trunc(ln.astype(jnp.float32) * 0.8).astype(counts.dtype)
        good = ok & (counts < thr[:, None]).all(axis=1) & (ln > min_overlap)
        return _canonical_local(c, ln), good

    f = shard_map(kernel, mesh=mesh,
                  in_specs=(P("dp", None), P("dp")),
                  out_specs=(P("dp", None), P("dp")))
    return jax.jit(f)(codes, lengths)


def sharded_overlap_counts(mesh, sorted_index_keys, query_keys):
    """Per-query hit counts: queries dp-sharded, index ix-sharded, partial
    counts psum'ed over the ix axis."""

    def kernel(idx_shard, q):
        idx = idx_shard.reshape(-1)
        left = jnp.searchsorted(idx, q, side="left")
        right = jnp.searchsorted(idx, q, side="right")
        cnt = (right - left).astype(jnp.int32)
        cnt = jnp.where(q == PAD_KEY, 0, cnt)
        return jax.lax.psum(cnt, "ix")

    f = shard_map(kernel, mesh=mesh,
                  in_specs=(P("ix"), P("dp")),
                  out_specs=P("dp"))
    return jax.jit(f)(sorted_index_keys, query_keys)


def assembly_step(mesh, codes, lengths, sorted_index_keys, hash_len: int,
                  min_overlap: int):
    """One full SPMD step of the overlap-detection pipeline: QC +
    canonicalization (dp), l-mer key extraction (dp), index probe counts
    (dp x ix join, psum over ix), global candidate total (psum over dp).

    This is the "training step" analog the multi-chip dry-run compiles: it
    exercises dp sharding, index (tensor-analog) sharding and both collective
    axes in one jitted program.
    """

    def kernel(c, ln, idx_shard):
        canon, good = _qc_canon(c, ln, min_overlap)
        keys = _query_keys_local(canon, ln, hash_len)
        npos = keys.shape[0] // c.shape[0]
        keys = jnp.where(jnp.repeat(good, npos), keys, PAD_KEY)
        idx = idx_shard.reshape(-1)
        left = jnp.searchsorted(idx, keys, side="left")
        right = jnp.searchsorted(idx, keys, side="right")
        cnt = jnp.where(keys == PAD_KEY, 0, (right - left).astype(jnp.int32))
        per_query = jax.lax.psum(cnt, "ix")
        total = jax.lax.psum(per_query.sum(), "dp")
        return per_query, total

    def _qc_canon(c, ln, mo):
        valid = jnp.arange(c.shape[1])[None, :] < ln[:, None]
        ok = jnp.where(valid, c <= 3, True).all(axis=1)
        counts = jnp.stack(
            [jnp.where(valid, c == b, False).sum(axis=1) for b in range(4)], 1)
        thr = jnp.trunc(ln.astype(jnp.float32) * 0.8).astype(counts.dtype)
        good = ok & (counts < thr[:, None]).all(axis=1) & (ln > mo)
        return _canonical_local(c, ln), good

    f = shard_map(kernel, mesh=mesh,
                  in_specs=(P("dp", None), P("dp"), P("ix")),
                  out_specs=(P("dp"), P()))
    return jax.jit(f)(codes, lengths, sorted_index_keys)


# --------------------------------------------------------------------------
# Full sharded overlap pipeline: candidates, verification, global-order merge
# --------------------------------------------------------------------------

def _local_probe(keys_loc, m_real, hf_blk, lengths_blk, hash_len):
    """Per-device probe of the local query block against the local index
    slice: (left, counts) with counts clamped to the slice's real entries.
    A bucket (equal-key run) that crosses a slice boundary contributes its
    in-slice portion on each side; concatenation over "ix" restores the full
    bucket in sorted order."""
    l = hash_len
    n_loc, npos = hf_blk.shape
    q = hf_blk.reshape(-1)
    jj = jnp.arange(npos, dtype=jnp.int32)[None, :]
    valid = ((jj >= 1) & (jj < (lengths_blk[:, None] - l))).reshape(-1)
    left = jnp.searchsorted(keys_loc, q, side="left").astype(jnp.int32)
    right = jnp.searchsorted(keys_loc, q, side="right").astype(jnp.int32)
    right = jnp.minimum(right, m_real)
    left_c = jnp.minimum(left, right)
    counts = jnp.where(valid, right - left_c, 0).astype(jnp.int32)
    return left_c, counts


class ShardedOverlapPipeline:
    """Multi-device twin of ops.device_overlap.DeviceOverlapPipeline.

    stream() returns the identical survivor stream — (per-read counts, r2,
    meta) in the reference's discovery order — so
    OverlapGraph.build_from_pipeline and the native replay run unchanged
    and the artifacts stay byte-equal (tests/test_sharded.py).
    """

    def __init__(self, dataset, min_overlap, mesh=None):
        from ..ops import device_overlap as dov
        from .mesh import make_mesh
        self.ds = dataset
        self.hash_len = min_overlap - 1
        ds = dataset
        if mesh is None:
            nd = len(jax.devices())
            ix = 2 if nd % 2 == 0 and nd >= 4 else 1
            mesh = make_mesh(dp=nd // ix, ix=ix)
        self.mesh = mesh
        self.dp = mesh.shape["dp"]
        self.ix = mesh.shape["ix"]

        lmax = ds.codes_fwd.shape[1]
        if lmax >= 4096:
            raise ValueError("read length >= 4096 unsupported by meta packing")
        self.lmax = lmax
        self.npos = lmax - self.hash_len + 1
        self.w = (lmax + 15) // 16
        self.wp = 2 * self.w + 1

        # replicated read matrix (2-bit packed fwd+rev rows) + lengths
        lengths32 = jnp.asarray(ds.lengths.astype(np.int32))
        pf = jnp.asarray(dov.pack_codes_host(ds.codes_fwd))
        codes_fwd = dov._unpack_codes(pf, lmax)
        codes_rev = dov._rc_codes(codes_fwd, lengths32)
        pr = dov._pack_codes_device(codes_rev, self.w)
        pad = ((0, 0), (0, self.wp - self.w))
        self.packed2 = jnp.concatenate(
            [jnp.pad(pf, pad), jnp.pad(pr, pad)], axis=0)
        self.lengths = lengths32

        # window hashes, dp-padded so every shard gets equal rows
        hf = dov.window_hashes_u32(codes_fwd, self.hash_len)
        hr = dov.window_hashes_u32(codes_rev, self.hash_len)
        n1 = hf.shape[0]
        self.n1 = n1
        n_pad = -n1 % self.dp
        self.n1_pad = n1 + n_pad
        # global query ids q = row*npos + j are int32 with sentinel
        # 0x7FFFFFFF; overflow would silently corrupt the merge order
        if self.n1_pad * self.npos >= 0x7FFFFFFF:
            raise ValueError(
                "global query id space exceeds int32 (%d reads x %d "
                "positions); shard the dataset first" %
                (self.n1_pad, self.npos))
        self.hf_pad = jnp.pad(hf, ((0, n_pad), (0, 0)))
        self.len_pad = jnp.pad(lengths32, (0, n_pad))

        # sorted l-mer index, ix-padded (position-range sharding)
        sk, srid, sorient, _ = dov._index_kernel(
            hf, hr, lengths32, self.hash_len)
        m = sk.shape[0]
        m_pad = -m % self.ix
        self.keys = jnp.concatenate(
            [sk, jnp.full((m_pad,), dov.PAD_HASH, jnp.uint32)])
        self.rid = jnp.concatenate([srid, jnp.zeros((m_pad,), jnp.int32)])
        self.orient = jnp.concatenate(
            [sorient, jnp.zeros((m_pad,), jnp.int32)])
        m_tot = m + m_pad
        m_loc = m_tot // self.ix
        # real (non-pad) entries of each ix slice
        self.m_real = jnp.asarray(
            [max(0, min(m - i * m_loc, m_loc)) for i in range(self.ix)],
            dtype=jnp.int32)

    def _counts_pass(self, check_cont):
        mesh = self.mesh
        hash_len = self.hash_len

        def kernel(keys_loc, m_real, hf_blk, lengths_blk):
            _, counts = _local_probe(keys_loc, m_real[0], hf_blk,
                                     lengths_blk, hash_len)
            return counts.sum(dtype=jnp.int32).reshape(1, 1)

        f = shard_map(kernel, mesh,
                      in_specs=(P("ix"), P("ix"), P("dp", None), P("dp")),
                      out_specs=P("dp", "ix"))
        return jax.jit(f)(self.keys, self.m_real, self.hf_pad, self.len_pad)

    def _emit_pass(self, cap, check_cont):
        from ..ops.device_overlap import _expand_verify
        mesh = self.mesh
        hash_len, npos, w, wp = self.hash_len, self.npos, self.w, self.wp
        n_loc = self.n1_pad // self.dp
        SENT = jnp.int32(0x7FFFFFFF)

        @partial(jax.jit, static_argnames=("cc",))
        def run(keys_loc_a, rid_a, orient_a, m_real_a, hf_a, len_blk_a,
                packed2_a, lengths_a, cc):
            def kernel(keys_loc, rid_loc, orient_loc, m_real, hf_blk,
                       len_blk, packed2, lengths):
                left, counts = _local_probe(keys_loc, m_real[0], hf_blk,
                                            len_blk, hash_len)
                row0 = jax.lax.axis_index("dp") * n_loc
                keep, r1, r2, qidx, fe, eoff = _expand_verify(
                    packed2, lengths, left, counts, rid_loc, orient_loc,
                    row0, hash_len, cap, npos, w, wp, cc)
                # local stable compaction, q = global query id
                pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
                dst = jnp.where(keep, pos, cap)
                n_keep = jnp.where(keep.any(), pos[-1] + 1, 0)
                q = row0 * npos + qidx
                meta = (fe | (eoff << 4)).astype(jnp.uint16)
                q_out = jnp.full((cap,), SENT).at[dst].set(q, mode="drop")
                r2_out = jnp.zeros((cap,), jnp.int32).at[dst].set(
                    r2, mode="drop")
                meta_out = jnp.zeros((cap,), jnp.uint16).at[dst].set(
                    meta, mode="drop")
                # exchange survivors across the index axis and restore the
                # reference's discovery order: stable sort by q keeps the
                # (ix slice, bucket position) order for equal queries.
                qg = jax.lax.all_gather(q_out, "ix").reshape(-1)
                r2g = jax.lax.all_gather(r2_out, "ix").reshape(-1)
                mg = jax.lax.all_gather(meta_out, "ix").reshape(-1)
                qs, r2s, ms = jax.lax.sort((qg, r2g, mg), num_keys=1,
                                           is_stable=True)
                return (qs[None], r2s[None], ms[None],
                        n_keep.reshape(1, 1).astype(jnp.int32))

            f = shard_map(
                kernel, mesh,
                in_specs=(P("ix"), P("ix"), P("ix"), P("ix"),
                          P("dp", None), P("dp"), P(None, None), P(None)),
                out_specs=(P("dp", None), P("dp", None), P("dp", None),
                           P("dp", "ix")))
            return f(keys_loc_a, rid_a, orient_a, m_real_a, hf_a, len_blk_a,
                     packed2_a, lengths_a)

        return run(self.keys, self.rid, self.orient, self.m_real,
                   self.hf_pad, self.len_pad, self.packed2, self.lengths,
                   cc=check_cont)

    def stream(self, check_cont=True, download=True):
        """Survivor stream in reference discovery order: (counts [n1] int64,
        r2 int32, meta uint16) — the DeviceOverlapPipeline.stream contract."""
        from ..ops.device_overlap import _tier
        totals = np.asarray(self._counts_pass(check_cont))
        cap = int(_tier(max(int(totals.max()), 1), lo=1 << 10))
        qs, r2s, ms, nk = self._emit_pass(cap, check_cont)
        nk = np.asarray(nk)
        if not download:
            return None
        q_parts, r2_parts, m_parts = [], [], []
        for d in range(self.dp):
            kept = int(nk[d].sum())
            if kept == 0:
                continue
            q_parts.append(np.asarray(qs[d, :kept]))
            r2_parts.append(np.asarray(r2s[d, :kept]))
            m_parts.append(np.asarray(ms[d, :kept]))
        if q_parts:
            q = np.concatenate(q_parts).astype(np.int64)
            r2 = np.concatenate(r2_parts)
            meta = np.concatenate(m_parts)
        else:
            q = np.zeros(0, np.int64)
            r2 = np.zeros(0, np.int32)
            meta = np.zeros(0, np.uint16)
        counts = np.bincount(q // self.npos, minlength=self.n1)[:self.n1]
        return counts.astype(np.int64), r2, meta

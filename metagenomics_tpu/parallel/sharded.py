"""SPMD overlap-detection over a ("dp", "ix") device mesh via shard_map.

This is the scaling path for the assembler's hot phase: read batches are
data-parallel over "dp", the sorted l-mer index is sharded by key range over
"ix", and per-shard hit counts are combined with psum over ICI.  The single
chip fallback is ops/overlap.verify_candidates + index.OverlapIndex.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops.packing import PAD_CODE

PAD_KEY = jnp.uint32(0xFFFFFFFF)


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

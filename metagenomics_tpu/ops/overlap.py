"""Device verification of overlap / containment candidates.

The reference verifies each hash-table hit with per-character std::string
compares (checkOverlap, MetaGenomics/OverlapGraph.cpp:354-383, and
checkOverlapForContainedRead, :302-340).  Here all candidates are verified in
one batched gather+compare kernel over the padded code arrays: for candidate
(r1, j, r2, orient) the two implied windows are gathered with
take_along_axis and compared under a length mask — one fused XLA kernel, no
per-candidate host work.

Window derivation (l = hash string length = minOverlap - 1, string2 is the
forward strand of r2 for orient 0/1 and the reverse strand for orient 2/3).
Unlike the reference, whose hash table guarantees the seed l-mer matches,
our hashed join does not — so each window INCLUDES the seed, giving the
identical accept set while rejecting hash collisions:

  edge mode (checkOverlap):
    orient 0/2: needs len1 - j < len2;  window r1[j : len1]    == s2[0 : len1-j]
    orient 1/3: needs len2 - l >= j;    window r1[0 : j+l]     == s2[len2-l-j : len2]
  containment mode (checkOverlapForContainedRead), m = len2 - l:
    orient 0/2: needs len1-j-l >= m;    window r1[j : j+len2]  == s2[0 : len2]
    orient 1/3: needs j >= m;           window r1[j-m : j+l]   == s2[0 : len2]
"""

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@dataclass
class CandidateBatch:
    """A flat batch of hash-hit candidates in reference discovery order
    (read id ascending, substring position j ascending, bucket order k)."""

    r1: np.ndarray      # int32 read id of the probing read
    j: np.ndarray       # int32 substring start position in r1's forward string
    r2: np.ndarray      # int32 read id of the indexed read
    orient: np.ndarray  # uint8 0..3 (prefix/suffix of forward/reverse)

    def __len__(self):
        return len(self.r1)


@partial(jax.jit, static_argnames=("lmax",))
def _window_equal(str1, str2, s1, s2, m, lmax):
    """Row-wise: str1[i, s1[i]:s1[i]+m[i]] == str2[i, s2[i]:s2[i]+m[i]]."""
    k = jnp.arange(lmax)[None, :]
    i1 = jnp.clip(s1[:, None] + k, 0, lmax - 1)
    i2 = jnp.clip(s2[:, None] + k, 0, lmax - 1)
    a = jnp.take_along_axis(str1, i1, axis=1)
    b = jnp.take_along_axis(str2, i2, axis=1)
    mask = k < m[:, None]
    return jnp.where(mask, a == b, True).all(axis=1)


@partial(jax.jit, static_argnames=("hash_len", "mode"))
def _verify_kernel(codes_fwd, codes_rev, lengths, r1, j, r2, orient, hash_len, mode):
    l = hash_len
    len1 = lengths[r1]
    len2 = lengths[r2]
    str1 = codes_fwd[r1]
    fwd2 = codes_fwd[r2]
    rev2 = codes_rev[r2]
    str2 = jnp.where((orient <= 1)[:, None], fwd2, rev2)
    is_pre = (orient == 0) | (orient == 2)

    # Windows INCLUDE the l-mer seed (the reference's hash table guarantees
    # the seed matches; our hashed join does not, so the compare covers it —
    # identical accept set, and hash collisions are rejected here).
    if mode == "edge":
        ok_pre = len1 - j < len2
        s1_pre, s2_pre, m_pre = j, jnp.zeros_like(j), len1 - j
        ok_suf = len2 - l >= j
        s1_suf, s2_suf, m_suf = jnp.zeros_like(j), len2 - l - j, j + l
    else:  # containment
        m2 = len2 - l
        ok_pre = len1 - j - l >= m2
        s1_pre, s2_pre, m_pre = j, jnp.zeros_like(j), len2
        ok_suf = j >= m2
        s1_suf, s2_suf, m_suf = j - m2, jnp.zeros_like(j), len2

    ok = jnp.where(is_pre, ok_pre, ok_suf)
    s1 = jnp.where(is_pre, s1_pre, s1_suf)
    s2 = jnp.where(is_pre, s2_pre, s2_suf)
    m = jnp.where(is_pre, m_pre, m_suf)
    s1 = jnp.clip(s1, 0)
    s2 = jnp.clip(s2, 0)
    m = jnp.where(ok, m, 0)
    eq = _window_equal(str1, str2, s1, s2, m, codes_fwd.shape[1])
    return ok & eq


def verify_candidates(
    codes_fwd: np.ndarray,
    codes_rev: np.ndarray,
    lengths: np.ndarray,
    batch: CandidateBatch,
    hash_len: int,
    mode: str = "edge",
    chunk: int = 1 << 16,
) -> np.ndarray:
    """Verify a candidate batch on device, chunked to bound VMEM/HBM use.

    Returns a bool array aligned with the batch.
    """
    assert mode in ("edge", "containment")
    n = len(batch)
    out = np.empty(n, dtype=bool)
    cf = jnp.asarray(codes_fwd)
    cr = jnp.asarray(codes_rev)
    ln = jnp.asarray(lengths.astype(np.int32))
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        ok = _verify_kernel(
            cf, cr, ln,
            jnp.asarray(batch.r1[s:e].astype(np.int32)),
            jnp.asarray(batch.j[s:e].astype(np.int32)),
            jnp.asarray(batch.r2[s:e].astype(np.int32)),
            jnp.asarray(batch.orient[s:e].astype(np.int32)),
            hash_len, mode,
        )
        out[s:e] = np.asarray(ok)
    return out

"""Device l-mer window packing.

Packs every length-l window of every read into uint32 limbs (16 bases at
2 bits each per limb) in one fused gather+dot kernel — the device-side
replacement for the reference's per-substring string hashing
(MetaGenomics/HashTable.cpp:135-155).  The host mixes the limbs into a
single 64-bit hash for the sorted join; hash collisions are harmless because
overlap verification compares the full window including the seed
(ops/overlap.py).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

BASES_PER_LIMB = 16

# odd 64-bit mixing constants (splitmix64 / xxhash style)
_MIX = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
                 0x27D4EB2F165667C5], dtype=np.uint64)


@partial(jax.jit, static_argnames=("hash_len",))
def window_limbs(codes: jnp.ndarray, hash_len: int) -> jnp.ndarray:
    """[N, npos, nlimb] uint32 limbs for every window start position.

    Window w at (i, p) covers codes[i, p : p+hash_len]; limb k packs bases
    [16k, 16k+16) big-endian 2-bit.  Padding codes (PAD_CODE=4) poison the
    limb value, but such windows are masked out by the caller via lengths.
    """
    n, lmax = codes.shape
    l = hash_len
    npos = max(lmax - l + 1, 1)
    nlimb = (l + BASES_PER_LIMB - 1) // BASES_PER_LIMB
    win = jnp.clip(jnp.arange(npos)[:, None] + jnp.arange(l)[None, :],
                   0, lmax - 1)                          # [npos, l]
    w = codes[:, win].astype(jnp.uint32) & 3             # [n, npos, l]
    limbs = []
    for k in range(nlimb):
        seg = w[:, :, k * BASES_PER_LIMB:(k + 1) * BASES_PER_LIMB]
        width = seg.shape[2]
        shifts = (2 * jnp.arange(width - 1, -1, -1)).astype(jnp.uint32)
        limbs.append((seg << shifts[None, None, :]).sum(
            axis=2, dtype=jnp.uint32))
    return jnp.stack(limbs, axis=-1)                     # [n, npos, nlimb]


def mix_limbs(limbs: np.ndarray) -> np.ndarray:
    """Host: fold uint32 limbs [..., nlimb] into one uint64 hash."""
    limbs = np.asarray(limbs)
    h = np.zeros(limbs.shape[:-1], dtype=np.uint64)
    for k in range(limbs.shape[-1]):
        h ^= limbs[..., k].astype(np.uint64) * _MIX[k % len(_MIX)]
    return h


def all_window_hashes(codes: np.ndarray, hash_len: int,
                      chunk: int = 1 << 14) -> np.ndarray:
    """uint64 window hashes [N, npos] computed on device in row chunks."""
    n = codes.shape[0]
    outs = []
    cj = jnp.asarray(codes)
    for s in range(0, n, chunk):
        limbs = np.asarray(window_limbs(cj[s:s + chunk], hash_len))
        outs.append(mix_limbs(limbs))
    return np.concatenate(outs, axis=0) if outs else np.zeros(
        (0, 1), dtype=np.uint64)

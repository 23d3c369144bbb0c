"""Pallas TPU kernel for the l-mer window hashes of the overlap index.

The device overlap pipeline (ops/device_overlap.py) keys every read window
of length l with two rolling polynomial hashes mixed into one uint32
(window_hashes_u32).  The jnp formulation is a lax.scan over the read
length: Lmax sequential steps of tiny [N] element-wise ops, which XLA
lowers to a loop with poor VPU occupancy.

This kernel reformulates the window hash as a static convolution and tiles
it over read blocks resident in VMEM:

    w[j] = sum_{k<l} c[j+k] * BASE^(l-1-k)   (mod 2^32)

which is exactly the rolling-hash value h[j+l] - h[j]*BASE^l in wrap-around
uint32 arithmetic, so the outputs are bit-identical to window_hashes_u32
(tested in tests/test_ops.py).  Each grid step loads one [BLOCK, L] tile of
base codes HBM->VMEM, does l fused multiply-adds over the whole tile on the
VPU, and writes the mixed hashes — one HBM round-trip for the entire index
keying pass instead of Lmax scan steps.

Reference semantics being keyed: the 4-key-per-read prefix/suffix hash
index of MetaGenomics/HashTable.cpp:88-155 (here: every window, so the same
kernel also feeds the probe side of the join).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

_B1 = 0x01000193     # FNV prime (matches device_overlap._B1)
_B2 = 0x9E3779B1     # golden-ratio odd constant
_M1 = 0x85EBCA6B
_M2 = 0xC2B2AE35

BLOCK_ROWS = 256
_LANE = 128


def _kernel(c_ref, out_ref, *, hash_len):
    l = hash_len
    c = (c_ref[:].astype(jnp.uint32) & 3) + 1
    rows, width = c.shape
    z = jnp.concatenate([c, jnp.zeros((rows, l), jnp.uint32)], axis=1)
    w1 = jnp.zeros((rows, width), jnp.uint32)
    w2 = jnp.zeros((rows, width), jnp.uint32)
    for k in range(l):
        t = z[:, k:k + width]
        w1 = w1 + t * np.uint32(pow(_B1, l - 1 - k, 1 << 32))
        w2 = w2 + t * np.uint32(pow(_B2, l - 1 - k, 1 << 32))
    out_ref[:] = (w1 * np.uint32(_M1)) ^ (w2 * np.uint32(_M2))


@partial(jax.jit, static_argnames=("hash_len", "interpret"))
def _window_hashes_padded(codes_padded, hash_len, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, width = codes_padded.shape
    grid = (n // BLOCK_ROWS,)
    return pl.pallas_call(
        partial(_kernel, hash_len=hash_len),
        out_shape=jax.ShapeDtypeStruct((n, width), jnp.uint32),
        grid=grid,
        in_specs=[pl.BlockSpec((BLOCK_ROWS, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLOCK_ROWS, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(codes_padded)


def window_hashes_pallas(codes, hash_len, interpret=False):
    """[N, npos] uint32 window hashes, bit-identical to window_hashes_u32.

    Pads rows to BLOCK_ROWS and columns to the 128-lane boundary; the
    padding columns never reach a valid window (window j<npos touches only
    columns < lmax) and padded rows are sliced away.
    """
    n, lmax = codes.shape
    npos = lmax - hash_len + 1
    n_pad = -n % BLOCK_ROWS
    w_pad = -lmax % _LANE
    padded = jnp.pad(jnp.asarray(codes), ((0, n_pad), (0, w_pad)),
                     constant_values=4)
    out = _window_hashes_padded(padded, hash_len, interpret)
    return out[:n, :npos]

"""Device mesh construction helpers."""

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(dp: int = None, ix: int = 1, devices=None) -> Mesh:
    """Build a 2D ("dp", "ix") mesh over the available devices.

    dp * ix must equal the device count; dp defaults to len(devices)//ix.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // ix
    assert dp * ix == n, "dp*ix (%d*%d) != device count %d" % (dp, ix, n)
    arr = np.asarray(devices).reshape(dp, ix)
    return Mesh(arr, axis_names=("dp", "ix"))

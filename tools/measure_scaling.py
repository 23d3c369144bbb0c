#!/usr/bin/env python
"""Sharded-pipeline scaling measurement over the virtual CPU mesh.

Runs the full sharded overlap stream (parallel/sharded.py) at dp=1,2,4,8
(and mixed dp x ix shapes) over the same input and records wall times into
SCALING.json at the repo root.

Interpretation caveat (recorded in the JSON): the mesh is 8 VIRTUAL CPU
devices sharing this machine's physical cores, so sharding cannot reduce
wall time — the ideal result is a FLAT curve, and the efficiency proxy
reported is T(dp=1)/T(dp=N): how much wall time the extra collective
exchange + merge work costs as the mesh grows.  Real ICI-attached chips
add compute with each device; this proxy isolates the communication/
orchestration overhead term of the design.

Usage:  python tools/measure_scaling.py  (from the repo root, CPU backend)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

N_READS = 24_000
GENOME = 120_000
READ_LEN = 100
MIN_OVERLAP = 40


def make_dataset(tmpdir):
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    comp_lut = np.zeros(256, np.uint8)
    for k, v in zip(b"ACGT", b"TGCA"):
        comp_lut[k] = v
    genome = bases[rng.integers(0, 4, GENOME)]
    starts = rng.integers(0, GENOME - READ_LEN + 1, N_READS)
    reads = genome[starts[:, None] + np.arange(READ_LEN)[None, :]]
    flip = rng.random(N_READS) < 0.5
    reads = np.where(flip[:, None], comp_lut[reads[:, ::-1]], reads)
    path = os.path.join(tmpdir, "scaling_se.fasta")
    with open(path, "wb") as f:
        for i, row in enumerate(reads):
            f.write(b">r%d\n" % i)
            f.write(row.tobytes())
            f.write(b"\n")
    return path


def main():
    import tempfile
    from metagenomics_tpu.dataset import Dataset
    from metagenomics_tpu.parallel.mesh import make_mesh
    from metagenomics_tpu.parallel.sharded import ShardedOverlapPipeline

    with tempfile.TemporaryDirectory() as td:
        path = make_dataset(td)
        ds = Dataset([], [path], MIN_OVERLAP, log=lambda *a, **k: None)

        shapes = [(1, 1), (2, 1), (4, 1), (8, 1), (4, 2), (2, 4)]
        rows = []
        ref_stream = None
        for dp, ix in shapes:
            mesh = make_mesh(dp=dp, ix=ix, devices=jax.devices()[:dp * ix])
            # warm-up/compile (the ctor runs setup + probe join)
            ShardedOverlapPipeline(ds, MIN_OVERLAP,
                                   mesh=mesh).stream(check_cont=False)
            t0 = time.time()
            sp = ShardedOverlapPipeline(ds, MIN_OVERLAP, mesh=mesh)
            out = sp.stream(check_cont=False)
            dt = time.time() - t0
            if ref_stream is None:
                ref_stream = out
            else:
                assert all(np.array_equal(a, b)
                           for a, b in zip(ref_stream, out)), \
                    "stream mismatch at dp=%d ix=%d" % (dp, ix)
            rows.append({"dp": dp, "ix": ix, "seconds": round(dt, 3)})
            print("dp=%d ix=%d: %.3fs" % (dp, ix, dt))

        t1 = rows[0]["seconds"]
        for r in rows:
            r["efficiency_proxy"] = round(t1 / r["seconds"], 3)
        out = {
            "what": "sharded overlap stream wall time on 8 VIRTUAL CPU "
                    "devices sharing physical cores; ideal curve is flat; "
                    "efficiency_proxy = T(dp=1,ix=1)/T(shape) measures "
                    "collective/orchestration overhead, not speedup",
            "n_reads": N_READS,
            "physical_cores": os.cpu_count(),
            "backend": jax.default_backend(),
            "byte_equal_across_shapes": True,
            "rows": rows,
        }
        with open(os.path.join(REPO, "SCALING.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark: overlap-detection throughput (graph-construction phase).

Metric: unique reads processed per second through the full overlap-detection
phase — l-mer index build + candidate join + device verification + graph
construction (BFS, transitive reduction, contraction/dead-end fixpoint).
This corresponds to the reference's insertDataset() +
buildOverlapGraphFromHashTable() span (MetaGenomics/HashTable.cpp:50,
OverlapGraph.cpp:107), timed by its own CLOCKSTOP output.

The reference baseline is measured once per dataset/binary on this machine
and cached in bench_baseline.json (the reference is single-threaded C++;
its own build system uses -O0, but we benchmark against an -O2 build when
available to be conservative).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "reads/s", "vs_baseline": N}
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DATA_DIR = os.path.join(REPO, "bench_data")
DATA_FILE = os.path.join(DATA_DIR, "bench_se.fasta")
BASELINE_FILE = os.path.join(REPO, "bench_baseline.json")

# dataset parameters (deterministic)
SEED = 7
GENOMES = [600_000, 400_000]
N_READS = 200_000
READ_LEN = 100
MIN_OVERLAP = 40


def gen_bench_data():
    import numpy as np
    os.makedirs(DATA_DIR, exist_ok=True)
    if os.path.exists(DATA_FILE):
        return
    rng = np.random.default_rng(SEED)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    comp = {65: 84, 67: 71, 71: 67, 84: 65}
    comp_lut = np.zeros(256, dtype=np.uint8)
    for k, v in comp.items():
        comp_lut[k] = v
    chunks = []
    for g_len in GENOMES:
        genome = bases[rng.integers(0, 4, g_len)]
        n = int(N_READS * g_len / sum(GENOMES))
        starts = rng.integers(0, g_len - READ_LEN + 1, n)
        idx = starts[:, None] + np.arange(READ_LEN)[None, :]
        reads = genome[idx]
        flip = rng.random(n) < 0.5
        rc = comp_lut[reads[:, ::-1]]
        reads = np.where(flip[:, None], rc, reads)
        chunks.append(reads)
    import io as _io
    buf = _io.BytesIO()
    rid = 0
    for reads in chunks:
        for row in reads:
            buf.write(b">r%d\n" % rid)
            buf.write(row.tobytes())
            buf.write(b"\n")
            rid += 1
    with open(DATA_FILE, "wb") as f:
        f.write(buf.getvalue())


def measure_ours():
    """Time the full overlap-detection phase (index + probe scan + verify +
    BFS/transitive-reduction/contraction) with the default engine.  One
    warm-up run first: page-cache/allocator warm-up is excluded, matching
    steady-state throughput."""
    # the native engine needs no device; avoid contending for a TPU tunnel
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from metagenomics_tpu.config import AssemblerConfig
    from metagenomics_tpu.dataset import Dataset
    from metagenomics_tpu.graph import OverlapGraph

    def quiet(*a, **k):
        pass

    ds = Dataset([], [DATA_FILE], MIN_OVERLAP, log=quiet)
    cfg = AssemblerConfig(min_overlap=MIN_OVERLAP)

    def run_once():
        u = ds.number_of_unique_reads
        ds.edges_forward = [[] for _ in range(u + 1)]
        ds.loc_forward = [[] for _ in range(u + 1)]
        ds.edges_reverse = [[] for _ in range(u + 1)]
        ds.loc_reverse = [[] for _ in range(u + 1)]
        ds.super_read_id[:] = 0
        graph = OverlapGraph(ds, cfg, log=quiet)
        t0 = time.time()
        if not graph.build_full_native():
            from metagenomics_tpu.ops.device_overlap import (
                DeviceOverlapPipeline)
            pipeline = DeviceOverlapPipeline(ds, MIN_OVERLAP)
            graph.build_from_pipeline(pipeline)
        return time.time() - t0

    run_once()                      # warm-up
    dt = min(run_once() for _ in range(3))
    return ds.number_of_unique_reads, dt


def measure_reference():
    """Run the reference binary on the bench dataset, parse CLOCKSTOP."""
    for name in ("metagenomics_ref", "metagenomics_ref_O0"):
        binary = os.path.join(REPO, "golden", name)
        if not os.path.exists(binary):
            continue
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            try:
                proc = subprocess.run(
                    [binary, "-se", "1", DATA_FILE, "-f",
                     os.path.join(td, "b_"), "-l", str(MIN_OVERLAP)],
                    capture_output=True, text=True, timeout=3600)
            except subprocess.TimeoutExpired:
                continue
            out = proc.stdout
            t_ins = re.search(
                r"Function insertDataset\(\) finished in ([\d.e+-]+) Seconds",
                out)
            t_bld = re.search(
                r"Function buildOverlapGraphFromHashTable\(\) finished in "
                r"([\d.e+-]+) Seconds", out)
            n_unique = re.search(r"Number of unique reads: (\d+)", out)
            if t_ins and t_bld and n_unique:
                secs = float(t_ins.group(1)) + float(t_bld.group(1))
                return {"binary": name, "seconds": secs,
                        "unique_reads": int(n_unique.group(1)),
                        "reads_per_s": int(n_unique.group(1)) / secs}
    return None


def get_baseline():
    params = {"seed": SEED, "genomes": GENOMES, "n_reads": N_READS,
              "read_len": READ_LEN, "min_overlap": MIN_OVERLAP}
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            cached = json.load(f)
        if cached.get("params") == params:
            return cached["baseline"]
    baseline = measure_reference()
    if baseline is not None:
        with open(BASELINE_FILE, "w") as f:
            json.dump({"params": params, "baseline": baseline}, f, indent=1)
    return baseline


def main():
    gen_bench_data()
    baseline = get_baseline()
    n_reads, secs = measure_ours()
    value = n_reads / secs
    vs = value / baseline["reads_per_s"] if baseline else 0.0
    print(json.dumps({
        "metric": "overlap_detection_throughput",
        "value": round(value, 1),
        "unit": "reads/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Sharded-engine verification + measurement at scale (VERDICT r4 item 4).

Two datasets: the 200k-read bench set and a 1M-read slice of the 10M-read
scale set.  For each:

  * full CLI through MGTPU_OVERLAP_ENGINE=sharded on an 8-virtual-device
    CPU mesh, every staged artifact byte-compared against a native-engine
    run of the same CLI,
  * an in-process sharded construction run (dp=4, ix=2) recording the
    collective ledger's MEASURED per-phase payload/wire bytes (real kernel
    shapes x real invocation counts at that scale, not the toy model).

Results land in SCALING.json under "at_scale".

Usage:  python tools/measure_sharded_scale.py   (repo root; ~10-20 min)
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BENCH = os.path.join(REPO, "bench_data", "bench_se.fasta")
SCALE = os.path.join(REPO, "bench_data", "scale_se.fasta")
SCALE_1M = os.path.join(REPO, "bench_data", "scale_se_1m.fasta")

ARTIFACTS = [
    "_sortedReads.fasta", ".unitig", "_flow.input", "_flow.output",
    "graph1.gdl", "contigs1.fasta", "graph2.gdl", "contigs2.fasta",
    "graph3.gdl", "contigs3.fasta", "graph4.gdl", "contigs4.fasta",
]


def ensure_1m():
    if os.path.exists(SCALE_1M):
        return
    if not os.path.exists(SCALE):
        raise SystemExit("scale_se.fasta missing — run tools/measure_scale.py"
                         " first to generate it")
    with open(SCALE) as src, open(SCALE_1M, "w") as dst:
        for i, line in enumerate(src):
            if i >= 2_000_000:
                break
            dst.write(line)


def run_cli(data, engine, outdir):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["MGTPU_OVERLAP_ENGINE"] = engine
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "metagenomics_tpu.cli", "-se", "1", data,
         "-f", "o_", "-l", "40"],
        cwd=outdir, env=env, capture_output=True, text=True, timeout=7200)
    wall = time.time() - t0
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    return wall


def measured_ledger(data):
    """In-process sharded construction on dp=4 x ix=2: measured ledger."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from metagenomics_tpu.dataset import Dataset
    from metagenomics_tpu.parallel.collectives import LEDGER
    from metagenomics_tpu.parallel.mesh import make_mesh
    from metagenomics_tpu.parallel.sharded import ShardedOverlapPipeline

    ds = Dataset([], [data], 40, log=lambda *a, **k: None)
    LEDGER.reset()
    mesh = make_mesh(dp=4, ix=2, devices=jax.devices()[:8])
    t0 = time.time()
    pipeline = ShardedOverlapPipeline(ds, 40, mesh=mesh)
    counts, r2, meta = pipeline.stream(
        check_cont=ds.longest_read_length != ds.shortest_read_length)
    stream_wall = time.time() - t0
    rep = LEDGER.report()
    return {
        "mesh": "dp=4 x ix=2 (8 virtual CPU devices)",
        "n_unique_reads": ds.number_of_unique_reads,
        "stream_records": int(len(r2)),
        "construction_stream_seconds": round(stream_wall, 2),
        "measured_payload_bytes": rep["total_payload_bytes"],
        "measured_wire_bytes": rep["total_wire_bytes"],
        "per_phase": {
            name: {"invocations": p["invocations"],
                   "payload_bytes": p["payload_bytes"],
                   "wire_bytes": p["wire_bytes"]}
            for name, p in rep["phases"].items()},
        "projected_ici_seconds": rep["model"]["projected_ici_seconds"],
    }


def one_dataset(name, data):
    print("== %s ==" % name, flush=True)
    row = {"dataset": name, "file": os.path.basename(data)}
    with tempfile.TemporaryDirectory() as ta, \
            tempfile.TemporaryDirectory() as tb:
        row["native_cli_seconds"] = round(run_cli(data, "native", ta), 1)
        print("  native CLI done", row["native_cli_seconds"], flush=True)
        row["sharded_cli_seconds"] = round(run_cli(data, "sharded", tb), 1)
        print("  sharded CLI done", row["sharded_cli_seconds"], flush=True)
        equal = []
        for a in ARTIFACTS:
            pa = os.path.join(ta, "o_" + a)
            pb = os.path.join(tb, "o_" + a)
            same = open(pa, "rb").read() == open(pb, "rb").read()
            equal.append(same)
            if not same:
                print("  MISMATCH:", a, flush=True)
        row["artifacts_equal"] = all(equal)
        row["artifacts_checked"] = len(ARTIFACTS)
    row["ledger"] = measured_ledger(data)
    return row


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    ensure_1m()
    rows = [one_dataset("bench_200k", BENCH),
            one_dataset("scale_1m", SCALE_1M)]
    path = os.path.join(REPO, "SCALING.json")
    doc = json.load(open(path))
    doc["at_scale"] = {
        "what": "full-CLI sharded engine vs native engine at scale: every "
                "staged artifact byte-compared; ledger bytes are MEASURED "
                "from the real kernel shapes and invocation counts at that "
                "scale (collectives.py, retrace-exact)",
        "rows": rows,
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["at_scale"], indent=1))


if __name__ == "__main__":
    main()

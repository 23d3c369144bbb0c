#!/usr/bin/env python
"""10M-read scale run: wall time + peak RSS, ours vs the reference binary.

Generates a 10M-read single-end dataset (50Mb genome, ~20x tiling, strand
flips) unless present, then runs the FULL CLI (native engine, CPU) and the
reference -O0 binary under /usr/bin/time -v, recording wall seconds and
peak RSS into SCALE_10M.json.  Artifacts are byte-compared.

Usage: python tools/measure_scale.py [--n-reads N] [--skip-reference]
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "bench_data", "scale_se.fasta")
REF = os.path.join(REPO, "golden", "metagenomics_ref_O0")
OUT = os.path.join(REPO, "SCALE_10M.json")


def gen_data(n_reads):
    import numpy as np
    if os.path.exists(DATA):
        with open(DATA) as f:
            head = f.readline()
            if head.startswith(">r0_%d" % n_reads):
                return
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    comp = np.zeros(256, np.uint8)
    for k, v in zip(b"ACGT", b"TGCA"):
        comp[k] = v
    glen = n_reads * 5   # ~20x at 100bp
    genome = bases[rng.integers(0, 4, glen)]
    rdlen = 100
    starts = rng.integers(0, glen - rdlen + 1, n_reads)
    print("writing %d reads..." % n_reads)
    with open(DATA, "wb") as f:
        B = 1 << 18
        for s in range(0, n_reads, B):
            e = min(s + B, n_reads)
            block = genome[starts[s:e, None] + np.arange(rdlen)[None, :]]
            flip = rng.random(e - s) < 0.5
            block = np.where(flip[:, None], comp[block[:, ::-1]], block)
            rows = []
            for t in range(e - s):
                rows.append(b">r%d_%d\n" % (s + t, n_reads) if s + t == 0
                            else b">r%d\n" % (s + t))
                rows.append(block[t].tobytes())
                rows.append(b"\n")
            f.write(b"".join(rows))


def run_timed(cmd, cwd, env, timeout):
    """Run cmd tracking wall time and peak RSS (resource.getrusage of the
    child via a wait4 wrapper; no /usr/bin/time in this image)."""
    import threading
    t0 = time.time()
    proc = subprocess.Popen(cmd, cwd=cwd, env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    peak = [0]

    def poll():
        path = "/proc/%d/status" % proc.pid
        while proc.poll() is None:
            try:
                with open(path) as f:
                    for line in f:
                        if line.startswith("VmHWM:"):
                            peak[0] = max(peak[0], int(line.split()[1]))
                            break
            except OSError:
                break
            time.sleep(0.5)

    th = threading.Thread(target=poll, daemon=True)
    th.start()
    try:
        proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        proc.kill()
        raise
    th.join(timeout=5)
    wall = time.time() - t0
    return proc, wall, peak[0] // 1024


def main():
    n_reads = 10_000_000
    if "--n-reads" in sys.argv:
        n_reads = int(sys.argv[sys.argv.index("--n-reads") + 1])
    gen_data(n_reads)
    os.makedirs("/tmp/scale_ours", exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["MGTPU_OVERLAP_ENGINE"] = "native"
    print("running ours...")
    proc, wall, rss = run_timed(
        [sys.executable, "-m", "metagenomics_tpu.cli", "-se", "1", DATA,
         "-f", "t_", "-l", "40"], "/tmp/scale_ours", env, 7200)
    ours = {"wall_s": round(wall, 1), "peak_rss_mb": rss,
            "rc": proc.returncode}
    result = {"n_reads": n_reads, "ours_native_cpu": ours}
    if "--skip-reference" not in sys.argv and os.path.exists(REF):
        os.makedirs("/tmp/scale_ref", exist_ok=True)
        print("running reference...")
        proc_r, wall_r, rss_r = run_timed(
            [REF, "-se", "1", DATA, "-f", "t_", "-l", "40"],
            "/tmp/scale_ref", dict(os.environ), 28800)
        result["reference_O0"] = {"wall_s": round(wall_r, 1),
                                  "peak_rss_mb": rss_r,
                                  "rc": proc_r.returncode}
        if proc.returncode == 0 and proc_r.returncode == 0:
            import filecmp
            arts = ["t_contigs1.fasta", "t_contigs2.fasta",
                    "t_contigs3.fasta", "t_contigs4.fasta", "t_.unitig",
                    "t__sortedReads.fasta", "t__flow.output"]
            result["artifacts_equal"] = all(
                filecmp.cmp("/tmp/scale_ours/" + a, "/tmp/scale_ref/" + a,
                            shallow=False) for a in arts)
            result["speedup"] = round(wall_r / wall, 2)
            result["rss_ratio"] = round(rss_r / max(rss, 1), 2)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()

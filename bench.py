#!/usr/bin/env python
"""Benchmark: overlap-detection throughput (graph-construction phase).

Metric: unique reads processed per second through the full overlap-detection
phase — l-mer index build + candidate join + verification + graph
construction (BFS, transitive reduction, contraction/dead-end fixpoint).
This corresponds to the reference's insertDataset() +
buildOverlapGraphFromHashTable() span (MetaGenomics/HashTable.cpp:50,
OverlapGraph.cpp:107), timed by its own CLOCKSTOP output.

Two engines are measured (see BENCH_NOTES.md for the full breakdown):

* native_cpu — the threaded C++ engine (the default on this machine, and
  the headline number).
* device_tpu — the JAX/Pallas device pipeline on the TPU backend, measured
  end-to-end (including host<->device transfers over this machine's
  tunneled TPU link) and device-compute-only (transfers excluded — the
  number that transfers ride on a directly-attached TPU host).

The reference baseline is measured once per dataset/binary on this machine
and cached in bench_baseline.json (single-threaded C++ at -O2; its own
build system uses -O0 — see golden/README_binaries.md).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "reads/s", "vs_baseline": N, ...}
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
JAX_CACHE = os.path.expanduser("~/.cache/mgtpu_jax_cache")

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


# ---------------------------------------------------------------- late-phase
# repeat-dense paired-end dataset (>=100k reads) on which the late pipeline
# stages (flow, mate-pair merging, scaffolding, resolveNodes, similar/tree/
# loop cleanup) all do real work — VERDICT r2 item 7

PE_DATA_A = os.path.join(DATA_DIR, "bench_pe_a.fasta")
PE_DATA_B = os.path.join(DATA_DIR, "bench_pe_b.fasta")
LATE_BASELINE_FILE = os.path.join(REPO, "bench_late_baseline.json")
LATE_SEED = 1717
LATE_ARTIFACTS = [
    "_sortedReads.fasta", ".unitig", "_flow.input",
    "graph1.gdl", "contigs1.fasta", "graph2.gdl", "contigs2.fasta",
    "graph3.gdl", "contigs3.fasta", "graph4.gdl", "contigs4.fasta",
]

_RC_TABLE = str.maketrans("ACGT", "TGCA")


def _rc(s):
    return s.translate(_RC_TABLE)[::-1]


def gen_pe_bench_data():
    """Deterministic repeat-dense PE metagenome, ~113k reads total.

    Structures (same constructions as golden/make_harddata.py, scaled up):
    six 2-copy 300bp repeats (flow/reduceTrees), a 2-copy repeat cycle
    (reduceLoops), three SNP-spaced strain bubbles (removeSimilarEdges), a
    mate-spannable 150bp repeat (findSupportByMatepairsAndMerge), a
    coverage-separable 600bp repeat at 40x/8x (resolveNodes), a 60bp
    sequencing gap bridged only by mate pairs (scaffolder N-gap), plus
    ~300kb of unique filler at ~26x.  File A: insert 450+-30; file B
    (the gap genome): insert 300+-25."""
    import random
    if os.path.exists(PE_DATA_A) and os.path.exists(PE_DATA_B):
        return
    os.makedirs(DATA_DIR, exist_ok=True)
    rng = random.Random(LATE_SEED)

    def genome(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    def snp_arm(s, spacing=30):
        # one substitution every `spacing` bp.  spacing < min_overlap(40)
        # guarantees no SNP-free window long enough for an exact cross-arm
        # overlap: random per-base SNPs leave such windows, whose chimeric
        # arm-mixing paths admit equal-cost alternate flow optima (the
        # assembler then cannot be byte-compared against CS2's pick)
        out = list(s)
        for p in range(spacing // 2, len(out), spacing):
            out[p] = rng.choice([c for c in "ACGT" if c != out[p]])
        return "".join(out)

    def span_pairs(g, n, ins_mean, ins_sd, out, forbid=None):
        for _ in range(n):
            ins = max(210, int(rng.gauss(ins_mean, ins_sd)))
            if ins >= len(g):
                continue
            pos = rng.randrange(0, len(g) - ins)
            if forbid is not None:
                lo, hi = forbid
                r1_ok = pos + 100 <= lo or pos >= hi
                r2_ok = pos + ins <= lo or pos + ins - 100 >= hi
                if not (r1_ok and r2_ok):
                    continue
            frag = g[pos:pos + ins]
            out.append(frag[:100])
            out.append(_rc(frag[-100:]))

    def tiled_pairs(g, step, ins_mean, out, jitter=20):
        i = 0
        for pos in range(0, len(g) - ins_mean - jitter, step):
            ins = ins_mean - jitter + (i * 17) % (2 * jitter + 1)
            i += 1
            frag = g[pos:pos + ins]
            r1, r2 = frag[:100], _rc(frag[-100:])
            if rng.random() < 0.5:
                out.append(r1)
                out.append(r2)
            else:
                out.append(r2)
                out.append(r1)

    reads_a = []
    # Every file-A segment uses gap-free fragment TILING (pe_tiled_pairs
    # construction from golden/make_harddata.py): Poisson (random) sampling
    # leaves coverage-0 tips whose min-cost-flow admits equal-cost
    # alternate optima, making byte-equality against CS2 ill-posed.
    # six 2-copy repeat islands, ~28x
    for k in range(6):
        R = genome(300)
        seg = (genome(2300 + 131 * k) + R + genome(2100 + 173 * k) + R
               + genome(2200))
        tiled_pairs(seg, 7, 450, reads_a)
    # 2-copy repeat cycle D R3 E R3 F, ~28x
    R3 = genome(300)
    seg = genome(2500) + R3 + genome(2000) + R3 + genome(2500)
    tiled_pairs(seg, 7, 450, reads_a)
    # three strain bubbles (shared flanks, 800bp arm vs SNP-every-30bp
    # variant arm: <5% edit distance -> removeSimilarEdges), ~14x
    for k in range(3):
        W, S, Z = genome(1500), genome(800), genome(1500)
        S2 = snp_arm(S)
        for arm in (S, S2):
            tiled_pairs(W + arm + Z, 14, 450, reads_a)
    # mate-spannable 150bp repeat (insert 450 > 150 + 2*100), ~25x
    M = genome(150)
    for lens in ((2200, 2400), (2300, 2100)):
        tiled_pairs(genome(lens[0]) + M + genome(lens[1]), 8, 450, reads_a)
    # coverage-separable 600bp repeat: 40x vs 8x
    R2 = genome(600)
    tiled_pairs(genome(2000) + R2 + genome(2000), 5, 450, reads_a)   # 40x
    tiled_pairs(genome(2100) + R2 + genome(1900), 25, 450, reads_a)  # 8x
    # unique filler, ~27x
    for _ in range(3):
        tiled_pairs(genome(100_000), 7, 450, reads_a)

    # file B: sequencing gap only mate pairs bridge (insert 300)
    reads_b = []
    X, gap, Y = genome(2500), genome(60), genome(2500)
    span_pairs(X + gap + Y, 2200, 300, 25, reads_b,
               forbid=(len(X), len(X) + len(gap)))

    for path, reads in ((PE_DATA_A, reads_a), (PE_DATA_B, reads_b)):
        with open(path, "w") as f:
            for i, r in enumerate(reads):
                f.write(">p%d\n%s\n" % (i, r))


def _sha256_file(path):
    import hashlib
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def measure_reference_late():
    """One-time: run the reference binary on the late-phase dataset; record
    phase walls, late-pass counters and artifact hashes (the oracle)."""
    binary = os.path.join(REPO, "golden", "metagenomics_ref_O0")
    if not os.path.exists(binary):
        return None
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        try:
            proc = subprocess.run(
                [binary, "-pe", "2", PE_DATA_A, PE_DATA_B, "-f",
                 os.path.join(td, "g_"), "-l", str(MIN_OVERLAP)],
                capture_output=True, text=True, timeout=7200)
        except subprocess.TimeoutExpired:
            return None
        if proc.returncode != 0:
            return None
        out = proc.stdout
        fin = re.findall(
            r"Function (\w+)\(\) finished in ([\d.e+-]+) Seconds", out)

        def total(name):
            return sum(float(t) for n, t in fin if n == name)

        n_unique = int(re.search(r"Number of unique reads: (\d+)",
                                 out).group(1))
        construction = (total("insertDataset")
                        + total("buildOverlapGraphFromHashTable"))
        ingest = (total("readDataset") + total("sortReads")
                  + total("removeDupicateReads"))
        mid_io = total("printDataset") + total("saveGraphToFile")
        late = total("main") - ingest - construction - mid_io
        counters = {
            "similar_edges": sum(int(m) for m in re.findall(
                r"(\d+) edges to remove", out)),
            "loops_removed": sum(int(m) for m in re.findall(
                r"Loops removed: (\d+)", out)),
            "trees_removed": sum(int(m) for m in re.findall(
                r"(\d+) trees removed", out)),
            "mp_merged": sum(int(m) for m in re.findall(
                r"(\d+) Pairs of Edges merged out", out)),
            "scaffold_joins": len(re.findall(
                r"supported\s+\d+ times\. Average distance", out)),
            "resolve_merged": sum(int(m) for m in re.findall(
                r"(\d+) edges merged", out)),
        }
        hashes = {a: _sha256_file(os.path.join(td, "g_" + a))
                  for a in LATE_ARTIFACTS
                  if os.path.exists(os.path.join(td, "g_" + a))}
    return {"unique_reads": n_unique,
            "construction_s": round(construction, 3),
            "late_s": round(late, 3),
            "counters": counters, "artifact_sha256": hashes}


def get_late_baseline():
    params = {"seed": LATE_SEED, "v": 2, "min_overlap": MIN_OVERLAP}
    if os.path.exists(LATE_BASELINE_FILE):
        with open(LATE_BASELINE_FILE) as f:
            cached = json.load(f)
        if cached.get("params") == params:
            return cached["baseline"]
    baseline = measure_reference_late()
    if baseline is not None:
        with open(LATE_BASELINE_FILE, "w") as f:
            json.dump({"params": params, "baseline": baseline}, f, indent=1)
    return baseline


def measure_late():
    """Full assembly on the late-phase dataset with the native engine on
    CPU; returns construction vs late-phase wall and artifact equality
    against the cached reference hashes."""
    gen_pe_bench_data()
    baseline = get_late_baseline()
    import tempfile
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "metagenomics_tpu.cli", "-pe", "2",
             PE_DATA_A, PE_DATA_B, "-f", os.path.join(td, "t_"),
             "-l", str(MIN_OVERLAP)],
            capture_output=True, text=True, timeout=3600, env=env)
        wall = time.time() - t0
        if proc.returncode != 0:
            return {"error": "assembler rc=%d" % proc.returncode}
        out = proc.stdout
        # our log stream is byte-compatible with the reference's, so the
        # phase extraction is IDENTICAL to measure_reference_late
        fin = re.findall(
            r"Function (\w+)\(\) finished in ([\d.e+-]+) Seconds", out)
        times = {}
        for name, t in fin:
            times[name] = times.get(name, 0.0) + float(t)
        construction = (times.get("insertDataset", 0.0)
                        + times.get("buildOverlapGraphFromHashTable", 0.0))
        ingest = (times.get("readDataset", 0.0) + times.get("sortReads", 0.0)
                  + times.get("removeDupicateReads", 0.0))
        mid_io = (times.get("printDataset", 0.0)
                  + times.get("saveGraphToFile", 0.0))
        total = times.get("main", wall)
        late = total - ingest - construction - mid_io
        result = {
            "construction_s": round(construction, 3),
            "late_phases_s": round(late, 3),
            "ingest_s": round(ingest, 3),
            "total_s": round(total, 3),
        }
        if baseline:
            equal = all(
                os.path.exists(os.path.join(td, "t_" + a))
                and _sha256_file(os.path.join(td, "t_" + a)) == h
                for a, h in baseline["artifact_sha256"].items())
            result["artifacts_equal_reference"] = equal
            result["ref_construction_s"] = baseline["construction_s"]
            result["ref_late_s"] = baseline["late_s"]
            result["late_speedup_vs_ref"] = (
                round(baseline["late_s"] / late, 2) if late > 0 else None)
            result["counters"] = baseline["counters"]
    return result


def _fresh_graph(ds, cfg):
    from metagenomics_tpu.graph import OverlapGraph
    u = ds.number_of_unique_reads
    ds.edges_forward = [[] for _ in range(u + 1)]
    ds.loc_forward = [[] for _ in range(u + 1)]
    ds.edges_reverse = [[] for _ in range(u + 1)]
    ds.loc_reverse = [[] for _ in range(u + 1)]
    ds.super_read_id[:] = 0
    return OverlapGraph(ds, cfg, log=lambda *a, **k: None)


def measure_native():
    """The threaded C++ engine (index + probe scan + verify + construction)
    with JAX forced to CPU so it never touches the TPU tunnel.  One warm-up
    run, then best of 3."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from metagenomics_tpu.config import AssemblerConfig
    from metagenomics_tpu.dataset import Dataset

    ds = Dataset([], [DATA_FILE], MIN_OVERLAP, log=lambda *a, **k: None)
    cfg = AssemblerConfig(min_overlap=MIN_OVERLAP)

    def run_once():
        graph = _fresh_graph(ds, cfg)
        t0 = time.time()
        assert graph.build_full_native()
        return time.time() - t0

    run_once()                      # warm-up
    # best of 9: this machine's 2 vCPUs see bursty steal from neighboring
    # VMs; the minimum is the real engine speed
    dt = min(run_once() for _ in range(9))
    return ds.number_of_unique_reads, dt


def measure_device_subprocess():
    """Run the device-pipeline measurement in a subprocess on the default
    (TPU) backend; returns the parsed result dict or None.  One retry if
    the subprocess dies (the tunneled TPU runtime occasionally drops the
    connection mid-run)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)   # let the TPU backend claim the device
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # link-health probe: the tunneled device link sometimes degrades to
    # KB/s; a full device run would then burn the measurement window.
    # Require a 1MB D2H round-trip to finish within the probe timeout.
    probe = ("import time,numpy as np,jax,jax.numpy as jnp;"
             "x=jnp.ones((512,512),jnp.float32);x.block_until_ready();"
             "t0=time.time();h=np.asarray(x);"
             "print('LINK_OK %.2f' % (time.time()-t0))")
    try:
        pr = subprocess.run([sys.executable, "-c", probe],
                            capture_output=True, text=True, timeout=300,
                            env=env)
        if "LINK_OK" not in pr.stdout:
            return None
    except subprocess.TimeoutExpired:
        return None
    for _attempt in range(2):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--device"],
                capture_output=True, text=True, timeout=3600, env=env)
        except subprocess.TimeoutExpired:
            continue
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                d = json.loads(line)
                if "backend" in d:
                    return d
            except ValueError:
                continue
    return None


def run_device_measurement():
    """Child-process body: device pipeline on whatever backend JAX picks
    (TPU when present).  Emits one JSON line with the phase breakdown and
    per-phase link/bandwidth utilization (VERDICT r4 item 2)."""
    import jax
    os.makedirs(JAX_CACHE, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", JAX_CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from metagenomics_tpu.config import AssemblerConfig
    from metagenomics_tpu.dataset import Dataset
    from metagenomics_tpu.ops.device_overlap import DeviceOverlapPipeline
    from metagenomics_tpu import native

    ds = Dataset([], [DATA_FILE], MIN_OVERLAP, log=lambda *a, **k: None)
    cfg = AssemblerConfig(min_overlap=MIN_OVERLAP)

    def run_once():
        graph = _fresh_graph(ds, cfg)
        t0 = time.time()
        pipeline = DeviceOverlapPipeline(ds, MIN_OVERLAP)
        t1 = time.time()
        canon = pipeline.stream_canon(check_cont=False)
        t2 = time.time()
        counts, words, _sup, _fh = canon
        res = native.build_graph_stream_canon_words(
            ds.lengths, counts, words, pipeline.off_bits,
            MIN_OVERLAP - 1, cfg.dead_end_length)
        graph._load_native_result(res)
        t3 = time.time()
        return {"total": t3 - t0, "index": t1 - t0, "stream": t2 - t1,
                "build": t3 - t2, "canon_records": len(words)}

    def run_device_only():
        t0 = time.time()
        pipeline = DeviceOverlapPipeline(ds, MIN_OVERLAP)
        pipeline.stream(check_cont=False, download=False)
        return time.time() - t0

    def utilization():
        """Per-phase device accounting (VERDICT r4 item 2): stage times
        with explicit sync points, the MINIMUM data volume each stage must
        move, the implied achieved bandwidth (a lower bound — sorts make
        multiple passes), and % of the chip's HBM roofline.  For the
        transfer stages the comparison is the LINK's own measured peak, so
        the table separates "device is slow" from "the link is slow"."""
        import numpy as np
        import jax.numpy as jnp
        from metagenomics_tpu.ops import device_overlap as dov

        HBM_PEAK_GBPS = 819.0          # TPU v5e HBM bandwidth
        u = {}

        # link microbenchmarks (fresh buffers, device-computed for D2H)
        k = jax.jit(lambda x: x * 2 + 1)
        d = k(jnp.ones(((8 << 20) // 4,), jnp.float32))
        np.asarray(d)
        ts = []
        for _ in range(3):
            d = k(d)
            t0 = time.time()
            np.asarray(d)
            ts.append(time.time() - t0)
        u["link_d2h_MBps"] = round(8 / min(ts), 1)
        a = np.ones((8 << 20) // 4, np.float32)
        ts = []
        for _ in range(3):
            t0 = time.time()
            jnp.asarray(a).block_until_ready()
            ts.append(time.time() - t0)
        u["link_h2d_MBps"] = round(8 / min(ts), 1)
        x = jnp.ones((8,), jnp.float32)
        f = jax.jit(lambda a: a + 1)
        np.asarray(f(x))
        ts = []
        for _ in range(6):
            t0 = time.time()
            np.asarray(f(x))
            ts.append(time.time() - t0)
        u["dispatch_roundtrip_ms"] = round(1e3 * min(ts), 2)

        def sync(arr):
            np.asarray(arr.ravel()[:1])

        def best_of(fn, k=3):
            """Best-of-k stage time: the tunnel's dispatch latency is
            bursty, the minimum is the real stage speed."""
            times = []
            out = None
            for _ in range(k):
                t0 = time.time()
                out = fn()
                times.append(time.time() - t0)
            return min(times), out

        phases = {}
        t_pack, pf_host = best_of(lambda: dov.pack_codes_host(ds.codes_fwd))
        phases["host_pack"] = {"s": round(t_pack, 4),
                               "MB": round(pf_host.nbytes / 1e6, 1)}
        lengths = jnp.asarray(ds.lengths.astype(np.int32))

        def upload():
            d = jnp.asarray(pf_host)
            d.block_until_ready()
            return d
        t_up, pf = best_of(upload)
        phases["h2d_upload"] = {
            "s": round(t_up, 4), "MB": round(pf_host.nbytes / 1e6, 1),
            "MBps": round(pf_host.nbytes / 1e6 / t_up, 1),
            "pct_link_peak": round(100 * pf_host.nbytes / 1e6 / t_up
                                   / max(u["link_h2d_MBps"], 1e-9), 1)}

        p = DeviceOverlapPipeline.__new__(DeviceOverlapPipeline)
        p.ds = ds
        p.hash_len = MIN_OVERLAP - 1
        lmax = ds.codes_fwd.shape[1]
        p.lmax = lmax
        p.w = (lmax + 15) // 16
        p.qw_max = (lmax - p.hash_len) >> 4
        p.wp = p.qw_max + p.w + 1
        n1 = ds.codes_fwd.shape[0]
        p.npos = lmax - p.hash_len + 1
        p.lengths = lengths
        use_pallas = jax.default_backend() == "tpu"

        def setup():
            r = dov._setup_kernel(pf, lengths, p.hash_len, p.w, p.wp,
                                  lmax, use_pallas)
            sync(r[3])
            return r
        t_set, (p.packed2, p.hf, p.sk, p.sid) = best_of(setup)
        # minimum traffic: read packed (5MB), write codes+flip (2x18MB),
        # write packed2 (2x wp words), write 2 hash matrices (2x n*npos*4),
        # read them for key extraction, index sort in+out (0.78M x 8B)
        hash_mb = 2 * n1 * p.npos * 4 / 1e6
        vol_set = (pf_host.nbytes / 1e6 + 2 * n1 * lmax * 2 / 1e6
                   + 2 * n1 * p.wp * 4 / 1e6 + 2 * hash_mb
                   + 2 * 4 * (n1 - 1) * 8 / 1e6)
        phases["setup_kernel"] = {
            "s": round(t_set, 4), "min_MB": round(vol_set, 1),
            "GBps_lower_bound": round(vol_set / 1e3 / t_set, 1),
            "pct_hbm_peak": round(100 * vol_set / 1e3 / t_set
                                  / HBM_PEAK_GBPS, 1)}

        m = int(p.sk.shape[0])
        sum_block = 1 << max(3, min(12, (1 << 31).bit_length()
                                    - max(m, 1).bit_length() - 2))

        def probe():
            r = dov._probe_join(p.hf, lengths, p.sk, p.hash_len, sum_block)
            sync(r[2])
            return r
        t_probe, (p.rk, p.rleft, p.rcnt, h_total, parts) = best_of(probe)
        nq = n1 * p.npos + m
        # two stable sorts over (key,payload) pairs of all queries + index
        vol_probe = 2 * 2 * nq * 8 / 1e6
        phases["probe_join"] = {
            "s": round(t_probe, 4), "queries": n1 * p.npos,
            "min_MB": round(vol_probe, 1),
            "GBps_lower_bound": round(vol_probe / 1e3 / t_probe, 1),
            "pct_hbm_peak": round(100 * vol_probe / 1e3 / t_probe
                                  / HBM_PEAK_GBPS, 1)}
        p.h_total = int(h_total)
        p.grand = int(np.asarray(parts).sum(dtype=np.int64))
        nn = n1 - 1
        bits_r2 = max(1, nn.bit_length())
        bits_off = max(1, (lmax - MIN_OVERLAP + 1).bit_length())
        p.off_bits = bits_off if bits_r2 + 4 + bits_off <= 32 else -1
        lens = ds.lengths[1:]
        p.uniform_len = (int(lens[0])
                         if len(lens) and (lens == lens[0]).all() else -1)

        cap, nqt, chunks = p._plan_chunks()
        rk_pad, rleft_pad, rcnt_pad = p._padded(nqt)
        h0, nh = chunks[0]

        def emit():
            r = dov._emit2(
                p.packed2, lengths, rk_pad, rleft_pad, rcnt_pad, p.sid,
                np.int32(h0), np.int32(nh), np.int32(0), p.hash_len, nqt,
                cap, p.npos, p.w, p.qw_max, False, p.off_bits,
                p.uniform_len, dedup=True)
            return r + (int(r[2]),)
        t_emit, (out, kc, n_keep, nk) = best_of(emit)
        # expansion scatter+scan (cap x 4B x ~4 arrays), candidate gathers
        # (bucket geometry + id + entry: 3 x cap x 4B), verification row
        # gathers (2 x cap x wp x 4B), final sort in+out (2 x cap x 8B)
        vol_emit = (4 * cap * 4 + 3 * cap * 4 + 2 * cap * p.wp * 4
                    + 2 * cap * 8 * 2) / 1e6
        phases["emit_verify"] = {
            "s": round(t_emit, 4), "candidates": p.grand,
            "survivors": nk, "min_MB": round(vol_emit, 1),
            "GBps_lower_bound": round(vol_emit / 1e3 / t_emit, 1),
            "pct_hbm_peak": round(100 * vol_emit / 1e3 / t_emit
                                  / HBM_PEAK_GBPS, 1)}

        t_fetch, parts2 = best_of(lambda: p._fetch_packed([(out, nk)]))
        mb = parts2[0].nbytes / 1e6
        phases["d2h_fetch"] = {
            "s": round(t_fetch, 4), "MB": round(mb, 1),
            "MBps": round(mb / t_fetch, 1),
            "pct_link_peak": round(100 * mb / t_fetch
                                   / max(u["link_d2h_MBps"], 1e-9), 1)}
        counts = np.asarray(kc).astype(np.int64)
        t_build, _ = best_of(lambda: native.build_graph_stream_canon_words(
            ds.lengths, counts, parts2[0], p.off_bits, MIN_OVERLAP - 1,
            cfg.dead_end_length), k=2)
        phases["host_replay"] = {
            "s": round(t_build, 4), "records": nk,
            "Mrec_per_s": round(nk / 1e6 / t_build, 1)}
        u["phases"] = phases
        u["hbm_peak_GBps"] = HBM_PEAK_GBPS
        u["note"] = ("min_MB is the stage's minimum data volume; "
                     "GBps_lower_bound = min_MB/time, a floor on achieved "
                     "HBM bandwidth (sorts make multiple passes). Transfer "
                     "stages compare against the measured LINK peak.")
        return u

    def run_hybrid():
        """Hybrid CPU+device engine: concurrent CPU shard scan + device
        shard pipeline, exact canonical merge (graph/build.py)."""
        graph = _fresh_graph(ds, cfg)
        ds.super_read_id[:] = 0
        t0 = time.time()
        ok = graph.build_hybrid()
        dt = time.time() - t0
        return dt if ok else None

    run_once()                      # warm-up (compiles cache to JAX_CACHE)
    run_device_only()
    runs = [run_once() for _ in range(3)]
    best = min(runs, key=lambda r: r["total"])
    # best of 6: the tunneled link's dispatch latency is bursty; the
    # minimum is the real device speed
    dev = min(run_device_only() for _ in range(6))
    hybrid = None
    try:
        if run_hybrid() is not None:
            hs = [run_hybrid() for _ in range(3)]
            if all(h is not None for h in hs):
                hybrid = min(hs)
    except Exception:
        hybrid = None
    util = None
    try:
        util = utilization()
    except Exception:
        pass
    n = ds.number_of_unique_reads

    # on-TPU Pallas regression check: the tile-kernel window hashes must be
    # bit-identical to the lax.scan reference ON THE REAL BACKEND (the
    # interpret-mode test in tests/test_ops.py only proves CPU semantics).
    pallas_identical = None
    if jax.default_backend() == "tpu":
        try:
            import numpy as np
            import jax.numpy as jnp
            from metagenomics_tpu.ops.pallas_hash import window_hashes_pallas
            from metagenomics_tpu.ops.device_overlap import window_hashes_u32
            codes = jnp.asarray(ds.codes_fwd[:4096] & 3)
            a = np.asarray(window_hashes_pallas(codes, MIN_OVERLAP - 1))
            b = np.asarray(window_hashes_u32(codes, MIN_OVERLAP - 1))
            pallas_identical = bool((a == b).all())
            with open(os.path.join(REPO, "TPU_KERNEL_CHECK.json"), "w") as f:
                json.dump({"backend": jax.default_backend(),
                           "device": str(jax.devices()[0]),
                           "kernel": "window_hashes_pallas",
                           "rows": int(codes.shape[0]),
                           "bit_identical": pallas_identical}, f, indent=1)
        except Exception:
            pallas_identical = False

    print(json.dumps({
        "backend": jax.default_backend(),
        "reads_per_s": round(n / best["total"], 1),
        "device_compute_reads_per_s": round(n / dev, 1),
        "hybrid_reads_per_s": (round(n / hybrid, 1) if hybrid else None),
        "pallas_bit_identical": pallas_identical,
        "phases_s": {k: (round(v, 3) if isinstance(v, float) else v)
                     for k, v in best.items()},
        "utilization": util,
    }))


def measure_reference():
    """Run the reference binary on the bench dataset, parse CLOCKSTOP.
    Only the -O0 binary ships (the -O2 build crashed in CS2 mid-pipeline —
    golden/README_binaries.md); the cached bench_baseline.json preserves
    the faster -O2 construction-phase timing as the baseline."""
    for name in ("metagenomics_ref_O0",):
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
    if "--device" in sys.argv:
        run_device_measurement()
        return
    baseline = get_baseline()
    base_rps = baseline["reads_per_s"] if baseline else None

    # native first: the headline number must never share the machine with
    # the device subprocess (round-2 driver run recorded a contended 9.83x
    # where the uncontended engine measures ~11.6x)
    n_reads, secs = measure_native()
    native_rps = n_reads / secs

    late = None
    try:
        late = measure_late()
    except Exception:
        pass

    device = None
    try:
        device = measure_device_subprocess()
    except Exception:
        pass

    engines = {"native_cpu": {"reads_per_s": round(native_rps, 1),
                              "vs_baseline": round(native_rps / base_rps, 2)
                              if base_rps else 0.0}}
    if device:
        device["vs_baseline"] = (round(device["reads_per_s"] / base_rps, 2)
                                 if base_rps else 0.0)
        device["device_compute_vs_baseline"] = (
            round(device["device_compute_reads_per_s"] / base_rps, 2)
            if base_rps else 0.0)
        hybrid_rps = device.pop("hybrid_reads_per_s", None)
        engines["device_tpu"] = device
        if hybrid_rps:
            engines["hybrid_cpu_tpu"] = {
                "reads_per_s": hybrid_rps,
                "vs_baseline": (round(hybrid_rps / base_rps, 2)
                                if base_rps else 0.0),
                "what": "device shard + concurrent CPU shard, exact "
                        "canonical merge (MGTPU_HYBRID_CPU_FRAC=0.7); "
                        "the auto engine on single-chip TPU backends",
            }

    # Headline: the fastest END-TO-END engine rate on this machine
    # (apples-to-apples with the reference's end-to-end baseline; ADVICE
    # r3).  The device engine's compute-only rate stays as an annotated
    # field — on this machine the tunneled ~30MB/s device->host link
    # dominates its end-to-end number (BENCH_NOTES.md quantifies the
    # projection to a directly-attached host).
    value, headline = native_rps, "native_cpu"
    if device and device.get("backend") == "tpu":
        if device["reads_per_s"] > value:
            value, headline = device["reads_per_s"], "device_tpu"
        hy = engines.get("hybrid_cpu_tpu")
        if hy and hy["reads_per_s"] > value:
            value, headline = hy["reads_per_s"], "hybrid_cpu_tpu"

    record = {
        "metric": "overlap_detection_throughput",
        "value": round(value, 1),
        "unit": "reads/s",
        "vs_baseline": round(value / base_rps, 2) if base_rps else 0.0,
        "headline_engine": headline,
        "engines": engines,
    }
    if device and device.get("backend") == "tpu":
        record["device_compute_reads_per_s"] = round(
            device["device_compute_reads_per_s"], 1)
        record["device_compute_vs_baseline"] = device[
            "device_compute_vs_baseline"]
    if late:
        record["late_phases"] = late
    scale_path = os.path.join(REPO, "SCALE_10M.json")
    if os.path.exists(scale_path):
        try:
            with open(scale_path) as f:
                scale = json.load(f)
            if scale.get("n_reads", 0) >= 10_000_000:
                record["scale_10m"] = {
                    "n_reads": scale["n_reads"],
                    "ours_wall_s": scale["ours_native_cpu"]["wall_s"],
                    "ours_peak_rss_mb":
                        scale["ours_native_cpu"]["peak_rss_mb"],
                    "ref_wall_s": scale.get("reference_O0", {}).get("wall_s"),
                    "ref_peak_rss_mb":
                        scale.get("reference_O0", {}).get("peak_rss_mb"),
                    "speedup": scale.get("speedup"),
                    "artifacts_equal": scale.get("artifacts_equal"),
                }
        except Exception:
            pass
    # per-engine 1M-read construction rates on the REAL backend
    # (tools/measure_engines_1m.py): the 200k set is small enough that
    # the tunneled link's fixed costs dominate the device engine's wall;
    # at 1M reads they amortize and the device engine clears 10x
    # end-to-end under either baseline
    e1m_path = os.path.join(REPO, "SCALE_1M_ENGINES.json")
    if os.path.exists(e1m_path):
        try:
            with open(e1m_path) as f:
                e1m = json.load(f)
            record["scale_1m_engines"] = {
                "n_unique_reads": e1m.get("n_unique_reads"),
                "backend": e1m.get("backend"),
                "engines": e1m.get("engines"),
                "reference_reads_per_s_at_1m":
                    e1m.get("reference_O0", {}).get("reads_per_s"),
                "unitig_equal_reference":
                    e1m.get("unitig_equal_reference"),
            }
        except Exception:
            pass
    print(json.dumps(record))


if __name__ == "__main__":
    main()

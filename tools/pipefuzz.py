"""Full-pipeline fuzz harness: random repeat-heavy datasets, reference
binary vs our CLI, every artifact byte-compared.

Planted tandem/dispersed repeats induce self-loops and late-phase merges
(the heap-address twin-selection paths — COMPONENTS.md known deviations).
Usage: python tools/pipefuzz.py [seeds...]   (FUZZ_ENGINE=host|native|...,
MGTPU_NO_NATIVE=1 for the pure-Python path, FUZZ_MODE=pe for interleaved
paired-end datasets exercising the mate-pair/scaffolder merge paths,
FUZZ_MODE=mix for a combined -pe + -se run with cross-dataset contained
reads, FUZZ_L=<n> to sweep the min-overlap; default seeds 1..40)
"""
import os, random, subprocess, sys, tempfile, shutil

REF = "/root/repo/golden/metagenomics_ref_O0"
ARTS = [".unitig", "_flow.input", "graph1.gdl", "contigs1.fasta",
        "graph2.gdl", "contigs2.fasta", "graph3.gdl", "contigs3.fasta",
        "graph4.gdl", "contigs4.fasta", "_sortedReads.fasta"]
COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def gen(seed, path):
    rng = random.Random(seed)
    n_rep = rng.randint(1, 3)
    glen = rng.randint(4000, 8000)
    g = [rng.choice("ACGT") for _ in range(glen)]
    # plant tandem/dispersed repeats (induce self-loops + flow>1 edges)
    for _ in range(n_rep):
        rl = rng.randint(150, 400)
        s = rng.randint(0, glen - rl - 1)
        seg = g[s:s + rl]
        if rng.random() < 0.5:
            # tandem: duplicate in place
            g[s + rl:s + rl] = list(seg)
        else:
            d = rng.randint(0, len(g) - 1)
            g[d:d] = list(seg)
    genome = "".join(g)

    def mutate(r):
        if rng.random() < 0.05:  # low error rate
            j = rng.randint(0, len(r) - 1)
            r = r[:j] + rng.choice("ACGT") + r[j + 1:]
        return r

    def rc(r):
        return "".join(COMP[c] for c in reversed(r))

    if os.environ.get("FUZZ_MODE") == "pe":
        # interleaved mate pairs (the pairing Dataset expects): fragments
        # of ~300 bp, a read off each end, second mate reverse-complemented
        npairs = rng.randint(2500, 4500)
        with open(path, "w") as f:
            for i in range(npairs):
                L = rng.choice((60, 70, 80, 90, 100))
                frag = rng.randint(max(2 * L, 250), 400)
                p = rng.randint(0, len(genome) - frag)
                r1 = mutate(genome[p:p + L])
                r2 = mutate(rc(genome[p + frag - L:p + frag]))
                f.write(">p%d/1\n%s\n>p%d/2\n%s\n" % (i, r1, i, r2))
        return
    nreads = rng.randint(4000, 9000)
    cov_reads = []
    for i in range(nreads):
        L = rng.choice((60, 70, 80, 90, 100))
        p = rng.randint(0, len(genome) - L)
        r = genome[p:p + L]
        if rng.random() < 0.5:
            r = rc(r)
        r = mutate(r)
        cov_reads.append(r)
    with open(path, "w") as f:
        for i, r in enumerate(cov_reads):
            f.write(">r%d\n%s\n" % (i, r))


def run_one(seed):
    d = tempfile.mkdtemp(prefix="pf%d_" % seed)
    fa = os.path.join(d, "f.fasta")
    mode = os.environ.get("FUZZ_MODE")
    l_opt = os.environ.get("FUZZ_L", "40")
    if mode == "mix":
        # combined -pe + -se run: the PE and SE files sample the SAME
        # genome, so SE reads contain/overlap PE reads across dataset
        # boundaries (dataset numbering, cross-dataset mate remapping)
        fb = os.path.join(d, "g.fasta")
        os.environ["FUZZ_MODE"] = "pe"
        gen(seed, fa)
        os.environ["FUZZ_MODE"] = ""
        gen(seed, fb)
        os.environ["FUZZ_MODE"] = "mix"
        args = ["-pe", "1", fa, "-se", "1", fb]
    else:
        gen(seed, fa)
        kind = "-pe" if mode == "pe" else "-se"
        args = [kind, "1", fa]
    rd, od = os.path.join(d, "ref"), os.path.join(d, "ours")
    os.makedirs(rd); os.makedirs(od)
    r1 = subprocess.run([REF, *args, "-f", "x_", "-l", l_opt],
                        cwd=rd, capture_output=True, timeout=600)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    if os.environ.get("FUZZ_ENGINE"):
        # select the overlap engine under test (default: the CLI's auto)
        env["MGTPU_OVERLAP_ENGINE"] = os.environ["FUZZ_ENGINE"]
    r2 = subprocess.run([sys.executable, "-m", "metagenomics_tpu.cli",
                         *args, "-f", "x_", "-l", l_opt],
                        cwd=od, capture_output=True, timeout=900, env=env)
    if r1.returncode != r2.returncode:
        print("seed %d: rc ref=%d ours=%d  (%s)" % (seed, r1.returncode,
                                                    r2.returncode, d))
        return False
    bad = []
    for a in ARTS:
        fr, fo = os.path.join(rd, "x_" + a), os.path.join(od, "x_" + a)
        if os.path.exists(fr) != os.path.exists(fo):
            bad.append(a + "(exist)")
        elif os.path.exists(fr):
            with open(fr, "rb") as h1, open(fo, "rb") as h2:
                if h1.read() != h2.read():
                    bad.append(a)
    if bad:
        print("seed %d: DIFF %s  (%s)" % (seed, ",".join(bad), d))
        return False
    shutil.rmtree(d)
    return True


if __name__ == "__main__":
    seeds = [int(a) for a in sys.argv[1:]] or list(range(1, 41))
    fails = 0
    for s in seeds:
        ok = run_one(s)
        if not ok:
            fails += 1
        print("seed %d %s" % (s, "ok" if ok else "FAIL"), flush=True)
    print("done: %d/%d failed" % (fails, len(seeds)))

#!/usr/bin/env python3
"""Generate a REALISTIC paired-end FASTQ read set (round-4, SURVEY M0 debt).

Earlier golden generators deliberately produced clean reads (pure ACGT,
tiled positions, spaced SNPs) to keep CS2's flow-tie selection well-posed
for byte comparison.  The trajectory-faithful replay solver (cs2replay.py)
removed that constraint, so this set exercises everything real sequencing
data throws at the QC/ingest layer and the graph passes:

  genome (~45kb "real-ish" structure):
    * GC-skewed segments and AT-rich islands (composition bias)
    * an IS-element-like 780bp repeat at 3 scattered copies
    * tandem (ACGGC)^n and homopolymer runs (low-complexity neighborhoods)
    * a 2%-divergent segmental duplication (bubble -> removeSimilarEdges)
  reads (FASTQ, paired-end, ~28x):
    * Gaussian insert 420 +/- 45, read lengths ragged 88..112
    * 0.4% substitution errors, 0.2% of bases replaced by 'N' (QC kills
      those reads: non-ACGT)
    * 1.5% of reads replaced by junk: homopolymer-dominated (>80% one
      base -> low-complexity QC) or truncated below minOverlap
    * lowercase bases on ~10% of reads (ingest must uppercase)
    * random strand flips and mate-order swaps

Artifacts are captured from the reference binary by capture_real.sh-style
invocation (see README_binaries.md); tests/test_golden.py diffs all 11
artifacts plus the normalized log.
"""
import os
import random

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
os.makedirs(OUT, exist_ok=True)

COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N",
        "a": "t", "c": "g", "g": "c", "t": "a", "n": "n"}


def rc(s):
    return "".join(COMP[c] for c in reversed(s))


def biased_genome(rng, n, gc):
    acgt = "ACGT"
    w = [(1 - gc) / 2, gc / 2, gc / 2, (1 - gc) / 2]
    return "".join(rng.choices(acgt, weights=w, k=n))


def build_genome(rng):
    IS = biased_genome(rng, 780, 0.52)            # mobile-element repeat
    dup = biased_genome(rng, 1400, 0.55)          # segmental duplication
    dup_var = "".join(
        (c if rng.random() > 0.02 else rng.choice("ACGT".replace(c, "")))
        for c in dup)
    parts = [
        biased_genome(rng, 5200, 0.62),           # GC-rich segment
        IS,
        biased_genome(rng, 4100, 0.30),           # AT-rich island
        "ACGGC" * 36,                             # tandem repeat
        biased_genome(rng, 5600, 0.50),
        dup,
        biased_genome(rng, 3900, 0.45),
        IS,
        biased_genome(rng, 2800, 0.50),
        "A" * 120 + biased_genome(rng, 300, 0.5) + "T" * 90,  # homopolymers
        biased_genome(rng, 5100, 0.58),
        dup_var,
        biased_genome(rng, 4300, 0.40),
        IS,
        biased_genome(rng, 5900, 0.50),
    ]
    return "".join(parts)


def corrupt(rng, s):
    out = []
    for c in s:
        r = rng.random()
        if r < 0.002:
            out.append("N")
        elif r < 0.006:
            out.append(rng.choice("ACGT".replace(c, "")))
        else:
            out.append(c)
    return "".join(out)


def make_reads(rng, g, n_pairs):
    pairs = []
    for _ in range(n_pairs):
        ins = max(200, int(rng.gauss(420, 45)))
        pos = rng.randrange(0, max(1, len(g) - ins))
        l1 = rng.randrange(88, 113)
        l2 = rng.randrange(88, 113)
        frag = g[pos:pos + ins]
        r1 = frag[:l1]
        r2 = rc(frag[-l2:])
        r1, r2 = corrupt(rng, r1), corrupt(rng, r2)
        u = rng.random()
        if u < 0.008:                     # junk: homopolymer-dominated
            b = rng.choice("ACGT")
            r1 = b * int(len(r1) * 0.9) + r1[int(len(r1) * 0.9):]
        elif u < 0.015:                   # junk: truncated below minOverlap
            r2 = r2[:rng.randrange(10, 39)]
        if rng.random() < 0.10:
            r1 = r1.lower()
        if rng.random() < 0.5:
            r1, r2 = rc(r2), rc(r1)       # strand/mate swap
        pairs.append((r1, r2))
    return pairs


def main():
    rng = random.Random(20260821)
    g = build_genome(rng)
    pairs = make_reads(rng, g, 6200)
    path = os.path.join(OUT, "pe_real.fastq")
    with open(path, "w") as f:
        for i, (a, b) in enumerate(pairs):
            f.write("@real%d/1\n%s\n+\n%s\n" % (i, a, "I" * len(a)))
            f.write("@real%d/2\n%s\n+\n%s\n" % (i, b, "I" * len(b)))
    print("genome %d bp, %d pairs -> %s" % (len(g), len(pairs), path))


if __name__ == "__main__":
    main()

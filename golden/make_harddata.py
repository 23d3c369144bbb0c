#!/usr/bin/env python3
"""Generate ADVERSARIAL read sets that force the reference assembler's late
pipeline stages to fire (they all run 0 times on the easy golden sets):

  se_hard.fasta  - single-end, repeat-rich ~30kb genome: four distinct
                   two-copy 300bp repeats (branch nodes -> a >500-arc
                   min-cost-flow instance with a UNIQUE optimum, see the
                   note at Rs below), a D R3 E R3 F two-copy repeat cycle (reduceTrees dup-merge turns the E+R3 cycle
                   into a self-loop -> reduceLoops), and a strain bubble
                   (shared flanks, 800bp arm + 2%-SNP variant arm ->
                   removeSimilarEdges), plus 1-in/N-out repeat boundaries
                   (reduceTrees).
  pe_hard_a.fasta - paired-end, insert ~450: genome A R1 B R1 C with a 150bp
                   repeat R1 that mate pairs CAN span
                   (-> findSupportByMatepairsAndMerge), plus two genomes at
                   30x / 8x coverage sharing a 600bp repeat R2 that mate
                   pairs CANNOT span (-> a 2-in/2-out node with coverage-
                   separable edges -> resolveNodes).
  pe_hard_b.fasta - paired-end, insert ~300: genome X..gap..Y where no read
                   covers the 60bp gap but mate pairs span it
                   (scaffolder -> disconnected merge with 'N' gap).

Counter expectations are asserted by tests/test_golden_hard.py against the
captured reference logs (golden/out/*/log.txt).
"""
import random
import os

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
os.makedirs(OUT, exist_ok=True)

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def rc(s):
    return "".join(COMP[c] for c in reversed(s))


def genome(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def mutate(rng, s, rate):
    out = list(s)
    for i in range(len(out)):
        if rng.random() < rate:
            out[i] = rng.choice([c for c in "ACGT" if c != out[i]])
    return "".join(out)


def tile_reads(rng, g, rdlen, step, flip=True):
    """Deterministic tiling (full coverage) + strand flip per read."""
    reads = []
    for pos in range(0, len(g) - rdlen + 1, step):
        s = g[pos:pos + rdlen]
        if flip and rng.random() < 0.5:
            s = rc(s)
        reads.append(s)
    # make sure the final window is covered
    s = g[len(g) - rdlen:]
    if flip and rng.random() < 0.5:
        s = rc(s)
    reads.append(s)
    return reads


def write_fasta(path, reads):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(">r%d\n%s\n" % (i, r))


def se_hard():
    rng = random.Random(4242)
    # four DISTINCT two-copy repeats (A Rk B Rk C islands).  Two copies per
    # repeat keep the min-cost-flow optimum unique (an 8-copy repeat node
    # admits equal-cost alternate routings that CS2 and any other exact
    # solver may resolve differently); four islands push the flow instance
    # past 500 arcs.
    Rs = [genome(rng, 300) for _ in range(4)]
    R3 = genome(rng, 300)         # 2-copy cycle repeat: D R3 E R3 F.  After
                                  # flow-balanced reduceTrees duplication the
                                  # E+R3 cycle becomes a self-loop with 1 in +
                                  # 1 out -> reduceLoops
    W = genome(rng, 1500)         # bubble 5' flank (shared)
    S = genome(rng, 800)          # bubble arm
    S2 = mutate(rng, S, 0.02)     # 2% SNP variant arm (similar edges)
    Z = genome(rng, 1500)         # bubble 3' flank (shared)
    parts = []
    for k in range(4):
        parts.append(genome(rng, 1800 + 173 * k))
        parts.append(Rs[k])
        parts.append(genome(rng, 1400 + 211 * k))
        parts.append(Rs[k])
    parts.append(genome(rng, 1500))
    parts.append(R3 + genome(rng, 1800) + R3)   # D R3 E R3 F cycle
    parts.append(genome(rng, 1600))
    parts.append(W + S + Z)        # strain bubble: parallel edges with
    parts.append(genome(rng, 1400))
    parts.append(W + S2 + Z)       # <5% edit distance -> removeSimilarEdges
    parts.append(genome(rng, 1700))
    g = "".join(parts)
    reads = tile_reads(rng, g, 100, 7)
    write_fasta(os.path.join(OUT, "se_hard.fasta"), reads)


def pe_spanning_pairs(rng, g, n, rdlen, insert_mean, insert_sd, forbid=None):
    """Mate pairs sampled across g; reads overlapping the forbidden interval
    [lo, hi) are dropped (both mates dropped together so pairing holds)."""
    reads = []
    for _ in range(n):
        ins = max(rdlen + 10, int(rng.gauss(insert_mean, insert_sd)))
        pos = rng.randrange(0, max(1, len(g) - ins))
        if forbid is not None:
            lo, hi = forbid
            r1_ok = pos + rdlen <= lo or pos >= hi
            r2_ok = pos + ins <= lo or pos + ins - rdlen >= hi
            if not (r1_ok and r2_ok):
                continue
        frag = g[pos:pos + ins]
        if len(frag) < ins:
            continue
        reads.append(frag[:rdlen])
        reads.append(rc(frag[-rdlen:]))
    return reads


def pe_tiled_pairs(rng, g, step, rdlen, insert_mean, jitter=20):
    """Deterministic fragment tiling: gap-free coverage at 2*rdlen/step x
    with tight per-base variance (no Poisson holes -> clean unitigs and
    statistically separable coverage depths for resolveNodes)."""
    reads = []
    i = 0
    for pos in range(0, len(g) - insert_mean - jitter, step):
        ins = insert_mean - jitter + (i * 17) % (2 * jitter + 1)
        i += 1
        frag = g[pos:pos + ins]
        if len(frag) < ins:
            continue
        r1 = frag[:rdlen]
        r2 = rc(frag[-rdlen:])
        if rng.random() < 0.5:
            reads.append(r1)
            reads.append(r2)
        else:
            reads.append(r2)
            reads.append(r1)
    return reads


def pe_hard():
    rng = random.Random(4343)
    # two genomes sharing ONE copy of a 150bp repeat M: after flow-balanced
    # reduceTrees duplication the M-end node is a 2-in/2-out X-node that only
    # mate pairs (insert 450 > 150 + 2*100) can resolve
    # (findSupportByMatepairsAndMerge)
    M = genome(rng, 150)
    g1a = genome(rng, 2200) + M + genome(rng, 2400)
    g1b = genome(rng, 2300) + M + genome(rng, 2100)
    # genomes H (30x) and L (8x) share a 600bp repeat R2 that insert ~450
    # cannot span: the R2 node keeps 2 in + 2 out edges whose coverage depths
    # separate statistically (resolveNodes)
    R2 = genome(rng, 600)
    gh = genome(rng, 2000) + R2 + genome(rng, 2000)
    gl = genome(rng, 2100) + R2 + genome(rng, 1900)
    # insert-size stats are per PE dataset: file A = insert 450, file B = 300
    reads_a = []
    reads_a += pe_spanning_pairs(rng, g1a, 500, 100, 450, 30)  # ~21x
    reads_a += pe_spanning_pairs(rng, g1b, 480, 100, 450, 30)  # ~21x
    reads_a += pe_tiled_pairs(rng, gh, 4, 100, 450)    # 50x, gap-free
    reads_a += pe_tiled_pairs(rng, gl, 32, 100, 450)   # 6.25x, gap-free
    write_fasta(os.path.join(OUT, "pe_hard_a.fasta"), reads_a)
    # genome 2: X [60bp gap] Y — no read covers the gap, mate pairs span it
    X = genome(rng, 2000)
    gap = genome(rng, 60)
    Y = genome(rng, 2000)
    g2 = X + gap + Y
    reads_b = pe_spanning_pairs(rng, g2, 1800, 100, 300, 25,
                                forbid=(len(X), len(X) + len(gap)))
    write_fasta(os.path.join(OUT, "pe_hard_b.fasta"), reads_b)


if __name__ == "__main__":
    se_hard()
    pe_hard()
    print("wrote hard test data to", OUT)

#!/usr/bin/env python3
"""Generate deterministic synthetic read sets for golden testing against the
reference assembler (abiswas-odu/metagenomics).

Produces, under golden/data/:
  se_small.fasta      - single-end reads from one 5kb genome, uniform length
  se_mixlen.fasta     - single-end reads, mixed lengths (exercises contained reads)
  pe_small.fasta      - paired-end reads (mates adjacent), insert ~300
  pe_meta.fastq       - paired-end FASTQ from two genomes (mock metagenome)
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


def sample_read(rng, g, length):
    pos = rng.randrange(0, len(g) - length + 1)
    s = g[pos:pos + length]
    if rng.random() < 0.5:
        s = rc(s)
    return s


def write_fasta(path, reads):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(">r%d\n%s\n" % (i, r))


def write_fastq(path, reads):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write("@r%d\n%s\n+\n%s\n" % (i, r, "I" * len(r)))


def se_small():
    rng = random.Random(42)
    g = genome(rng, 5000)
    reads = [sample_read(rng, g, 100) for _ in range(1500)]
    write_fasta(os.path.join(OUT, "se_small.fasta"), reads)


def se_mixlen():
    rng = random.Random(43)
    g = genome(rng, 4000)
    reads = []
    for _ in range(1800):
        reads.append(sample_read(rng, g, rng.choice([60, 80, 100, 120])))
    write_fasta(os.path.join(OUT, "se_mixlen.fasta"), reads)


def pe_pairs(rng, g, n, rdlen, insert_mean, insert_sd):
    reads = []
    for _ in range(n):
        ins = max(rdlen + 10, int(rng.gauss(insert_mean, insert_sd)))
        pos = rng.randrange(0, max(1, len(g) - ins))
        frag = g[pos:pos + ins]
        if len(frag) < ins:
            continue
        r1 = frag[:rdlen]
        r2 = rc(frag[-rdlen:])
        reads.append(r1)
        reads.append(r2)
    return reads


def pe_small():
    rng = random.Random(44)
    g = genome(rng, 6000)
    reads = pe_pairs(rng, g, 1200, 100, 300, 30)
    write_fasta(os.path.join(OUT, "pe_small.fasta"), reads)


def pe_meta():
    rng = random.Random(45)
    g1 = genome(rng, 5000)
    g2 = genome(rng, 7000)
    reads = pe_pairs(rng, g1, 900, 100, 300, 30) + pe_pairs(rng, g2, 1400, 100, 300, 30)
    write_fastq(os.path.join(OUT, "pe_meta.fastq"), reads)


if __name__ == "__main__":
    se_small()
    se_mixlen()
    pe_small()
    pe_meta()
    print("wrote test data to", OUT)

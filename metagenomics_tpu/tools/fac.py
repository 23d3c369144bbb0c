"""Assembly contiguity statistics (N50/N80/N20).

Semantics follow the reference's bundled abyss-fac
(MetaGenomics/Debug/abyss-fac.pl:44-109): sequences shorter than the
threshold (default 200) are counted but excluded; N-statistics walk the
length-sorted contigs from the largest until the cumulative sum crosses the
corresponding fraction of the total (or of --genome-size when given).

Usage: python -m metagenomics_tpu.tools.fac [-t N] [-g SIZE] contigs.fasta...
"""

import argparse
import sys


def fac_stats(path, threshold=200, genome_size=None):
    lengths = []
    short = 0
    total = 0
    seq_len = 0
    have = False
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                if have:
                    if seq_len < threshold:
                        short += 1
                    else:
                        lengths.append(seq_len)
                        total += seq_len
                have = True
                seq_len = 0
            else:
                seq_len += sum(1 for c in line.upper() if c in "ACGT")
    if have:
        if seq_len < threshold:
            short += 1
        else:
            lengths.append(seq_len)
            total += seq_len
    if not lengths:
        return None
    lengths.sort()
    target = genome_size if genome_size is not None else total
    n20 = n50 = n80 = None
    nn50 = 0
    n20sum = n50sum = n80sum = 0
    stack = list(lengths)
    while stack and n80sum < 0.8 * target:
        x = stack.pop()
        if n20sum < 0.2 * target:
            n20 = x
            n20sum += x
        if n50sum < 0.5 * target:
            nn50 += 1
            n50 = x
            n50sum += x
        if n80sum < 0.8 * target:
            n80 = x
            n80sum += x
    return {
        "n": short + len(lengths), "n_kept": len(lengths), "n_n50": nn50,
        "min": lengths[0], "N80": n80, "N50": n50, "N20": n20,
        "max": lengths[-1], "sum": total,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-t", "--threshold", type=int, default=200)
    p.add_argument("-g", "--genome-size", type=int, default=None)
    p.add_argument("files", nargs="+")
    args = p.parse_args(argv)
    cols = ["n", "n_kept", "n_n50", "min", "N80", "N50", "N20", "max", "sum"]
    print("\t".join(cols + ["file"]))
    for path in args.files:
        st = fac_stats(path, args.threshold, args.genome_size)
        if st is None:
            print("warning: `%s' is empty" % path, file=sys.stderr)
            continue
        print("\t".join(str(st[c]) for c in cols) + "\t" + path)


if __name__ == "__main__":
    main()

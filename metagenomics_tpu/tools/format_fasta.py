"""Flatten multi-line FASTA to one uppercase line per sequence
(reference: MetaGenomics/Debug/format_fasta.pl).

Usage: python -m metagenomics_tpu.tools.format_fasta in.fasta > out.fasta
"""

import sys


def format_fasta(infile, outfile):
    header = None
    parts = []
    for line in infile:
        line = line.rstrip("\n")
        if line.startswith(">"):
            if header is not None:
                outfile.write(header + "\n" + "".join(parts).upper() + "\n")
            header = line
            parts = []
        else:
            parts.append(line)
    if header is not None:
        outfile.write(header + "\n" + "".join(parts).upper() + "\n")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if argv:
        with open(argv[0]) as f:
            format_fasta(f, sys.stdout)
    else:
        format_fasta(sys.stdin, sys.stdout)


if __name__ == "__main__":
    main()

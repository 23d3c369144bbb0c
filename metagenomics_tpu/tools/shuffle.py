"""Interleave separate R1/R2 mate files into the adjacent-mate layout the
assembler expects (reference: MetaGenomics/Debug/shuffleSequences_fasta.pl
and shuffleSequences_fastq.pl).

Usage: python -m metagenomics_tpu.tools.shuffle R1.fastx R2.fastx out.fastx
"""

import sys


def _records(path):
    with open(path) as f:
        first = f.read(1)
        f.seek(0)
        if first == ">":
            header = None
            parts = []
            for line in f:
                line = line.rstrip("\n")
                if line.startswith(">"):
                    if header is not None:
                        yield header + "\n" + "".join(parts) + "\n"
                    header = line
                    parts = []
                else:
                    parts.append(line)
            if header is not None:
                yield header + "\n" + "".join(parts) + "\n"
        elif first == "@":
            while True:
                rec = [f.readline() for _ in range(4)]
                if not rec[0]:
                    return
                yield "".join(rec)
        else:
            raise ValueError("Unknown input file format: " + path)


def shuffle(path1, path2, out):
    for r1, r2 in zip(_records(path1), _records(path2)):
        out.write(r1)
        out.write(r2)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        sys.stderr.write(__doc__)
        raise SystemExit(1)
    if len(argv) >= 3:
        with open(argv[2], "w") as out:
            shuffle(argv[0], argv[1], out)
    else:
        shuffle(argv[0], argv[1], sys.stdout)


if __name__ == "__main__":
    main()

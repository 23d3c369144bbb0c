"""FASTA/FASTQ record iteration with the reference's exact stream semantics.

The reference (MetaGenomics/Dataset.cpp:110-193, 208-310) reads records with
std::getline in a `while(!eof())` loop:

* FASTA: one header getline + one '>'-delimited getline per record (newlines
  stripped from the sequence), so multi-line sequences are concatenated and
  the loop ends exactly at the last record.
* FASTQ: four getlines per record; because the trailing newline of the last
  record does not set eofbit, the loop runs one extra iteration yielding an
  empty sequence (which then fails QC and is counted as a bad read).  We
  reproduce that spurious record so read-accounting matches.

Paired-end variants consume two records per loop iteration (mates adjacent).
"""


class _Stream:
    """Mimics std::istream getline + eofbit semantics over an in-memory str."""

    def __init__(self, data: str):
        self.data = data
        self.pos = 0
        self.eof = False

    def getline(self, delim: str = "\n") -> str:
        if self.pos >= len(self.data):
            self.eof = True
            return ""
        idx = self.data.find(delim, self.pos)
        if idx == -1:
            s = self.data[self.pos:]
            self.pos = len(self.data)
            self.eof = True
            return s
        s = self.data[self.pos: idx]
        self.pos = idx + 1
        return s


def detect_format(text: str) -> str:
    if text[:1] == ">":
        return "fasta"
    if text[:1] == "@":
        return "fastq"
    raise ValueError("Unknown input file format.")


def fastx_records(path: str):
    """Yield uppercased sequence strings, one per record, reference-style."""
    with open(path) as f:
        text = f.read()
    fmt = detect_format(text)
    st = _Stream(text)
    if fmt == "fasta":
        while not st.eof:
            st.getline()
            seq = st.getline(">").replace("\n", "")
            yield seq.upper()
    else:
        while not st.eof:
            lines = [st.getline() for _ in range(4)]
            yield lines[1].upper()


def fastx_pairs(path: str):
    """Yield uppercased (seq1, seq2) mate pairs, two records per iteration."""
    with open(path) as f:
        text = f.read()
    fmt = detect_format(text)
    st = _Stream(text)
    if fmt == "fasta":
        while not st.eof:
            st.getline()
            s1 = st.getline(">").replace("\n", "")
            st.getline()
            s2 = st.getline(">").replace("\n", "")
            yield s1.upper(), s2.upper()
    else:
        while not st.eof:
            lines = [st.getline() for _ in range(8)]
            yield lines[1].upper(), lines[5].upper()

"""Normalized reference-log comparison (VERDICT r3 item 9).

The full CLI stdout must equal the captured reference log modulo the
run-varying content: timing values, memory counters, file paths, and the
argv echo's binary path / output prefix.
"""

import re


def normalize_log(text):
    out = []
    for line in text.splitlines():
        line = re.sub(r"^Currently in file: \S+ Function: (\w+)\(\)$",
                      r"Currently in: \1()", line)
        line = re.sub(r"^(Function \w+\(\) finished in ).* Seconds\.$",
                      r"\1X Seconds.", line)
        line = re.sub(r"^Memory used: .*MB\.$", "Memory used: X MB.", line)
        # absolute/relative paths -> basename
        line = re.sub(r"(\.\./)+[\w/.-]*/(\w[\w.-]*\.(fasta|fastq))",
                      r"\2", line)
        line = re.sub(r"/[\w/.-]*/(\w[\w.-]*\.(fasta|fastq))", r"\1", line)
        if "metagenomics_ref_O0" in line or "cli.py" in line:
            line = re.sub(r"^\S*(metagenomics_ref_O0|cli\.py)\s*",
                          "BIN ", line).rstrip()
            line = re.sub(r"-f \S+", "-f X", line)
        out.append(line.rstrip())
    return out


def assert_log_equal(stdout_text, ref_log_path, label):
    ours = normalize_log(stdout_text)
    ref = normalize_log(open(ref_log_path).read())
    assert ours == ref, _first_diff(ref, ours, label)


def _first_diff(ref, ours, label):
    import difflib
    diff = list(difflib.unified_diff(ref, ours, "ref", "ours", lineterm=""))
    return "log mismatch (%s):\n%s" % (label, "\n".join(diff[:40]))

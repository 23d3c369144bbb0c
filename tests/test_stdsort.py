"""Fuzz the libstdc++ std::sort behavioral clone against the real compiler.

The reference assembler's tie order (equal contig lengths, equal support
counts, parallel edges with equal offsets) is introsort's element order, so
utils/stdsort.py must reproduce g++'s std::sort movement-for-movement.
"""

import os
import random
import shutil
import subprocess
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metagenomics_tpu.utils.stdsort import std_sort

ORACLE_SRC = r"""
#include <algorithm>
#include <cstdio>
#include <vector>
struct Item { long key; long idx; };
bool lessKey(const Item &a, const Item &b) { return a.key < b.key; }
int main() {
    long n;
    while (scanf("%ld", &n) == 1) {
        std::vector<Item> v(n);
        for (long i = 0; i < n; i++) { scanf("%ld", &v[i].key); v[i].idx = i; }
        std::sort(v.begin(), v.end(), lessKey);
        for (long i = 0; i < n; i++) printf("%ld ", v[i].idx);
        printf("\n");
    }
    return 0;
}
"""


@pytest.fixture(scope="module")
def oracle():
    gxx = shutil.which("g++")
    if gxx is None:
        pytest.skip("g++ not available")
    d = tempfile.mkdtemp()
    src = os.path.join(d, "oracle.cpp")
    binp = os.path.join(d, "oracle")
    with open(src, "w") as f:
        f.write(ORACLE_SRC)
    subprocess.run([gxx, "-O0", "-o", binp, src], check=True)
    return binp


def test_std_sort_matches_gxx(oracle):
    rng = random.Random(20260819)
    cases = []
    for _ in range(200):
        n = rng.choice([0, 1, 2, 15, 16, 17, 31, 64, 100, 257, 1000, 4096])
        maxkey = rng.choice([1, 2, 3, 5, 10, 1000])
        cases.append([rng.randrange(maxkey) for _ in range(n)])
    inp = []
    for keys in cases:
        inp.append(str(len(keys)))
        inp.extend(map(str, keys))
    out = subprocess.run([oracle], input=" ".join(inp),
                         capture_output=True, text=True).stdout.splitlines()
    assert len(out) == len(cases)
    for keys, line in zip(cases, out):
        want = [int(x) for x in line.split()]
        items = list(enumerate(keys))
        std_sort(items, lambda x, y: x[1] < y[1])
        got = [i for i, _ in items]
        assert got == want, "introsort order mismatch at n=%d" % len(keys)


def test_std_sort_is_a_sort():
    rng = random.Random(7)
    for _ in range(50):
        n = rng.randrange(0, 300)
        a = [rng.randrange(20) for _ in range(n)]
        b = list(a)
        std_sort(b, lambda x, y: x < y)
        assert b == sorted(a)

"""l-mer prefix/suffix index and candidate join.

The reference builds an open-addressing hash table with 4 entries per read —
prefix/suffix of the forward and reverse strands, tagged orient 0..3
(MetaGenomics/HashTable.cpp:88-104) — and probes it with every proper
substring of every read (OverlapGraph.cpp:529-565, :225-290).  A bucket holds
all entries sharing one exact l-mer, in insertion order (read id ascending,
orient 0..3 within a read).

Here the index is a sorted key table: the 4U l-mers are extracted as byte
rows, sorted bytewise (stable, so bucket order is preserved), and probed with
vectorized searchsorted over all (read, position) queries at once.  The
result is a flat CandidateBatch in exactly the reference's discovery order
(read asc, j asc, bucket order), which downstream replay consumes.
"""

import numpy as np

from .ops.overlap import CandidateBatch


def _as_void(arr: np.ndarray) -> np.ndarray:
    """View uint8 rows [n, w] as a void column for memcmp-style compare."""
    arr = np.ascontiguousarray(arr)
    return arr.view("V%d" % arr.shape[1]).reshape(-1)


class OverlapIndex:
    def __init__(self, dataset, min_overlap: int):
        self.dataset = dataset
        self.hash_len = min_overlap - 1
        l = self.hash_len
        u = dataset.number_of_unique_reads
        lens = dataset.lengths
        cf, cr = dataset.codes_fwd, dataset.codes_rev

        # 4 keys per read in (read, orient) order: prefix-fwd, suffix-fwd,
        # prefix-rev, suffix-rev (HashTable.cpp:98-101).
        keys = np.empty((4 * u, l), dtype=np.uint8)
        rid = np.repeat(np.arange(1, u + 1), 4)
        orient = np.tile(np.arange(4, dtype=np.uint8), u)
        ar = np.arange(l)
        pre_idx = ar[None, :]
        suf_idx = (lens[1:, None] - l) + ar[None, :]
        keys[0::4] = np.take_along_axis(cf[1:], pre_idx.repeat(u, 0), axis=1)
        keys[1::4] = np.take_along_axis(cf[1:], suf_idx, axis=1)
        keys[2::4] = np.take_along_axis(cr[1:], pre_idx.repeat(u, 0), axis=1)
        keys[3::4] = np.take_along_axis(cr[1:], suf_idx, axis=1)

        kv = _as_void(keys)
        order = np.argsort(kv, kind="stable")
        self.sorted_keys = kv[order]
        self.sorted_rid = rid[order].astype(np.int64)
        self.sorted_orient = orient[order]

    def candidates(self, read_ids=None) -> CandidateBatch:
        """All hash hits for every proper substring of the given reads
        (default: all reads), in reference discovery order."""
        ds = self.dataset
        l = self.hash_len
        if read_ids is None:
            read_ids = np.arange(1, ds.number_of_unique_reads + 1)
        read_ids = np.asarray(read_ids, dtype=np.int64)
        lens = ds.lengths[read_ids]
        nq = np.maximum(lens - l - 1, 0)           # j runs 1 .. len-l-1
        i_arr = np.repeat(read_ids, nq)
        j_arr = np.concatenate([np.arange(1, n + 1) for n in nq]) if len(nq) else \
            np.zeros(0, np.int64)

        if len(i_arr) == 0:
            z = np.zeros(0, np.int64)
            return CandidateBatch(z, z, z, np.zeros(0, np.uint8))

        windows = ds.codes_fwd[i_arr[:, None], j_arr[:, None] + np.arange(l)[None, :]]
        qv = _as_void(windows)
        left = np.searchsorted(self.sorted_keys, qv, side="left")
        right = np.searchsorted(self.sorted_keys, qv, side="right")
        counts = right - left

        r1 = np.repeat(i_arr, counts)
        j = np.repeat(j_arr, counts)
        # position within bucket for each emitted candidate
        total = int(counts.sum())
        within = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
        src = np.repeat(left, counts) + within
        return CandidateBatch(
            r1=r1, j=j, r2=self.sorted_rid[src], orient=self.sorted_orient[src])

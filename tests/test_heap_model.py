"""Unit tests for the Edge heap-address model (GraphCore._alloc_addr).

The reference picks which twin of a self-loop to emit by comparing Edge
POINTERS (OverlapGraph.cpp:460/:1237); those addresses come from glibc
malloc's per-size-class reuse.  GraphCore models the mechanism: a depth-7
LIFO tcache, an unbounded LIFO fastbin spillover whose refill into the
tcache reverses chunk order, and consolidation barriers where the
reference frees >= 64 KiB scratch.  The end-to-end pin is the `se_heap`
golden config (test_golden.py); these tests pin the allocator semantics
in isolation.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metagenomics_tpu.graph.core import GraphCore


def _bare_core():
    g = GraphCore.__new__(GraphCore)
    g._addr_free = []
    g._addr_fast = []
    g._addr_next = 0
    g._addr_track = True
    return g


def test_fresh_addresses_ascend():
    g = _bare_core()
    assert [g._alloc_addr() for _ in range(4)] == [1, 2, 3, 4]


def test_tcache_is_lifo():
    g = _bare_core()
    a = [g._alloc_addr() for _ in range(3)]
    for v in a:
        g._free_addr(v)
    # most recently freed chunk is returned first
    assert [g._alloc_addr() for _ in range(3)] == [3, 2, 1]


def test_tcache_capped_at_seven_then_fastbin():
    g = _bare_core()
    addrs = [g._alloc_addr() for _ in range(10)]
    for v in addrs:
        g._free_addr(v)
    assert g._addr_free == addrs[:7]
    assert g._addr_fast == addrs[7:]


def test_fastbin_refill_reverses_order():
    """On a tcache miss glibc takes the fastbin head and moves up to 7
    more head-first into the tcache; the next tcache pop therefore
    returns the OLDEST moved chunk (glibc malloc.c fastbin->tcache
    refill loop)."""
    g = _bare_core()
    addrs = [g._alloc_addr() for _ in range(12)]   # 1..12
    for v in addrs:
        g._free_addr(v)
    # tcache [1..7], fastbin [8..12]; drain the tcache: 7,6,...,1
    assert [g._alloc_addr() for _ in range(7)] == [7, 6, 5, 4, 3, 2, 1]
    # tcache miss: victim is the fastbin head (12); 11,10,9,8 move into
    # the tcache head-first, so the next pops give 8, 9, 10, 11
    assert g._alloc_addr() == 12
    assert [g._alloc_addr() for _ in range(4)] == [8, 9, 10, 11]
    # pool exhausted: fresh again
    assert g._alloc_addr() == 13


def test_remove_edge_frees_twin_then_edge():
    """removeEdge deletes the twin first, then the edge
    (OverlapGraph.cpp:873/:886), so the next allocation (a merge's
    forward edge) reuses the EDGE's chunk and the one after (its twin)
    the old twin's chunk."""
    from metagenomics_tpu.graph.core import Edge

    g = _bare_core()
    g.adj = [[] for _ in range(4)]
    g.number_of_nodes = 0
    g.number_of_edges = 0
    g._serial = 0
    g._events = None

    class _DS:
        edges_forward = edges_reverse = ()
        loc_forward = loc_reverse = ()

        def read_length(self, r):
            return 60
    g.ds = _DS()
    g._addr_track = True
    e = Edge.__new__(Edge)
    t = Edge.__new__(Edge)
    for obj, s, d in ((e, 1, 2), (t, 2, 1)):
        obj.source, obj.destination = s, d
        obj.orient, obj.offset = 3, 10
        obj.list_reads = []
        obj.list_offsets = []
        obj.list_orients = []
        obj.flow = 0
        obj.coverage_depth = 0
        obj.sd = 0
        obj.transitive_flag = False
        obj.cached_str = None
    e.addr, t.addr = g._alloc_addr(), g._alloc_addr()   # 1, 2
    e.reverse, t.reverse = t, e
    e.serial, t.serial = 1, 2
    g.adj[1].append(e)
    g.adj[2].append(t)
    g.number_of_edges = 2

    g.remove_edge(e)
    # free order [twin, edge] -> LIFO pops edge.addr first
    assert g._addr_free == [t.addr, e.addr]
    assert g._alloc_addr() == e.addr
    assert g._alloc_addr() == t.addr

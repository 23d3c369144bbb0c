#!/usr/bin/env python
"""Analyze a heapspy log of the reference binary: find exactly which
late-phase Edge allocations our glibc heap model mispredicts and why
(VERDICT r4 item 6).

Inputs: a heapspy event log (n/d records with call sites, ASLR disabled)
and the four known Edge allocation sites:
    insertEdge twins  OverlapGraph.cpp:409/:412
    mergeEdges twins  OverlapGraph.cpp:704/:706

Method: replay OUR model (graph/core.py _alloc_addr/_free_addr semantics:
abstract fresh-ascending construction addresses, then tcache-7 LIFO +
fastbin with refill, consolidation barrier at the flow phase) over the
EDGE events only, exactly as the assembler does; compare each late-phase
mergeEdges twin pair's predicted fwd<twin order against the ACTUAL
pointers the reference got.  For every mismatch, print the surrounding
96-byte-class string traffic from the log — the events the model cannot
see.

Usage: python tools/heapspy_analyze.py /tmp/heapseedN/heap3.log PREFIX
"""

import sys
from collections import Counter

EDGE_INSERT = {"555555572907", "555555572965"}
EDGE_MERGE = {"555555575603", "555555575648"}
EDGE_SITES = EDGE_INSERT | EDGE_MERGE


def klass(size):
    """96-byte glibc chunk class: request sizes 73..88."""
    return 73 <= size <= 88


def main(path, prefix):
    # ------------------------------------------------------------- parse
    events = []          # (kind, size, ptr, site) kind in n/d/o
    for line in open(path):
        f = line.split()
        if f[0] == "n":
            events.append(("n", int(f[1]), f[2], f[3]))
        elif f[0] == "d":
            events.append(("d", 0, f[1], f[2]))
        elif f[0] == "o":
            events.append(("o", 0, f[1], ""))

    # locate the flow-output marker: everything after it is "late phases"
    marker = None
    for i, e in enumerate(events):
        if e[0] == "o" and e[2].endswith("_flow.output"):
            marker = i
    assert marker is not None, "no _flow.output marker in log"

    # ------------------------------------------- classify 96-class ptrs
    # current owner kind of each live ptr: 'E' edge / 'S' other-in-class
    owner = {}
    # abstract model address per live Edge ptr
    model_addr = {}
    serial = 0
    tcache = []          # model: LIFO, depth 7 (abstract addresses)
    fastbin = []
    tracking = False     # model tracks reuse only after construction;
                         # construction allocs are fresh-ascending

    # the model's own notion of construction end: the reference's unitig
    # fixpoint ends before saveGraphToFile; we approximate it with the
    # _flow.input marker (sortEdges/saveGraph allocate no Edges, so the
    # Edge-event stream is identical) and apply the flow consolidation
    # barrier at the _flow.output marker like graph/flow.py does.
    flow_in = None
    for i, e in enumerate(events):
        if e[0] == "o" and e[2].endswith("_flow.input"):
            flow_in = i
            break

    mism = []
    pairs_checked = 0
    pend_pair = None     # (actual_fwd_ptr, model_fwd_addr)
    last_events = []     # ring buffer of recent class events for context

    def model_alloc():
        nonlocal serial
        if tracking:
            if tcache:
                return tcache.pop()
            if fastbin:
                victim = fastbin.pop()
                while fastbin and len(tcache) < 7:
                    tcache.append(fastbin.pop())
                return victim
        serial += 1
        return serial

    def model_free(a):
        if not tracking:
            return
        if len(tcache) < 7:
            tcache.append(a)
        else:
            fastbin.append(a)

    for i, e in enumerate(events):
        kind, size, ptr, site = e
        if i == flow_in:
            tracking = True
        if i == marker:
            fastbin.clear()          # flow consolidation barrier
        if kind == "o":
            continue
        if kind == "n":
            is_edge = site in EDGE_SITES and size == 88
            if klass(size):
                owner[ptr] = "E" if is_edge else "S"
                last_events.append((i, "n", size, ptr,
                                    "E" if is_edge else "S", site))
            if is_edge:
                a = model_alloc()
                model_addr[ptr] = a
                if site in EDGE_MERGE:
                    if site == "555555575603":
                        pend_pair = (ptr, a)
                    elif pend_pair is not None and i > marker:
                        fwd_ptr, fwd_a = pend_pair
                        actual = int(fwd_ptr, 16) < int(ptr, 16)
                        model = fwd_a < a
                        pairs_checked += 1
                        if actual != model:
                            mism.append((i, fwd_ptr, ptr, fwd_a, a,
                                         list(last_events[-14:])))
                        pend_pair = None
        else:  # delete
            k = owner.pop(ptr, None)
            if k is not None:
                last_events.append((i, "d", 0, ptr, k, site))
            if k == "E":
                a = model_addr.pop(ptr, None)
                if a is not None:
                    model_free(a)
        if len(last_events) > 40:
            del last_events[:20]

    print("late-phase merge twin pairs checked:", pairs_checked)
    print("model/actual order mismatches:", len(mism))
    for i, fwd, twin, fa, ta, ctx in mism:
        print("\n== mismatch at event %d: fwd=%s twin=%s (model %d vs %d;"
              " actual %s)" % (i, fwd, twin, fa, ta,
                               "fwd<twin" if int(fwd, 16) < int(twin, 16)
                               else "twin<fwd"))
        print("   recent 96-class events (S = string/other in class):")
        for ev in ctx:
            print("    ", ev)

    # string-churn statistics in the late phases
    s_new = s_del = e_new = e_del = 0
    for i, e in enumerate(events[marker:], marker):
        kind, size, ptr, site = e
        if kind == "n" and klass(size):
            if site in EDGE_SITES and size == 88:
                e_new += 1
            else:
                s_new += 1
        elif kind == "d":
            pass
    print("\nlate-phase 96-class news: edges=%d strings/other=%d"
          % (e_new, s_new))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "x_")

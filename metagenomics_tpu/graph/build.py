"""Graph construction: contained reads, BFS edge insertion, transitive reduction.

The heavy work — enumerating every (read, position) probe against the l-mer
index and verifying each hit base-by-base — happens in one shot on device
(index.OverlapIndex.candidates + ops.overlap.verify_candidates).  The replay
below then walks the verified hit stream in exactly the reference's BFS order
(OverlapGraph.cpp:107-218), inserting edges and interleaving Myers transitive
marking/removal (:574-661) so the final edge set, adjacency ordering and
interior manifests match the reference's.
"""

import numpy as np

from ..ops.overlap import CandidateBatch, verify_candidates
from ..utils.stdsort import std_sort
from .core import Edge

UNEXPLORED, EXPLORED, EXPLORED_MARKED = 0, 1, 2
VACANT, INPLAY, ELIMINATED = 0, 1, 2


def _resolve_supers(cont_r1, cont_r2, lengths, n):
    """Vectorized containment resolution over hits in global discovery
    order (OverlapGraph.cpp:225-290 semantics: first containing read wins,
    a strictly longer one replaces — equivalently, the FIRST hit whose
    container length equals the per-read maximum).  Returns (supers,
    firsthit_r1) arrays indexed by read id; firsthit_r1 feeds the per-1e6
    contained-read heartbeat lines."""
    supers = np.zeros(n + 1, np.int64)
    firsthit = np.zeros(n + 1, np.int64)
    if len(cont_r2) == 0:
        return supers, firsthit
    len1 = np.asarray(lengths)[cont_r1]
    pos = np.arange(len(cont_r2))
    order = np.lexsort((pos, cont_r2))
    r2s = cont_r2[order]
    l1s = len1[order]
    r1s = cont_r1[order]
    seg_start = np.concatenate([[True], r2s[1:] != r2s[:-1]])
    seg_id = np.cumsum(seg_start) - 1
    nseg = int(seg_id[-1]) + 1
    segmax = np.zeros(nseg, l1s.dtype)
    np.maximum.at(segmax, seg_id, l1s)
    ismax = l1s == segmax[seg_id]
    firstmax = np.full(nseg, len(r2s), np.int64)
    np.minimum.at(firstmax, seg_id[ismax], np.flatnonzero(ismax))
    starts = np.flatnonzero(seg_start)
    seg_r2 = r2s[starts]
    supers[seg_r2] = r1s[firstmax]
    firsthit[seg_r2] = r1s[starts]
    return supers, firsthit


class BuildMixin:
    # ------------------------------------------------------ contained reads

    def mark_contained_reads(self, index, batch=None):
        """Mark reads fully contained in longer reads
        (OverlapGraph.cpp:225-290: first super read wins, longer super read
        replaces)."""
        with self._clock("markContainedReads"):
            return self._mark_contained_reads(index, batch)

    def _mark_contained_reads(self, index, batch=None):
        ds = self.ds
        if ds.longest_read_length == ds.shortest_read_length:
            self.log("All reads are of same length. No contained reads.")
            return None
        if batch is None:
            batch = index.candidates()
        ok = verify_candidates(ds.codes_fwd, ds.codes_rev, ds.lengths, batch,
                               index.hash_len, mode="containment")
        len1 = ds.lengths[batch.r1]
        len2 = ds.lengths[batch.r2]
        hits = ok & (len1 > len2)
        sup = ds.super_read_id
        lens = ds.lengths
        counter = 0
        next_b = 1000000
        n_u = ds.number_of_unique_reads
        for k in np.flatnonzero(hits):
            r1 = int(batch.r1[k])
            r2 = int(batch.r2[k])
            while next_b <= n_u and r1 > next_b:
                self.log("%10d contained reads in %10d super reads."
                         % (counter, next_b))
                next_b += 1000000
            if sup[r2] == 0:
                sup[r2] = r1
                counter += 1
            elif lens[r1] > lens[sup[r2]]:
                sup[r2] = r1
        while next_b <= n_u:
            self.log("%10d contained reads in %10d super reads."
                     % (counter, next_b))
            next_b += 1000000
        contained = int((sup[1:] != 0).sum())
        self.log("")
        self.log("%10d Non-contained reads. (Keep as is)"
                 % (ds.number_of_unique_reads - contained))
        self.log("%10d contained reads. (Need to change their mate-pair "
                 "information)" % contained)
        return batch

    def _mark_contained_from_hits(self, batch, cont_ok):
        """Contained-read replay from a precomputed hit mask (device pipeline
        already applied the verification and the len1 > len2 filter)."""
        with self._clock("markContainedReads"):
            self._mark_contained_from_hits_inner(batch, cont_ok)

    def _mark_contained_from_hits_inner(self, batch, cont_ok):
        ds = self.ds
        if ds.longest_read_length == ds.shortest_read_length:
            self.log("All reads are of same length. No contained reads.")
            return
        sup = ds.super_read_id
        lens = ds.lengths
        counter = 0
        next_b = 1000000
        n_u = ds.number_of_unique_reads
        for k in np.flatnonzero(cont_ok):
            r1 = int(batch.r1[k])
            r2 = int(batch.r2[k])
            while next_b <= n_u and r1 > next_b:
                self.log("%10d contained reads in %10d super reads."
                         % (counter, next_b))
                next_b += 1000000
            if sup[r2] == 0:
                sup[r2] = r1
                counter += 1
            elif lens[r1] > lens[sup[r2]]:
                sup[r2] = r1
        while next_b <= n_u:
            self.log("%10d contained reads in %10d super reads."
                     % (counter, next_b))
            next_b += 1000000
        contained = int((sup[1:] != 0).sum())
        self.log("")
        self.log("%10d Non-contained reads. (Keep as is)"
                 % (ds.number_of_unique_reads - contained))
        self.log("%10d contained reads. (Need to change their mate-pair "
                 "information)" % contained)

    # --------------------------------------------------------- construction

    def build_full_native(self):
        """Whole construction phase (index, probe scan, containment, BFS,
        contraction) in the native C++ engine — the fast path when device
        interconnect bandwidth is poor.  Returns False if unavailable."""
        ds = self.ds
        from .. import native
        mixed = ds.longest_read_length != ds.shortest_read_length
        res = native.assemble_native(
            ds.lengths, ds.codes_fwd, ds.codes_rev,
            self.cfg.hash_string_length, mixed, self.cfg.dead_end_length)
        if res is None:
            return False
        ds.super_read_id[:] = res["supers"]
        self._log_contained(mixed, res["cont_heartbeats"])
        ds.read_mate_pairs_from_file()
        fixpoint_log = (res["bfs_nodes"], res["bfs_edges"], res["iter_log"],
                        res["bfs_heartbeats"])
        self._load_native_result(res)
        # the read->(edge, offset) inverted index was built as flat ARRAYS
        # inside the native engine (finalize_locations — that is the
        # reference's updateReadLocations construction work); conversion to
        # per-read Python lists happens lazily on first access, so phases
        # that never touch the lists (single-end runs, array-path
        # insert-size estimation) never pay for it
        res = None
        self._emit_native_fixpoint_log(*fixpoint_log)
        return True

    def _emit_native_fixpoint_log(self, bfs_nodes, bfs_edges, iter_log,
                                  heartbeats=()):
        """Replay the reference's construction log tail from the native
        engine's recorded counters: the mid-BFS progress heartbeats
        (counter%100000, OverlapGraph.cpp:200-201, reconstructed from
        per-component snapshots), the final BFS progress line (:205,
        counter == number of unique reads) and one contract/dead-end CLOCK
        block pair per fixpoint iteration (:211-215, including the
        terminating all-zero iteration)."""
        for counter, nodes, edges in heartbeats:
            self.log("counter: %10d Nodes: %10d Edges: %10d"
                     % (counter, nodes, edges // 2))
        self.log("counter: %10d Nodes: %10d Edges: %10d"
                 % (self.ds.number_of_unique_reads, bfs_nodes,
                    bfs_edges // 2))
        for merged, dead_nodes, dead_edges in iter_log:
            with self._clock("contractCompositePaths"):
                self.log("%10d composite Edges merged." % merged)
            with self._clock("removeDeadEndNodes"):
                self.log("Dead-end nodes removed: %d" % dead_nodes)
                self.log("Total Edges removed: %d" % dead_edges)

    def build_from_pipeline(self, pipeline):
        """buildOverlapGraphFromHashTable over the fully device-resident
        overlap pipeline (ops/device_overlap.py): the device emits the
        verified survivor stream, the threaded native replay builds the
        graph from it (mg_build_stream), Python materializes the result."""
        import os
        ds = self.ds
        mixed = ds.longest_read_length != ds.shortest_read_length
        use_native = (getattr(self.cfg, "use_native_build", True)
                      and not os.environ.get("MGTPU_NO_NATIVE"))

        if use_native and hasattr(pipeline, "stream_canon"):
            from .. import native
            if native.get_lib() is not None:
                canon = pipeline.stream_canon(check_cont=mixed)
                if canon is not None and self._build_from_canon(
                        canon, mixed, pipeline.off_bits):
                    return

        counts, r2, meta = pipeline.stream(check_cont=mixed)

        if use_native:
            from .. import native
            res = native.build_graph_stream(
                ds.lengths, counts, r2, meta, mixed, self.cfg.dead_end_length)
            if res is not None:
                ds.super_read_id[:] = res["supers"]
                self._log_contained(mixed, res["cont_heartbeats"])
                ds.read_mate_pairs_from_file()
                fixpoint_log = (res["bfs_nodes"], res["bfs_edges"],
                                res["iter_log"], res["bfs_heartbeats"])
                self._load_native_result(res)
                self._emit_native_fixpoint_log(*fixpoint_log)
                return

        # pure-Python fallback: unpack the stream and replay in Python
        r1 = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        eo = (meta & 3).astype(np.int64)
        eoff = (meta >> 4).astype(np.int64)
        edge_ok = ((meta >> 2) & 1).astype(bool)
        cont_ok = ((meta >> 3) & 1).astype(bool)
        batch = CandidateBatch(r1=r1, j=np.zeros_like(r1),
                               r2=r2.astype(np.int64),
                               orient=np.zeros(len(r1), np.uint8))
        self._mark_contained_from_hits(batch, cont_ok)
        ds.read_mate_pairs_from_file()
        sup = ds.super_read_id
        keep = edge_ok & (sup[batch.r1] == 0) & (sup[batch.r2] == 0)
        self._build_from_filtered(batch.r1[keep], batch.r2[keep],
                                  eo[keep], eoff[keep])

    def build_hybrid(self, cpu_frac=None):
        """Heterogeneous construction: the CPU natively scans reads
        [1, a) against the full index (native.scan_canon, on a worker
        thread) WHILE the device pipeline probes its shard [a, n]
        (DeviceOverlapPipeline(row_lo=a)).  Canonical records are keyed by
        their smaller endpoint, so the two shards partition the overlap
        set exactly and the word streams concatenate into the full
        canonical stream for the usual native replay — byte-identical
        artifacts by construction (tests/test_hybrid.py).

        Mixed-length datasets: both shards emit their containment hits in
        discovery order plus UNFILTERED canonical edge records; the
        host resolves supers globally (the reference's first-wins /
        longest-replaces rule, vectorized) and masks both edge streams
        symmetrically before the replay.

        The split fraction defaults to 0.9 (CPU side), tuned for a
        ~2-core host with a tunneled device link (both shards finish in
        ~0.4s; the 2-thread BFS replay then runs on the freed cores);
        override with MGTPU_HYBRID_CPU_FRAC / MGTPU_HYBRID_CPU_THREADS."""
        import os
        import threading
        ds = self.ds
        mixed = ds.longest_read_length != ds.shortest_read_length
        from .. import native
        if native.get_lib() is None:
            return False
        from ..ops.device_overlap import (DeviceOverlapPipeline,
                                          canon_off_bits)
        n = ds.number_of_unique_reads
        lmax = ds.codes_fwd.shape[1]
        off_bits = canon_off_bits(n, lmax, self.cfg.min_overlap)
        if off_bits < 0 or n < 1024:
            return False
        frac = float(os.environ.get("MGTPU_HYBRID_CPU_FRAC",
                                    cpu_frac if cpu_frac is not None
                                    else 0.9))
        a = max(1, min(n + 1, 1 + int(n * frac)))
        hold = {}

        def cpu_side():
            # 2 scan threads: while the device side is in flight the main
            # thread is mostly blocked on link transfers, so both cores
            # are effectively available to the CPU shard
            hold["cpu"] = native.scan_canon(
                ds.lengths, ds.codes_fwd, ds.codes_rev,
                self.cfg.hash_string_length, 1, a, off_bits, mixed=mixed,
                n_threads=int(os.environ.get("MGTPU_HYBRID_CPU_THREADS",
                                             2)))

        th = threading.Thread(target=cpu_side)
        th.start()
        try:
            pipeline = DeviceOverlapPipeline(ds, self.cfg.min_overlap,
                                             row_lo=a)
            if mixed:
                dev = pipeline.stream_canon_raw_mixed()
            else:
                dev = pipeline.stream_canon(check_cont=False)
        finally:
            th.join()
        cpu = hold.get("cpu")
        if dev is None or cpu is None:
            return False

        ob = off_bits
        if not mixed:
            counts_d, words_d, _, _ = dev
            counts_c, words_c = cpu
            counts = counts_c + counts_d
            words = np.concatenate([words_c, words_d])
            return self._build_from_canon((counts, words, None, None),
                                          False, ob)

        # ---- mixed: global containment resolution across the shards ----
        counts_d, words_d = dev
        counts_c, words_c, cont_r1c, cont_r2c = cpu
        fe_d = (words_d >> np.uint32(ob)) & np.uint32(15)
        r2_d = (words_d >> np.uint32(4 + ob)).astype(np.int64)
        r1_d = np.repeat(np.arange(len(counts_d), dtype=np.int64),
                         counts_d)
        cont_d = (fe_d & 8) != 0
        cont_r1 = np.concatenate([cont_r1c.astype(np.int64), r1_d[cont_d]])
        cont_r2 = np.concatenate([cont_r2c.astype(np.int64), r2_d[cont_d]])
        supers, firsthit = _resolve_supers(cont_r1, cont_r2, ds.lengths, n)

        r1_c = np.repeat(np.arange(len(counts_c), dtype=np.int64),
                         counts_c)
        r2_c = (words_c >> np.uint32(4 + ob)).astype(np.int64)
        keep_c = (supers[r1_c] == 0) & (supers[r2_c] == 0)
        keep_d = (((fe_d & 4) != 0) & (r1_d <= r2_d)
                  & (supers[r1_d] == 0) & (supers[r2_d] == 0))
        counts = np.zeros(n + 1, np.int64)
        np.add.at(counts, r1_c[keep_c], 1)
        np.add.at(counts, r1_d[keep_d], 1)
        words = np.concatenate([words_c[keep_c], words_d[keep_d]])
        return self._build_from_canon((counts, words, supers, firsthit),
                                      True, ob)

    def _build_from_canon(self, canon, mixed, off_bits):
        """Finish construction from the canonical device stream: the native
        replay reconstructs mirror occurrences (mg_build_stream_canon);
        containment was resolved ON DEVICE (ops/device_overlap._cont_canon),
        so this only replays the logs and materializes the result.  Returns
        False if the native replay is unavailable."""
        from .. import native
        ds = self.ds
        counts, words, supers, firsthit = canon
        res = native.build_graph_stream_canon_words(
            ds.lengths, counts, words, off_bits,
            self.cfg.hash_string_length, self.cfg.dead_end_length)
        if res is None:
            return False
        if mixed and supers is not None:
            ds.super_read_id[:] = supers
            # per-1e6 contained-read heartbeats (OverlapGraph.cpp:273-274):
            # counter at boundary b = contained reads whose FIRST containing
            # hit came from a probing read id <= b
            fh = firsthit[np.flatnonzero(supers[1:]) + 1]
            fh.sort()
            heartbeats = [(b, int(np.searchsorted(fh, b, side="right")))
                          for b in range(1000000,
                                         ds.number_of_unique_reads + 1,
                                         1000000)]
        else:
            heartbeats = []
        self._log_contained(mixed, heartbeats)
        ds.read_mate_pairs_from_file()
        fixpoint_log = (res["bfs_nodes"], res["bfs_edges"],
                        res["iter_log"], res["bfs_heartbeats"])
        self._load_native_result(res)
        self._emit_native_fixpoint_log(*fixpoint_log)
        return True

    def _log_contained(self, mixed, heartbeats=()):
        ds = self.ds
        with self._clock("markContainedReads"):
            if not mixed:
                self.log("All reads are of same length. No contained reads.")
                return
            # per-1e6-probing-read progress (OverlapGraph.cpp:273-274)
            for boundary, counter in heartbeats:
                self.log("%10d contained reads in %10d super reads."
                         % (counter, boundary))
            contained = int((ds.super_read_id[1:] != 0).sum())
            self.log("")
            self.log("%10d Non-contained reads. (Keep as is)"
                     % (ds.number_of_unique_reads - contained))
            self.log("%10d contained reads. (Need to change their mate-pair "
                     "information)" % contained)

    def build_from_index(self, index):
        """buildOverlapGraphFromHashTable equivalent (OverlapGraph.cpp:107-218)
        over the host (numpy) join — fallback/reference path."""
        ds = self.ds

        batch = index.candidates()
        self.mark_contained_reads(index, batch)
        ds.read_mate_pairs_from_file()

        ok = verify_candidates(ds.codes_fwd, ds.codes_rev, ds.lengths, batch,
                               index.hash_len, mode="edge")
        sup = ds.super_read_id
        keep = ok & (sup[batch.r1] == 0) & (sup[batch.r2] == 0)

        r1 = batch.r1[keep]
        j = batch.j[keep]
        orient = batch.orient[keep]
        l = index.hash_len
        len1 = ds.lengths[r1]
        # hash orient -> edge orientation and offset (OverlapGraph.cpp:550-557):
        # the edge offset passed to insertEdge is len1 - overlapOffset.
        is_pre = (orient == 0) | (orient == 2)
        edge_orient = np.where(orient == 0, 3,
                       np.where(orient == 1, 0,
                        np.where(orient == 2, 2, 1))).astype(np.int64)
        edge_offset = np.where(is_pre, j, len1 - l - j)
        self._build_from_filtered(r1, batch.r2[keep], edge_orient, edge_offset)

    def _build_from_filtered(self, r1, r2, edge_orient, edge_offset):
        """Replay construction over the filtered candidate stream (native
        engine when available, else pure Python)."""
        ds = self.ds
        u = ds.number_of_unique_reads
        # per-read candidate ranges (candidates are in r1-ascending order)
        starts = np.searchsorted(r1, np.arange(u + 2))
        cand = (r2.astype(np.int64), edge_orient.astype(np.int64),
                edge_offset.astype(np.int64))

        import os
        if (getattr(self.cfg, "use_native_build", True)
                and not os.environ.get("MGTPU_NO_NATIVE")):
            from .. import native
            res = native.build_graph_native(
                ds.lengths, (ds.super_read_id != 0).astype(np.uint8),
                starts, cand[0], cand[1].astype(np.int8), cand[2],
                self.cfg.dead_end_length)
            if res is not None:
                fixpoint_log = (res["bfs_nodes"], res["bfs_edges"],
                                res["iter_log"], res["bfs_heartbeats"])
                self._load_native_result(res)
                self._emit_native_fixpoint_log(*fixpoint_log)
                return

        explored = np.zeros(u + 1, dtype=np.int8)
        marked = np.zeros(u + 1, dtype=np.int8)
        adj = self.adj
        # Heap-model: during construction the reference's overlap checks
        # churn read-length std::string temporaries through the SAME malloc
        # size class as Edge (sizeof(Edge) == 88 -> 96-byte chunks; so do
        # 81..96-char strings), so construction-era Edge frees are recycled
        # long before the late phases, and the construction teardown
        # (OverlapGraph.cpp:207-210, >= 64 KiB frees) runs
        # malloc_consolidate.  Net effect, validated against the reference
        # binary on fuzzed datasets: construction-era allocations behave
        # fresh-ascending and the reuse model starts EMPTY at the end of
        # the unitig fixpoint (exactly the native engine's handoff state).
        self._addr_track = False

        def insert_all_edges_of_read(rn):
            for k in range(starts[rn], starts[rn + 1]):
                dest = int(cand[0][k])
                if explored[dest] != UNEXPLORED:
                    continue
                self.insert_edge(rn, dest, int(cand[1][k]), int(cand[2][k]))
            if adj[rn]:
                std_sort(adj[rn], lambda a, b: a.offset < b.offset)

        counter = 0
        for i in range(1, u + 1):
            if explored[i] != UNEXPLORED:
                continue
            queue = [i]
            start = 0
            while start < len(queue):
                counter += 1
                read1 = queue[start]
                start += 1
                if explored[read1] == UNEXPLORED:
                    insert_all_edges_of_read(read1)
                    explored[read1] = EXPLORED
                if adj[read1]:
                    if explored[read1] == EXPLORED:
                        idx1 = 0
                        while idx1 < len(adj[read1]):
                            read2 = adj[read1][idx1].destination
                            if explored[read2] == UNEXPLORED:
                                queue.append(read2)
                                insert_all_edges_of_read(read2)
                                explored[read2] = EXPLORED
                            idx1 += 1
                        self.mark_transitive_edges(read1, marked)
                        explored[read1] = EXPLORED_MARKED
                    if explored[read1] == EXPLORED_MARKED:
                        idx1 = 0
                        while idx1 < len(adj[read1]):
                            read2 = adj[read1][idx1].destination
                            if explored[read2] == EXPLORED:
                                idx2 = 0
                                while idx2 < len(adj[read2]):
                                    read3 = adj[read2][idx2].destination
                                    if explored[read3] == UNEXPLORED:
                                        queue.append(read3)
                                        insert_all_edges_of_read(read3)
                                        explored[read3] = EXPLORED
                                    idx2 += 1
                                self.mark_transitive_edges(read2, marked)
                                explored[read2] = EXPLORED_MARKED
                            idx1 += 1
                        self.remove_transitive_edges(read1)
                if counter % 100000 == 0:
                    self.log("counter: %10d Nodes: %10d Edges: %10d"
                             % (counter, self.number_of_nodes,
                                self.number_of_edges // 2))
        self.log("counter: %10d Nodes: %10d Edges: %10d"
                 % (counter, self.number_of_nodes, self.number_of_edges // 2))

        while True:
            c = self.contract_composite_paths()
            c += self.remove_dead_end_nodes()
            if c == 0:
                break

        # end of the unitig stage: reuse tracking starts here with empty
        # tcache/fastbin (see the note above `self._addr_track = False`)
        self._addr_free.clear()
        self._addr_fast.clear()
        self._addr_track = True

    def _load_native_result(self, res):
        """Materialize the native engine's final graph state into the Python
        edge structure (emission order = node-ascending adjacency order, so
        appends reproduce adjacency ordering exactly)."""
        ds = self.ds
        ne = len(res["src"])
        edges = [None] * ne
        src_l = res["src"].tolist()
        dst_l = res["dst"].tolist()
        ori_l = res["orient"].tolist()
        off_l = res["offset"].tolist()
        ser_l = res["serial"].tolist()
        twin_l = res["twin_pos"].tolist()
        ms_l = res["man_start"].tolist()
        ml_l = res["man_len"].tolist()
        man_reads = res["man_reads"].tolist()
        man_offsets = res["man_offsets"].tolist()
        man_orients = res["man_orients"].tolist()
        for p in range(ne):
            s = ms_l[p]
            ln = ml_l[p]
            edges[p] = Edge(
                self, src_l[p], dst_l[p], ori_l[p], off_l[p],
                man_reads[s:s + ln], man_offsets[s:s + ln],
                man_orients[s:s + ln], serial=ser_l[p], addr=ser_l[p])
        for p in range(ne):
            edges[p].reverse = edges[twin_l[p]]
            self.adj[edges[p].source].append(edges[p])
        self.number_of_nodes = int(res["n_nodes"])
        self.number_of_edges = int(res["n_edges"])
        self._serial = max(self._serial, int(res["serial_counter"]))
        self._addr_next = max(self._addr_next, int(res["serial_counter"]))
        # read-location lists in the engine's final order; conversion to
        # per-read Python lists is deferred to first access (the data is
        # already complete in array form — Dataset._materialize_locations)
        ds._pending_locations = (
            edges, res["counts_f"].tolist(), res["counts_r"].tolist(),
            res["loc_edge_pos"], res["loc_dist"].tolist())

    # -------------------------------------------------- transitive reduction

    def mark_transitive_edges(self, read_number, marked):
        """Myers transitive marking for one node (OverlapGraph.cpp:574-615)."""
        adj = self.adj
        for e in adj[read_number]:
            marked[e.destination] = INPLAY
        for e in adj[read_number]:
            read2 = e.destination
            if marked[read2] == INPLAY:
                for e2 in adj[read2]:
                    read3 = e2.destination
                    if marked[read3] == INPLAY:
                        t1, t2 = e.orient, e2.orient
                        if ((t1 in (0, 2) and t2 in (0, 1))
                                or (t1 in (1, 3) and t2 in (2, 3))):
                            marked[read3] = ELIMINATED
        for e in adj[read_number]:
            if marked[e.destination] == ELIMINATED:
                e.transitive_flag = True
                e.reverse.transitive_flag = True
        for e in adj[read_number]:
            marked[e.destination] = VACANT
        marked[read_number] = VACANT

    def remove_transitive_edges(self, read_number):
        """Remove flagged edges of a node: twins first (swap-with-last),
        then in-place compaction (OverlapGraph.cpp:623-661)."""
        adj = self.adj
        lst = adj[read_number]
        index = 0
        while index < len(lst):
            if lst[index].transitive_flag:
                twin = lst[index].reverse
                tl = adj[twin.source]
                for i1 in range(len(tl)):
                    if tl[i1] is twin:
                        self._free_addr(twin.addr)  # `delete twinEdge` (:635)
                        tl[i1] = tl[-1]
                        tl.pop()
                        if not tl:
                            self.number_of_nodes -= 1
                        self.number_of_edges -= 1
                        break
            index += 1
        jj = 0
        for index in range(len(lst)):
            if not lst[index].transitive_flag:
                lst[jj] = lst[index]
                jj += 1
            else:
                self._free_addr(lst[index].addr)  # `delete` at :654
                self.number_of_edges -= 1
        del lst[jj:]
        if not lst:
            self.number_of_nodes -= 1

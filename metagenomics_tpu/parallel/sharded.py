"""SPMD overlap detection over a ("dp", "ix") device mesh via shard_map.

This is the scaling path for the assembler's hot phase (the reference's
single-threaded probe loop, HashTable.cpp:202-221 + OverlapGraph.cpp:
529-565), re-expressed as a fully sharded sort-merge join:

* reads are row-sharded over BOTH mesh axes: the raw code matrix is
  uploaded with a (("dp","ix"), None) sharding and every per-read
  derivation — 2-bit packing, reverse complements, window hashes, the
  4-key index slice — runs exactly once somewhere on the mesh.  Nothing
  about the read set is replicated at ingest; the only deliberately
  ix-replicated array is each dp row's packed block (needed for r1-side
  verification), assembled with one all_gather over "ix",
* the l-mer index is sharded by HASH RANGE over "ix": each device sorts
  its local keys, routes per-range slices with an all_to_all over "ix",
  and merges the dp rows' slices with one all_gather over "dp" — concat
  order (dp-major, then source row) + stable sort reproduce the
  reference's global bucket (read id, orient) order exactly.  A hash
  bucket lives wholly inside one range, so survivors never interleave
  across "ix",
* queries are ROUTED, not recomputed: each device extracts its row
  slice's (hash, qid) probes once, partitions them by hash range, and an
  all_to_all over "ix" delivers every query to the device owning its
  range — total probe work stays flat as the ix axis grows,
* each (dp, ix) device then runs the same stable sort-merge join as the
  single-device engine (ops/device_overlap._probe_join structure):
  queries sort before their equal-key index entries, prefix scans give
  bucket bounds, a second sort compacts hit queries in global
  (read, position) order,
* emission is CHUNKED: row windows whose ix-summed candidate totals fit a
  fixed per-device buffer, so every all_gather buffer is bounded by the
  chunk tier, not by the dataset,
* verification gets each candidate's r2 row from a RING EXCHANGE over
  "dp": candidates are sorted by r2's owner shard and each of the D ring
  rounds verifies the resident tile's block — packed row tiles move over
  the interconnect (jax.lax.ppermute), never a replicated matrix,
* per-chunk survivors carry their global query id; one all_gather over
  "ix" plus a stable merge sort restores the reference's discovery order
  before the per-shard stream crosses to the host.

ShardedOverlapPipeline is interface-compatible with
ops.device_overlap.DeviceOverlapPipeline (same stream() contract), so the
assembler's native threaded replay consumes either and the artifacts stay
byte-equal (tests/test_sharded.py, __graft_entry__.dryrun_multichip).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import device_overlap as dov
from .collectives import LEDGER


def shard_map(f, mesh, in_specs, out_specs):
    return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)

# numpy scalars on purpose: module-level jnp constants would initialize the
# XLA backend at import time, breaking jax.distributed.initialize ordering
PAD_KEY = np.uint32(0xFFFFFFFF)
SENT = np.uint32(0xFFFFFFFF)
QPAD = np.uint32(0x7FFFFFFF)     # routed-query padding id (never a real qid)


def _fetch_rows(arr, nrows):
    """Row blocks of a ("dp",)-sharded array as numpy, fetched directly
    from the addressable shards — no per-slice jit programs.  Returns a
    list indexed by dp row (replicated ix shards collapse to one)."""
    out = [None] * nrows
    rows_per = None
    for s in arr.addressable_shards:
        idx = s.index[0] if isinstance(s.index, tuple) else s.index
        start = idx.start or 0
        data = np.asarray(s.data)
        if rows_per is None:
            rows_per = data.shape[0]
        d = start // rows_per
        if out[d] is None:
            out[d] = data
    return out, rows_per


def _expand_window(rk, rleft, rcnt, h0, nh, cap):
    """Slice one hit window [h0, h0+nh) (sentinel-padded) and expand it:
    per-slot global query id, index position, slot index and live total."""
    pad_q = jnp.full((cap,), SENT, jnp.uint32)
    pad_i = jnp.zeros((cap,), jnp.int32)
    qid_s = jax.lax.dynamic_slice(jnp.concatenate([rk, pad_q]), (h0,), (cap,))
    left_s = jax.lax.dynamic_slice(jnp.concatenate([rleft, pad_i]),
                                   (h0,), (cap,))
    cnt_s = jax.lax.dynamic_slice(jnp.concatenate([rcnt, pad_i]),
                                  (h0,), (cap,))
    live = jnp.arange(cap, dtype=jnp.int32) < nh
    cnt_s = jnp.where(live, cnt_s, 0)
    cum = jnp.cumsum(cnt_s, dtype=jnp.int32)
    total = cum[-1]
    starts = cum - cnt_s
    hdest = jnp.where(cnt_s > 0, starts, cap)
    seed = jnp.zeros((cap,), jnp.int32).at[hdest].max(
        jnp.arange(cap, dtype=jnp.int32), mode="drop")
    hidx = jax.lax.cummax(seed)
    k = jnp.arange(cap, dtype=jnp.int32)
    src = k + (left_s - starts)[hidx]
    qid = qid_s[hidx]
    return qid, src, k, total


class ShardedOverlapPipeline:
    """Multi-device twin of ops.device_overlap.DeviceOverlapPipeline.

    stream() returns the identical survivor stream — (per-read counts, r2,
    meta) in the reference's discovery order — so
    OverlapGraph.build_from_pipeline and the native replay run unchanged
    and the artifacts stay byte-equal (tests/test_sharded.py).
    """

    MAX_CAP = 1 << 22      # per-device upper bound on a chunk's buffer

    def __init__(self, dataset, min_overlap, mesh=None):
        from .mesh import make_mesh
        self.ds = dataset
        self.hash_len = min_overlap - 1
        ds = dataset
        if mesh is None:
            nd = len(jax.devices())
            ix = 2 if nd % 2 == 0 and nd >= 4 else 1
            mesh = make_mesh(dp=nd // ix, ix=ix)
        self.mesh = mesh
        self.dp = D = mesh.shape["dp"]
        self.ix = I = mesh.shape["ix"]
        if I & (I - 1):
            raise ValueError("ix axis must be a power of two (hash-range "
                             "sharding uses top-bit ranges), got %d" % I)

        lmax = ds.codes_fwd.shape[1]
        if lmax >= 4096:
            raise ValueError("read length >= 4096 unsupported by meta packing")
        self.lmax = lmax
        self.npos = lmax - self.hash_len + 1
        self.w = (lmax + 15) // 16
        self.qw_max = (lmax - self.hash_len) >> 4
        self.wp = self.qw_max + self.w + 1

        n1 = ds.codes_fwd.shape[0]
        self.n1 = n1
        self.nloc2 = nloc2 = -(-n1 // (D * I))   # rows per device
        self.nloc = nloc = nloc2 * I             # rows per dp shard
        self.n1_pad = nloc * D
        # global query ids must stay strictly below the routing pad id
        # 0x7FFFFFFF and the join's index-tag bit 2^31
        if self.n1_pad * self.npos >= 0x7FFFFFFF:
            raise ValueError(
                "query id space too large (%d rows x %d positions)"
                % (self.n1_pad, self.npos))

        # sharded upload: each device receives only its row slice
        pad_rows = self.n1_pad - n1
        codes_host = ds.codes_fwd
        lengths_host = ds.lengths.astype(np.int32)
        if pad_rows:
            codes_host = np.concatenate(
                [codes_host, np.full((pad_rows, lmax), 4, np.uint8)])
            lengths_host = np.concatenate(
                [lengths_host, np.zeros(pad_rows, np.int32)])
        # make_array_from_callback materializes only the addressable
        # shards, so this works unchanged under a multi-process runtime
        # where the mesh spans hosts (each process loads the dataset and
        # donates its row slices)
        self.codes = jax.make_array_from_callback(
            codes_host.shape, NamedSharding(mesh, P(("dp", "ix"), None)),
            lambda idx: codes_host[idx])
        self.lengths_sl = jax.make_array_from_callback(
            lengths_host.shape, NamedSharding(mesh, P(("dp", "ix"))),
            lambda idx: lengths_host[idx])

        # stage 1: per-slice setup (each read processed exactly once)
        (self.pslice_f, self.pslice_r, self.hf_sl, self.keys_l, self.id_l,
         qcnt, icnt) = self._with_phase("setup", self._setup)
        self.cap_q = int(dov._tier(
            max(int(self._np(qcnt).max()), 1), lo=1 << 8))
        self.cap_blk = int(dov._tier(
            max(int(self._np(icnt).max()), 1), lo=1 << 8))

        # stages 2+3: query + index routing, probe join, block assembly
        (self.pfwd, self.prev, self.lengths, self.sid2, self.rk,
         self.rleft, self.rcnt, self.row_hits_cum, row_tot,
         grand_parts) = self._with_phase(
            "probe", self._probe,
            self.cap_q, self.cap_blk, self.pslice_f, self.pslice_r,
            self.hf_sl, self.lengths_sl, self.keys_l, self.id_l)
        self.row_tot = self._np(row_tot).astype(np.int64)
        parts = self._np(grand_parts).astype(np.int64)
        self.dev_tot = parts.sum(axis=1)           # per-device candidates
        self.grand = int(self.dev_tot.sum())


    def _with_phase(self, name, fn, *args):
        """Run one pipeline kernel under the collective ledger's phase:
        trace-time LEDGER.record calls land in `name`, and each execution
        bumps the phase's invocation count (collectives.py)."""
        with LEDGER.phase(name):
            LEDGER.invoke(name)
            return fn(*args)

    def _np(self, arr):
        """Global array -> host numpy.  Single-process: direct.  Multi-
        process: reshard to fully-replicated first (a cross-host
        all_gather), then read the local copy."""
        if jax.process_count() > 1:
            ns = NamedSharding(self.mesh, P(*([None] * arr.ndim)))
            arr = jax.jit(lambda x: x, out_shardings=ns)(arr)
            return np.asarray(arr.addressable_shards[0].data)
        return np.asarray(arr)

    def _rows(self, arr, nrows):
        """Row blocks of a ("dp",)-sharded array as numpy, one per dp
        shard, working under both single- and multi-process runtimes."""
        if jax.process_count() > 1:
            full = self._np(arr)
            per = full.shape[0] // nrows
            return [full[d * per:(d + 1) * per] for d in range(nrows)]
        return _fetch_rows(arr, nrows)[0]

    # ------------------------------------------------------------- stage 1

    def _setup(self):
        mesh, I = self.mesh, self.ix
        hash_len, w, wp, nloc2, npos = (self.hash_len, self.w, self.wp,
                                        self.nloc2, self.npos)
        nloc = self.nloc
        rbits = (I - 1).bit_length()           # range id = key >> (32-rbits)

        def kernel(codes_u8, lengths):
            codes_fwd = (codes_u8 & 3).astype(jnp.uint8)
            codes_rev = dov._rc_codes(codes_fwd, lengths)
            pad = ((0, 0), (0, wp - w))
            pf = jnp.pad(dov._pack_codes_device(codes_fwd, w), pad)
            pr = jnp.pad(dov._pack_codes_device(codes_rev, w), pad)
            hf = dov.window_hashes_u32(codes_fwd, hash_len)
            hr = dov.window_hashes_u32(codes_rev, hash_len)

            # 4-key local index with GLOBAL read ids; zero-length rows
            # (the global dummy row 0 and padding) become inert PAD
            # entries with identry 0 (rejected at verification: length 0)
            d = jax.lax.axis_index("dp")
            i = jax.lax.axis_index("ix")
            row0 = d * nloc + i * nloc2
            rows_g = row0 + jnp.arange(nloc2, dtype=jnp.int32)
            real = lengths > hash_len
            suf = jnp.clip(lengths - hash_len, 0, npos - 1).astype(jnp.int32)
            k0 = hf[:, 0]
            k1 = jnp.take_along_axis(hf, suf[:, None], axis=1)[:, 0]
            k2 = hr[:, 0]
            k3 = jnp.take_along_axis(hr, suf[:, None], axis=1)[:, 0]
            keys = jnp.stack([k0, k1, k2, k3], axis=1)
            keys = jnp.where(real[:, None], keys, jnp.uint32(PAD_KEY))
            keys = keys.reshape(-1)
            rid = jnp.repeat(rows_g.astype(jnp.uint32), 4)
            orient = jnp.tile(jnp.arange(4, dtype=jnp.uint32), nloc2)
            identry = jnp.where(jnp.repeat(real, 4),
                                (rid << 2) | orient, jnp.uint32(0))
            sk, sid = jax.lax.sort((keys, identry), num_keys=1,
                                   is_stable=True)

            # per-range histograms for the routing buffer tiers
            if rbits:
                irng = (sk >> jnp.uint32(32 - rbits)).astype(jnp.int32)
                icnt = jnp.zeros((I,), jnp.int32).at[irng].add(1,
                                                              mode="drop")
                q = hf.reshape(-1)
                jj = jnp.arange(npos, dtype=jnp.int32)[None, :]
                valid = ((jj >= 1) & (jj < (lengths[:, None] - hash_len))
                         ).reshape(-1)
                qrng = jnp.where(
                    valid, (q >> jnp.uint32(32 - rbits)).astype(jnp.int32),
                    I)
                qcnt = jnp.zeros((I,), jnp.int32).at[qrng].add(1,
                                                              mode="drop")
            else:
                icnt = jnp.array([sk.shape[0]], jnp.int32)
                jj = jnp.arange(npos, dtype=jnp.int32)[None, :]
                valid = ((jj >= 1) & (jj < (lengths[:, None] - hash_len)))
                qcnt = valid.sum(dtype=jnp.int32).reshape(1)
            return pf, pr, hf, sk, sid, qcnt[None], icnt[None]

        f = shard_map(kernel, mesh,
                      in_specs=(P(("dp", "ix"), None), P(("dp", "ix"))),
                      out_specs=(P(("dp", "ix"), None),
                                 P(("dp", "ix"), None),
                                 P(("dp", "ix"), None),
                                 P(("dp", "ix")), P(("dp", "ix")),
                                 P(("dp", "ix"), None),
                                 P(("dp", "ix"), None)))
        return jax.jit(f)(self.codes, self.lengths_sl)

    # --------------------------------------------------------- stages 2+3

    @partial(jax.jit, static_argnames=("self", "cap_q", "cap_blk"))
    def _probe(self, cap_q, cap_blk, pslice_f, pslice_r, hf_sl,
               lengths_sl, keys_l, id_l):
        # global arrays arrive as jit ARGUMENTS (never closures: a closed-
        # over array would be embedded as a constant, which recompiles per
        # instance and is illegal for multi-host global arrays)
        mesh, D, I = self.mesh, self.dp, self.ix
        hash_len, nloc2, nloc, npos = (self.hash_len, self.nloc2,
                                       self.nloc, self.npos)
        rbits = (I - 1).bit_length()
        v_loc = I * cap_q + D * I * cap_blk
        # blocked partial sums keep int32 accumulators exact (finished in
        # int64 on the host)
        sum_block = 1 << max(3, min(
            12, 29 - max(4 * self.n1_pad, 1).bit_length()))

        def _range_blocks(rank_sorted, keys_sorted, payload, cap,
                          pad_payload):
            """[I, cap] per-range blocks of rank-sorted arrays (block r =
            entries with rank r; entries ranked >= I are never emitted)."""
            off = jnp.searchsorted(
                rank_sorted,
                jnp.arange(I + 1, dtype=rank_sorted.dtype)).astype(
                jnp.int32)
            ks, ps = [], []
            kpad = jnp.full((cap,), PAD_KEY, jnp.uint32)
            ppad = jnp.full((cap,), pad_payload, jnp.uint32)
            key_ext = jnp.concatenate([keys_sorted, kpad])
            pay_ext = jnp.concatenate([payload, ppad])
            for r in range(I):
                kb = jax.lax.dynamic_slice(key_ext, (off[r],), (cap,))
                pb = jax.lax.dynamic_slice(pay_ext, (off[r],), (cap,))
                live = jnp.arange(cap, dtype=jnp.int32) < (off[r + 1]
                                                           - off[r])
                ks.append(jnp.where(live, kb, jnp.uint32(PAD_KEY)))
                ps.append(jnp.where(live, pb, jnp.uint32(pad_payload)))
            return jnp.stack(ks), jnp.stack(ps)

        def kernel(pf, pr, hf, lengths, keys_l, id_l):
            d = jax.lax.axis_index("dp")
            i = jax.lax.axis_index("ix")
            row0 = d * nloc + i * nloc2

            # ---- assemble this dp row's packed block + lengths ---------
            LEDGER.record("all_gather", "ix", I, pf, pr, lengths)
            pfwd = jax.lax.all_gather(pf, "ix").reshape(-1, pf.shape[1])
            prev = jax.lax.all_gather(pr, "ix").reshape(-1, pr.shape[1])
            len_blk = jax.lax.all_gather(lengths, "ix").reshape(-1)

            # ---- route queries to their hash range's owner -------------
            q = hf.reshape(-1)
            jj = jnp.arange(npos, dtype=jnp.int32)[None, :]
            valid = ((jj >= 1) & (jj < (lengths[:, None] - hash_len))
                     ).reshape(-1)
            qid = (row0 * npos
                   + jnp.arange(nloc2 * npos, dtype=jnp.int32)).astype(
                jnp.uint32)
            if rbits:
                qrank = jnp.where(
                    valid, (q >> jnp.uint32(32 - rbits)).astype(jnp.int32),
                    I)
            else:
                qrank = jnp.where(valid, 0, I)
            qsr, qskey, qsid = jax.lax.sort(
                (qrank, q, jnp.where(valid, qid, jnp.uint32(QPAD))),
                num_keys=1, is_stable=True)
            qblk_k, qblk_id = _range_blocks(qsr, qskey, qsid, cap_q, QPAD)
            LEDGER.record("all_to_all", "ix", I, qblk_k, qblk_id)
            qr_k = jax.lax.all_to_all(qblk_k, "ix", 0, 0,
                                      tiled=False).reshape(-1)
            qr_id = jax.lax.all_to_all(qblk_id, "ix", 0, 0,
                                       tiled=False).reshape(-1)

            # ---- route + merge the index range slices ------------------
            if rbits:
                irank = (keys_l >> jnp.uint32(32 - rbits)).astype(jnp.int32)
            else:
                irank = jnp.zeros_like(keys_l, jnp.int32)
            iblk_k, iblk_id = _range_blocks(irank, keys_l, id_l, cap_blk, 0)
            LEDGER.record("all_to_all", "ix", I, iblk_k, iblk_id)
            ir_k = jax.lax.all_to_all(iblk_k, "ix", 0, 0, tiled=False)
            ir_id = jax.lax.all_to_all(iblk_id, "ix", 0, 0, tiled=False)
            LEDGER.record("all_gather", "dp", D, ir_k, ir_id)
            gk = jax.lax.all_gather(ir_k.reshape(-1), "dp").reshape(-1)
            gi = jax.lax.all_gather(ir_id.reshape(-1), "dp").reshape(-1)
            sk, sid = jax.lax.sort((gk, gi), num_keys=1, is_stable=True)

            # ---- sort-merge join (queries before equal-key entries) ----
            pi = jnp.uint32(0x80000000) | jnp.arange(
                sk.shape[0], dtype=jnp.uint32)
            kv, pv = jax.lax.sort(
                (jnp.concatenate([qr_k, sk]), jnp.concatenate([qr_id, pi])),
                num_keys=1, is_stable=True)
            tag = (pv >> 31).astype(jnp.int32)
            u = jnp.cumsum(tag, dtype=jnp.int32)
            left = u
            is_last = jnp.concatenate([kv[1:] != kv[:-1],
                                       jnp.ones((1,), bool)])
            ub = jnp.flip(jax.lax.cummin(jnp.flip(
                jnp.where(is_last, u, jnp.int32(0x7FFFFFFF)))))
            cnt = ub - left
            hit = (tag == 0) & (cnt > 0) & (pv != jnp.uint32(QPAD))
            rkey = jnp.where(hit, pv, jnp.uint32(SENT))
            rk, rleft, rcnt = jax.lax.sort((rkey, left, cnt), num_keys=1,
                                           is_stable=True)

            # per-row hit offsets (dp-block-local rows) + candidate sums
            vsz = rk.shape[0]
            h_total = hit.sum(dtype=jnp.int32)
            isq = jnp.arange(vsz, dtype=jnp.int32) < h_total
            row = jnp.where(
                isq,
                (rk // jnp.uint32(npos)).astype(jnp.int32) - d * nloc,
                nloc)
            cq = jnp.where(isq, rcnt, 0)
            row_hits = jnp.zeros((nloc,), jnp.int32).at[
                jnp.clip(row, 0, nloc)].add(
                jnp.where(isq, 1, 0), mode="drop")
            row_tot = jnp.zeros((nloc,), jnp.int32).at[
                jnp.clip(row, 0, nloc)].add(cq, mode="drop")
            row_hits_cum = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(row_hits)])
            LEDGER.record("psum", "ix", I, row_tot)
            row_tot_all = jax.lax.psum(row_tot, "ix")

            vp = -vsz % sum_block
            parts = jnp.pad(cq, (0, vp)).reshape(-1, sum_block).sum(
                axis=1, dtype=jnp.int32)
            return (pfwd, prev, len_blk, sid[None], rk[None], rleft[None],
                    rcnt[None], row_hits_cum[None], row_tot_all,
                    parts[None])

        f = shard_map(
            kernel, mesh,
            in_specs=(P(("dp", "ix"), None), P(("dp", "ix"), None),
                      P(("dp", "ix"), None), P(("dp", "ix")),
                      P(("dp", "ix")), P(("dp", "ix"))),
            out_specs=(P("dp", None), P("dp", None), P("dp"),
                       P(("dp", "ix")), P(("dp", "ix")), P(("dp", "ix")),
                       P(("dp", "ix")), P(("dp", "ix")), P("dp"),
                       P(("dp", "ix"))))
        return f(pslice_f, pslice_r, hf_sl, lengths_sl, keys_l, id_l)

    # ------------------------------------------------------------ prepass

    @partial(jax.jit, static_argnames=("self", "cap"))
    def _owner_hist(self, r0s, r1s, cap, rk_a, rleft_a, rcnt_a, hcum_a,
                    sid_a):
        """Largest per-owner candidate block of one chunk, per device —
        sizes the static ring-round slice M_blk (host takes the max)."""
        mesh, D = self.mesh, self.dp
        nloc = self.nloc

        def kernel(rk, rleft, rcnt, hcum, r0, r1, sid):
            rk, rleft, rcnt, hcum, sid = (rk[0], rleft[0], rcnt[0],
                                          hcum[0], sid[0])
            h0 = hcum[r0[0]]
            nh = hcum[r1[0]] - h0
            _, src, k, total = _expand_window(rk, rleft, rcnt, h0, nh, cap)
            e = sid[jnp.clip(src, 0, sid.shape[0] - 1)]
            r2 = (e >> 2).astype(jnp.int32)
            owner = jnp.clip(r2 // nloc, 0, D - 1)
            hist = jnp.zeros((D,), jnp.int32).at[
                jnp.where(k < total, owner, D)].add(1, mode="drop")
            return hist.max().reshape(1, 1)

        f = shard_map(
            kernel, mesh,
            in_specs=(P(("dp", "ix")), P(("dp", "ix")), P(("dp", "ix")),
                      P(("dp", "ix")), P("dp"), P("dp"), P(("dp", "ix"))),
            out_specs=P("dp", "ix"))
        return f(rk_a, rleft_a, rcnt_a, hcum_a, r0s, r1s, sid_a)

    # --------------------------------------------------------------- emit

    @partial(jax.jit, static_argnames=("self", "cap", "m_blk", "cc",
                                       "dedup"))
    def _emit_chunk(self, r0s, r1s, cap, m_blk, cc, rk_a, rleft_a, rcnt_a,
                    hcum_a, sid_a, pfwd_a, prev_a, lengths_a, dedup=False):
        mesh, D, I = self.mesh, self.dp, self.ix
        nloc, npos, w = self.nloc, self.npos, self.w
        hash_len, qw_max = self.hash_len, self.qw_max

        def kernel(rk, rleft, rcnt, hcum, r0, r1, sid, pfwd, prev, lengths):
            rk, rleft, rcnt, hcum, sid = (rk[0], rleft[0], rcnt[0],
                                          hcum[0], sid[0])
            d_my = jax.lax.axis_index("dp")
            h0 = hcum[r0[0]]
            nh = hcum[r1[0]] - h0
            qid, src, k, total = _expand_window(rk, rleft, rcnt, h0, nh,
                                                cap)
            e = sid[jnp.clip(src, 0, sid.shape[0] - 1)]
            r2 = (e >> 2).astype(jnp.int32)
            orient = (e & 3).astype(jnp.int32)
            qid_i = qid.astype(jnp.int32) & jnp.int32(0x7FFFFFFF)
            r1loc = jnp.clip(qid_i // npos - d_my * nloc, 0, nloc - 1)
            j = qid_i - (qid_i // npos) * npos
            len1 = lengths[r1loc]
            in_range = k < total

            # ---- candidates sorted by r2's owner shard -----------------
            owner = jnp.where(in_range,
                              jnp.clip(r2 // nloc, 0, D - 1),
                              D).astype(jnp.uint32)
            meta1 = (jnp.clip(j, 0, 4095).astype(jnp.uint32)
                     | (jnp.clip(len1, 0, 4095).astype(jnp.uint32) << 12)
                     | (orient.astype(jnp.uint32) << 24))
            so, sslot, sr2, sm1, sr1loc, sqid = jax.lax.sort(
                (owner, k.astype(jnp.uint32), r2.astype(jnp.uint32), meta1,
                 r1loc.astype(jnp.uint32), qid), num_keys=2,
                is_stable=False)
            off = jnp.searchsorted(
                so, jnp.arange(D + 1, dtype=jnp.uint32)).astype(jnp.int32)
            rows1_all = pfwd[sr1loc.astype(jnp.int32)]

            # ---- D-round ring verify -----------------------------------
            tile = jnp.concatenate([pfwd, prev], axis=0)
            tlen = lengths
            blks = []
            for t in range(D):
                o = (d_my + t) % D
                start = off[o]
                bsz = off[o + 1] - start
                # dynamic_slice CLAMPS the start to cap - m_blk when the
                # window would run past the buffer, shifting the block's
                # entries within the slice; mask by GLOBAL position so the
                # block stays exact (the clamped window always still
                # covers [start, start+bsz) because bsz <= m_blk)
                start_eff = jnp.clip(start, 0, cap - m_blk)

                def blk(a):
                    return jax.lax.dynamic_slice(
                        a, (start,) + (0,) * (a.ndim - 1),
                        (m_blk,) + a.shape[1:])
                br2 = blk(sr2).astype(jnp.int32)
                bm1 = blk(sm1)
                bj = (bm1 & 4095).astype(jnp.int32)
                blen1 = ((bm1 >> 12) & 4095).astype(jnp.int32)
                bori = ((bm1 >> 24) & 3).astype(jnp.int32)
                lrow = jnp.clip(br2 - o * nloc, 0, nloc - 1)
                rows2 = tile[lrow + nloc * (bori > 1)]
                edge_ok, cont_ok, eo, eoff = dov._verify_windows(
                    blk(rows1_all), rows2, blen1, tlen[lrow], bj, bori,
                    hash_len, w, qw_max, cc)
                pos = jnp.arange(m_blk, dtype=jnp.int32) + start_eff
                livem = (pos >= start) & (pos < start + bsz)
                if dedup:
                    # canonical-dedup mode: keep only the smaller-endpoint
                    # occurrence of each edge; the native replay
                    # reconstructs the mirrors (mg_build_stream_canon).
                    # dedup == "cont" additionally keeps every containment
                    # hit (either id order) for the host's global
                    # resolution, like ops/device_overlap's mixed mode.
                    br1g = (blk(sqid).astype(jnp.int32)
                            & jnp.int32(0x7FFFFFFF)) // npos
                    bkeep = livem & edge_ok & (br1g <= br2)
                    if dedup == "cont":
                        bkeep = bkeep | (livem & cont_ok)
                else:
                    bkeep = livem & (edge_ok | cont_ok)
                fe = (eo | (edge_ok.astype(jnp.int32) << 2)
                      | (cont_ok.astype(jnp.int32) << 3))
                bmeta = (fe | (eoff << 4)).astype(jnp.uint16)
                blks.append((bkeep, blk(sslot), blk(sqid), br2,
                             bmeta.astype(jnp.uint32)))
                if t != D - 1:
                    perm = [(x, (x - 1) % D) for x in range(D)]
                    LEDGER.record("ppermute", "dp", D, tile, tlen)
                    tile = jax.lax.ppermute(tile, "dp", perm)
                    tlen = jax.lax.ppermute(tlen, "dp", perm)

            keep_f = jnp.concatenate([b[0] for b in blks])
            slot_f = jnp.concatenate([b[1] for b in blks])
            qid_f = jnp.concatenate([b[2] for b in blks])
            r2_f = jnp.concatenate([b[3] for b in blks])
            meta_f = jnp.concatenate([b[4] for b in blks])
            n_keep = keep_f.sum(dtype=jnp.int32)

            # compaction + slot order (= qid asc, bucket order) in one sort
            qkey_f = jnp.where(keep_f, qid_f, jnp.uint32(SENT))
            skey = jnp.where(keep_f, slot_f, jnp.uint32(SENT))
            _, qo, r2o, mo = jax.lax.sort(
                (skey, qkey_f, r2_f.astype(jnp.uint32), meta_f),
                num_keys=1, is_stable=True)
            if qo.shape[0] < cap:
                padn = cap - qo.shape[0]
                qo = jnp.concatenate(
                    [qo, jnp.full((padn,), SENT, jnp.uint32)])
                r2o = jnp.concatenate([r2o, jnp.zeros((padn,), jnp.uint32)])
                mo = jnp.concatenate([mo, jnp.zeros((padn,), jnp.uint32)])
            qo, r2o, mo = qo[:cap], r2o[:cap], mo[:cap]

            # cross-ix merge in global qid order (a bucket lives wholly in
            # one hash range, so streams never interleave within a query)
            LEDGER.record("all_gather", "ix", I, qo, r2o, mo)
            qg = jax.lax.all_gather(qo, "ix").reshape(-1)
            r2g = jax.lax.all_gather(r2o, "ix").reshape(-1)
            mg = jax.lax.all_gather(mo, "ix").reshape(-1)
            qs, r2s, ms = jax.lax.sort((qg, r2g, mg), num_keys=1,
                                       is_stable=True)
            nk_all = jax.lax.psum(n_keep, "ix")

            # per-read survivor counts (dp-block-local rows, psum over ix)
            krow = (qid_f.astype(jnp.int32)
                    // npos) - d_my * nloc
            kc = jnp.zeros((nloc,), jnp.int32).at[
                jnp.where(keep_f, jnp.clip(krow, 0, nloc), nloc)].add(
                1, mode="drop")
            LEDGER.record("psum", "ix", I, n_keep, kc)
            kc = jax.lax.psum(kc, "ix")
            return (qs[None], r2s[None].astype(jnp.int32),
                    ms[None].astype(jnp.uint16), nk_all.reshape(1), kc)

        f = shard_map(
            kernel, mesh,
            in_specs=(P(("dp", "ix")), P(("dp", "ix")), P(("dp", "ix")),
                      P(("dp", "ix")), P("dp"), P("dp"), P(("dp", "ix")),
                      P("dp", None), P("dp", None), P("dp")),
            out_specs=(P("dp", None), P("dp", None), P("dp", None),
                       P("dp"), P("dp")))
        return f(rk_a, rleft_a, rcnt_a, hcum_a, r0s, r1s, sid_a,
                 pfwd_a, prev_a, lengths_a)

    # -------------------------------------------------------------- stream

    def stream_canon(self, check_cont=True):
        """Canonical (deduplicated) survivor stream in the packed-word
        contract of DeviceOverlapPipeline.stream_canon — halves the
        cross-ix all_gather payload AND the device->host download.

        Mixed-length datasets (check_cont=True): the kernel keeps every
        containment hit alongside the canonical (sup-UNFILTERED) edges;
        the host resolves supers globally with the same vectorized
        first-wins/longest-replaces rule as the hybrid engine and masks
        the edge stream before the replay."""
        ob = dov.canon_off_bits(self.n1 - 1, self.lmax, self.hash_len + 1)
        if ob < 0:
            return None
        self.off_bits = ob

        def pack(r2, meta):
            return ((r2.astype(np.uint32) << np.uint32(4 + ob))
                    | ((meta.astype(np.uint32) & np.uint32(15))
                       << np.uint32(ob))
                    | (meta.astype(np.uint32) >> np.uint32(4)))

        if not check_cont:
            counts, r2, meta = self.stream(check_cont=False, dedup=True)
            return counts, pack(r2, meta), None, None

        counts, r2, meta = self.stream(check_cont=True, dedup="cont")
        from ..graph.build import _resolve_supers
        n = self.n1 - 1
        r1 = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        r2_64 = r2.astype(np.int64)
        cont = (meta & 8) != 0
        supers, firsthit = _resolve_supers(
            r1[cont], r2_64[cont], self.ds.lengths, n)
        keep = (((meta & 4) != 0) & (r1 <= r2_64)
                & (supers[r1] == 0) & (supers[r2_64] == 0))
        ccounts = np.zeros(len(counts), np.int64)
        np.add.at(ccounts, r1[keep], 1)
        return ccounts, pack(r2[keep], meta[keep]), supers, firsthit

    def stream(self, check_cont=True, download=True, dedup=False):
        """Survivor stream in reference discovery order: (counts [n1] int64,
        r2 int32, meta uint16) — the DeviceOverlapPipeline.stream contract."""
        D = self.dp
        n1, nloc = self.n1, self.nloc

        # chunk planning.  Single-chunk fast path: buffers sized to the
        # LARGEST PER-DEVICE candidate total (cheap at high ix, where each
        # device holds ~1/(dp*ix) of the candidates).  Multi-chunk path:
        # per-shard row windows whose ix-TOTAL sums fit one buffer
        # (conservative bound on any device's share).
        dev_max = int(self.dev_tot.max()) if self.dev_tot.size else 1
        per_shard = self.row_tot.reshape(D, nloc)
        if dev_max <= self.MAX_CAP:
            cap = int(dov._tier(max(dev_max, 1), lo=1 << 12))
            bounds = [[0, nloc] for _ in range(D)]
            nchunks = 1
        else:
            cap = min(int(dov._tier(max(self.grand, 1), lo=1 << 12)),
                      self.MAX_CAP)
            cap = max(cap, int(per_shard.max()) if per_shard.size else 1)
            bounds = []
            nchunks = 1
            for d in range(D):
                b = [0]
                acc = 0
                for r in range(nloc):
                    if acc + per_shard[d, r] > cap and b[-1] != r:
                        b.append(r)
                        acc = 0
                    acc += per_shard[d, r]
                b.append(nloc)
                bounds.append(b)
                nchunks = max(nchunks, len(b) - 1)
            for b in bounds:             # lockstep: pad with empty chunks
                while len(b) - 1 < nchunks:
                    b.append(nloc)

        outs = []
        kc_total = None
        for c in range(nchunks):
            # numpy on purpose: identical on every process, so the jit
            # treats it as a replicated input under multi-controller runs
            r0s = np.asarray([bounds[d][c] for d in range(D)], np.int32)
            r1s = np.asarray([bounds[d][c + 1] for d in range(D)],
                             np.int32)
            hist = self._np(self._with_phase(
                "owner_hist", self._owner_hist,
                r0s, r1s, cap, self.rk, self.rleft, self.rcnt,
                self.row_hits_cum, self.sid2))
            m_blk = min(int(dov._tier(max(int(hist.max()), 1), lo=1 << 8)),
                        cap)
            qk, r2o, mo, nk, kc = self._with_phase(
                "emit", self._emit_chunk,
                r0s, r1s, cap, m_blk, check_cont, self.rk, self.rleft,
                self.rcnt, self.row_hits_cum, self.sid2, self.pfwd,
                self.prev, self.lengths, dedup)
            outs.append((qk, r2o, mo, nk))
            kc_total = kc if kc_total is None else kc_total + kc

        # shard-direct fetches (no per-slice jit programs); the whole
        # per-chunk buffer crosses per shard — bounded by the chunk tier
        n_keeps = []
        for *_, nk in outs:
            n_keeps.append([int(r[0]) for r in self._rows(nk, D)])
        if not download:
            return None

        r2_parts, m_parts = [], []
        fetched = []
        for c in range(nchunks):
            _, r2o, mo, _ = outs[c]
            fetched.append((self._rows(r2o, D), self._rows(mo, D)))
        for d in range(D):
            for c in range(nchunks):
                kept = n_keeps[c][d]
                if kept == 0:
                    continue
                r2_parts.append(fetched[c][0][d].reshape(-1)[:kept])
                m_parts.append(fetched[c][1][d].reshape(-1)[:kept])
        counts = np.concatenate(self._rows(kc_total, D)).astype(
            np.int64)[:n1]
        if r2_parts:
            r2 = np.concatenate(r2_parts).astype(np.int32)
            meta = np.concatenate(m_parts).astype(np.uint16)
        else:
            r2 = np.zeros(0, np.int32)
            meta = np.zeros(0, np.uint16)
        return counts, r2, meta

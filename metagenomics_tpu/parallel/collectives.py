"""Collective-volume accounting for the sharded SPMD pipeline.

Every collective in parallel/sharded.py runs inside shard_map'd kernels
whose shapes are static per chunk, so the bytes each device moves are
known at trace time.  The ledger records, per pipeline phase, the payload
bytes of each collective per kernel invocation (captured once, when the
kernel traces) and the number of invocations; `report()` folds both into
total logical payload and a modeled ICI wire cost:

    all_gather over axis size A : each device receives (A-1)/A of the
                                  gathered buffer  -> wire = out*(A-1)/A
    all_to_all  over axis size A: (A-1)/A of the buffer changes device
    ppermute                    : the whole buffer crosses one link
    psum (ring allreduce)       : 2*(A-1)/A of the buffer

The report is measurement-independent (no timers): it lets multi-host ICI
behaviour be projected from single-host runs (SCALING.json)."""

import contextlib
import math
from collections import defaultdict


class CollectiveLedger:
    def __init__(self):
        self.reset()

    def reset(self):
        # (phase, op, axis) -> payload bytes per invocation
        self.per_call = defaultdict(int)
        # phase -> invocation count
        self.calls = defaultdict(int)
        self._phase = None
        self._traced = set()

    @contextlib.contextmanager
    def phase(self, name):
        prev = self._phase
        self._phase = name
        try:
            yield
        finally:
            self._phase = prev

    def invoke(self, name):
        """Count one execution of phase `name`'s kernel."""
        self.calls[name] += 1

    def record(self, op, axis, axis_size, *arrays):
        """Called at TRACE time inside a kernel: accumulate the payload
        bytes of `arrays` for the current phase (once per trace)."""
        if self._phase is None:
            return
        nbytes = 0
        for a in arrays:
            n = 1
            for d in a.shape:
                n *= int(d)
            nbytes += n * a.dtype.itemsize
        self.per_call[(self._phase, op, axis, axis_size)] += nbytes

    # ----------------------------------------------------------- reporting

    _WIRE = {
        "all_gather": lambda b, a: b * (a - 1),         # out buffer = a*b
        "all_to_all": lambda b, a: b * (a - 1) / a,
        "ppermute": lambda b, a: b,
        "psum": lambda b, a: 2 * b * (a - 1) / a,
    }

    def report(self, ici_bytes_per_s=4.5e10):
        """Per-phase collective totals + a modeled ICI transfer time."""
        phases = {}
        for (phase, op, axis, asize), nbytes in sorted(self.per_call.items()):
            calls = self.calls.get(phase, 1)
            total = nbytes * calls
            wire = self._WIRE[op](nbytes, max(asize, 1)) * calls
            rec = phases.setdefault(phase, {
                "invocations": calls, "collectives": [],
                "payload_bytes": 0, "wire_bytes": 0})
            rec["collectives"].append({
                "op": op, "axis": axis, "axis_size": asize,
                "payload_bytes_per_call": nbytes,
                "payload_bytes": total, "wire_bytes": int(wire)})
            rec["payload_bytes"] += total
            rec["wire_bytes"] += int(wire)
        total_wire = sum(p["wire_bytes"] for p in phases.values())
        return {
            "phases": phases,
            "total_payload_bytes": sum(p["payload_bytes"]
                                       for p in phases.values()),
            "total_wire_bytes": total_wire,
            "model": {
                "ici_bytes_per_s": ici_bytes_per_s,
                "projected_ici_seconds": total_wire / ici_bytes_per_s,
                "assumptions": "ring all_gather/psum; per-device wire "
                               "bytes; no overlap with compute",
            },
        }


LEDGER = CollectiveLedger()

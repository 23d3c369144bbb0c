"""Per-phase wall-clock + memory accounting (Common.h:52-76 parity)."""

import contextlib
import os
import time


def check_memory_usage() -> int:
    """Current VmData in MB from /proc/self/status — the same counter the
    reference's checkMemoryUsage() parses (Common.h:56-76).  Returns 0 where
    /proc is unavailable (macOS, sandboxes)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmData:"):
                    return int(line.split()[1]) // 1024
    except OSError:
        pass
    return 0


@contextlib.contextmanager
def phase_clock(name, log=print):
    """CLOCKSTART/CLOCKSTOP equivalent: logs elapsed seconds and the VmData
    delta of the enclosed phase.  If MGTPU_PROFILE_DIR is set, the phase is
    additionally captured as a jax.profiler trace (one trace directory per
    phase) for device-timeline inspection in TensorBoard/XProf."""
    mem0 = check_memory_usage()
    t0 = time.time()
    trace_dir = os.environ.get("MGTPU_PROFILE_DIR")
    ctx = contextlib.nullcontext()
    if trace_dir:
        import jax
        ctx = jax.profiler.trace(
            os.path.join(trace_dir, name.replace("/", "_")))
    with ctx:
        yield
    dt = time.time() - t0
    log("Function %s finished in %.6f Seconds." % (name, dt))
    log("Memory used: %d MB." % check_memory_usage())
    log("Memory delta: %+d MB in %s" % (check_memory_usage() - mem0, name))


class PhaseTimer:
    """Collects named phase durations (the assembler's self.timings)."""

    def __init__(self, log=print):
        self.log = log
        self.timings = {}

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.time()
        with phase_clock(name, log=self.log):
            yield
        self.timings[name] = time.time() - t0

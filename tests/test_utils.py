"""Tests for the observability utilities and the distributed launcher."""

import os

from metagenomics_tpu.utils import check_memory_usage, PhaseTimer
from metagenomics_tpu.parallel.launcher import initialize_distributed


def test_check_memory_usage_positive():
    assert check_memory_usage() > 0   # VmData of this test process


def test_phase_timer_records_silently():
    lines = []
    t = PhaseTimer(log=lines.append)
    with t.phase("unitTestPhase"):
        x = sum(range(1000))
    assert x == 499500
    assert "unitTestPhase" in t.timings
    assert lines == []   # log emission moved into phase_clock


def test_phase_clock_reference_format():
    from metagenomics_tpu.utils import phase_clock

    lines = []
    with phase_clock("unitTestPhase", log=lines.append, src="/x/y.py"):
        pass
    assert lines[0] == "Currently in file: /x/y.py Function: unitTestPhase()"
    assert lines[1].startswith("Function unitTestPhase() finished in ")
    assert lines[1].endswith(" Seconds.")
    assert lines[2].startswith("Memory used: ")
    assert lines[2].endswith(" MB.")
    assert lines[3] == ""


def test_launcher_noop_without_config(monkeypatch):
    for k in ("MGTPU_COORDINATOR", "MGTPU_NUM_PROCESSES",
              "MGTPU_PROCESS_ID", "MGTPU_AUTODETECT"):
        monkeypatch.delenv(k, raising=False)
    assert initialize_distributed() is False

"""Tests for the observability utilities and the distributed launcher."""

import os

from metagenomics_tpu.utils import check_memory_usage, PhaseTimer
from metagenomics_tpu.parallel.launcher import initialize_distributed


def test_check_memory_usage_positive():
    assert check_memory_usage() > 0   # VmData of this test process


def test_phase_timer_records_and_logs():
    lines = []
    t = PhaseTimer(log=lines.append)
    with t.phase("unitTestPhase"):
        x = sum(range(1000))
    assert x == 499500
    assert "unitTestPhase" in t.timings
    assert any("Function unitTestPhase finished in" in s for s in lines)
    assert any(s.startswith("Memory used:") for s in lines)


def test_launcher_noop_without_config(monkeypatch):
    for k in ("MGTPU_COORDINATOR", "MGTPU_NUM_PROCESSES",
              "MGTPU_PROCESS_ID", "MGTPU_AUTODETECT"):
        monkeypatch.delenv(k, raising=False)
    assert initialize_distributed() is False

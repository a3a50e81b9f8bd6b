"""Artifact-delivery guarantees of bench.py (VERDICT r04 wrong #1).

The r4 driver bench artifact was rc:124 / parsed:null: bench.py printed its
single JSON line only at the very end, and the gate-and-retry loops (whose
wall time scales with ambient load) pushed the worst case past the driver's
timeout — so a run that had already finished its headline phase delivered
NOTHING. These tests pin the two fixes:

 1. incremental emission — a complete, parseable artifact line is flushed
    after every phase, so killing the process mid-run still leaves the
    deepest completed snapshot on stdout (simulated here by SIGKILLing a
    real bench subprocess right after its first artifact line);
 2. the global wall-clock budget — adaptive loops consult _budget_allows()
    and scaling_run() declines to start at all when the budget can't fit
    even one round.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


class TestBudgetLogic:
    def test_budget_allows_respects_deadline(self, monkeypatch):
        monkeypatch.setattr(bench, "_DEADLINE", time.time() + 1000.0)
        assert bench._budget_allows(100.0)
        monkeypatch.setattr(bench, "_DEADLINE", time.time() + 20.0)
        # 20s left, 15s final reserve: a 10s step no longer fits
        assert not bench._budget_allows(10.0)
        assert bench._budget_allows(1.0)

    def test_scaling_run_skips_when_budget_spent(self, monkeypatch):
        """An exhausted budget must skip the scaling phase entirely (ship
        headline+extraction) instead of starting worker JVMs it can't
        finish — the artifact marks scaling_skipped_budget."""
        monkeypatch.setattr(bench, "_DEADLINE", time.time() - 1.0)
        assert bench.scaling_run(Path("/nonexistent")) is None

    def test_emit_prints_parseable_line_and_mirrors_file(self, capsys):
        bench._emit({"metric": "m", "value": 1.5, "phases": ["headline"]})
        line = capsys.readouterr().out.strip().splitlines()[-1]
        parsed = json.loads(line)
        assert parsed["phases"] == ["headline"]
        assert "elapsed_sec" in parsed and "budget_sec" in parsed
        mirror = REPO / ".bench" / "last_artifact.json"
        assert json.loads(mirror.read_text())["value"] == 1.5


@pytest.mark.slow
class TestPartialEmitEndToEnd:
    def test_killed_run_still_delivers_headline_snapshot(self, tmp_path):
        """SIGKILL the bench right after its first emitted artifact line —
        the captured stdout must already contain a complete parseable
        artifact with the headline phase (exactly what a driver-timeout
        leaves behind)."""
        env = dict(
            os.environ,
            SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
            SPARK_GRAFT_HEADLINE="ocr_concat",
            SPARK_GRAFT_BENCH_DOCS="60",
            SPARK_GRAFT_CPUS="8",
        )
        proc = subprocess.Popen(
            [sys.executable, str(REPO / "bench.py")],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            cwd=str(REPO),
            env=env,
        )
        first = None
        try:
            deadline = time.time() + 300
            assert proc.stdout is not None
            while time.time() < deadline:
                line = proc.stdout.readline()
                if not line:
                    break
                line = line.strip()
                if line.startswith("{"):
                    first = json.loads(line)
                    break
        finally:
            # kill mid-run: the extraction phase is still ahead of it
            try:
                proc.send_signal(signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait(timeout=60)
        assert first is not None, "no artifact line before kill"
        assert first["phases"] == ["headline"]
        assert first["queries"]["ocr_concat"] > 0
        assert first["unit"] == "sec"

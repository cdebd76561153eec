"""Driver-contract tests for bench.py: ONE parseable JSON line on
stdout under EVERY termination mode.

Rounds 3 and 4 both lost their driver-captured perf record — r03 to a
single-attempt probe on a transient tunnel outage, r04 to the driver's
`timeout` SIGTERM arriving before the one JSON line was printed
(BENCH_r04.json: rc=124, parsed=null).  bench.py now runs the
measurement in a child process supervised by a jax-free parent that
streams incremental record updates and prints the best-known record on
child exit, SIGTERM, or self-deadline.  These tests pin that contract
(the always-live fps counter they mirror:
/root/reference/main.cpp:37-58).

All runs here are CPU smoke configurations (BENCH_FORCE_CPU +
BENCH_WH) — tiny frames, NOT reportable numbers — exercising the
control flow, not the measurement.
"""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")

SMOKE_ENV = dict(
    os.environ,
    BENCH_FORCE_CPU="1",
    BENCH_WH="64x36",
    PYTHONUNBUFFERED="1",
)


def _one_json_line(stdout: str) -> dict:
    """Assert stdout carries exactly one line and it parses as the
    bench record."""
    lines = [ln for ln in stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE stdout line, got: {lines!r}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "frames_per_sec_1080p"
    assert rec["unit"] == "fps"
    return rec


def test_sigterm_midrun_emits_json_line():
    """SIGTERM mid-run (the driver's `timeout` behavior) must still
    produce the one JSON line — the exact failure of BENCH_r04."""
    p = subprocess.Popen(
        [sys.executable, BENCH, "4"], env=SMOKE_ENV, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    # Wait for the parent's readiness sentinel (handlers installed,
    # child spawned) before signalling: interpreter startup measures
    # ~3-4 s of site init on the bench box, and a SIGTERM landing
    # during it default-kills the process before the contract exists —
    # a fixed sleep raced exactly that window.
    deadline = time.time() + 60
    for line in p.stderr:
        if b"# bench: supervising child" in line:
            break
        assert time.time() < deadline, "no readiness sentinel within 60s"
    time.sleep(1.0)                 # mid-run: child is compiling/measuring
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=30)
    rec = _one_json_line(out.decode())
    # killed this early there is no measurement: the record must say so
    # explicitly (consumers treat "error" as no-measurement, not 0 fps)
    # and reference the last valid capture only by POINTER — no inlined
    # fps values (ADVICE r4: benchmark-integrity rule).
    if "error" in rec:
        assert rec["value"] == 0.0
        ref = rec.get("last_valid_capture_ref")
        if ref is not None:
            assert "value" not in ref and "fps" not in json.dumps(ref)
    else:
        # slow box: the primary measurement already landed — fine too
        assert rec["value"] > 0.0


def test_self_deadline_emits_error_record():
    """A dead device tunnel makes the child hang silently; the parent's
    self-deadline must convert that into the structured error record
    instead of an unbounded hang."""
    env = dict(SMOKE_ENV, BENCH_DEADLINE_S="1")
    p = subprocess.run(
        [sys.executable, BENCH, "4"], env=env, cwd=REPO,
        capture_output=True, timeout=60)
    assert p.returncode == 3
    rec = _one_json_line(p.stdout.decode())
    assert "error" in rec and rec["value"] == 0.0
    assert "deadline" in rec["error"]


def test_noarg_run_rides_aerial_artifact(tmp_path):
    """A no-arg run (exactly how the driver invokes bench.py) must ALSO
    measure the real-artifact fixture when present and carry its
    figures as aerial_* keys in the same record — the BASELINE >= 30
    fps target is defined on Mill-19-shaped octrees, so the official
    driver capture has to include the target-defining numbers, not
    only the synthetic shell's.  Smoke-exercised here via the
    BENCH_AERIAL_FIXTURE override with a tiny synthetic npz."""
    from mega_nerf_viewer_tpu.n3tree import sphere_tree
    fix = tmp_path / "tiny_aerial.npz"
    sphere_tree(basis_dim=1, depth=3).save_npz(str(fix))
    env = dict(SMOKE_ENV, BENCH_AERIAL_FIXTURE=str(fix))
    p = subprocess.run(
        [sys.executable, BENCH], env=env, cwd=REPO,
        capture_output=True, timeout=600)
    assert p.returncode == 0, p.stderr.decode()[-2000:]
    rec = _one_json_line(p.stdout.decode())
    assert rec["value"] > 0.0                    # shell primary intact
    assert rec["aerial_fps"] > 0.0               # rider landed
    assert "aerial_sorted_mode_fps" in rec
    assert "aerial_projected_v5e8_fps" in rec


def test_completed_smoke_run_has_record_and_projections():
    """A full (CPU smoke) run emits exactly one JSON line carrying the
    measurement plus the v5e-8 projection keys, flagged smoke."""
    p = subprocess.run(
        [sys.executable, BENCH, "4"], env=SMOKE_ENV, cwd=REPO,
        capture_output=True, timeout=600)
    assert p.returncode == 0, p.stderr.decode()[-2000:]
    rec = _one_json_line(p.stdout.decode())
    assert rec["value"] > 0.0
    assert rec["smoke"] is True
    assert rec["vs_baseline"] > 0.0
    assert "sorted_mode_fps" in rec
    assert "projected_v5e8_fps" in rec
    assert "projected_v5e8_motion_fps" in rec
    # smoke runs must never overwrite the last-valid pointer target
    lv = os.path.join(REPO, "benchmarks", "last_valid.json")
    if os.path.exists(lv):
        with open(lv) as f:
            assert json.load(f)["record"].get("smoke") is not True

"""A/B runner (tools/tpu_ab.py): record parsing, step-done logic, and the
full run loop driven against a fake bench — so the first real invocation
during a scarce on-chip session cannot be its first execution ever."""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.tpu_ab import parse_record, step_done  # noqa: E402

REPO = os.path.join(os.path.dirname(__file__), "..")

FAKE_BENCH = """\
import argparse, json, os, sys
ap = argparse.ArgumentParser()
ap.add_argument("--config")
ap.add_argument("--caps-set", action="append", default=[])
ap.add_argument("--params-set", action="append", default=[])
a = ap.parse_args()
if os.environ.get("FAKE_DOWN"):
    print(json.dumps({"metric": "m", "value": 0.0, "unit": "pairs/s",
                      "vs_baseline": 0.0, "error": "backend unreachable"}))
    raise SystemExit(3)
if os.environ.get("FAKE_SIGABRT"):
    # the axon-client failure mode: infra record printed, then the
    # process dies with a NON-fail-fast exit code (observed -6/SIGABRT)
    print(json.dumps({"metric": "m", "value": 0.0, "unit": "pairs/s",
                      "vs_baseline": 0.0, "error": "backend unreachable"}))
    raise SystemExit(134)
v = 100.0 + 10.0 * bool(os.environ.get("FCCF_SEED_COL_BLOCKED")) \
    - 5.0 * len(a.caps_set) - 3.0 * len(a.params_set)
rec = {"metric": "m", "value": v, "unit": "pairs/s", "vs_baseline": v / 15.2,
       "accuracy_ok": True}
if a.config == "office":
    print(json.dumps(rec))
else:
    print(f"# [{a.config}] {json.dumps(rec)}", file=sys.stderr)
"""


def test_parse_record_formats():
    rec = {"metric": "m", "value": 1.0}
    line = json.dumps(rec)
    assert parse_record(line) == rec                       # bare stdout
    assert parse_record(f"# [heritage] {line}") == rec     # stderr prefix
    assert parse_record("noise\n" + line + "\ntrailing") == rec
    assert parse_record("no record here") is None


def test_step_done_logic():
    good = {"exit_code": 0, "record": {"metric": "m", "value": 50.0}}
    infra = {"exit_code": 3, "record": {"metric": "m", "error": "down"}}
    assert step_done(good, "office")
    assert not step_done(infra, "office")      # infra failure: retry
    assert not step_done(None, "office")
    assert not step_done({"exit_code": 0, "record": None}, "office")
    assert step_done({"exit_code": 0}, None)   # probe: any clean run
    assert not step_done({"exit_code": 1}, None)


# The loop test pins its OWN step plan (FCCF_TPU_AB_PLAN) so it exercises
# the runner mechanics without depending on the live session plan, which
# is restaged every measurement round.
TEST_PLAN = [
    ["base/office", "office", {}, None, []],
    ["base/structured", "structured", {}, None, []],
    ["variant/structured", "structured", {}, "base/structured",
     ["--params-set", "curvature_threshold=0.05"]],
]


@pytest.mark.slow
def test_runner_loop_against_fake_bench(tmp_path):
    """End-to-end: run a filtered step set against a fake bench, check the
    JSONL, the resume skip, the env/args plumbing, and the abort path."""
    fake = tmp_path / "fake_bench.py"
    fake.write_text(FAKE_BENCH)
    plan = tmp_path / "plan.json"
    plan.write_text(json.dumps(TEST_PLAN))
    results = tmp_path / "results.jsonl"
    env = {
        **os.environ,
        "FCCF_TPU_AB_RESULTS": str(results),
        "FCCF_TPU_AB_BENCH": str(fake),
        "FCCF_TPU_AB_PLAN": str(plan),
    }

    def runner(*args, extra_env=None):
        return subprocess.run(
            [sys.executable, os.path.join("tools", "tpu_ab.py"), *args],
            cwd=REPO, env={**env, **(extra_env or {})},
            capture_output=True, text=True, timeout=120,
        )

    # abort path: fake backend down -> exit 3, step not recorded as done
    p = runner("--only", "base/office", extra_env={"FAKE_DOWN": "1"})
    assert p.returncode == 3, p.stdout + p.stderr
    assert "ABORT" in p.stdout

    # healthy: baseline + variant structured steps (the stderr-prefixed
    # record format, since config != office)
    p = runner("--only", "structured")
    assert p.returncode == 0, p.stdout + p.stderr
    recs = {}
    for line in results.read_text().splitlines():
        r = json.loads(line)
        recs[r["step"]] = r  # last record wins (abort retry included)
    assert recs["base/structured"]["record"]["value"] == 100.0
    # --params-set args reached the subprocess (one override -> -3)
    assert recs["variant/structured"]["record"]["value"] == 97.0
    assert recs["variant/structured"]["args"] == [
        "--params-set", "curvature_threshold=0.05",
    ]
    # report shows the delta vs the in-session baseline
    p = runner("--report")
    assert "-3.0%" in p.stdout, p.stdout

    # resume: everything already measured -> nothing to do
    p = runner("--only", "structured")
    assert "nothing to do" in p.stdout


@pytest.mark.slow
def test_runner_aborts_after_consecutive_infra_failures(tmp_path):
    """Tunnel outages are time-correlated: when bench dies with a
    non-fail-fast exit code after printing the infra record (the observed
    axon SIGABRT mode), two in a row must abort the pass instead of
    burning the full probe timeout on every remaining step. The failed
    steps stay not-done for resume."""
    fake = tmp_path / "fake_bench.py"
    fake.write_text(FAKE_BENCH)
    plan = tmp_path / "plan.json"
    plan.write_text(json.dumps(TEST_PLAN))
    results = tmp_path / "results.jsonl"
    p = subprocess.run(
        [sys.executable, os.path.join("tools", "tpu_ab.py")],
        cwd=REPO,
        env={**os.environ,
             "FCCF_TPU_AB_RESULTS": str(results),
             "FCCF_TPU_AB_BENCH": str(fake),
             "FCCF_TPU_AB_PLAN": str(plan),
             "FAKE_SIGABRT": "1"},
        capture_output=True, text=True, timeout=120,
    )
    assert p.returncode == 3, p.stdout + p.stderr
    assert "consecutive infra-failure" in p.stdout
    recs = [json.loads(l) for l in results.read_text().splitlines()]
    assert len(recs) == 2  # third step never attempted
    from tools.tpu_ab import step_done
    assert all(not step_done(r, r["config"]) for r in recs)  # all retryable


@pytest.mark.slow
def test_runner_aborts_on_step_timeout(tmp_path):
    """A step that hits the hard timeout with no record aborts the whole
    session (tunnel-down = python hangs at interpreter boot, so every
    later step would burn its full timeout too); the step stays
    not-done for resume."""
    fake = tmp_path / "hang_bench.py"
    fake.write_text("import time\ntime.sleep(60)\n")
    plan = tmp_path / "plan.json"
    plan.write_text(json.dumps(TEST_PLAN))
    results = tmp_path / "results.jsonl"
    p = subprocess.run(
        [sys.executable, os.path.join("tools", "tpu_ab.py"),
         "--only", "base/office"],
        cwd=REPO,
        env={**os.environ,
             "FCCF_TPU_AB_RESULTS": str(results),
             "FCCF_TPU_AB_BENCH": str(fake),
             "FCCF_TPU_AB_PLAN": str(plan),
             "FCCF_TPU_AB_TIMEOUT_S": "3"},
        capture_output=True, text=True, timeout=120,
    )
    assert p.returncode == 3, p.stdout + p.stderr
    assert "timed out with no bench record" in p.stdout
    rec = json.loads(results.read_text().splitlines()[-1])
    assert rec["exit_code"] == -1 and rec["record"] is None
    from tools.tpu_ab import step_done
    assert not step_done(rec, "office")

"""Scripted on-chip A/B measurement session.

Executes the pending hardware measurement plan (docs/ROADMAP.md, "Pending
hardware measurements") as a serial chain of one-process-per-measurement
``bench.py`` runs — the discipline the remote-TPU tunnel demands: no
concurrent host work, ONE config per process, implementation variants
selected by environment knobs (utils/tuning.py) so no source edit happens
mid-session. Results append to a JSONL; completed steps are skipped on
restart, so the session is resumable after a tunnel drop.

Usage:
    python tools/tpu_ab.py                 # run every pending step
    python tools/tpu_ab.py --only kth      # substring filter on step names
    python tools/tpu_ab.py --list          # show the plan and what's done
    python tools/tpu_ab.py --report        # A/B deltas vs declared baselines

Adoption rules (read the report, then edit defaults):
  - a variant wins only if pairs/s improves beyond tunnel noise (~±2%)
    with accuracy_ok and unchanged statuses;
  - accuracy-affecting knobs (FCCF_SCATTER_STATS_MIN_V changes f32
    summation order) additionally need a clean
    ``tools/evaluate.py --configs resso,heritage --seeds 16`` spot-check
    before the default moves.

Results-file contract (for every consumer, present and future): records
append-only, one JSON object per line; a step may appear multiple times
(tunnel-failure records are interleaved with their later successful
retries under the SAME step name) and **the last record per step wins**.
Records carrying an ``error`` key inside ``record`` are infra failures,
never measurements. tools/update_perf_table.py and load_results() below
already follow this; any new consumer must too — aggregating all records
per step would average in zeros.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Both overridable for the integration test (tests/test_tpu_ab.py), which
# drives the whole runner loop against a fake bench script.
RESULTS = os.environ.get(
    "FCCF_TPU_AB_RESULTS", os.path.join(ROOT, "tpu_ab_results.jsonl")
)
BENCH = os.environ.get("FCCF_TPU_AB_BENCH", "bench.py")
STEP_TIMEOUT_S = int(os.environ.get("FCCF_TPU_AB_TIMEOUT_S", "1500"))

# (name, bench config | None, env overrides, baseline step | None).
# Order matters: baselines run first so every A/B compares within-session
# numbers (tunnel conditions drift across sessions).
# ROUND-4 SESSION PLAN. The round-3 variant grid is RESOLVED (records
# archived in tpu_ab_results_r3.jsonl; see the round-4 report there):
#   kth-bsearch   lost (-0.1/-8.0/-5.1%)      -> cost model confirmed
#   stat-scatter  within noise (+0.7/+0.7%)   -> default stays off
#   sched-s4j0    lost (-2.0/-6.7%)           -> J=0 rejected
#   sched-s2j1    won (+4.0% heritage)        -> J=1 is now the default
#   colblock      lost (-4.7/-1.0%)           -> knob stays off
#   tightcaps     won (+9.6/+19.8/+5.9%)      -> now the preset defaults
#   jump-inkernel never compiled (no 1D gather) -> path deleted
#   sort-pallas   2x slower than lax.sort     -> kernel deleted
STEPS = [
    # ROUND-5 POST-SESSION PLAN. The staged round-5 grid is RESOLVED
    # (records in tpu_ab_results.jsonl, commit 5852ddc):
    #   base/*  fresh tight-lane baselines: office 138.2, apartment 88.1,
    #           cross-season 115.3, sweep 143.6, structured 61.2,
    #           resso 66.9, heritage 31.8 pairs/s — all accuracy_ok
    #   tight/office-hyp1536       +1.3% (noise)  -> not adopted
    #   tight/{heritage,resso}-key32  flat        -> wide_extent stays 1
    #   tight/heritage-batch8      +4.9%          -> paired confirm below
    #   eval/guard    guard worse on EVERY metric -> knob DELETED
    #   eval/overlap  success-vs-overlap curves   -> docs/EVALUATION.md
    #   probe/heritage-trace  whiles attributed: the pass-1 growth
    #           convergence loops (src+tar), 9.1+5.8 ms/step
    # Paired same-window batch A/B for the heritage preset: the staged
    # batch-8 probe beat a baseline measured hours earlier through a
    # drifting tunnel (STALE-BASE); adoption wants adjacent arms. Batch
    # 16 rides along (untried; office measured flat at 16/32 but
    # heritage's profile is while-heavy, which batch amortizes).
    ("pair/heritage-b4", "heritage", {}, None),
    ("pair/heritage-b8", "heritage", {},
     "pair/heritage-b4", ["--batch", "8"]),
    ("pair/heritage-b16", "heritage", {},
     "pair/heritage-b4", ["--batch", "16"]),
    # Sweep-schedule probes against the trace attribution: the pass-1
    # convergence whiles cost ~2.5 ms/iteration of NON-kernel overhead
    # (jump gathers + state round-trips of the carried (V,16) stats),
    # and the measured call counts are 2-3 at sweeps_per_call=2. More
    # Gauss-Seidel sweeps per pallas_call trade cheap sequential-grid
    # sweep passes for whole while iterations. s4j0 lost round 3
    # (-2.0/-6.7%) but that change ALSO dropped the jump; s3/s4 with
    # J=1 are untested. Schedule invariance is exact (any schedule
    # reaches the same fixpoint — tests/test_pallas_label_prop.py), so
    # the accuracy gate is a pure sanity check here.
    ("pair/heritage-s3", "heritage", {"FCCF_SWEEPS_PER_CALL": "3"},
     "pair/heritage-b4"),
    ("pair/heritage-s4", "heritage", {"FCCF_SWEEPS_PER_CALL": "4"},
     "pair/heritage-b4"),
    # Batch probes for the remaining presets: the heritage +4.9% came
    # from amortizing serial while trip counts across a wider vmap;
    # apartment (250k-pt, batch 8) and the two ~60-75k building/indoor
    # presets (batch 8) have the same loop structure. Office measured
    # flat at 16/32 round 3 (dead end, do not re-probe); sweep's steps
    # are its sequence chunks. Paired within-session baselines.
    ("pair/apartment-b8", "apartment", {}, None),
    ("pair/apartment-b16", "apartment", {},
     "pair/apartment-b8", ["--batch", "16"]),
    ("pair/structured-b8", "structured", {}, None),
    ("pair/structured-b16", "structured", {},
     "pair/structured-b8", ["--batch", "16"]),
    ("pair/resso-b8", "resso", {}, None),
    ("pair/resso-b16", "resso", {},
     "pair/resso-b8", ["--batch", "16"]),
]
# normalize: optional 5th element = extra bench CLI args
STEPS = [s if len(s) == 5 else (*s, []) for s in STEPS]

# The integration test (tests/test_tpu_ab.py) injects its own plan so it
# exercises the runner loop without depending on the live session plan
# (which changes every measurement round): a JSON file of
# [name, config, env, baseline, extra_args] entries.
if os.environ.get("FCCF_TPU_AB_PLAN"):
    with open(os.environ["FCCF_TPU_AB_PLAN"]) as _f:
        STEPS = [tuple(s) if len(s) == 5 else (*s, [])
                 for s in json.load(_f)]


def load_results(path=RESULTS):
    done = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                done[rec["step"]] = rec  # last record wins
    return done


def step_done(entry, cfg):
    """A step counts as done only with a real measurement: probe steps
    need a completed run whose captured output shows no per-case error
    (probe scripts catch per-case exceptions and still exit 0 — an
    all-error run must be retried after the kernel is fixed, same as a
    failed bench step); bench steps need a record that is not the
    fail-fast infra-failure JSON (which also carries "metric")."""
    if not entry:
        return False
    if cfg is None:
        return (
            entry.get("exit_code") == 0
            and "_error" not in entry.get("output", "")
        )
    rec = entry.get("record")
    return bool(rec) and "error" not in rec


def parse_record(text):
    """Find the bench JSON record in stdout/stderr ('# [cfg] {...}' or a
    bare JSON line)."""
    for line in reversed(text.splitlines()):
        i = line.find('{"metric"')
        if i >= 0:
            try:
                return json.loads(line[i:])
            except json.JSONDecodeError:
                continue
    return None


def run_step(name, cfg, env, extra_args=()):
    if cfg is None:  # probe step: record raw output
        script = extra_args[0] if extra_args else (
            os.path.join("tools", "probe_gather.py"))
        cmd = [sys.executable, "-u", script]
    else:
        cmd = [sys.executable, "-u", BENCH, "--config", cfg, *extra_args]
    t0 = time.time()
    try:
        p = subprocess.run(
            cmd, cwd=ROOT, env={**os.environ, **env},
            capture_output=True, text=True, timeout=STEP_TIMEOUT_S,
        )
        code, out, err = p.returncode, p.stdout, p.stderr
    except subprocess.TimeoutExpired as e:
        code = -1
        out = (e.stdout or b"").decode(errors="replace") if isinstance(
            e.stdout, bytes) else (e.stdout or "")
        err = (e.stderr or b"").decode(errors="replace") if isinstance(
            e.stderr, bytes) else (e.stderr or "")
    rec = {
        "step": name,
        "config": cfg,
        "env": env,
        "args": list(extra_args),
        "ts": round(t0, 1),
        "exit_code": code,
        "elapsed_s": round(time.time() - t0, 1),
        "record": parse_record(out + "\n" + err),
    }
    if cfg is None:
        rec["output"] = (out + err).strip()[-800:]
    if code != 0 or rec["record"] is None and cfg is not None:
        rec["stderr_tail"] = err[-600:]
    return rec


def cmd_run(only):
    done = load_results()
    todo = [
        s for s in STEPS
        if (only in s[0] if only else True)
        and not step_done(done.get(s[0]), s[1])
    ]
    if not todo:
        print("nothing to do (see --list / --report)")
        return 0
    print(f"{len(todo)} step(s) to run -> {RESULTS}")
    consecutive_infra = 0
    with open(RESULTS, "a") as f:
        for name, cfg, env, _, extra in todo:
            print(f"== {name} ({cfg or 'probe'}) env={env or '{}'} "
                  f"{' '.join(extra)} ...", flush=True)
            rec = run_step(name, cfg, env, extra)
            f.write(json.dumps(rec) + "\n")
            f.flush()
            r = rec.get("record")
            if r:
                print(f"   {r.get('value')} {r.get('unit')} "
                      f"accuracy_ok={r.get('accuracy_ok')} "
                      f"({rec['elapsed_s']}s)", flush=True)
            else:
                print(f"   exit={rec['exit_code']} ({rec['elapsed_s']}s) "
                      f"{rec.get('output', '')[:200]}", flush=True)
            if rec["exit_code"] == 3:
                print("ABORT: backend unreachable (bench fail-fast); "
                      "re-run when the tunnel is back — completed steps "
                      "are skipped.", flush=True)
                return 3
            # bench's fail-fast probe can also die with a SIGABRT from the
            # axon client AFTER printing the infra-failure record (exit -6,
            # observed whole-sessions of it in tpu_ab_results_r4a.jsonl);
            # each such step burns the probe's full retry budget (3x120 s
            # attempts + 2x45 s backoff ~ 450 s since round 5). Tunnel outages are
            # time-correlated, so two in a row means "down", not "flaky":
            # abort the pass and let the outer retry loop (--retry-forever)
            # or a manual re-run resume it.
            if r and "error" in r:
                consecutive_infra += 1
                if consecutive_infra >= 2:
                    print("ABORT: 2 consecutive infra-failure records — "
                          "backend looks down; re-run when the tunnel is "
                          "back (completed steps are skipped).", flush=True)
                    return 3
            elif r:
                consecutive_infra = 0
            if rec["exit_code"] == -1 and rec["record"] is None:
                # Step hit the hard timeout without producing any record.
                # When the tunnel drops, axon's sitecustomize register()
                # retries forever at interpreter BOOT, so the subprocess
                # hangs before bench.py's own fail-fast probe can even
                # run — every remaining step would burn the full timeout.
                # Treat it like the fail-fast abort; the session resumes.
                print("ABORT: step timed out with no bench record "
                      "(backend likely unreachable — python hangs at "
                      "interpreter boot while the tunnel is down); "
                      "re-run when the tunnel is back — completed steps "
                      "are skipped.", flush=True)
                return 3
    cmd_report()
    return 0


def cmd_list():
    done = load_results()
    for name, cfg, env, base, extra in STEPS:
        mark = "x" if step_done(done.get(name), cfg) else " "
        knobs = json.dumps(env) if env else " ".join(extra)
        print(f"[{mark}] {name:28s} {cfg or 'probe':14s} "
              f"{knobs:44s} vs {base or '-'}")


def cmd_report():
    done = load_results()
    print(f"{'step':28s} {'pairs/s':>8s} {'base':>8s} {'delta':>7s}  flags")
    for name, cfg, env, base, extra in STEPS:
        rec = (done.get(name) or {}).get("record")
        if cfg is None:
            out = (done.get(name) or {}).get("output")
            if out:
                print(f"{name:28s} {out.splitlines()[-1][:60]}")
            continue
        if not rec or "error" in rec:
            continue
        v = rec.get("value") or rec.get("measured_pairs_per_s") or 0.0
        flags = "" if rec.get("accuracy_ok", True) else "ACCURACY-FAIL"
        entry = done.get(name) or {}
        b_entry = done.get(base) if base else None
        b = (b_entry or {}).get("record")
        if b:
            # tunnel conditions drift across sessions (~> the ±2% noise
            # band): a delta against a baseline measured much earlier is
            # not an adoption-grade A/B
            if abs(entry.get("ts", 0) - b_entry.get("ts", 0)) > 3600:
                flags = (flags + " STALE-BASE").strip()
            bv = b.get("value") or b.get("measured_pairs_per_s") or 0.0
            d = f"{(v / bv - 1) * 100:+6.1f}%" if bv else "   n/a"
            print(f"{name:28s} {v:8.1f} {bv:8.1f} {d:>7s}  {flags}")
        else:
            print(f"{name:28s} {v:8.1f} {'':>8s} {'':>7s}  {flags}")


def _backend_up(timeout_s=240):
    """Cheap tunnel probe in a throwaway subprocess (the axon client can
    hang at interpreter BOOT while the tunnel is down, so the probe needs
    its own process + hard timeout, not an in-process attempt)."""
    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "print(float(jnp.ones((8, 8)).sum()))"],
            cwd=ROOT, capture_output=True, text=True, timeout=timeout_s,
        )
        return p.returncode == 0 and "64.0" in p.stdout
    except subprocess.TimeoutExpired:
        return False


def cmd_retry_loop(only, max_passes=40, sleep_s=120):
    """Run passes until every step has a real measurement, waiting out
    tunnel outages between passes (outages observed to last tens of
    minutes; completed steps are never re-run)."""
    for i in range(max_passes):
        done = load_results()
        todo = [s for s in STEPS
                if (only in s[0] if only else True)
                and not step_done(done.get(s[0]), s[1])]
        if not todo:
            print("all steps measured.")
            cmd_report()
            return 0
        print(f"[pass {i + 1}] {len(todo)} step(s) remaining; probing "
              "backend...", flush=True)
        if not _backend_up():
            print(f"[pass {i + 1}] backend down; sleeping {sleep_s}s",
                  flush=True)
            time.sleep(sleep_s)
            continue
        cmd_run(only)
    print("retry budget exhausted with steps remaining.")
    return 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="substring filter on step names")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--report", action="store_true")
    ap.add_argument("--retry-forever", action="store_true",
                    help="loop passes (with a backend probe between them) "
                         "until every step has a real measurement")
    args = ap.parse_args()
    if args.list:
        cmd_list()
    elif args.report:
        cmd_report()
    elif args.retry_forever:
        raise SystemExit(cmd_retry_loop(args.only))
    else:
        raise SystemExit(cmd_run(args.only))


if __name__ == "__main__":
    main()

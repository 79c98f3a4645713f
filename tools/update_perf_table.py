"""Regenerate the per-config results table in docs/PERFORMANCE.md from
measured bench records.

Usage:
    python tools/update_perf_table.py FILE [FILE ...]

Each FILE may be either
  - a capture of ``bench.py`` stdout/stderr (lines like
    ``# [office] {"metric": ...}`` or a bare ``{"metric": ...}`` line), or
  - ``tpu_ab_results.jsonl`` (the A/B runner's records; only the fresh
    ``base/<config>`` steps are used — variant steps measure env-knob
    candidates, not the shipped defaults).

The last record per config across all files wins. Only rows whose config
was actually re-measured are rewritten (value/vs-ref/RRE/RTE columns;
the static leaf/scene columns are kept from the existing row), so a
partial re-bench updates what it measured and leaves the rest. When all
seven configs come from the same input set, the staleness blockquote
(if present) is dropped; otherwise it is left for the next full run.

Records whose accuracy gate failed (value == 0, measured_pairs_per_s
present) are refused — a gated-out number must never look like a
throughput regression fix.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
DOC = ROOT / "docs" / "PERFORMANCE.md"

CONFIGS = (
    "office",
    "apartment",
    "structured",
    "cross-season",
    "sweep",
    "resso",
    "heritage",
)

_BOLD = {"office", "structured"}  # rows the table emphasizes (bar-setters)


def _records_from_file(path: Path):
    """Yield (config, record) from a bench capture or A/B results file."""
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        # A/B runner record: {"step": "base/office", ..., "record": {...}}
        if line.startswith("{"):
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            step = obj.get("step", "")
            rec = obj.get("record")
            if step.startswith("base/") and rec:
                yield step.split("/", 1)[1], rec
            elif "metric" in obj and obj.get("config") in CONFIGS:
                yield obj["config"], obj
            continue
        # bench stderr line: "# [office] {...}"
        m = re.match(r"#\s*\[([\w-]+)\]\s*(\{.*\})\s*$", line)
        if m and m.group(1) in CONFIGS:
            try:
                yield m.group(1), json.loads(m.group(2))
            except json.JSONDecodeError:
                continue


def _fmt_row(cells):
    return "| " + " | ".join(cells) + " |"


def update(files):
    latest = {}
    for f in files:
        for cfg, rec in _records_from_file(Path(f)):
            latest[cfg] = rec
    if not latest:
        raise SystemExit("no bench records found in the given files")

    gated = [
        c for c, r in latest.items()
        if r.get("value") == 0.0 and "measured_pairs_per_s" in r
    ]
    if gated:
        raise SystemExit(
            f"refusing to publish gated-out records (accuracy gate failed): "
            f"{sorted(gated)}"
        )
    bad = [c for c, r in latest.items() if "error" in r or not r.get("value")]
    if bad:
        raise SystemExit(f"records without a real measurement: {sorted(bad)}")

    text = DOC.read_text()
    lines = text.splitlines()
    out = []
    updated = []
    for ln in lines:
        m = re.match(r"\|\s*([\w-]+)\s*\|", ln)
        cfg = m.group(1) if m else None
        if cfg in CONFIGS and cfg in latest:
            cells = [c.strip() for c in ln.strip().strip("|").split("|")]
            if len(cells) != 7:
                out.append(ln)
                continue
            rec = latest[cfg]
            val = f"{rec['value']:.1f}"
            cells[3] = f"**{val}**" if cfg in _BOLD else val
            cells[4] = f"{rec['vs_baseline']:.2f}×"
            cells[5] = f"{rec['rre_mean_deg']:.3f}°"
            cells[6] = f"{rec['rte_mean_m']:.3f} m"
            out.append(_fmt_row(cells))
            updated.append(cfg)
        else:
            out.append(ln)
    text = "\n".join(out) + ("\n" if text.endswith("\n") else "")

    if set(updated) == set(CONFIGS):
        # full refresh: drop the staleness blockquote (contiguous "> " block
        # containing the word "Staleness")
        text = re.sub(
            r"\n> \*\*Staleness note[^\n]*\n(?:>[^\n]*\n)*", "\n", text
        )

    DOC.write_text(text)
    print(f"updated rows: {updated}")
    missing = [c for c in CONFIGS if c not in latest]
    if missing:
        print(f"not re-measured (rows left as-is): {missing}")
    for cfg in ("office",):
        if cfg in latest:
            r = latest[cfg]
            print(
                f"README headline suggestion: ~{r['value']:.0f} pairs/s "
                f"({r['vs_baseline']:.1f}× the reference) on {cfg}"
            )


if __name__ == "__main__":
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    update(sys.argv[1:])

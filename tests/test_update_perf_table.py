"""The PERFORMANCE.md table updater: parses both input formats, rewrites
only measured rows, refuses gated-out records, drops the staleness note
only on a full 7-config refresh."""

import importlib.util
import json
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


def _load(tmp_doc):
    spec = importlib.util.spec_from_file_location(
        "update_perf_table", ROOT / "tools" / "update_perf_table.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["update_perf_table"] = mod
    spec.loader.exec_module(mod)
    mod.DOC = tmp_doc
    return mod


_DOC = """# Perf

| config | leaf | scene | pairs/s | vs ref | RRE mean | RTE mean |
|---|---|---|---|---|---|---|
| office | 0.1 m | desc | **101.2** | 6.67× | 0.066° | 0.011 m |
| apartment | 0.05 m | desc | 78.3 | 5.16× | 0.132° | 0.017 m |
| structured | 0.1 m | desc | **52.6** | 3.47× | 0.507° | 0.055 m |
| cross-season | 0.1 m | desc | 89.4 | 5.89× | 0.099° | 0.020 m |
| sweep | 0.1 m | desc | 107.4 | 7.08× | 0.069° | 0.015 m |
| resso | 0.1 m | desc | 45.1 | 2.97× | 0.060° | 0.047 m |
| heritage | 0.2 m | desc | 20.9 | 1.37× | 0.148° | 0.090 m |

note line

> **Staleness note (2026-08-18):** stale.
> second line.

tail
"""


def _rec(v, vs=None):
    return {
        "metric": "scan_pairs_registered_per_sec_per_chip",
        "value": v,
        "unit": "pairs/s",
        "vs_baseline": vs if vs is not None else round(v / 15.2, 3),
        "rre_mean_deg": 0.1,
        "rte_mean_m": 0.02,
        "accuracy_ok": True,
    }


def test_partial_update_keeps_staleness_and_other_rows(tmp_path):
    doc = tmp_path / "PERFORMANCE.md"
    doc.write_text(_DOC)
    mod = _load(doc)
    cap = tmp_path / "bench.out"
    cap.write_text("# [office] " + json.dumps(_rec(105.0)) + "\n")
    mod.update([str(cap)])
    text = doc.read_text()
    assert "| office | 0.1 m | desc | **105.0** | 6.91× | 0.100° | 0.020 m |" in text
    assert "| apartment | 0.05 m | desc | 78.3 |" in text  # untouched
    assert "Staleness note" in text  # partial refresh keeps the note
    assert text.endswith("tail\n")


def test_full_refresh_drops_staleness_and_parses_ab_jsonl(tmp_path):
    doc = tmp_path / "PERFORMANCE.md"
    doc.write_text(_DOC)
    mod = _load(doc)
    ab = tmp_path / "tpu_ab_results.jsonl"
    lines = []
    for i, cfg in enumerate(mod.CONFIGS):
        lines.append(json.dumps({
            "step": f"base/{cfg}", "config": cfg, "exit_code": 0,
            "record": _rec(50.0 + i),
        }))
        # variant steps must be ignored
        lines.append(json.dumps({
            "step": f"sort-pallas/{cfg}", "config": cfg, "exit_code": 0,
            "record": _rec(999.0),
        }))
    ab.write_text("\n".join(lines) + "\n")
    mod.update([str(ab)])
    text = doc.read_text()
    assert "Staleness note" not in text
    assert "999" not in text
    assert "| office | 0.1 m | desc | **50.0** |" in text
    assert "| heritage | 0.2 m | desc | 56.0 |" in text


def test_gated_record_refused(tmp_path):
    doc = tmp_path / "PERFORMANCE.md"
    doc.write_text(_DOC)
    mod = _load(doc)
    cap = tmp_path / "bench.out"
    rec = _rec(0.0, vs=0.0)
    rec["measured_pairs_per_s"] = 88.0
    cap.write_text("# [office] " + json.dumps(rec) + "\n")
    with pytest.raises(SystemExit, match="gated-out"):
        mod.update([str(cap)])
    assert "**101.2**" in doc.read_text()  # untouched


def test_infra_failure_record_refused(tmp_path):
    doc = tmp_path / "PERFORMANCE.md"
    doc.write_text(_DOC)
    mod = _load(doc)
    cap = tmp_path / "bench.out"
    rec = {"metric": "scan_pairs_registered_per_sec_per_chip", "value": 0.0,
           "vs_baseline": 0.0, "error": "backend probe timeout",
           "config": "office"}
    cap.write_text(json.dumps(rec) + "\n")
    with pytest.raises(SystemExit):
        mod.update([str(cap)])

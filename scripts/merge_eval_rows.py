#!/usr/bin/env python3
"""Fold re-evaluated policy rows into a release-sweep snapshot.

After a straggler retrain ships, only the retrained policies need
re-evaluating (`eval_policies.py --full_grid --only <name>`); this
utility merges those rows into the existing full-sweep JSON, recomputes
the stopping-ladder summary with the same module function the sweep
uses (scripts/eval_policies.py stopping_summary — never a hand tally),
and refreshes the shipped registry status blob that
``pretrained.policy_status`` reads.

Usage:
  python scripts/merge_eval_rows.py SNAPSHOT.json PARTIAL.json [PARTIAL...]
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from eval_policies import stopping_summary, write_registry_summary


def main():
    snap_path = Path(sys.argv[1])
    snap = json.loads(snap_path.read_text())
    by_name = {r["policy"]: r for r in snap["rows"]}
    for p in sys.argv[2:]:
        part = json.loads(Path(p).read_text())
        for r in part["rows"]:
            old = by_name.get(r["policy"])
            print(f"merge {r['policy']}: iters "
                  f"{old['mean_iters'] if old else '-'} -> {r['mean_iters']}"
                  f", psnr {old['mean_psnr'] if old else '-'} -> "
                  f"{r['mean_psnr']}")
            by_name[r["policy"]] = r
    snap["rows"] = sorted(by_name.values(), key=lambda r: r["policy"])
    snap["stopping_summary"] = stopping_summary(snap["rows"])
    snap_path.write_text(json.dumps(snap, indent=1))
    out = write_registry_summary(snap["stopping_summary"])
    s = snap["stopping_summary"]
    print(json.dumps({k: s[k] for k in
                      ("in_reference_band", "evidenced_optimal",
                       "in_band_or_evidenced", "total", "stragglers")}))
    print(f"registry summary -> {out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Shared-set ratio between two bench JSON lines (r15 ask 3: the
committed floor artifact must carry its own same-session control, so
round-over-round comparisons stop depending on cross-day box state).

Usage: ab_ratio.py <current.json> <control.json> [label]
Each input is one graft.Bench output line ({"queries": {name: sec}}).
Prints one JSON line: shared-set totals, the ratio current/control,
and the worst per-query ratios.
"""
import sys, json

def load(p):
    with open(p) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {p}")

def main(cur_path, ctl_path, label="r15_control"):
    cur, ctl = load(cur_path), load(ctl_path)
    qc, qt = cur["queries"], ctl["queries"]
    shared = sorted(set(qc) & set(qt))
    if not shared:
        raise SystemExit("no shared queries")
    sc = sum(qc[q] for q in shared)
    st = sum(qt[q] for q in shared)
    per = sorted(((round(qc[q] / qt[q], 3) if qt[q] > 0 else None, q)
                  for q in shared if qt[q] > 0), reverse=True)
    out = {
        "detail": label,
        "shared_n": len(shared),
        "current_total": round(sc, 3),
        "control_total": round(st, 3),
        "ratio": round(sc / st, 4),
        "only_current": sorted(set(qc) - set(qt)),
        "only_control": sorted(set(qt) - set(qc)),
        "worst5": [{"q": q, "ratio": r} for r, q in per[:5]],
        "best5": [{"q": q, "ratio": r} for r, q in per[-5:]],
    }
    print(json.dumps(out))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], *(sys.argv[3:4]))

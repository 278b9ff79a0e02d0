"""Diff two bench records: per-query time ratios AND plan-fingerprint
drift, so "is this regression noise or a plan change?" is answerable
from the artifacts alone (the r4 lesson: times moved 10x with unchanged
code and no way to prove the plans hadn't).

Usage: python tools/bench_compare.py OLD.json NEW.json [ratio_threshold]

Output: one line per query whose min time moved more than the threshold
(default 1.5x either way), annotated with whether its fingerprint
(shuffle/broadcast counts, join strategies) changed; a summary of
fingerprint-only drifts; exit 1 if any slowdown coincides with a plan
change (the actionable case).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    def load(path):
        d = json.load(open(path))
        if "queries" in d:
            return d
        # driver-wrapped record (BENCH_r*.json): the bench JSON line is
        # embedded in the captured stdout tail
        tail = d.get("tail", "")
        start = tail.find('{"metric"')
        if start < 0:
            raise SystemExit(f"{path}: no bench record found")
        return json.loads(tail[start:tail.rfind("}") + 1])

    old = load(old_path)
    new = load(new_path)
    oq, nq = old["queries"], new["queries"]
    op, np_ = old.get("plans", {}), new.get("plans", {})

    def fp(d):
        if not d:
            return None
        return (
            d.get("shuffles"),
            d.get("broadcasts"),
            tuple(sorted((d.get("joins") or {}).items())),
        )

    plan_changed = {
        k
        for k in set(op) & set(np_)
        if fp(op.get(k)) is not None
        and fp(np_.get(k)) is not None
        and fp(op[k]) != fp(np_[k])
    }
    actionable = []
    moved = []
    for k in sorted(set(oq) & set(nq)):
        a, b = oq[k], nq[k]
        if a <= 0 or b <= 0:
            continue
        r = b / a
        if r > thresh or r < 1 / thresh:
            if k in plan_changed:
                note = "PLAN CHANGED"
            elif fp(op.get(k)) is None or fp(np_.get(k)) is None:
                note = "no fingerprint"
            else:
                note = "plan stable"
            moved.append((r, k, a, b, note))
            if r > thresh and k in plan_changed:
                actionable.append(k)
    for r, k, a, b, note in sorted(moved, reverse=True):
        print(f"{k:<32}{a:>8.2f}s ->{b:>8.2f}s  ({r:5.2f}x)  {note}")
    quiet_drift = plan_changed - {k for _, k, *_ in moved}
    if quiet_drift:
        print("fingerprint drift without time move:", sorted(quiet_drift))
    if not moved and not quiet_drift:
        print("no movement past threshold; plans stable")
    print(
        f"totals: {old.get('value')}s -> {new.get('value')}s; "
        f"tpch {old.get('tpch_total')}s -> {new.get('tpch_total')}s"
    )
    if actionable:
        print("ACTIONABLE (slowdown + plan change):", actionable)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

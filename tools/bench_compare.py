#!/usr/bin/env python
"""Common-set comparison of two BENCH_HISTORY.jsonl entries — the
round-11 verdict's drift-adjudication tool (item 2): given two entry
heads (default: the round-10 reference entry b753dcd and the latest),
sum the queries present in BOTH and report per-query movers, so a
uniform machine-state drift (everything ±N%) is distinguishable from a
real per-query regression.

Usage:
    python tools/bench_compare.py              # b753dcd vs latest
    python tools/bench_compare.py OLDHEAD NEWHEAD
"""

from __future__ import annotations

import json
import os
import sys


def load(path: str) -> list[dict]:
    return [json.loads(line) for line in open(path) if line.strip()]


def pick(entries: list[dict], head: str | None) -> dict:
    if head is None:
        return entries[-1]
    matches = [e for e in entries if e.get("head", "").startswith(head)]
    if not matches:
        raise SystemExit(f"no BENCH_HISTORY entry with head {head}")
    return matches[-1]


def main() -> int:
    hist = load(os.path.join(os.path.dirname(__file__), "..",
                             "BENCH_HISTORY.jsonl"))
    old_head = sys.argv[1] if len(sys.argv) > 1 else "b753dcd"
    new_head = sys.argv[2] if len(sys.argv) > 2 else None
    old, new = pick(hist, old_head), pick(hist, new_head)
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    so = sum(qo[q] for q in common)
    sn = sum(qn[q] for q in common)
    movers = sorted(
        ((q, qo[q], qn[q], qn[q] / max(qo[q], 0.01)) for q in common),
        key=lambda t: -abs(t[2] - t[1]),
    )
    print(json.dumps({
        "old_head": old.get("head"), "new_head": new.get("head"),
        "n_common": len(common),
        "common_sum_old": round(so, 1), "common_sum_new": round(sn, 1),
        "ratio": round(sn / so, 3),
        "new_only_sum": round(
            sum(v for q, v in qn.items() if q not in qo), 1),
        "top_movers": [
            {"q": q, "old": o, "new": n, "x": round(x, 2)}
            for q, o, n, x in movers[:8]
        ],
    }, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

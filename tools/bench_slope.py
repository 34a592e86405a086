#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. sf0.1 vs sf1) and print a per-query
scaling slope table: slope = t_big / t_small against a data ratio (10x by
default). Queries faster than FLOOR seconds at the small SF are noise
(fixed per-query overhead dominates) and are reported but not flagged.

Usage: bench_slope.py <small.json> <big.json> [ratio] [floor_sec]
"""
import json, sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5

# entry-registry flags (either file may carry them; bench emits "flags")
flags = {**small.get("flags", {}), **big.get("flags", {})}

rows = []
for q, t0 in small["queries"].items():
    t1 = big["queries"].get(q)
    if t1 is None or t0 <= 0 or t1 <= 0:
        rows.append((q, t0, t1 if t1 is not None else -1.0, None))
        continue
    rows.append((q, t0, t1, t1 / t0))

rows.sort(key=lambda r: -(r[3] or 0))
print(f"{'query':28s} {'t_small':>8s} {'t_big':>8s} {'slope':>7s}  flag (data ratio {ratio:g}x, floor {floor}s)")
for q, t0, t1, s in rows:
    flag = ""
    if s is None:
        flag = "FAILED"
    elif q in flags:
        flag = f"[{flags[q]}]"
    elif t0 >= floor and s > ratio * 1.3:
        flag = "SUPER-LINEAR"
    elif t0 < floor:
        flag = "(overhead-dominated at small SF)"
    print(f"{q:28s} {t0:8.3f} {t1 if t1 else -1:8.3f} {('%.2f' % s) if s else '  n/a'}  {flag}")
tot0 = sum(v for v in small["queries"].values() if v > 0)
tot1 = sum(v for v in big["queries"].values() if v > 0)
print(f"\nTOTAL {tot0:.1f}s -> {tot1:.1f}s (x{tot1/tot0:.2f} at {ratio:g}x data)")

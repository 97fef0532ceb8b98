#!/usr/bin/env python3
"""Scale-rehearsal report: per-query scaling exponents between two
Bench JSON lines (target/bench.json format) at different scale factors.

Usage: python3 tools/scale_report.py <bench_small.json> <bench_big.json> <factor>

Exponent = log(t_big / t_small) / log(factor): 1.0 = linear in data
volume, < 1 sub-linear (parallelism/constant costs amortizing), > 1
super-linear (the adjudication trigger).
"""
import json, math, sys

def main():
    small, big, factor = sys.argv[1], sys.argv[2], float(sys.argv[3])
    s = json.load(open(small))
    b = json.load(open(big))
    qs, qb = s["queries"], b["queries"]
    rows = []
    for k in qs:
        if k in qb and qs[k] > 0 and qb[k] > 0:
            ratio = qb[k] / qs[k]
            rows.append((math.log(ratio) / math.log(factor), ratio,
                         qs[k], qb[k], k))
    rows.sort(reverse=True)
    print(f"factor {factor:g}x | {small} -> {big}")
    print(f"total: {s['value']:.1f} s -> {b['value']:.1f} s "
          f"({b['value']/s['value']:.2f}x, exp "
          f"{math.log(b['value']/s['value'])/math.log(factor):.2f})")
    print(f"errors small={s['errors']} big={b['errors']}")
    print(f"controls small={[round(c['sec'],3) for c in s['controls']]}")
    print(f"controls big={[round(c['sec'],3) for c in b['controls']]}")
    print(f"\n{'query':28s} {'small':>8s} {'big':>8s} {'ratio':>6s} {'exp':>6s}")
    for exp, ratio, ts, tb, k in rows:
        flag = " <-- SUPER-LINEAR" if ratio > factor else ""
        print(f"{k:28s} {ts:8.2f} {tb:8.2f} {ratio:6.2f} {exp:6.2f}{flag}")
    sup = [r for r in rows if r[1] > factor]
    print(f"\nsuper-linear (ratio > {factor:g}): {len(sup)} of {len(rows)}")

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Per-query scale exponents across the measured decades (dev tool).

Reads three Bench records (sf0.1, sf1, sf10) and prints, per query,
e1 = log10(t_sf1 / t_sf0.1) and e2 = log10(t_sf10 / t_sf1) — the
per-decade wall-time exponents — flagging queries whose second decade
bends upward (e2 materially above e1 AND superlinear territory): those
are the real 100× risks the plan-shape arguments must answer for.

Usage: exponents.py <bench_sf0.1.json> <bench_sf1.json> <bench_sf10.json>
"""
import json
import math
import sys


def main():
    a, b, c = (json.load(open(p))["queries"] for p in sys.argv[1:4])
    common = sorted(set(a) & set(b) & set(c))
    flagged = []
    print(f"{'query':34s} {'sf0.1':>7s} {'sf1':>7s} {'sf10':>8s} "
          f"{'e1':>6s} {'e2':>6s}")
    def exp(t_small, t_big):
        # guard BOTH operands: a zero/negative recorded time on either
        # side (clock quantization, a hand-edited record) must print nan,
        # not crash the tool with a log-domain ValueError
        return (math.log10(t_big / t_small)
                if t_small > 0 and t_big > 0 else float("nan"))

    for n in common:
        t1, t2, t3 = a[n], b[n], c[n]
        e1 = exp(t1, t2)
        e2 = exp(t2, t3)
        # e2 ~ 1.0 is the healthy asymptote: once fixed costs amortize, a
        # work-bound query grows with its data. The 100x risk is e2
        # MATERIALLY above 1 (superlinear work or a regime that stopped
        # scaling); require a 1 s floor so sub-second noise can't flag.
        bend = e2 > 1.05 and t3 > 1.0
        if bend:
            flagged.append((n, t1, t2, t3, e1, e2))
        print(f"{n:34s} {t1:7.2f} {t2:7.2f} {t3:8.2f} {e1:6.2f} {e2:6.2f}"
              + ("  <-- superlinear" if bend else ""))
    ta, tb, tc = (sum(d[n] for n in common) for d in (a, b, c))
    print(f"\n{'TOTAL (common set)':34s} {ta:7.1f} {tb:7.1f} {tc:8.1f} "
          f"{exp(ta, tb):6.2f} {exp(tb, tc):6.2f}")
    print(f"\n{len(flagged)} queries superlinear in the second decade "
          f"(e2 > 1.05, t > 1 s):")
    for n, t1, t2, t3, e1, e2 in sorted(flagged, key=lambda r: -r[5]):
        print(f"  {n:32s} {t1:6.2f} -> {t2:6.2f} -> {t3:7.2f}  "
              f"e1={e1:.2f} e2={e2:.2f}")


if __name__ == "__main__":
    main()

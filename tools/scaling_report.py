#!/usr/bin/env python3
"""Measured scaling report: per-query and per-family sf1/sf0.1 ratios.

Usage:
    python3 tools/scaling_report.py BENCH_full_r16.json BENCH_sf1_r16.json \
        families.json [--scale 10]

The scale-up multiplies ROWS by `scale` (default 10), so a query whose
cost is Theta(n) shows ratio ~= scale, and the per-query scaling
exponent is log(ratio)/log(scale): 1.0 = linear, < 1 = sublinear
(fixed-cost / bucket-capped work), > 1 = super-linear (the thing the
100 TB bar cares about).

Sub-second sf0.1 queries are ratio-noisy (a 0.05 s -> 0.6 s move is
12x but means nothing), so the exponent table flags, rather than
averages over, queries whose sf0.1 warm time is under FLOOR seconds;
the headline per-family exponent uses total family seconds (big
queries dominate, which is what matters at scale).
"""
import json
import math
import sys

FLOOR = 0.20  # sf0.1 seconds under which a per-query ratio is noise


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    base_f, scaled_f, fam_f = args[0], args[1], args[2]
    scale = 10.0
    if "--scale" in sys.argv:
        scale = float(sys.argv[sys.argv.index("--scale") + 1])
    base = json.load(open(base_f))
    scaled = json.load(open(scaled_f))
    fams = json.load(open(fam_f))
    bq, sq = base["queries"], scaled["queries"]
    common = sorted(set(bq) & set(sq))
    missing = sorted(set(bq) ^ set(sq))
    if missing:
        print(f"WARNING: queries not in both runs: {missing}", file=sys.stderr)

    def exponent(ratio: float) -> float:
        return math.log(max(ratio, 1e-9)) / math.log(scale)

    rows = []
    for name in common:
        b, s = bq[name], sq[name]
        rows.append((name, fams.get(name, "?"), b, s, s / max(b, 1e-9)))

    print(f"# per-query (sorted by sf{scale:g}x time); exponent = "
          f"log(ratio)/log({scale:g}); '~' = sf-base under {FLOOR}s (noisy)")
    print(f"{'query':26s} {'family':11s} {'base_s':>8s} {'scaled_s':>9s} "
          f"{'ratio':>7s} {'exp':>6s}")
    for name, fam, b, s, r in sorted(rows, key=lambda t: -t[3]):
        flag = "~" if b < FLOOR else " "
        print(f"{name:26s} {fam:11s} {b:8.2f} {s:9.2f} {r:7.2f} "
              f"{exponent(r):6.2f}{flag}")

    print("\n# per-family (total seconds; exponent over family totals)")
    print(f"{'family':11s} {'n':>3s} {'base_s':>8s} {'scaled_s':>9s} "
          f"{'ratio':>7s} {'exp':>6s}")
    for fam in sorted({f for _, f, *_ in rows}):
        fr = [t for t in rows if t[1] == fam]
        b = sum(t[2] for t in fr)
        s = sum(t[3] for t in fr)
        print(f"{fam:11s} {len(fr):3d} {b:8.2f} {s:9.2f} {s / b:7.2f} "
              f"{exponent(s / b):6.2f}")
    tb = sum(t[2] for t in rows)
    ts = sum(t[3] for t in rows)
    print(f"{'TOTAL':11s} {len(rows):3d} {tb:8.2f} {ts:9.2f} {ts / tb:7.2f} "
          f"{exponent(ts / tb):6.2f}")

    print("\n# super-linear watchlist (exp > 1.10 and base >= FLOOR)")
    hot = [t for t in rows if t[2] >= FLOOR and exponent(t[4]) > 1.10]
    for name, fam, b, s, r in sorted(hot, key=lambda t: -t[4]):
        print(f"  {name:26s} {fam:11s} {b:6.2f}s -> {s:7.2f}s "
              f"(x{r:.1f}, exp {exponent(r):.2f})")
    if not hot:
        print("  (none)")


if __name__ == "__main__":
    main()

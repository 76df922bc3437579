#!/usr/bin/env python3
"""Fit per-entry growth exponents from BenchScale artifacts at multiple
scale tiers: given scratch JSONs that share sfA (the 1x tier) and measure
sfB at different factors, fit log(t) = e*log(n) + c over the 1x/3x/10x
points and emit one merged artifact. The exponent answers the round-8
verdict's curvature question: e <= ~1.2 is linear-with-constants; e ~ 2
is the quadratic the decomposition argument ruled out.

Usage: fit_scale.py <out.json> <factorA:fileA> <factorB:fileB> ...
Each file is a BenchScale line whose sfA times are averaged across runs
(same tier measured twice -> min).
"""
import json
import math
import sys


def main(out_path, specs):
    tiers = []  # (factor, {entry: sec})
    sf_a = {}   # entry -> list of 1x times across runs
    meta = []
    for spec in specs:
        factor, path = spec.split(":", 1)
        d = json.loads(open(path).read())
        meta.append({"factor": float(factor), "file": path,
                     "loadavg_start": d.get("loadavg_start"),
                     "loadavg_end": d.get("loadavg_end")})
        qs = {}
        for name, row in d["queries"].items():
            if "sfB" in row:
                qs[name] = row["sfB"]
                sf_a.setdefault(name, []).append(row["sfA"])
        tiers.append((float(factor), qs))
    entries = {}
    for name, a_times in sf_a.items():
        pts = [(1.0, min(a_times))]
        for factor, qs in tiers:
            if name in qs:
                pts.append((factor, qs[name]))
        if len(pts) < 3:
            continue
        xs = [math.log(f) for f, _ in pts]
        ys = [math.log(t) for _, t in pts]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        e = (sum((x - mx) * (y - my) for x, y in zip(xs, ys)) /
             sum((x - mx) ** 2 for x in xs))
        entries[name] = {
            "points": [{"factor": f, "sec": round(t, 3)} for f, t in pts],
            "exponent": round(e, 3),
        }
    art = {"metric": "scale_curvature", "runs": meta, "queries": entries}
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    for name, row in sorted(entries.items()):
        print(name, "e=%.3f" % row["exponent"],
              " ".join("%gx:%.2fs" % (p["factor"], p["sec"])
                       for p in row["points"]))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])

#!/usr/bin/env python3
"""Per-family sf0.1 -> sf1.0 bench time ratios (SCALING.md sf1.0 sweep).

Usage: scale_ratios.py bench_sf01.json bench_sf1.json
Both files are graft.Bench JSON lines ({"queries": {name: sec}, ...}).
Families are the query-name prefixes used throughout COVERAGE.md.
Data grew 10x between the inputs; a family ratio well above 10x is
superlinear and must be adjudicated in SCALING.md.
"""
import json
import re
import sys


def family(name: str) -> str:
    m = re.match(r"(tpch|dd|nn|er|ev|ft|pipe|mm|set|st|[a-z])[0-9]", name)
    return m.group(1) if m else name.split("_")[0]


def load(path: str) -> dict:
    with open(path) as f:
        txt = f.read()
    obj = json.JSONDecoder().raw_decode(txt[txt.index('{"metric"'):])[0]
    return obj["queries"]


def main() -> None:
    a, b = load(sys.argv[1]), load(sys.argv[2])
    fams: dict = {}
    for name, t in a.items():
        if name in b:
            fa = fams.setdefault(family(name), [0.0, 0.0, 0])
            fa[0] += t
            fa[1] += b[name]
            fa[2] += 1
    only = (set(a) | set(b)) - (set(a) & set(b))
    if only:
        print(f"(not in both sweeps, excluded: {sorted(only)})\n")
    print("| family | n | sf0.1 s | sf1.0 s | ratio |")
    print("|---|---|---|---|---|")
    tot01 = tot1 = 0.0
    for fam in sorted(fams, key=lambda f: -fams[f][1]):
        s01, s1, n = fams[fam]
        tot01 += s01
        tot1 += s1
        flag = " **> 10x**" if s1 / s01 > 10 else ""
        print(f"| {fam} | {n} | {s01:.2f} | {s1:.2f} | {s1 / s01:.1f}x{flag} |")
    print(f"| **total** | {sum(f[2] for f in fams.values())} | "
          f"{tot01:.2f} | {tot1:.2f} | {tot1 / tot01:.1f}x |")
    print("\nPer-query movers with ratio > 15x and sf1.0 > 1 s:")
    for name in sorted(a, key=lambda q: -(b.get(q, 0) / max(a[q], 1e-9))):
        if name in b and b[name] / max(a[name], 1e-9) > 15 and b[name] > 1:
            print(f"  {name}: {a[name]:.2f} -> {b[name]:.2f} "
                  f"({b[name] / max(a[name], 1e-9):.1f}x)")


if __name__ == "__main__":
    main()

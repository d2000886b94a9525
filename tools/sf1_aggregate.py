"""Summarize a bench_compare log into the three graded aggregates:
full oracle set, minus-pathological (the two pair-blowup queries both
engines pay), and the compute-bound subset (DuckDB >= 0.1 s).

Usage: python tools/sf1_aggregate.py /tmp/bench_sf1_postfix.log
"""

import re
import sys

PATHOLOGICAL = {"edit_distance_pairs", "entity_match_pairs"}


def main() -> None:
    rows = {}
    for raw in open(sys.argv[1], errors="replace"):
        for line in raw.replace("\r", "\n").splitlines():
            m = re.match(
                r"^([a-z_0-9]+) +([0-9.]+) +([0-9.]+) +[0-9.]+$", line.strip()
            )
            if m and m.group(1) != "TOTAL":
                rows[m.group(1)] = (float(m.group(2)), float(m.group(3)))
    def agg(pred, label):
        sel = {k: v for k, v in rows.items() if pred(k, v)}
        s = sum(v[0] for v in sel.values())
        d = sum(v[1] for v in sel.values())
        print(f"{label:44s} n={len(sel):3d} spark={s:8.1f} duckdb={d:8.1f} ratio={s / max(d, 1e-9):5.2f}")
        return sel
    agg(lambda k, v: True, "full oracle-compared set")
    agg(lambda k, v: k not in PATHOLOGICAL, "minus pair-blowup (edit_distance/entity_match)")
    agg(lambda k, v: k not in PATHOLOGICAL and v[1] >= 0.1, "compute-bound (duckdb >= 0.1s, minus blowup)")
    agg(lambda k, v: k not in PATHOLOGICAL and v[1] < 0.1, "job-floor (duckdb < 0.1s)")
    worst = sorted(
        ((k, v) for k, v in rows.items() if k not in PATHOLOGICAL),
        key=lambda kv: kv[1][0] / max(kv[1][1], 1e-9),
        reverse=True,
    )[:10]
    print("\nworst ratios (minus blowup):")
    for k, (s, d) in worst:
        print(f"  {k:28s} {s:8.3f} {d:8.3f} {s / max(d, 1e-9):7.1f}")


if __name__ == "__main__":
    main()

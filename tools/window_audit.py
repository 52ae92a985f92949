"""Window-shape audit (r13): sweep every registry entry's EXECUTED plan
for window specs and report their partition keys + whether Spark's
WindowGroupLimit (map-side per-group pre-limit) engaged.

Why: a window partition is the one shuffle unit AQE cannot split, so
every `Window.partitionBy(<data key>)` over raw rows is a potential
hot-key straggler. This audit classifies each occurrence so none hides:

- top-k shapes (row_number + filter) must show WindowGroupLimit — if a
  sibling full-partition expression (e.g. an unordered count over the
  same partition) sneaks into the select, it silently DEFEATS the
  pre-limit (how r13 caught inverted_index);
- bucketed scale paths partition by (key, __b__) or run over the tiny
  per-bucket summary frame;
- plain ordered carries (sessionize/rolling/asof/merge_intervals
  defaults) are documented hot-key-exposed with bucketed remedies;
- anything else partitioning raw rows by a bare data key is a finding.

Usage: python tools/window_audit.py [sf_dir] [query ...]
Writes /tmp/window_audit.json and prints one line per windowed entry.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from omigo_data_analytics_spark import get_spark

    import __spark_entry__ as entry

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not os.path.isabs(sf_dir):
        sf_dir = f"/root/testdata/{sf_dir}"
    only = set(sys.argv[2:])

    spark = get_spark("window_audit", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "8")))
    report = {}
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            wins = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
            if not wins:
                continue
            report[name] = {"n": len(wins),
                            "window_group_limit": "WindowGroupLimit" in plan,
                            "specs": sorted(set(w[:110] for w in wins))}
            print(f"{name:32s} n={len(wins):2d} "
                  f"wgl={'Y' if report[name]['window_group_limit'] else 'n'}",
                  flush=True)
        except Exception as ex:  # noqa: BLE001 - audit must not die mid-sweep
            report[name] = {"error": str(ex)[:160]}
            print(f"{name:32s} ERROR {str(ex)[:80]}", flush=True)
    with open("/tmp/window_audit.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"{len(report)} windowed entries of {len(entry.queries())}; "
          "details in /tmp/window_audit.json")


if __name__ == "__main__":
    main()

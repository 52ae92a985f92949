"""Measured shuffle/scan/spill audit per driver query.

Runs each named query (default: all) at $SPARK_GRAFT_SF_DIR through the
noop sink, then reads the REAL executed-plan SQLMetrics from the SQL
status store — not estimates: shuffle bytes/records actually written,
parquet bytes actually read, spill actually hit. This is the evidence
behind SCALE.md's shuffle-footprint claims ("measure, don't guess"):
a query whose shuffle grows corpus-sized shows up here long before it
becomes an OOM at 100 TB.

Caveat: SQLMetrics cover DataFrame exchanges; RDD-level shuffles from
localCheckpoint-based loops (graph closure) report records but not
bytes — read those rows as record counts.

Usage: python tools/shuffle_audit.py [sf_dir_or_name] [query ...]
Prints one line per query:
  name  wall_s  shuffle_written  shuffle_records  files_read_bytes  spill
and a JSON blob at the end.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_UNITS = {"B": 1, "KiB": 1024, "MiB": 1024**2, "GiB": 1024**3,
          "TiB": 1024**4}


def _parse_value(s: str) -> int:
    """SQLMetric display strings: '6,000', '216.0 B', '32.2 MiB',
    'total (min, med, max...)\\n...' — take the leading total."""
    s = s.strip().split("\n")[0]
    m = re.match(r"([\d.,]+)\s*([KMGT]i?B)?", s)
    if not m:
        return 0
    num = float(m.group(1).replace(",", ""))
    return int(num * _UNITS.get(m.group(2), 1))


def collect_exec_metrics(spark, from_exec_id: int) -> dict[str, int]:
    """Aggregate named metrics over all SQL executions after the marker
    (one logical query can run several executions, e.g. streaming
    micro-batches or in-plan count jobs)."""
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    agg: dict[str, int] = {}
    for i in range(execs.size()):
        ex = execs.apply(i)
        if ex.executionId() <= from_exec_id:
            continue
        try:
            vals = {}
            vit = store.executionMetrics(ex.executionId()).iterator()
            while vit.hasNext():
                kv = vit.next()
                vals[kv._1()] = kv._2()
        except Exception:
            continue
        mit = ex.metrics().iterator()
        while mit.hasNext():
            m = mit.next()
            if m.accumulatorId() in vals:
                name = m.name()
                agg[name] = agg.get(name, 0) + _parse_value(
                    vals[m.accumulatorId()])
    return agg


def last_exec_id(spark) -> int:
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    return execs.apply(execs.size() - 1).executionId() if execs.size() else -1


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    if not os.path.isdir(sf_dir) and os.path.isdir(f"/root/testdata/{sf_dir}"):
        sf_dir = f"/root/testdata/{sf_dir}"
    only = sys.argv[2:]

    import __spark_entry__ as entry_mod
    from omigo_data_analytics_spark import get_spark

    spark = get_spark("omigo_shuffle_audit",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS",
                                              os.cpu_count() or 8)))
    spark.sparkContext.setLogLevel("ERROR")
    entry_mod.entry(spark).write.format("noop").mode("overwrite").save()

    qs = entry_mod.queries()
    names = only or list(qs)
    out = {}
    for name in names:
        marker = last_exec_id(spark)
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)[:200]}
            continue
        wall = round(time.time() - t0, 2)
        m = collect_exec_metrics(spark, marker)
        row = {
            "wall_s": wall,
            "shuffle_bytes_written": m.get("shuffle bytes written", 0),
            "shuffle_records_written": m.get("shuffle records written", 0),
            "files_read_bytes": m.get("size of files read", 0),
            "output_rows_total": m.get("number of output rows", 0),
            "spill_bytes": m.get("spill size", 0),
        }
        out[name] = row
        print(f"{name:28s} {wall:6.2f}s  shuffle="
              f"{row['shuffle_bytes_written']/1e6:9.2f}MB "
              f"({row['shuffle_records_written']:>9} rec)  scan="
              f"{row['files_read_bytes']/1e6:8.2f}MB  spill="
              f"{row['spill_bytes']/1e6:6.1f}MB", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()

"""Per-query phase profiler: split each declared query's wall into
DataFrame-construction time (eager censuses / localCheckpoints run here)
vs noop-action time, and count the Spark jobs each phase submits.

Usage:
    python tools/profile_queries.py q1,q2,...   # or 'all'

Prints one line per query:
    name  t_construct  t_action  jobs_construct  jobs_action  total
Runs each query twice and reports the second (warm) run, so JIT noise
does not masquerade as construction cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    names_arg = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    import __spark_entry__ as entry_mod
    from omigo_data_analytics_spark import get_spark
    spark = get_spark("omigo_spark_profile", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = entry_mod.queries()
    todo = (list(qs) if names_arg == "all"
            else [n.strip() for n in names_arg.split(",") if n.strip()])

    # warm the workers like bench.py does
    try:
        entry_mod.entry(spark).write.format("noop").mode("overwrite").save()
        (spark.range(cpus * 4).repartition(cpus)
         .mapInPandas(lambda it: it, schema="id long")
         .write.format("noop").mode("overwrite").save())
    except Exception:
        pass

    def _n_jobs():
        return len(sc.statusTracker().getJobIdsForGroup(None) or [])

    results = {}
    for name in todo:
        if name not in qs:
            print(f"# unknown query: {name}", file=sys.stderr)
            continue
        rec = None
        for _ in range(2):  # report the warm run
            j0 = _n_jobs()
            t0 = time.time()
            try:
                df = qs[name](spark, sf_dir)
                t1 = time.time()
                j1 = _n_jobs()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.time()
                j2 = _n_jobs()
                rec = {"construct": round(t1 - t0, 3),
                       "action": round(t2 - t1, 3),
                       "jobs_construct": j1 - j0,
                       "jobs_action": j2 - j1,
                       "total": round(t2 - t0, 3)}
            except Exception as e:
                rec = {"error": f"{type(e).__name__}: {e}"}
                break
        results[name] = rec
        if "error" in rec:
            print(f"{name:36s} ERROR {rec['error']}", flush=True)
        else:
            print(f"{name:36s} c={rec['construct']:7.3f}s a={rec['action']:7.3f}s "
                  f"jc={rec['jobs_construct']:3d} ja={rec['jobs_action']:3d} "
                  f"t={rec['total']:7.3f}s", flush=True)
    print(json.dumps({"profile": results}, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()

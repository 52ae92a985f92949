"""Capture .explain('formatted') for declared queries into plans/<tag>/.

Usage:
    python tools/capture_plans.py <tag> [q1,q2,...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix from $PLAN_SUFFIX,
default 'before'). With no query list, captures every declared query.
Queries whose construction runs eager jobs (censuses, localCheckpoints)
still only PLAN here — nothing is executed beyond what construction
itself triggers.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    names = ([n.strip() for n in sys.argv[2].split(",") if n.strip()]
             if len(sys.argv) > 2 else None)
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry_mod
    from omigo_data_analytics_spark import get_spark
    spark = get_spark("omigo_spark_plans", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    todo = names if names is not None else list(qs)
    n_ok = 0
    for name in todo:
        if name not in qs:
            print(f"# unknown query: {name}", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
        except Exception as e:
            plan = f"ERROR capturing plan: {type(e).__name__}: {e}"
            print(f"# plan error {name}: {type(e).__name__}: {e}",
                  file=sys.stderr)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        n_ok += 1
    print(f"captured {n_ok} plans -> {out_dir} (suffix={suffix})")
    spark.stop()


if __name__ == "__main__":
    main()

"""Trace every Spark job a registry key runs — id, description/callsite,
stage count, task count, duration — via the JVM AppStatusStore. The
what-are-these-17-jobs measurement behind the fewer-jobs lever (guide §1.2).

Usage: python tools/job_trace.py <key>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakefs_iceberg_catalog_spark import registry
from lakefs_iceberg_catalog_spark.operators.util import release_scoped
from lakefs_iceberg_catalog_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark("job-trace")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()

    def jobs_list():
        seq = store.jobsList(None)
        return [seq.apply(i) for i in range(seq.size())]

    base = [j.jobId() for j in jobs_list()]
    lo = max(base) if base else -1
    df = registry.QUERIES[name](spark, sf_dir)
    fixture_hi = max(j.jobId() for j in jobs_list())
    df.count()
    jobs = sorted(
        (j for j in jobs_list() if j.jobId() > lo),
        key=lambda j: j.jobId(),
    )
    for j in jobs:
        desc = j.description()
        d = desc.get() if desc.isDefined() else ""
        dur = (
            (j.completionTime().get().getTime() - j.submissionTime().get().getTime())
            if j.completionTime().isDefined() and j.submissionTime().isDefined()
            else -1
        )
        tag = "FIX" if j.jobId() <= fixture_hi else "ACT"
        print(
            f"{tag} job={j.jobId()} stages={j.stageIds().size()} "
            f"tasks={j.numTasks()} ms={dur} name={j.name()[:90]!r} desc={d[:60]!r}"
        )
    release_scoped()
    spark.stop()


if __name__ == "__main__":
    main()

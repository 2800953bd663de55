"""Per-stage breakdown of one query run (guide §1/§7.1 via REST API).

Usage: python scripts/stage_breakdown_r06.py <query> [<query> ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def stages(spark):
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main():
    spark = bench.make_spark(bench.CPUS, ui=True)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    for name in sys.argv[1:]:
        # warm twice
        qs[name](spark, bench.SF_DIR).collect()
        qs[name](spark, bench.SF_DIR).collect()
        before = {s["stageId"] for s in stages(spark)}
        t0 = time.perf_counter()
        qs[name](spark, bench.SF_DIR).collect()
        wall = time.perf_counter() - t0
        time.sleep(0.3)
        new = [s for s in stages(spark) if s["stageId"] not in before]
        new.sort(key=lambda s: s["stageId"])
        print(f"== {name}: wall {wall:.3f}s, {len(new)} stages")
        tot = 0.0
        for s in new:
            dur = (s.get("executorRunTime", 0)) / 1000.0
            sub = time.strptime(s["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            comp = time.strptime(s["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            span = time.mktime(comp) - time.mktime(sub)
            ms = lambda k: s.get(k, 0)
            print(
                f"  stage {s['stageId']:4d} tasks={s['numCompleteTasks']:3d} "
                f"execRun={dur:6.3f}s cpu={ms('executorCpuTime')/1e9:6.3f}s "
                f"span~{span:4.0f}s sched={ms('schedulerDelay')/1e3:5.3f} "
                f"pyt={ms('executorDeserializeTime')/1e3:5.3f} "
                f"name={s['name'][:60]}"
            )
            tot += dur
        print(f"  sum execRun {tot:.3f}s vs wall {wall:.3f}s "
              f"(gap = driver/sched/AQE {wall - tot:.3f}s)")
    spark.stop()


if __name__ == "__main__":
    main()

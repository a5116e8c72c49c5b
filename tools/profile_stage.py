"""Per-Spark-stage profile of the e2e tile pipeline.

Runs the same job as ``bench.py --e2e-only`` once (fresh workdir), then
reads the live UI REST API (local mode, port 4040+) to print, for every
Spark stage: wall, executorRunTime, CPU time, GC, shuffle bytes, task
count and the max/median task-time skew.  Used to localize where the
4->16-slot scaling pair loses efficiency (round-5 verdict item 3).

Usage:
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_TASK_CPUS=2 \
        python tools/profile_stage.py 800000
"""

from __future__ import annotations

import json
import os
import sys
import calendar
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from tilemaker_spark.config import default_config
    from tilemaker_spark.fixtures import make_pages
    from tilemaker_spark.plans.pipeline import TilePipeline
    from tilemaker_spark.session import get_spark

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    cfg = default_config()
    pages = make_pages(spark, n_pages)
    workdir = f"/tmp/profile_run_{cpus}"
    import shutil
    # two runs: first warms JVM/JIT/python workers, second is measured
    # (mirrors the bench's best-of-2 protocol)
    for run in range(2):
        shutil.rmtree(workdir, ignore_errors=True)
        pipe = TilePipeline(spark, cfg, workdir=workdir)
        t0 = time.time()
        pipe.run(pages, force=True)
        wall = time.time() - t0
    stage_meta = {k: v.get("seconds") for k, v in
                  pipe.metrics["stages"].items()}

    stages = _get(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    # keep only stages from the SECOND pipeline run (submission after t0)
    rows = []
    for st in stages:
        sub = st.get("firstTaskLaunchedTime") or st.get("submissionTime")
        if not sub:
            continue
        # REST timestamps are GMT ("...000GMT"): timegm, not mktime, or the
        # second-run stage filter shifts by the host UTC offset
        t_sub = calendar.timegm(time.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S"))
        if t_sub < t0 - 1:
            continue
        comp = st.get("completionTime")
        t_comp = calendar.timegm(time.strptime(comp[:19], "%Y-%m-%dT%H:%M:%S"))
        # task-time quantiles for skew
        q = {}
        try:
            q = _get(f"{ui}/api/v1/applications/{app_id}/stages/"
                     f"{st['stageId']}/{st['attemptId']}/taskSummary"
                     "?quantiles=0.5,1.0")
        except Exception:
            pass
        dur = q.get("duration", [0, 0])
        rows.append({
            "stageId": st["stageId"],
            "name": st["name"].split("\n")[0][:60],
            "wall_s": round(t_comp - t_sub, 1),
            "tasks": st["numCompleteTasks"],
            "run_s": round(st["executorRunTime"] / 1e3, 1),
            "cpu_s": round(st["executorCpuTime"] / 1e9, 1),
            "gc_s": round(st["jvmGcTime"] / 1e3, 1),
            "sh_w_mb": round(st["shuffleWriteBytes"] / 1e6, 1),
            "sh_r_mb": round(st["shuffleReadBytes"] / 1e6, 1),
            "in_mb": round(st["inputBytes"] / 1e6, 1),
            "out_mb": round(st["outputBytes"] / 1e6, 1),
            "task_med_s": round(dur[0] / 1e3, 2) if dur else None,
            "task_max_s": round(dur[-1] / 1e3, 2) if dur else None,
        })
    rows.sort(key=lambda r: r["stageId"])
    print(json.dumps({"cpus": cpus,
                      "task_cpus": os.environ.get("SPARK_GRAFT_TASK_CPUS"),
                      "pages": n_pages, "wall_s": round(wall, 1),
                      "pipeline_stages": stage_meta,
                      "tiles": pipe.metrics["tiles"]}, indent=1))
    hdr = ("stage wall_s tasks run_s cpu_s gc_s sh_w_mb sh_r_mb in_mb "
           "out_mb med_s max_s name").split()
    print(" | ".join(hdr))
    for r in rows:
        print(" | ".join(str(r[k]) for k in
                         ("stageId", "wall_s", "tasks", "run_s", "cpu_s",
                          "gc_s", "sh_w_mb", "sh_r_mb", "in_mb", "out_mb",
                          "task_med_s", "task_max_s", "name")))
    spark.stop()


if __name__ == "__main__":
    main()

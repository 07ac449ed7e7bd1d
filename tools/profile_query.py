"""Per-stage profile of one or more registry queries via the Spark
event log — the guide §1 "empirical" loop without the live UI (the
session runs spark.ui.enabled=false).

Usage: python tools/profile_query.py SF_DIR QUERY [QUERY ...]

Runs each named query twice (run2 is the steady-state number), then
parses the event log and prints, per job and per stage of the SECOND
run: wall time, task-time sum, shuffle read/write bytes, and the first
line of the stage's callsite. Fixed driver gaps (time between jobs —
planning, collects, checkpoint bookkeeping) are reported as the
difference between the query wall and the sum of job walls.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jagular_spark.session import get_spark, heap_ramp_warmup
from jagular_spark.workloads import SPARK_QUERIES


def run_once(spark, name, sf_dir):
    from pyspark.sql import Observation, functions as F

    t0 = time.perf_counter()
    obs = Observation()
    SPARK_QUERIES[name](spark, sf_dir).observe(
        obs, F.count(F.lit(1)).alias("rows")
    ).write.mode("overwrite").format("noop").save()
    n = int(obs.get["rows"])
    return time.perf_counter() - t0, n


def parse_events(path):
    jobs = {}   # id -> dict
    stages = {}  # id -> dict
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jobs[e["Job ID"]] = {
                    "t0": e["Submission Time"],
                    "desc": (e.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
                }
            elif ev == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["t1"] = e["Completion Time"]
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                # update, don't replace: TaskEnd events for this stage
                # were already folded into the same dict
                st = stages.setdefault(si["Stage ID"], {})
                st.update(
                    name=si.get("Stage Name", ""),
                    t0=si.get("Submission Time", 0),
                    t1=si.get("Completion Time", 0),
                    ntasks=si.get("Number of Tasks", 0),
                    details=(si.get("Details") or "").split("\n")[0],
                )
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                st = stages.setdefault(sid, {})
                m = e.get("Task Metrics") or {}
                st["task_ms"] = st.get("task_ms", 0) + m.get("Executor Run Time", 0)
                # CPU ns -> ms: actual CPU consumed, immune to host steal
                st["cpu_ms"] = st.get("cpu_ms", 0) + (
                    m.get("Executor CPU Time", 0) + m.get("Executor Deserialize CPU Time", 0)
                ) // 1_000_000
                st["gc_ms"] = st.get("gc_ms", 0) + m.get("JVM GC Time", 0)
                st["deser_ms"] = st.get("deser_ms", 0) + m.get(
                    "Executor Deserialize Time", 0
                )
                srm = m.get("Shuffle Read Metrics") or {}
                st["sh_read"] = (
                    st.get("sh_read", 0)
                    + srm.get("Remote Bytes Read", 0)
                    + srm.get("Local Bytes Read", 0)
                )
                st["fetch_ms"] = st.get("fetch_ms", 0) + srm.get("Fetch Wait Time", 0)
                swm = m.get("Shuffle Write Metrics") or {}
                st["sh_write"] = st.get("sh_write", 0) + swm.get(
                    "Shuffle Bytes Written", 0
                )
                pym = [
                    a
                    for a in (e.get("Task Executor Metrics") or {})
                    if False
                ]
    return jobs, stages


def main():
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    evdir = tempfile.mkdtemp(prefix="jgs_prof_events_")
    spark = get_spark(
        "profiler",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            # rolling dir logs default to zstd part files; keep them
            # plain text so parse_events can read them directly
            "spark.eventLog.compress": "false",
        },
    )
    from pyspark.sql import functions as F

    w = spark.range(0, 1 << 19, 1, 32).select((F.col("id") % 97).alias("k"))
    w.groupBy("k").count().count()
    w.mapInPandas(lambda it: (b for b in it), "k long").count()
    heap_ramp_warmup(spark)

    marks = {}
    for name in names:
        dt1, n = run_once(spark, name, sf_dir)
        # mark the boundary between run1 and run2 with a throwaway job
        spark.sparkContext.setJobDescription(f"__MARK__{name}")
        spark.range(1).count()
        spark.sparkContext.setJobDescription(None)
        t0 = time.time()
        dt2, n2 = run_once(spark, name, sf_dir)
        marks[name] = (dt1, dt2, n)
        print(f"\n=== {name}: run1 {dt1:.3f}s run2 {dt2:.3f}s rows={n}")

    spark.stop()
    # one app log per app; Spark 4 rolling logs are a DIRECTORY of
    # events_* part files — concatenate them in sequence order
    logs = [os.path.join(evdir, f) for f in os.listdir(evdir) if not f.startswith(".")]
    target = max(logs, key=os.path.getmtime)
    if os.path.isdir(target):
        parts = sorted(
            os.path.join(target, f)
            for f in os.listdir(target)
            if f.startswith("events_")
        )
        cat = os.path.join(evdir, "_concat_events.jsonl")
        with open(cat, "w") as out:
            for p in parts:
                with open(p) as fh:
                    out.write(fh.read())
        target = cat
    jobs, stages = parse_events(target)

    # split jobs into per-query run2 segments using the __MARK__ jobs
    ordered = sorted(jobs.items(), key=lambda kv: kv[1]["t0"])
    seg = {}
    cur = None
    for jid, j in ordered:
        d = j.get("desc") or ""
        if d.startswith("__MARK__"):
            cur = d[len("__MARK__"):]
            seg.setdefault(cur, [])
            continue
        if cur is not None:
            seg.setdefault(cur, []).append((jid, j))
    for name in names:
        js = seg.get(name, [])
        # run2 of query N is followed by run1 of query N+1 (or end);
        # keep only jobs up to the next query's mark — already handled —
        # but run1 of the NEXT query is in this segment too. Heuristic:
        # jobs belonging to run2 start right after the mark; the next
        # query's run1 follows with the same shapes. We print everything
        # in the segment up to the wall time of run2.
        if not js:
            continue
        t_start = js[0][1]["t0"]
        dt2 = marks[name][1]
        print(f"\n##### {name} run2 jobs (wall {dt2:.3f}s):")
        job_wall = 0.0
        last_end = None
        gap = 0.0
        for jid, j in js:
            if j["t0"] - t_start > dt2 * 1000 + 500:
                break
            w = (j.get("t1", j["t0"]) - j["t0"]) / 1000.0
            if last_end is not None:
                gap += max(0.0, (j["t0"] - last_end) / 1000.0)
            last_end = j.get("t1", j["t0"])
            job_wall += w
            print(f"  job {jid}: {w:7.3f}s  desc={j['desc'][:60]!r}")
            for sid in sorted(j["stages"]):
                s = stages.get(sid)
                if not s or "t1" not in s or not s.get("t0"):
                    continue
                sw = (s["t1"] - s["t0"]) / 1000.0
                if sw < 0.02:
                    continue
                print(
                    f"    stage {sid}: {sw:7.3f}s  tasks={s.get('ntasks', 0):3d} "
                    f"task_ms={s.get('task_ms', 0):6d} cpu_ms={s.get('cpu_ms', 0):6d} "
                    f"gc={s.get('gc_ms', 0):5d} "
                    f"fetch={s.get('fetch_ms', 0):4d} "
                    f"shR={s.get('sh_read', 0) >> 10}K shW={s.get('sh_write', 0) >> 10}K  "
                    f"{s.get('name', '')[:50]}"
                )
        print(f"  sum(job wall)={job_wall:.3f}s  inter-job gaps={gap:.3f}s  "
              f"driver-side (wall - jobs) = {dt2 - job_wall:.3f}s")
    shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    main()

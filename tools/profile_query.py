"""Per-query profiler for the optimization rounds (guide §1: measure
first). Runs the named queries exactly like bench._run_suite (build
phase + noop-sink probe, caches invalidated between queries) in a fresh
JVM with the Spark event log enabled, then parses the log to break each
query's wall time into:

  - per-job durations (and the driver-side GAPS between jobs — planning,
    codegen, collects, py4j round-trips),
  - per-stage executor totals: task time, shuffle read/write bytes,
    records, spill,
  - Python/Arrow eval presence per stage (from the stage name).

Usage:
    PYTHONPATH=/root/repo python tools/profile_query.py name [name ...]

Prints a human-readable report per query to stdout plus one JSON line
per query (prefix PROFILE_JSON:) for scripted diffing.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from cargo_chat_spark import caching  # noqa: E402
from cargo_chat_spark.queries import catalog  # noqa: E402
from cargo_chat_spark.session import get_spark  # noqa: E402


def _parse_event_log(log_dir: str):
    """All events from the single application log under log_dir."""
    files = []
    for root, _dirs, names in os.walk(log_dir):
        for f in names:
            if not f.startswith(".") and "appstatus" not in f:
                files.append(os.path.join(root, f))
    events = []
    for path in files:
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                try:
                    events.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
    return events


def _summarize(events, t_start_ms: float, t_end_ms: float, label: str):
    """Aggregate job/stage/task events that fall inside [t_start, t_end]."""
    jobs = {}
    stage_meta = {}
    stage_tasks = {}
    for ev in events:
        kind = ev.get("Event")
        if kind == "SparkListenerJobStart":
            ts = ev.get("Submission Time", 0)
            if t_start_ms <= ts <= t_end_ms:
                jobs[ev["Job ID"]] = {
                    "start": ts,
                    "end": None,
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
        elif kind == "SparkListenerJobEnd":
            j = jobs.get(ev["Job ID"])
            if j is not None:
                j["end"] = ev.get("Completion Time", 0)
        elif kind == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            ts = si.get("Submission Time", 0)
            if t_start_ms <= ts <= t_end_ms:
                stage_meta[si["Stage ID"]] = {
                    "name": si.get("Stage Name", ""),
                    "ntasks": si.get("Number of Tasks", 0),
                    "submit": si.get("Submission Time", 0),
                    "complete": si.get("Completion Time", 0),
                }
        elif kind == "SparkListenerTaskEnd":
            sid = ev.get("Stage ID")
            tm = ev.get("Task Metrics") or {}
            ti = ev.get("Task Info") or {}
            ts = ti.get("Launch Time", 0)
            if not (t_start_ms <= ts <= t_end_ms):
                continue
            agg = stage_tasks.setdefault(
                sid,
                {
                    "run_ms": 0,
                    "cpu_ms": 0,
                    "gc_ms": 0,
                    "sh_read_b": 0,
                    "sh_write_b": 0,
                    "sh_fetch_ms": 0,
                    "input_b": 0,
                    "output_b": 0,
                    "spill_b": 0,
                    "deser_ms": 0,
                    "result_ser_ms": 0,
                    "n": 0,
                },
            )
            agg["n"] += 1
            agg["run_ms"] += tm.get("Executor Run Time", 0)
            agg["cpu_ms"] += tm.get("Executor CPU Time", 0) // 1_000_000
            agg["gc_ms"] += tm.get("JVM GC Time", 0)
            agg["deser_ms"] += tm.get("Executor Deserialize Time", 0)
            agg["result_ser_ms"] += tm.get("Result Serialization Time", 0)
            srm = tm.get("Shuffle Read Metrics") or {}
            agg["sh_read_b"] += srm.get("Local Bytes Read", 0) + srm.get(
                "Remote Bytes Read", 0
            )
            agg["sh_fetch_ms"] += srm.get("Fetch Wait Time", 0)
            swm = tm.get("Shuffle Write Metrics") or {}
            agg["sh_write_b"] += swm.get("Shuffle Bytes Written", 0)
            im = tm.get("Input Metrics") or {}
            agg["input_b"] += im.get("Bytes Read", 0)
            om = tm.get("Output Metrics") or {}
            agg["output_b"] += om.get("Bytes Written", 0)
            agg["spill_b"] += tm.get("Disk Bytes Spilled", 0)

    # job timeline -> busy vs gap time
    spans = sorted(
        (j["start"], j["end"] or j["start"]) for j in jobs.values()
    )
    busy = 0
    last_end = None
    first_start = spans[0][0] if spans else None
    final_end = max((e for _, e in spans), default=None)
    merged = []
    for s, e in spans:
        if merged and s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    busy = sum(e - s for s, e in merged)
    wall = t_end_ms - t_start_ms
    pre_gap = (first_start - t_start_ms) if first_start else wall
    tail_gap = (t_end_ms - final_end) if final_end else 0
    inter_gap = wall - busy - pre_gap - tail_gap

    print(f"\n===== {label}: wall {wall/1000:.2f}s =====")
    print(
        f"  jobs={len(jobs)} job-busy={busy/1000:.2f}s  "
        f"pre-first-job(gap)={pre_gap/1000:.2f}s  "
        f"between-jobs(gap)={inter_gap/1000:.2f}s  "
        f"after-last-job={tail_gap/1000:.2f}s"
    )
    rows = []
    for sid, agg in stage_tasks.items():
        meta = stage_meta.get(sid, {})
        dur = (meta.get("complete", 0) - meta.get("submit", 0)) / 1000
        rows.append((dur, sid, meta, agg))
    rows.sort(reverse=True)
    for dur, sid, meta, agg in rows[:14]:
        name = meta.get("name", "?")[:80]
        print(
            f"  stage {sid:>4} {dur:6.2f}s wall | tasks={agg['n']:>3} "
            f"run={agg['run_ms']/1000:6.2f}s cpu={agg['cpu_ms']/1000:6.2f}s "
            f"gc={agg['gc_ms']/1000:5.2f}s "
            f"shR={agg['sh_read_b']/1e6:7.2f}MB shW={agg['sh_write_b']/1e6:7.2f}MB "
            f"in={agg['input_b']/1e6:6.1f}MB | {name}"
        )
    out = {
        "label": label,
        "wall_s": round(wall / 1000, 3),
        "n_jobs": len(jobs),
        "job_busy_s": round(busy / 1000, 3),
        "pre_gap_s": round(pre_gap / 1000, 3),
        "inter_gap_s": round(inter_gap / 1000, 3),
        "tail_gap_s": round(tail_gap / 1000, 3),
        "stages": {
            str(sid): {
                "wall_s": round(
                    (m.get("complete", 0) - m.get("submit", 0)) / 1000, 3
                ),
                "ntasks": a["n"],
                "run_s": round(a["run_ms"] / 1000, 3),
                "cpu_s": round(a["cpu_ms"] / 1000, 3),
                "shuffle_read_mb": round(a["sh_read_b"] / 1e6, 3),
                "shuffle_write_mb": round(a["sh_write_b"] / 1e6, 3),
                "name": m.get("name", "")[:120],
            }
            for _, sid, m, a in rows
        },
    }
    print("PROFILE_JSON:" + json.dumps(out))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = tempfile.mkdtemp(prefix="ccs_eventlog_")
    spark = get_spark(
        app_name="profile_query",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    bench._warmup(spark, sf_dir)
    from cargo_chat_spark.queries.registry import PHASE_BUILDERS

    windows = []
    for name in names:
        fn = catalog.SPARK_QUERIES[name]
        build_fn = PHASE_BUILDERS.get(name)
        if build_fn is not None:
            t0 = time.time()
            build_fn(spark, sf_dir)
            windows.append((f"{name} [build]", t0 * 1000, time.time() * 1000))
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        windows.append((f"{name} [probe]", t0 * 1000, time.time() * 1000))
        spark.sparkContext.setJobDescription(None)
        caching.invalidate_all()
    spark.stop()
    events = _parse_event_log(log_dir)
    for label, t0, t1 in windows:
        _summarize(events, t0, t1, label)
    shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

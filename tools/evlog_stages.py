"""Summarize a Spark event log: per-stage wall, task time, GC, spill, I/O.

Reads the rolling .zstd event log dir (or a single file) and prints one line
per stage: stageId, name (truncated), submit→complete wall, #tasks, sum task
run time, sum JVM GC time, GC share, shuffle read/write MB, spill MB, and
the max single task run time (straggler indicator).

Usage: python tools/evlog_stages.py /tmp/evlog_job/eventlog_v2_local-XXXX
"""

from __future__ import annotations

import io
import json
import os
import sys


def iter_events(path: str):
    files = []
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path) if "events" in f
        )
    else:
        files = [path]
    for f in files:
        if f.endswith(".zstd"):
            try:
                import zstandard  # type: ignore

                with open(f, "rb") as fh:
                    reader = zstandard.ZstdDecompressor().stream_reader(fh)
                    for line in io.TextIOWrapper(reader, encoding="utf-8"):
                        yield json.loads(line)
                continue
            except ImportError:
                import subprocess

                out = subprocess.run(
                    ["zstd", "-dc", f], capture_output=True, check=True
                ).stdout
                for line in out.decode().splitlines():
                    yield json.loads(line)
                continue
        with open(f, encoding="utf-8") as fh:
            for line in fh:
                yield json.loads(line)


def main() -> int:
    path = sys.argv[1]
    stages: dict[int, dict] = {}
    for ev in iter_events(path):
        typ = ev.get("Event")
        if typ == "SparkListenerStageSubmitted":
            si = ev["Stage Info"]
            stages.setdefault(si["Stage ID"], {}).update(
                name=si["Stage Name"], sub=si.get("Submission Time"),
                ntasks=si["Number of Tasks"],
            )
        elif typ == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            s = stages.setdefault(si["Stage ID"], {})
            s["name"] = si["Stage Name"]
            s["sub"] = si.get("Submission Time", s.get("sub"))
            s["done"] = si.get("Completion Time")
            s["ntasks"] = si["Number of Tasks"]
        elif typ == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            s = stages.setdefault(sid, {})
            m = ev.get("Task Metrics") or {}
            s["run"] = s.get("run", 0) + m.get("Executor Run Time", 0)
            s["gc"] = s.get("gc", 0) + m.get("JVM GC Time", 0)
            s["cpu"] = s.get("cpu", 0) + m.get("Executor CPU Time", 0) // 1_000_000
            s["deser"] = s.get("deser", 0) + m.get("Executor Deserialize Time", 0)
            s["memspill"] = s.get("memspill", 0) + m.get("Memory Bytes Spilled", 0)
            s["diskspill"] = s.get("diskspill", 0) + m.get("Disk Bytes Spilled", 0)
            sr = m.get("Shuffle Read Metrics") or {}
            sw = m.get("Shuffle Write Metrics") or {}
            s["sread"] = (
                s.get("sread", 0)
                + sr.get("Remote Bytes Read", 0)
                + sr.get("Local Bytes Read", 0)
            )
            s["swrite"] = s.get("swrite", 0) + sw.get("Shuffle Bytes Written", 0)
            s["fetchwait"] = s.get("fetchwait", 0) + sr.get("Fetch Wait Time", 0)
            s["maxrun"] = max(s.get("maxrun", 0), m.get("Executor Run Time", 0))

    print(
        f"{'id':>4} {'wall_s':>7} {'tasks':>5} {'run_s':>8} {'cpu_s':>8} "
        f"{'gc_s':>7} {'gc%':>5} {'maxtask_s':>9} {'sread_MB':>8} "
        f"{'swrite_MB':>9} {'spill_MB':>8} {'fetchw_s':>8}  name"
    )
    tot_wall = 0.0
    for sid in sorted(stages):
        s = stages[sid]
        if "sub" not in s or s.get("sub") is None or s.get("done") is None:
            continue
        wall = (s["done"] - s["sub"]) / 1000.0
        tot_wall += wall
        run = s.get("run", 0) / 1000.0
        gc = s.get("gc", 0) / 1000.0
        cpu = s.get("cpu", 0) / 1000.0
        print(
            f"{sid:>4} {wall:>7.1f} {s.get('ntasks', 0):>5} {run:>8.1f} "
            f"{cpu:>8.1f} {gc:>7.1f} {100 * gc / max(run, 0.001):>4.0f}% "
            f"{s.get('maxrun', 0) / 1000.0:>9.1f} "
            f"{s.get('sread', 0) / 1e6:>8.0f} {s.get('swrite', 0) / 1e6:>9.0f} "
            f"{(s.get('memspill', 0) + s.get('diskspill', 0)) / 1e6:>8.0f} "
            f"{s.get('fetchwait', 0) / 1000.0:>8.1f}  {s.get('name', '?')[:60]}"
        )
    print(f"total stage wall: {tot_wall:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

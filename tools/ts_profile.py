"""One-off profiler for the ts suites on the current box: phase timings
plus /proc/diskstats write-sector deltas per phase, so slow-disk rounds
can attribute gate seconds to actual bytes written (guide §1).

Usage: python tools/ts_profile.py [conf_k=v ...]
Extra args become session extra_conf entries, e.g.
  python tools/ts_profile.py spark.local.dir=/dev/shm/spark-local
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def disk_sectors_written() -> int:
    tot = 0
    with open("/proc/diskstats") as f:
        for line in f:
            parts = line.split()
            # field 10 (index 9 after the 3 id cols) = sectors written
            if parts[2].startswith(("vd", "sd", "nvme")) and not parts[2][-1].isdigit():
                tot += int(parts[9])
    return tot


def main() -> int:
    extra = dict(a.split("=", 1) for a in sys.argv[1:])
    from crux_spark import get_spark

    spark = get_spark("ts-profile", extra_conf=extra or None)
    spark.sparkContext.setLogLevel("ERROR")
    from ts_bench import gen_devices_csvs, gen_weather_csvs, run_devices_suite, run_weather_suite

    with tempfile.TemporaryDirectory() as td:
        ddir = os.path.join(td, "ts_devices")
        wdir = os.path.join(td, "ts_weather")
        marks = []

        def mark(label):
            marks.append((label, time.perf_counter(), disk_sectors_written()))

        mark("start")
        gen_devices_csvs(spark, ddir, 200, 360, step_s=120)
        mark("gen_devices")
        gen_weather_csvs(spark, wdir, 100, 960, step_s=90)
        mark("gen_weather")
        out = run_devices_suite(spark, ddir)
        mark("devices_suite")
        out.update(run_weather_suite(spark, wdir))
        mark("weather_suite")

        for (l0, t0, s0), (l1, t1, s1) in zip(marks, marks[1:]):
            print(f"{l1:16s} {t1 - t0:7.2f}s  written {(s1 - s0) * 512 / 1e6:8.1f} MB")
        print(json.dumps({k: round(v, 2) for k, v in out.items()}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())

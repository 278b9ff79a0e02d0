"""CI guard for the ts-devices / ts-weather suite port
(tools/ts_bench.py — crux-bench ts_devices.clj / ts_weather.clj): run
both suites at a small scale; every query step self-asserts against its
relational oracle, so a pass here means ingest (bulk, valid-time per
reading), snapshot queries, the join query, and the history rollups all
agree with the raw CSV frames."""

import sys


def test_ts_suites_small(spark, tmp_path):
    sys.path.insert(0, "/root/repo/tools")
    from ts_bench import run_ts_suites

    timings = run_ts_suites(
        spark,
        str(tmp_path),
        n_devices=20,
        n_reading_times=60,
        n_locations=12,
        n_condition_times=120,
    )
    assert set(timings) == {
        "ts_devices_ingest", "ts_devices_recent_battery",
        "ts_devices_busiest", "ts_devices_minmax_hour",
        "ts_weather_ingest", "ts_weather_last10",
        "ts_weather_last10_outside", "ts_weather_hourly_temp",
    }
    assert all(v >= 0 for v in timings.values())

"""The criterion aggregation (bench.summarize_scaling_runs) is itself
load-bearing evidence: it selects THE pre-registered north-rule number
(BENCH/BASELINE.md §2). These tests pin its rules on synthetic run
files so the selection logic cannot drift silently:

- all-era median is the headline while <3 current-job runs exist;
- the headline switches to the current-job median at >=3 such runs,
  with the all-era median still carried alongside (nothing dropped);
- gauge-healthy secondary medians require the fault gauge and classify
  degraded legs out;
- hash-mode runs are era-insensitive (their job never changed).

Pure-Python (no Spark session) — safe to run while benchmarks hold the
box.
"""

import json
import os

import bench


def _run(extract_eff, parity=0.9, extract_rows=None, fault_us=3.0,
         with_gauge=True, mur_eff=0.7):
    health = [{"dram_gbps": 15.0, "steal_frac": 0.0}]
    if with_gauge:
        health[0]["fault_us_per_page"] = fault_us
    rec = {
        "rows": 16_000_000,
        "health_2": health,
        "health_8": health,
        "murmur3": {
            "thr_2": 1_000_000, "thr_8": 4 * 700_000,
            "scaling_efficiency": mur_eff, "cpu_parity": 0.7,
        },
        "extract": {
            "thr_2": 40_000, "thr_8": 160_000,
            "scaling_efficiency": extract_eff, "cpu_parity": parity,
        },
    }
    if extract_rows is not None:
        rec["extract_rows"] = extract_rows
    return rec


def _write_runs(tmp_path, recs):
    for i, rec in enumerate(recs):
        with open(os.path.join(tmp_path, f"scaling_r{i:02d}.json"), "w") as f:
            json.dump(rec, f)


def test_all_era_median_while_current_job_sparse(tmp_path):
    # two old-era runs + two current-job runs: current-job n=2 < 3,
    # so the all-era median (over all four) must stand
    recs = [
        _run(0.4), _run(0.5),
        _run(0.9, extract_rows=bench.EXTRACT_SCALING_ROWS),
        _run(1.0, extract_rows=bench.EXTRACT_SCALING_ROWS),
    ]
    _write_runs(tmp_path, recs)
    out = bench.summarize_scaling_runs(str(tmp_path))
    assert out["n_runs"] == 4
    # statistics.median of [0.4, 0.5, 0.9, 1.0] = 0.7
    assert out["scaling_efficiency"] == 0.7
    assert out["all_era_eff"] == 0.7
    assert "across committed runs" in out["metric"]
    detail = json.load(open(os.path.join(tmp_path, "scaling_summary.json")))
    ex = detail["medians"]["extract"]
    assert ex["n_current_job"] == 2
    assert ex["eff_median_current_job"] == 0.95


def test_headline_switches_to_current_job_at_three_runs(tmp_path):
    recs = [
        _run(0.4), _run(0.5),  # old era (no extract_rows marker)
        _run(0.85, extract_rows=bench.EXTRACT_SCALING_ROWS),
        _run(0.9, extract_rows=bench.EXTRACT_SCALING_ROWS),
        _run(0.95, extract_rows=bench.EXTRACT_SCALING_ROWS),
    ]
    _write_runs(tmp_path, recs)
    out = bench.summarize_scaling_runs(str(tmp_path))
    assert out["scaling_efficiency"] == 0.9  # median of the 3 current-job
    assert "current criterion job" in out["metric"]
    # the all-era median is still computed and carried — nothing dropped
    assert out["all_era_eff"] == 0.85
    assert out["n_runs"] == 5


def test_runs_of_other_row_counts_never_enter_current_job(tmp_path):
    recs = [
        _run(0.2, extract_rows=1_000_000),
        _run(0.3, extract_rows=1_000_000),
        _run(0.4, extract_rows=1_000_000),
        _run(0.9, extract_rows=bench.EXTRACT_SCALING_ROWS),
    ]
    _write_runs(tmp_path, recs)
    detail_out = bench.summarize_scaling_runs(str(tmp_path))
    detail = json.load(open(os.path.join(tmp_path, "scaling_summary.json")))
    ex = detail["medians"]["extract"]
    assert ex["n_current_job"] == 1
    assert ex["eff_median_current_job"] == 0.9
    # 1 < 3: all-era median stands
    assert detail_out["scaling_efficiency"] == 0.35


def test_murmur3_is_era_insensitive(tmp_path):
    # the hash-mode job never changed; every run counts as current
    recs = [_run(0.5, mur_eff=0.6), _run(0.5, mur_eff=0.8)]
    _write_runs(tmp_path, recs)
    bench.summarize_scaling_runs(str(tmp_path))
    detail = json.load(open(os.path.join(tmp_path, "scaling_summary.json")))
    mm = detail["medians"]["murmur3"]
    assert mm["n_current_job"] == 2
    assert mm["eff_median_current_job"] == 0.7


def test_gauge_healthy_subset_requires_fault_gauge(tmp_path):
    recs = [
        _run(0.9, fault_us=3.0),     # healthy
        _run(0.3, fault_us=200.0),   # degraded leg -> excluded
        _run(0.8, with_gauge=False),  # pre-gauge run -> not classifiable
    ]
    _write_runs(tmp_path, recs)
    bench.summarize_scaling_runs(str(tmp_path))
    detail = json.load(open(os.path.join(tmp_path, "scaling_summary.json")))
    ex = detail["medians"]["extract"]
    assert ex["n_gauge_healthy"] == 1
    assert ex["eff_median_gauge_healthy"] == 0.9
    # the degraded run still counts in the all-era median
    assert ex["n_runs"] == 3

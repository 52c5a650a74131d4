"""The bench perf-regression gate (bench.py::_best_prior).

Round-4 postmortem: commit 2e64281 regressed the 512^3 step ~20%
(37.6 -> 45.9 ms) seven minutes before the end-of-round snapshot and no
tooling flagged it, because every bench run was a point measurement with
no memory.  bench.py now scans the committed BENCH_*.json artifacts for
the best prior compute rate of the same (ppd, dtype) config and flags
``regressed_vs_best`` when the fresh default-route number lands >10%
below it.  These tests pin the artifact-scanning semantics.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def _write(d, name, obj):
    (d / name).write_text(json.dumps(obj))


def test_best_prior_picks_max_matching_config(tmp_path):
    _write(tmp_path, "BENCH_r01.json", {
        "metric": "IC generation throughput (512^3, float32, x, tpu)",
        "value": 100.0, "unit": "Mpart/sec",
    })
    _write(tmp_path, "BENCH_r02.json", {
        "metric": "IC generation throughput (512^3, float32, x, tpu)",
        "value": 250.0, "unit": "Mpart/sec",
    })
    best, src = bench._best_prior(512, "float32", here=str(tmp_path))
    assert best == 250.0 and src == "BENCH_r02.json"


def test_best_prior_ignores_other_configs(tmp_path):
    _write(tmp_path, "BENCH_r01.json", {
        "metric": "IC generation throughput (256^3, float32, x, tpu)",
        "value": 9999.0, "unit": "Mpart/sec",
    })
    _write(tmp_path, "BENCH_r02.json", {
        "metric": "IC generation throughput (512^3, df64, x, tpu)",
        "value": 9999.0, "unit": "Mpart/sec",
    })
    assert bench._best_prior(512, "float32", here=str(tmp_path)) == (None, None)


def test_best_prior_prefers_compute_rate_over_e2e_headline(tmp_path):
    # when the headline is the e2e rate, the comparable number is the
    # compute rate carried in compute_mpart_per_sec
    _write(tmp_path, "BENCH_r01.json", {
        "metric": "IC generation throughput (512^3, float32, end-to-end, tpu)",
        "value": 40.0, "unit": "Mpart/sec",
        "compute_mpart_per_sec": 3200.0,
    })
    best, _ = bench._best_prior(512, "float32", here=str(tmp_path))
    assert best == 3200.0


def test_best_prior_reads_floor_file_explicit_keys(tmp_path):
    # BENCH_FLOOR.json has no "(512^3, float32" metric string; it carries
    # explicit ppd/dtype keys instead
    _write(tmp_path, "BENCH_FLOOR.json", {
        "metric": "committed perf floor", "ppd": 512, "dtype": "float32",
        "value": 3571.124, "unit": "Mpart/sec",
    })
    best, src = bench._best_prior(512, "float32", here=str(tmp_path))
    assert best == 3571.124 and src == "BENCH_FLOOR.json"
    assert bench._best_prior(256, "float32", here=str(tmp_path)) == (None, None)


def test_best_prior_survives_garbage(tmp_path):
    (tmp_path / "BENCH_bad.json").write_text("{not json")
    _write(tmp_path, "BENCH_zero.json", {
        "metric": "IC generation throughput (device unreachable)",
        "value": 0.0, "unit": "Mpart/sec",
    })
    assert bench._best_prior(512, "float32", here=str(tmp_path)) == (None, None)


def test_committed_floor_matches_bench_config():
    # the committed floor must describe the config bench.py actually runs
    # by default, or the gate silently never fires
    root = Path(__file__).resolve().parent.parent
    floor = json.loads((root / "BENCH_FLOOR.json").read_text())
    assert floor["ppd"] == 512 and floor["dtype"] == "float32"
    best, _ = bench._best_prior(512, "float32")
    assert best is not None and best >= floor["value"]

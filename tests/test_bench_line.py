"""The bench's driver-facing JSON line must stay parseable.

The driver records ONLY the last JSON line bench.py prints, parsed from a
~2000-char tail of captured stdout. Rounds 2-4 all failed to land a
driver-parseable record; r4's failure mode was a 3.1 KB line whose head
was truncated mid-JSON by the tail window. `bench.compact_line` is the
guard: headline + small scalar summaries only, hard-capped below 1500
bytes no matter how much detail accumulates in BENCH_DETAIL.json."""
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _worst_case_result():
    """A result dict bloated the way 4 rounds of cached sub-benches bloat
    it: every sub-bench present + cached, long notes, full tables."""
    big_note = "x" * 600
    return {
        "metric": bench.HEADLINE,
        "value": 6.347,
        "unit": "ms",
        "vs_baseline": 126.05,
        "headline_cached": True,
        "cholesky_n10k": {
            "n": 10000, "ms": 21.623, "tflops": 15.416, "xla_ms": 27.146,
            "xla_tflops": 12.279, "vs_xla": 1.255,
            "gemm_peak_tflops": 33.37, "frac_gemm_peak": 0.462,
            "seq": 5, "measured_at": "2026-08-21T04:24:58Z",
            "cached": True, "note": big_note,
        },
        "fitc_100k": {
            "N": 100000, "m": 512, "step_ms": 72.23,
            "losses": [round(2564.1 - 5000 * i, 2) for i in range(10)],
            "seq": 4, "measured_at": "2026-08-21T04:23:39Z",
            "cached": True,
        },
        "gpa_classification_ess": {
            "n_obs": 200, "dim_theta": 206, "sampler": "split",
            "chains": 128, "iters_post_warmup": 524, "draws_per_iter": 16,
            "segments": 2, "wall_s": 101.007, "accept_rate": 0.86,
            "ess_min": 4690.1, "ess_median": 57287.2,
            "ess_per_sec_min": 46.4, "ess_per_sec_median": 567.2,
            "rhat_max": 1.038, "iters_per_sec_per_chain": 6.2,
            "a_iters": 16, "eps_a": 0.06, "eps_b": 0.08,
            "accept_a": 0.891, "accept_b": 0.829, "cached": True,
            "note": big_note,
        },
        "student_t_1024": {
            "n_obs": 60, "dim_theta": 63, "chains": 1024,
            "hmc": {"iters_post_warmup": 1200, "warmup": 600,
                    "wall_s": 231.476, "accept_rate": 0.779,
                    "eps_adapted": 0.01571, "ess_min": 7302.3,
                    "ess_median": 10828.9, "ess_per_sec_min": 31.5,
                    "ess_per_sec_median": 46.8, "rhat_max": 1.5391},
            "split": {"ess_per_sec_median": 300.0, "rhat_max": 1.005,
                      "wall_s": 120.0, "note": big_note},
            "ess_sampler": {"iters": 300, "wall_s": 46.782,
                            "mean_proposals": 6.019,
                            "ess_median": 11663.5,
                            "ess_per_sec_median": 249.3},
            "note": big_note, "cached": True,
        },
        "chains_scaling": {str(c): {"ess_per_sec_median": 600.0,
                                    "ess_per_sec_min": 50.0,
                                    "wall_s": 100.0}
                           for c in (16, 64, 256, 1024)},
        "kernel_table_ms": {k: 6.4 for k in bench.REF_MS},
        "kernel_table_speedup": {k: 127.0 for k in bench.REF_MS},
        "kernel_table_n16384_ms": {k: 500.0 for k in bench.REF_MS},
        "_costs": {"headline": 86.5, "fitc_100k": 33.4},
    }


def test_compact_line_under_cap_and_parseable():
    js = bench.compact_line(_worst_case_result())
    assert len(js.encode()) < bench.LINE_CAP_BYTES
    parsed = json.loads(js)
    # the driver's required fields
    assert parsed["metric"] == bench.HEADLINE
    assert parsed["value"] == 6.347
    assert parsed["unit"] == "ms"
    assert parsed["vs_baseline"] == 126.05
    # scalar summaries survive
    assert parsed["cholesky_n10k"]["tflops"] == 15.416
    assert parsed["gpa_classification_ess"]["ess_per_sec_median"] == 567.2
    assert parsed["gpa_classification_ess"]["rhat_max"] == 1.038
    assert parsed["student_t_1024"]["split"]["rhat_max"] == 1.005
    # cached provenance survives (the judge checks freshness)
    assert parsed["cholesky_n10k"]["cached"] is True


def test_compact_line_strips_bulk():
    parsed = json.loads(bench.compact_line(_worst_case_result()))
    dumped = json.dumps(parsed)
    assert "note" not in dumped
    assert "chains_scaling" not in parsed
    assert "kernel_table_ms" not in parsed
    assert "losses" not in dumped
    assert "_costs" not in parsed
    assert "measured_at" not in dumped


def test_compact_line_minimal_result():
    """Before any sub-bench has run, the skeleton still emits cleanly."""
    js = bench.compact_line({"metric": bench.HEADLINE, "value": None,
                             "unit": "ms"})
    parsed = json.loads(js)
    assert parsed["value"] is None
    assert len(js.encode()) < bench.LINE_CAP_BYTES


def test_compact_line_asserts_on_oversize():
    r = _worst_case_result()
    r["metric"] = "m" * 2000
    with pytest.raises(AssertionError, match="cap"):
        bench.compact_line(r)


def test_emitted_line_matches_current_committed_detail():
    """The committed BENCH_DETAIL.json, loaded exactly the way main()
    loads it, must produce an under-cap line (regression vs the actual
    artifact, not just the synthetic worst case)."""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DETAIL.json")
    with open(path) as f:
        prev = json.load(f)
    result = {"metric": bench.HEADLINE, "value": None, "unit": "ms"}
    result.update({k: v for k, v in prev.items() if k != "_costs"})
    result["metric"] = bench.HEADLINE
    js = bench.compact_line(result)
    assert len(js.encode()) < bench.LINE_CAP_BYTES
    json.loads(js)

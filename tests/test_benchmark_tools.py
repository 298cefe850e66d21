"""Smoke tests for the benchmark harnesses (tiny iteration counts)."""

import numpy as np
import pytest

from lyra_tpu import config


def test_run_benchmark_stages_and_csv(tmp_path, model_path):
    from lyra_tpu.tools.benchmark import run_benchmark

    result = run_benchmark(num_cond_vectors=3, batch=2, num_bits=120,
                           model_path=model_path,
                           csv_path=str(tmp_path / "bench.csv"))
    rows = result["rows"]
    assert set(rows) == {"feature_extractor", "quantizer_quantize",
                         "quantizer_decode", "model_decode"}
    for r in rows.values():
        assert r.num_calls == 3 and r.mean_us > 0
    assert result["streams_per_chip"] > 0
    csv = (tmp_path / "bench.csv").read_text().splitlines()
    assert csv[0].startswith("stage,") and len(csv) == 5


def test_melspec_benchmark_runs(capsys):
    from lyra_tpu.tools import melspec_benchmark

    # keep it tiny: one hop/batch combo would need flag surgery; the default
    # grid with 2 iterations is still only ~seconds on CPU.
    assert melspec_benchmark.main(["--iters", "2"]) == 0
    out = capsys.readouterr().out
    assert "hop=  320" in out and "frames/s" in out

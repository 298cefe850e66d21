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
    for name, r in rows.items():
        # Stats must be internally consistent, not merely present
        # (mirrors TimingStats invariants, lyra_benchmark_lib.cc:62-83).
        assert r.num_calls == 3, name
        assert 0 < r.min_us <= r.mean_us <= r.max_us, name
        assert r.stdev_us >= 0, name
        assert r.max_us < 60e6, name  # a stage call is not taking a minute
    assert result["streams_per_chip"] > 0
    # streams/chip must agree with the measured stage means: one stream's
    # 20 ms budget divided by the per-frame total, times the batch.
    total_us = sum(r.mean_us for r in rows.values())
    expect = 2 * 0.02e6 / total_us
    assert result["streams_per_chip"] == pytest.approx(expect, rel=0.2)
    csv = (tmp_path / "bench.csv").read_text().splitlines()
    assert csv[0].startswith("stage,") and len(csv) == 5
    # CSV rows carry the same numbers that were reported.
    for line in csv[1:]:
        stage, *vals = line.split(",")
        r = rows[stage]
        assert float(vals[0]) == pytest.approx(r.max_us, rel=1e-6)
        assert float(vals[2]) == pytest.approx(r.mean_us, rel=1e-6)


def test_stage_toggles_disable_components(model_path, capsys):
    """Disabled stages time a zeros substitute but still report a row
    (reference: lyra_benchmark.cc:34-41, lyra_benchmark_lib.cc:85-162)."""
    from lyra_tpu.tools import benchmark

    rc = benchmark.main([
        "--num_cond_vectors=2", "--batch=1", f"--model_path={model_path}",
        "--benchmark_quantizer=false", "--benchmark_generative_model=false",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    # All four rows still print; the disabled ones are near-instant
    # zero-substitutes, the enabled extractor dominates.
    for row in ("feature_extractor", "quantizer_quantize",
                "quantizer_decode", "model_decode"):
        assert row in out


def test_stage_toggle_flag_rejects_garbage():
    from lyra_tpu.tools import benchmark

    with pytest.raises(SystemExit):
        benchmark.main(["--benchmark_quantizer=maybe"])


def test_melspec_benchmark_runs(capsys):
    from lyra_tpu.tools import melspec_benchmark

    # keep it tiny: one hop/batch combo would need flag surgery; the default
    # grid with 2 iterations is still only ~seconds on CPU.
    assert melspec_benchmark.main(["--iters", "2"]) == 0
    out = capsys.readouterr().out
    assert "hop=  320" in out and "frames/s" in out

"""Tests for the one-off generate CLI and the multi-process helpers."""

import sys

import numpy as np
import pytest


def test_distributed_initialize_noop_single_process(monkeypatch):
    from sonicdiffusionbayeslab_tpu.parallel import distributed

    monkeypatch.delenv("SDBL_COORDINATOR", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert distributed.initialize() is False


def test_all_sum_single_process():
    from sonicdiffusionbayeslab_tpu.parallel import distributed

    assert distributed.all_sum_scalar(2.5) == 2.5
    out = distributed.all_sum_array(np.arange(4.0))
    np.testing.assert_array_equal(out, np.arange(4.0))


def test_generate_cli_tiny(tmp_path, monkeypatch):
    from sonicdiffusionbayeslab_tpu import generate

    out = tmp_path / "img_{i:03d}.png"
    monkeypatch.setattr(sys, "argv", [
        "sdbl-generate", "--prompt", "a red cube", "--tiny",
        "--steps", "3", "--scheduler", "ddim_scheduler",
        "--out", str(out),
    ])
    generate.main()
    assert (tmp_path / "img_000.png").exists()


def test_generate_cli_deepcache_tiny(tmp_path, monkeypatch):
    from sonicdiffusionbayeslab_tpu import generate

    out = tmp_path / "dc_{i:03d}.png"
    monkeypatch.setattr(sys, "argv", [
        "sdbl-generate", "--prompt", "a blue sphere", "--tiny",
        "--steps", "4", "--cache_interval", "2",
        "--out", str(out),
    ])
    generate.main()
    assert (tmp_path / "dc_000.png").exists()


def test_metric_compute_reduces_across_processes(monkeypatch):
    """Simulate 2 identical processes: sums double, means/rates unchanged,
    and FID moments combine before the Frechet math."""
    from sonicdiffusionbayeslab_tpu.metrics import metrics as M

    monkeypatch.setattr(M, "all_sum_scalar", lambda x: 2.0 * float(x))
    monkeypatch.setattr(M, "all_sum_array", lambda x: 2.0 * np.asarray(x))

    t = M.TimeMetric()
    t.update(10.0, 4)
    assert t.compute() == pytest.approx(20.0 / 8)
    assert t.compute() == pytest.approx(20.0 / 8)  # idempotent

    r = M.RewardModel(scorer=lambda imgs, prompts: np.asarray(imgs).mean(axis=(1, 2, 3)))
    real = np.zeros((2, 4, 4, 3), np.float32)
    gen = np.ones((2, 4, 4, 3), np.float32)
    r.update(["a", "b"], real, gen)
    assert r.compute() == pytest.approx(1.0)  # 4 wins / 4

    f = M.FID(feature=8, tiny=True)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((64, 8))
    f.real.update(feats)
    f.fake.update(feats)
    assert f.compute() == pytest.approx(0.0, abs=1e-6)

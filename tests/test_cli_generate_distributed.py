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

"""Offline surface of the quality-frontier tool (the real run is
environment-gated on local snapshots — tests/test_real_weights_gate.py)."""

import pytest

from sonicdiffusionbayeslab_tpu.quality_frontier import (
    SD15_MODES,
    SD3_MODES,
    coco_prompts,
    main,
)


def test_mode_matrix_covers_the_acceleration_zoo():
    labels = [m.label for m in SD15_MODES]
    assert labels[0] == "exact_bf16"  # the BASELINE.json CLIP-gate row
    assert {"tome_0.25", "tome_0.5", "int8_conv_only",
            "deep_cache_2", "deep_cache_3", "deep_cache_5"} <= set(labels)
    assert any("max_stack" in l for l in labels)
    sd3_labels = [m.label for m in SD3_MODES]
    assert sd3_labels[0] == "sd3_exact_bf16"
    assert {"sd3_trunk_delta_2", "sd3_trunk_delta_3", "sd3_tome_0.25",
            "sd3_tome_0.5", "sd3_int8"} <= set(sd3_labels)
    assert any("max_stack" in l for l in sd3_labels)
    # Approximate modes never mislabel themselves exact.
    for m in SD15_MODES[1:] + SD3_MODES[1:]:
        assert m.call_kw or m.quant or m.cache_interval


def test_requires_snapshot_offline(monkeypatch):
    monkeypatch.delenv("SDBL_SD15_SNAPSHOT", raising=False)
    with pytest.raises(SystemExit):
        main([])  # argparse error: the tool is snapshot-gated


def test_coco_prompts_come_from_the_reference_eval_set():
    ps = coco_prompts(5)
    assert len(ps) == 5 and all(isinstance(p, str) and p for p in ps)

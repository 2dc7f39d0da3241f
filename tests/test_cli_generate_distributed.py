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


def test_image_reward_weight_map_synthetic(tmp_path):
    """Synthesize an ImageReward-v1.0-layout checkpoint (tiny geometry) and
    load it: exercises every mapped key, the transposes, and the built-in
    shape validation."""
    import jax
    import torch

    from sonicdiffusionbayeslab_tpu.metrics.image_reward_model import (
        BLIPConfig,
        ImageRewardScorer,
        load_image_reward_weights,
    )

    cfg = BLIPConfig.tiny()
    scorer = ImageRewardScorer(tiny=True)
    ref = jax.tree.map(np.asarray, scorer.params)

    rng = np.random.default_rng(3)
    sd = {}

    def put(key, shape):
        sd[key] = torch.tensor(rng.standard_normal(shape).astype(np.float32))

    vw, tw = cfg.vision_width, cfg.text_width
    put("blip.visual_encoder.patch_embed.proj.weight", (vw, 3, cfg.patch_size, cfg.patch_size))
    put("blip.visual_encoder.patch_embed.proj.bias", (vw,))
    n_patch = (cfg.image_size // cfg.patch_size) ** 2
    put("blip.visual_encoder.cls_token", (1, 1, vw))
    put("blip.visual_encoder.pos_embed", (1, n_patch + 1, vw))
    for i in range(cfg.vision_layers):
        src = f"blip.visual_encoder.blocks.{i}"
        for ln in ("norm1", "norm2"):
            put(f"{src}.{ln}.weight", (vw,)); put(f"{src}.{ln}.bias", (vw,))
        put(f"{src}.attn.qkv.weight", (3 * vw, vw)); put(f"{src}.attn.qkv.bias", (3 * vw,))
        put(f"{src}.attn.proj.weight", (vw, vw)); put(f"{src}.attn.proj.bias", (vw,))
        put(f"{src}.mlp.fc1.weight", (4 * vw, vw)); put(f"{src}.mlp.fc1.bias", (4 * vw,))
        put(f"{src}.mlp.fc2.weight", (vw, 4 * vw)); put(f"{src}.mlp.fc2.bias", (vw,))
    put("blip.visual_encoder.norm.weight", (vw,)); put("blip.visual_encoder.norm.bias", (vw,))

    emb = "blip.text_encoder.bert.embeddings"
    put(f"{emb}.word_embeddings.weight", (cfg.vocab_size, tw))
    put(f"{emb}.position_embeddings.weight", (512, tw))  # BERT's full table
    put(f"{emb}.LayerNorm.weight", (tw,)); put(f"{emb}.LayerNorm.bias", (tw,))
    for i in range(cfg.text_layers):
        src = f"blip.text_encoder.bert.encoder.layer.{i}"
        for attn in ("attention", "crossattention"):
            for qkv in ("query", "key", "value"):
                put(f"{src}.{attn}.self.{qkv}.weight", (tw, tw))
                put(f"{src}.{attn}.self.{qkv}.bias", (tw,))
            put(f"{src}.{attn}.output.dense.weight", (tw, tw))
            put(f"{src}.{attn}.output.dense.bias", (tw,))
            put(f"{src}.{attn}.output.LayerNorm.weight", (tw,))
            put(f"{src}.{attn}.output.LayerNorm.bias", (tw,))
        put(f"{src}.intermediate.dense.weight", (cfg.text_intermediate, tw))
        put(f"{src}.intermediate.dense.bias", (cfg.text_intermediate,))
        put(f"{src}.output.dense.weight", (tw, cfg.text_intermediate))
        put(f"{src}.output.dense.bias", (tw,))
        put(f"{src}.output.LayerNorm.weight", (tw,)); put(f"{src}.output.LayerNorm.bias", (tw,))

    dims = (tw, 1024, 128, 64, 16)
    for i, src_i in enumerate((0, 2, 4, 6)):
        put(f"mlp.layers.{src_i}.weight", (dims[i + 1] if i + 1 < len(dims) else 16, dims[i]))
        put(f"mlp.layers.{src_i}.bias", (dims[i + 1] if i + 1 < len(dims) else 16,))
    put("mlp.layers.7.weight", (1, 16)); put("mlp.layers.7.bias", (1,))

    path = tmp_path / "ImageReward.pt"
    torch.save(sd, path)
    loaded = load_image_reward_weights(str(path), ref, cfg)
    # Spot-check a transpose and the patch conv permute.
    np.testing.assert_allclose(
        loaded["vision"]["block_0"]["qkv"]["kernel"],
        sd["blip.visual_encoder.blocks.0.attn.qkv.weight"].numpy().T)
    np.testing.assert_allclose(
        loaded["vision"]["patch_embed"]["kernel"],
        np.transpose(sd["blip.visual_encoder.patch_embed.proj.weight"].numpy(), (2, 3, 1, 0)))

    # Truncated checkpoint fails loudly.
    del sd["mlp.layers.7.bias"]
    torch.save(sd, path)
    with pytest.raises(KeyError):
        load_image_reward_weights(str(path), ref, cfg)

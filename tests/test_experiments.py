"""Experiment-layer tests: metrics protocol, config surface, and a tiny
end-to-end sweep through the CLI entry (the reference's whole lifecycle)."""

import json
from pathlib import Path

import numpy as np
import pytest

from sonicdiffusionbayeslab_tpu.config import load_config
from sonicdiffusionbayeslab_tpu.metrics import FID, ClipScoreMetric, RewardModel, TimeMetric
from sonicdiffusionbayeslab_tpu.metrics.frechet import StreamingMoments, frechet_distance
from sonicdiffusionbayeslab_tpu.registry import (
    load_all_plugins,
    methods_registry,
    models_registry,
    schedulers_registry,
)

load_all_plugins()


# ------------------------------------------------------------------ metrics
def test_time_metric_sec_per_image():
    m = TimeMetric()
    m.update(2.0, 4)
    m.update(4.0, 8)
    assert m.compute() == pytest.approx(0.5)
    m.reset()
    assert m.compute() == 0.0


def test_frechet_distance_identical_is_zero():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 8))
    a, b = StreamingMoments(8), StreamingMoments(8)
    a.update(x)
    b.update(x)
    d = frechet_distance(*a.mean_cov(), *b.mean_cov())
    assert abs(d) < 1e-8


def test_frechet_distance_shifted_gaussians():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4000, 4))
    y = rng.standard_normal((4000, 4)) + 2.0
    a, b = StreamingMoments(4), StreamingMoments(4)
    a.update(x)
    b.update(y)
    # Analytic: |mu diff|^2 = 4 * 4 = 16 (covariances ~equal)
    assert frechet_distance(*a.mean_cov(), *b.mean_cov()) == pytest.approx(16.0, rel=0.1)


def test_fid_metric_protocol():
    m = FID(feature=8, tiny=True)
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32)
    m.update(imgs, real=True)
    m.update(imgs + 0.1, real=False)
    m.update(imgs, real=True)
    m.update(imgs + 0.1, real=False)
    d_diff = m.compute()
    m.reset()
    m.update(imgs, real=True)
    m.update(imgs, real=False)
    m.update(imgs, real=True)
    m.update(imgs, real=False)
    assert m.compute() < d_diff  # identical sets closer than shifted ones


def test_clip_score_and_reward_tiny():
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    prompts = ["a cat", "a dog", "a car", "a tree"]
    cs = ClipScoreMetric(tiny=True)
    cs.update(imgs, prompts)
    assert 0.0 <= cs.compute() <= 100.0
    rm = RewardModel(tiny=True)
    rm.update(prompts, imgs, imgs)  # identical: gen >= real everywhere
    assert rm.compute() == 1.0


# ------------------------------------------------------------------ configs
ALL_CONFIGS = sorted(Path("configs").glob("*.yaml"))


def _is_training_config(path) -> bool:
    import yaml

    return "training" in yaml.safe_load(path.read_text())


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=[p.stem for p in ALL_CONFIGS])
def test_shipped_configs_resolve(path):
    cfg = load_config(path)
    if _is_training_config(path):  # sdbl-train configs have no method
        assert "num_steps" in cfg.training
        return
    assert cfg.experiment.method in methods_registry
    assert cfg.model.model_name in models_registry
    scfg = cfg.get("scheduler")
    if scfg:
        for key in ("scheduler_name", "scheduler_first", "scheduler_second",
                    "scheduler_main", "scheduler_inter"):
            name = scfg.get(key)
            if name:
                assert name in schedulers_registry, name


def _tinyify(raw: dict) -> dict:
    """Shrink a shipped config to a one-grid-point tiny smoke: random tiny
    weights, 64px, one batch of 2 — but the SAME dataset path, method,
    scheduler wiring and metric set as shipped."""
    import copy

    raw = copy.deepcopy(raw)
    raw["model"]["tiny"] = True
    raw["model"]["image_size"] = 64
    raw["dataset"]["image_size"] = 64
    raw.setdefault("inference", {})["batch_size"] = 2
    raw["inference"]["batch_count"] = 1
    raw.setdefault("logger", {})["wandb_enable"] = False
    raw["logger"]["save"] = False
    ep = raw.get("experiment_params", {})
    for k, v in list(ep.items()):
        if isinstance(v, list):
            ep[k] = [v[0]]
            if k.startswith("num_inference_steps") and isinstance(ep[k][0], int):
                ep[k] = [min(ep[k][0], 8)]
    return raw


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=[p.stem for p in ALL_CONFIGS])
def test_shipped_config_end_to_end(tmp_path, monkeypatch, path):
    """Every shipped config must actually run: real dataset path loaded
    (the reference's 1000-prompt COCO caption file), method + scheduler +
    metrics built from the shipped sections, one tiny batch generated and
    validated to a metrics table (reference protocol: main.py + configs/*)."""
    import yaml

    monkeypatch.chdir(Path(__file__).parent.parent)
    if _is_training_config(path):
        pytest.skip("training config: covered by test_training.py's loop test")
    raw = yaml.safe_load(path.read_text())
    prompts_path = Path(raw["dataset"]["prompts"])
    assert prompts_path.exists(), f"{path.name} points at missing {prompts_path}"
    if "img2annotations_test" in prompts_path.name:
        assert len(json.loads(prompts_path.read_text())) == 1000

    cfgp = tmp_path / path.name
    cfgp.write_text(yaml.safe_dump(_tinyify(raw)))
    from sonicdiffusionbayeslab_tpu.cli import run

    metrics = run(str(cfgp))
    assert len(metrics["exp"]) == 1
    assert metrics["time"][0] > 0
    if "quality_metrics" in raw and "clip_score" in raw["quality_metrics"]:
        assert np.isfinite(metrics["clip_score"][0])


# ---------------------------------------------------------------- e2e sweep
def _smoke_config(tmp_path, method, model, extra_params, scheduler=None, extra_model=None):
    cfg = {
        "experiment_name": "t",
        "experiment": {"method": method, "seed": 29},
        "model": {"model_name": model, "pretrained_model": "x", "tiny": True,
                  "image_size": 64, **(extra_model or {})},
        "dataset": {"prompts": "data/dataset/prompts_sample.json", "image_size": 64},
        "quality_metrics": {"clip_score": {"model_name_or_path": "none"}},
        "logger": {"wandb_enable": False, "log_images_step": 1, "save": False},
        "inference": {"batch_size": 4, "batch_count": 1},
        "experiment_params": extra_params,
    }
    if scheduler:
        cfg["scheduler"] = scheduler
    import yaml

    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return p


@pytest.mark.parametrize(
    "method,model,scheduler,params",
    [
        ("dpm_solver", "stable_diffusion_model",
         {"scheduler_name": "dpm_solver_scheduler"},
         {"solver_order": 2, "num_inference_steps": [3]}),
        ("two_schedulers", "stable_diffusion_model_two_schedulers",
         {"scheduler_first": "ddim_scheduler", "scheduler_second": "dpm_solver_scheduler"},
         {"solver_order": 2, "type_switch": "closest",
          "num_inference_steps_first": [6], "num_inference_steps_second": [6],
          "num_step_switch": [2]}),
        ("skip_steps", "stable_diffusion_model_skip_timesteps",
         {"scheduler_name": "dpm_solver_scheduler"},
         {"solver_order": 2, "num_inference_steps": [6], "skip_steps": [[2]]}),
        ("deep_cache", "stable_diffusion_model",
         {"scheduler_name": "ddim_scheduler"},
         # tome_ratio modifier: DeepCache x ToMe compose (max-stack,
         # docs/PERF.md).
         {"cache_interval": [2], "num_inference_steps": [4],
          "tome_ratio": 0.5}),
        ("consistency_model", "stable_diffusion_model",
         {"scheduler_name": "lcm_scheduler"},
         {"guidance_scale": 0.0, "num_inference_steps": [2]}),
        ("interliving_schedulers", "stable_diffusion_model_interliving_schedulers",
         {"scheduler_main": "dpm_solver_scheduler", "scheduler_inter": "dpm_solver_scheduler"},
         {"solver_order": 2, "num_inference_steps": [8], "interliving_steps": [[1]]}),
        ("unipc", "stable_diffusion_model",
         {"scheduler_name": "unipc_scheduler"},
         {"solver_order": 2, "num_inference_steps": [3]}),
    ],
    ids=["dpm", "two_sched", "skip", "deepcache", "lcm", "interleave", "unipc"],
)
def test_method_end_to_end(tmp_path, monkeypatch, method, model, scheduler, params):
    monkeypatch.chdir(Path(__file__).parent.parent)
    cfgp = _smoke_config(tmp_path, method, model, params, scheduler)
    from sonicdiffusionbayeslab_tpu.cli import run

    metrics = run(str(cfgp))
    assert len(metrics["nfe"]) == 1
    assert metrics["time"][0] > 0
    assert "clip_score" in metrics


def test_sweep_resume(tmp_path, monkeypatch):
    """Interrupted sweeps resume at the next grid point (sweep_state.json)."""
    monkeypatch.chdir(Path(__file__).parent.parent)
    cfgp = _smoke_config(
        tmp_path, "ddim", "stable_diffusion_model",
        {"num_inference_steps": [2, 3]}, {"scheduler_name": "ddim_scheduler"},
    )
    from sonicdiffusionbayeslab_tpu.config import load_config as lc
    from sonicdiffusionbayeslab_tpu.registry import methods_registry as mr

    m = mr["ddim"](lc(str(cfgp)))
    state = m.logger.local.dir / "sweep_state.json"
    state.write_text(json.dumps({"done": ["steps_2"]}))
    metrics = m.run_experiment()
    assert metrics["exp"] == ["steps_3"]  # steps_2 skipped as already done


def test_inception_stem_features():
    from sonicdiffusionbayeslab_tpu.metrics.inception import InceptionFeatures

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    for feat in (64, 192):
        fx = InceptionFeatures(feat)
        out = fx(imgs)
        assert out.shape == (2, feat) and np.isfinite(out).all()
    with pytest.raises(ValueError, match="taps"):
        InceptionFeatures(100)


def test_inception_full_mixed_blocks():
    """Deep taps: channel widths and spatial map sizes of FID-Inception
    (Mixed_6e -> 768ch @17x17, Mixed_7c -> 2048ch @8x8 at 299 input)."""
    import jax
    import jax.numpy as jnp

    from sonicdiffusionbayeslab_tpu.metrics.inception import InceptionBlocks

    model = InceptionBlocks(max_tap=2048)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, 299, 299, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    taps = model.apply({"params": params}, x)
    assert set(taps) == {64, 192, 768, 2048}
    for feat, tap in taps.items():
        assert tap.shape == (1, feat) and bool(jnp.isfinite(tap).all())
    # Param count of the full tower (conv weights + BN): ~21.8M.
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 20_000_000 < n < 24_000_000


def test_inception_weight_loader_roundtrip(tmp_path):
    """Synthesize a torch state dict from known values and check every
    ConvBN in the tree receives its mapped weights."""
    import jax
    import jax.numpy as jnp
    import torch

    from sonicdiffusionbayeslab_tpu.metrics.inception import (
        InceptionBlocks,
        _is_convbn,
        load_inception_weights,
    )

    model = InceptionBlocks(max_tap=768)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))["params"]

    rng = np.random.default_rng(7)
    sd = {}

    def fill(tree, prefix):
        if _is_convbn(tree):
            k = tree["conv"]["kernel"]
            sd[f"{prefix}.conv.weight"] = torch.tensor(
                rng.standard_normal((k.shape[3], k.shape[2], k.shape[0], k.shape[1])).astype(np.float32))
            c = k.shape[3]
            for torch_name in ("running_mean", "running_var", "weight", "bias"):
                sd[f"{prefix}.bn.{torch_name}"] = torch.tensor(
                    rng.standard_normal(c).astype(np.float32))
            return
        for name, sub in tree.items():
            fill(sub, f"{prefix}.{name}" if prefix else name)

    fill(params, "")
    path = tmp_path / "inception.pth"
    torch.save(sd, path)

    loaded = load_inception_weights(str(path), params)

    def check(tree, prefix):
        if _is_convbn(tree):
            np.testing.assert_allclose(
                np.asarray(tree["conv"]["kernel"]),
                np.transpose(sd[f"{prefix}.conv.weight"].numpy(), (2, 3, 1, 0)))
            np.testing.assert_allclose(np.asarray(tree["bn_scale"]), sd[f"{prefix}.bn.weight"].numpy())
            return
        for name, sub in tree.items():
            check(sub, f"{prefix}.{name}" if prefix else name)

    check(loaded, "")


def test_fid_uses_inception_for_64():
    m = FID(feature=64, tiny=False)
    assert m._inception is not None
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    m.update(imgs, real=True)
    m.update(imgs, real=True)
    m.update(imgs + 0.05, real=False)
    m.update(imgs + 0.05, real=False)
    assert np.isfinite(m.compute())


def test_time_it_and_sync():
    import jax.numpy as jnp

    from sonicdiffusionbayeslab_tpu.utils.profiling import flops_estimate, time_it

    @time_it
    def f(x):
        return x * 2

    out, dt = f(jnp.ones((4, 4)))
    assert dt > 0 and np.allclose(np.asarray(out), 2.0)
    est = flops_estimate(lambda a, b: a @ b, jnp.ones((64, 64)), jnp.ones((64, 64)))
    assert est.get("flops", 0) > 0 or est == {}


def test_compilation_cache_enable(tmp_path):
    from sonicdiffusionbayeslab_tpu.utils import compilation_cache

    p = compilation_cache.enable(str(tmp_path / "cache"))
    assert p.exists()
    compilation_cache.enable(str(tmp_path / "cache"))  # idempotent


def test_aesthetic_scorer():
    from sonicdiffusionbayeslab_tpu.metrics.aesthetic import AestheticScorer, normalized

    emb = np.random.default_rng(0).standard_normal((3, 768)).astype(np.float32)
    scores = AestheticScorer()(emb)
    assert scores.shape == (3,) and np.isfinite(scores).all()
    n = normalized(emb)
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)


def test_reward_model_fallback_warns(monkeypatch, caplog):
    """Without an ImageReward checkpoint the CLIP fallback must be loud
    (ADVICE r1: silent semantic divergence from the reference's BLIP scorer)."""
    from sonicdiffusionbayeslab_tpu.metrics import metrics as M

    stub = type("S", (), {"scores": staticmethod(lambda i, p: np.zeros(len(p)))})()
    monkeypatch.setattr(M, "_clip_backend", lambda *a, **k: stub)
    monkeypatch.delenv("SDBL_IMAGE_REWARD_CKPT", raising=False)
    monkeypatch.chdir(Path(__file__).parent)  # no data/models/ImageReward.pt here
    with caplog.at_level("WARNING"):
        M.RewardModel()
    assert any("NOT comparable" in r.message for r in caplog.records)


def test_aesthetic_metric_registered_e2e(tmp_path):
    """aesthetic_score as a registered quality metric in a sweep (the
    reference ships the model but never wires it — SURVEY §2.1)."""
    import yaml

    from sonicdiffusionbayeslab_tpu.cli import run

    cfg = {
        "experiment_name": "t",
        "experiment": {"method": "ddim", "seed": 29},
        "model": {"model_name": "stable_diffusion_model", "pretrained_model": "x",
                  "tiny": True, "image_size": 64},
        "scheduler": {"scheduler_name": "ddim_scheduler"},
        "dataset": {"prompts": "data/dataset/prompts_sample.json", "image_size": 64},
        "quality_metrics": {"clip_score": {"model_name_or_path": "none"},
                            "aesthetic_score": {}},
        "logger": {"wandb_enable": False, "log_images_step": 1, "save": False},
        "inference": {"batch_size": 2, "batch_count": 1},
        "experiment_params": {"num_inference_steps": [3]},
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    metrics = run(str(p))
    assert np.isfinite(metrics["aesthetic_score"][0])


def test_aesthetic_scorer_real_checkpoint(monkeypatch):
    """The shipped reference-format Lightning checkpoint loads and scores in
    the LAION aesthetic range (reference data/models/aethetic_score_model.pth)."""
    monkeypatch.chdir(Path(__file__).parent.parent)
    from sonicdiffusionbayeslab_tpu.metrics.aesthetic import AestheticScorer

    path = Path("data/models/aethetic_score_model.pth")
    assert path.exists()
    s = AestheticScorer(str(path))
    emb = np.random.default_rng(0).standard_normal((4, 768)).astype(np.float32)
    out = s(emb)
    assert out.shape == (4,) and np.isfinite(out).all()
    assert (0.0 < out).all() and (out < 10.0).all()


def test_logger_local_artifacts(tmp_path):
    from sonicdiffusionbayeslab_tpu.loggers import Logger

    lg = Logger(wandb_enable=False, run_name="t", output_root=str(tmp_path))
    lg.log_metrics({"a": 1.0}, step=0)
    lg.log_metrics_into_table({"x": [1, 2]}, name="tbl")
    imgs = np.random.default_rng(0).uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
    lg.log_batch_of_images(imgs, name="s", captions=["a", "b"], step=0)
    lg.finish()
    d = lg.local.dir
    assert (d / "events.jsonl").exists()
    assert (d / "tables" / "tbl.tsv").exists()
    assert list((d / "images").glob("*.png"))


def test_image_reward_blip_scorer_tiny():
    from sonicdiffusionbayeslab_tpu.metrics.image_reward_model import ImageRewardScorer

    scorer = ImageRewardScorer(tiny=True)
    imgs = np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    s = scorer(imgs, ["a cat on a mat", "a dog"])
    assert s.shape == (2,) and np.isfinite(s).all()
    # Deterministic + prompt-sensitive.
    s2 = scorer(imgs, ["a cat on a mat", "a dog"])
    np.testing.assert_array_equal(s, s2)
    s3 = scorer(imgs, ["something completely different entirely", "a dog"])
    assert abs(s3[0] - s[0]) > 0 and s3[1] == s[1]
    # Plugs into the metric.
    rm = RewardModel(scorer=scorer)
    rm.update(["a cat", "a dog"], imgs, imgs)
    assert rm.compute() == 1.0


def test_inference_perf_knobs_config_wiring(tmp_path, monkeypatch):
    """inference.unet_microbatch and inference.quant reach the pipeline /
    quant mode from YAML (the batch-32 fix and the int8 knob must be
    expressible in the reference's config schema, not just env vars)."""
    import yaml

    from sonicdiffusionbayeslab_tpu.ops.quant import get_quant_mode, set_quant_mode

    monkeypatch.chdir(Path(__file__).parent.parent)
    cfgp = _smoke_config(
        tmp_path, "ddim", "stable_diffusion_model",
        {"num_inference_steps": [3]}, {"scheduler_name": "ddim_scheduler"},
    )
    raw = yaml.safe_load(cfgp.read_text())
    raw["inference"]["unet_microbatch"] = 2  # divides the CFG-doubled batch 8
    raw["inference"]["quant"] = "int8"
    cfgp.write_text(yaml.safe_dump(raw))
    from sonicdiffusionbayeslab_tpu.cli import run

    try:
        metrics = run(str(cfgp))
        assert get_quant_mode() == "int8"  # set_quant_mode called from config
        assert len(metrics["exp"]) == 1 and metrics["time"][0] > 0
    finally:
        set_quant_mode(None)  # process-global: never leak into other tests

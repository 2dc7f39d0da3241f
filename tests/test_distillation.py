"""LCM consistency distillation: fixed-rng probe improvement, teacher
frozen, boundary scalings match the LCM sampler, distilled student samples
through the LCM plan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonicdiffusionbayeslab_tpu.models import (
    CLIPTextConfig,
    StableDiffusionEngine,
    UNetConfig,
    VAEConfig,
)
from sonicdiffusionbayeslab_tpu.models import weights as W
from sonicdiffusionbayeslab_tpu.schedulers import LCMScheduler
from sonicdiffusionbayeslab_tpu.training.distillation import LCMDistillConfig, LCMDistiller
from sonicdiffusionbayeslab_tpu.training.trainer import TrainState


@pytest.fixture(scope="module")
def engine():
    return StableDiffusionEngine(
        UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny(),
        dtype=jnp.float32, param_dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def params(engine):
    return engine.init_params(seed=0, latent_hw=8)


@pytest.fixture(scope="module")
def batch():
    lat = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (4, 77, 32))
    return lat, ctx, jnp.zeros_like(ctx)


def test_distill_grid_matches_lcm_sampler(engine):
    """The distillation grid must be the LCM sampler's node set — otherwise
    the distilled model is queried off-grid at inference."""
    from sonicdiffusionbayeslab_tpu.schedulers.lcm import lcm_timesteps

    dist = LCMDistiller(engine, LCMDistillConfig(original_inference_steps=10))
    sampler_ts = lcm_timesteps(10, 1000, 10)
    assert set(int(t) for t in sampler_ts) <= set(int(t) for t in dist.grid)


def test_distill_boundary_scalings_match_sampler(engine):
    """c_skip/c_out here and in schedulers/lcm.py must agree — the
    consistency property only transfers if both sides use one convention."""
    dist = LCMDistiller(engine, LCMDistillConfig())
    t = jnp.asarray([0, 499, 999])
    c_skip, c_out = dist._scalings(t)
    for i, tv in enumerate([0, 499, 999]):
        scaled = tv * 10.0
        np.testing.assert_allclose(
            float(c_skip[i, 0, 0, 0]), 0.25 / (scaled**2 + 0.25), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(c_out[i, 0, 0, 0]), scaled / np.sqrt(scaled**2 + 0.25), rtol=1e-6
        )
    # Clean boundary: f(z, 0) == z (c_skip=1, c_out=0).
    assert float(c_skip[0, 0, 0, 0]) == 1.0 and float(c_out[0, 0, 0, 0]) == 0.0


def test_distill_loss_improves_and_teacher_frozen(engine, params, batch):
    lat, ctx, unc = batch
    dist = LCMDistiller(
        engine,
        LCMDistillConfig(learning_rate=1e-3, lora_rank=4, original_inference_steps=10,
                         donate=False),
    )
    st0 = dist.init_state(params, key=jax.random.PRNGKey(7))
    teacher_before = W.flatten(jax.tree.map(np.asarray, params["unet"]))
    key = jax.random.PRNGKey(42)
    _, m0 = dist.distill_step(st0, params, lat, ctx, unc, key)
    st = st0
    for _ in range(15):
        st, m = dist.distill_step(st, params, lat, ctx, unc, key)
        assert np.isfinite(float(m["loss"])) and float(m["grad_norm"]) > 0
    probe = TrainState(step=jnp.zeros((), jnp.int32), trainable=st.trainable,
                       opt_state=st0.opt_state, ema=st.ema)
    _, m1 = dist.distill_step(probe, params, lat, ctx, unc, key)
    assert float(m1["loss"]) < float(m0["loss"])
    for k, v in teacher_before.items():
        np.testing.assert_array_equal(
            v, np.asarray(W.flatten(params["unet"])[k]), err_msg=k
        )


def test_distilled_student_samples_with_lcm_plan(engine, params, batch):
    lat, ctx, unc = batch
    dist = LCMDistiller(
        engine,
        LCMDistillConfig(learning_rate=1e-3, lora_rank=4, original_inference_steps=10),
    )
    st = dist.init_state(params, key=jax.random.PRNGKey(7))
    for _ in range(3):
        st, _ = dist.distill_step(st, params, lat, ctx, unc, jax.random.PRNGKey(9))
    p2 = dict(params)
    p2["unet"] = dist.student_unet_params(st, params)
    plan = LCMScheduler(original_inference_steps=10).build_plan(4)
    out = engine.sample(p2, plan, ctx[:1], None, jax.random.PRNGKey(0),
                        guidance_scale=0.0, latent_hw=(8, 8))
    assert out.images.shape == (1, 16, 16, 3)
    assert bool(jnp.isfinite(out.images).all())
    assert out.nfe == 4


def test_distill_mode_config_loop(tmp_path):
    """sdbl-train with training.mode=distill runs the distillation loop and
    exports the LoRA student."""
    import json

    import yaml
    from PIL import Image

    from sonicdiffusionbayeslab_tpu.config import load_config
    from sonicdiffusionbayeslab_tpu.training.loop import run_training

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    prompts = {}
    for i in range(4):
        f = f"im_{i}.png"
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(img_dir / f)
        prompts[f] = f"synthetic image {i}"
    (tmp_path / "prompts.json").write_text(json.dumps(prompts))
    cfg = {
        "experiment": {"seed": 29},
        "model": {"model_name": "stable_diffusion_model", "pretrained_model": "x",
                  "tiny": True, "image_size": 64, "dtype": "float32"},
        "dataset": {"img_dataset": str(img_dir), "prompts": str(tmp_path / "prompts.json"),
                    "image_size": 64},
        "training": {"mode": "distill", "num_steps": 3, "batch_size": 2,
                     "log_every": 1, "learning_rate": 1e-3, "lora_rank": 2,
                     "original_inference_steps": 10,
                     "save_dir": str(tmp_path / "ckpt")},
    }
    p = tmp_path / "train.yaml"
    p.write_text(yaml.safe_dump(cfg))
    out = run_training(load_config(str(p)))
    assert all(np.isfinite(l) for l in out["losses"])
    assert (tmp_path / "ckpt" / "final" / "lora_peft.npz").exists()


def test_wconditioned_distillation(engine, params, batch):
    """Full-LCM recipe: per-example w sampled and embedded into a
    cond_proj-augmented student; zero-init cond_proj, teacher frozen, probe
    improves, exported student samples through a w-conditioned engine."""
    import dataclasses

    lat, ctx, unc = batch
    dist = LCMDistiller(
        engine,
        LCMDistillConfig(learning_rate=1e-4, lora_rank=0,
                         original_inference_steps=10, donate=False,
                         w_min=2.0, w_max=10.0, student_time_cond_proj_dim=8),
    )
    st0 = dist.init_state(params)
    from sonicdiffusionbayeslab_tpu.models import weights as W2

    cp = np.asarray(W2.flatten(st0.trainable)["time_embedding/cond_proj/kernel"])
    assert cp.shape == (8, 32) and np.abs(cp).max() == 0.0

    key = jax.random.PRNGKey(42)
    _, m0 = dist.distill_step(st0, params, lat, ctx, unc, key)
    st = st0
    losses = []
    for _ in range(25):
        st, m = dist.distill_step(st, params, lat, ctx, unc, key)
        assert np.isfinite(float(m["loss"])) and float(m["grad_norm"]) > 0
        losses.append(float(m["loss"]))
    # The w path learned: the zero-init cond_proj moved.
    cp_after = np.asarray(W2.flatten(st.trainable)["time_embedding/cond_proj/kernel"])
    assert np.abs(cp_after).max() > 0
    # The student tracks its (moving EMA) target: the consistency loss
    # trends down. (A frozen-target probe is NOT meaningful for full-mode
    # consistency training — the objective is self-referential.)
    assert np.mean(losses[-5:]) < float(m0["loss"])

    # Export into a w-conditioned engine and sample CFG-free.
    from sonicdiffusionbayeslab_tpu.models import (
        CLIPTextConfig as _T,
        StableDiffusionEngine as _E,
        UNetConfig as _U,
        VAEConfig as _V,
    )

    cfg_w = dataclasses.replace(_U.tiny(), time_cond_proj_dim=8)
    eng_w = _E(cfg_w, _V.tiny(), _T.tiny(), dtype=jnp.float32, param_dtype=jnp.float32)
    p2 = dict(params)
    p2["unet"] = dist.student_unet_params(st, params)
    plan = LCMScheduler(original_inference_steps=10).build_plan(4)
    out = eng_w.sample(p2, plan, ctx[:1], None, jax.random.PRNGKey(0),
                       guidance_scale=8.0, latent_hw=(8, 8))
    assert bool(jnp.isfinite(out.images).all())


def test_wconditioned_validation(engine):
    with pytest.raises(ValueError, match="lora_rank=0"):
        LCMDistiller(engine, LCMDistillConfig(lora_rank=4,
                                              student_time_cond_proj_dim=8))
    with pytest.raises(ValueError, match="w_min and w_max"):
        LCMDistiller(engine, LCMDistillConfig(lora_rank=0, w_min=2.0,
                                              student_time_cond_proj_dim=8))
    with pytest.raises(ValueError, match="student_time_cond_proj_dim"):
        LCMDistiller(engine, LCMDistillConfig(lora_rank=0, w_min=2.0, w_max=8.0))


def test_distill_rejects_vpred_teacher(engine):
    import dataclasses

    from sonicdiffusionbayeslab_tpu.schedulers.schedule import ScheduleConfig

    vpred = dataclasses.replace(ScheduleConfig(), prediction_type="v_prediction")
    with pytest.raises(ValueError, match="epsilon"):
        LCMDistiller(engine, LCMDistillConfig(), schedule_config=vpred)

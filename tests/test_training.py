"""Training subsystem: jitted diffusion train step (full + LoRA), EMA,
mesh-parallel training, peft-layout LoRA export round-trip, config loop."""

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
from sonicdiffusionbayeslab_tpu.training import (
    DiffusionTrainer,
    TrainConfig,
    apply_lora,
    init_lora,
    lora_to_peft_state_dict,
)


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
    return (
        jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4)),
        jax.random.normal(jax.random.PRNGKey(2), (4, 77, 32)),
    )


def test_full_finetune_loss_decreases(engine, params, batch):
    lat, ctx = batch
    tr = DiffusionTrainer(engine, TrainConfig(learning_rate=1e-3))
    st = tr.init_state(params)
    losses = []
    for _ in range(8):
        st, m = tr.train_step(st, params, lat, ctx, jax.random.PRNGKey(42))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(st.step) == 8
    assert all(np.isfinite(l) for l in losses)


def test_full_finetune_adafactor(engine, params, batch):
    """Adafactor option: loss decreases, and the factored optimizer state
    carries no full-sized first-moment tree (the memory claim it exists
    for — docs/TRAINING.md single-chip full fine-tune)."""
    lat, ctx = batch
    tr = DiffusionTrainer(
        engine, TrainConfig(learning_rate=1e-3, optimizer="adafactor"))
    st = tr.init_state(params)
    n_param = sum(x.size for x in jax.tree.leaves(st.trainable))
    n_opt = sum(x.size for x in jax.tree.leaves(st.opt_state)
                if hasattr(x, "size"))
    assert n_opt < n_param  # factored stats, not 2 full Adam trees
    losses = []
    for _ in range(8):
        st, m = tr.train_step(st, params, lat, ctx, jax.random.PRNGKey(42))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(l) for l in losses)


def test_donate_flag_off_keeps_old_state_usable(engine, params, batch):
    """donate=False must let a caller re-step from an old state (CPU is a
    donation no-op either way; this pins the opt-out API)."""
    lat, ctx = batch
    tr = DiffusionTrainer(engine, TrainConfig(learning_rate=1e-3, donate=False))
    st0 = tr.init_state(params)
    st1, m1 = tr.train_step(st0, params, lat, ctx, jax.random.PRNGKey(0))
    st1b, m1b = tr.train_step(st0, params, lat, ctx, jax.random.PRNGKey(0))
    assert float(m1["loss"]) == float(m1b["loss"])
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(st1.trainable)[0]),
        np.asarray(jax.tree.leaves(st1b.trainable)[0]))


def test_lora_loss_decreases_and_base_frozen(engine, params, batch):
    lat, ctx = batch
    tr = DiffusionTrainer(engine, TrainConfig(learning_rate=1e-2, lora_rank=4))
    st = tr.init_state(params, key=jax.random.PRNGKey(7))
    base_before = jax.tree.map(np.asarray, params["unet"])
    l0 = None
    for _ in range(8):
        st, m = tr.train_step(st, params, lat, ctx, jax.random.PRNGKey(42))
        l0 = float(m["loss"]) if l0 is None else l0
    assert float(m["loss"]) < l0
    # The base tree is untouched — only the adapters moved.
    for k, v in W.flatten(base_before).items():
        np.testing.assert_array_equal(v, np.asarray(W.flatten(params["unet"])[k]), err_msg=k)


def test_lora_step0_is_identity(engine, params):
    """b initializes at zero, so merged == base before any update."""
    adapters = init_lora(params["unet"], 4, jax.random.PRNGKey(0))
    merged = apply_lora(params["unet"], adapters)
    fa, fb = W.flatten(params["unet"]), W.flatten(merged)
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]), atol=1e-7)


def test_lora_peft_export_round_trip(engine, params, batch):
    """A LoRA trained here, exported in the peft layout, fuses through the
    inference-side merge_lora to the same weights apply_lora produces."""
    lat, ctx = batch
    tr = DiffusionTrainer(engine, TrainConfig(learning_rate=1e-2, lora_rank=4))
    st = tr.init_state(params, key=jax.random.PRNGKey(7))
    for _ in range(3):
        st, _ = tr.train_step(st, params, lat, ctx, jax.random.PRNGKey(42))

    nm = W.unet_name_map(engine.unet_config)
    sd = lora_to_peft_state_dict(jax.tree.map(np.asarray, st.trainable), nm)
    assert any(k.endswith(".lora_A.weight") for k in sd)

    fused = W.merge_lora(jax.tree.map(np.asarray, params["unet"]), sd, nm)
    functional = apply_lora(params["unet"], st.trainable)
    fa, fb = W.flatten(functional), W.flatten(fused)
    for k in fa:
        np.testing.assert_allclose(
            np.asarray(fa[k], np.float32), np.asarray(fb[k], np.float32),
            atol=1e-5, err_msg=k,
        )

    # Non-default alpha in the peft layout must actually be honored: doubling
    # the exported alphas doubles the fused delta (alpha keys parse even
    # though they carry no .lora_ marker).
    sd2 = {k: (v * 2.0 if k.endswith(".alpha") else v) for k, v in sd.items()}
    fused2 = W.flatten(W.merge_lora(jax.tree.map(np.asarray, params["unet"]), sd2, nm))
    base = W.flatten(jax.tree.map(np.asarray, params["unet"]))
    for k in fa:
        d1 = np.asarray(fb[k], np.float32) - np.asarray(base[k], np.float32)
        d2 = np.asarray(fused2[k], np.float32) - np.asarray(base[k], np.float32)
        np.testing.assert_allclose(d2, 2.0 * d1, atol=1e-5, err_msg=k)


def test_ema_shadow_math(engine, params, batch):
    lat, ctx = batch
    tr = DiffusionTrainer(
        engine, TrainConfig(learning_rate=1e-3, ema_decay=0.9, donate=False))
    st0 = tr.init_state(params)
    st1, _ = tr.train_step(st0, params, lat, ctx, jax.random.PRNGKey(0))
    k = "conv_in/kernel"
    e = np.asarray(W.flatten(st1.ema)[k])
    expect = 0.9 * np.asarray(W.flatten(st0.trainable)[k]) + 0.1 * np.asarray(
        W.flatten(st1.trainable)[k]
    )
    np.testing.assert_allclose(e, expect, atol=1e-6)


def test_vpred_and_snr_weighting_differ(engine, params, batch):
    lat, ctx = batch
    key = jax.random.PRNGKey(42)
    losses = {}
    for name, cfg in {
        "eps": TrainConfig(),
        "v": TrainConfig(prediction_type="v_prediction"),
        # gamma far below any sampled timestep's SNR so min(snr, gamma)/snr
        # is < 1 with certainty (gamma=5 only bites at t < ~100).
        "eps_snr": TrainConfig(snr_gamma=0.01),
    }.items():
        tr = DiffusionTrainer(engine, cfg)
        st = tr.init_state(params)
        _, m = tr.train_step(st, params, lat, ctx, key)
        losses[name] = float(m["loss"])
        assert np.isfinite(losses[name])
    assert losses["eps"] != losses["v"]
    assert losses["eps"] != losses["eps_snr"]


def test_grad_clip_bounds_update(engine, params, batch):
    lat, ctx = batch
    tr = DiffusionTrainer(
        engine, TrainConfig(learning_rate=1e-3, max_grad_norm=1e-8, donate=False))
    st0 = tr.init_state(params)
    st1, m = tr.train_step(st0, params, lat, ctx, jax.random.PRNGKey(0))
    # With the norm clipped to ~0 the params barely move.
    k = "conv_in/kernel"
    delta = np.abs(
        np.asarray(W.flatten(st1.trainable)[k]) - np.asarray(W.flatten(st0.trainable)[k])
    ).max()
    assert delta < 1e-3  # adamw update is lr-scaled normalized grad; clip keeps it tiny
    assert float(m["grad_norm"]) > 0


def test_train_step_on_mesh_matches_single_device(engine, params, batch):
    """8-way DP training: same batch, same key -> same trainable tree."""
    from sonicdiffusionbayeslab_tpu.parallel import make_mesh, shard_batch, shard_params

    lat, ctx = batch
    lat8 = jnp.tile(lat, (2, 1, 1, 1))
    ctx8 = jnp.tile(ctx, (2, 1, 1))
    cfg = TrainConfig(learning_rate=1e-3, lora_rank=4)

    tr = DiffusionTrainer(engine, cfg)
    st = tr.init_state(params, key=jax.random.PRNGKey(7))
    for _ in range(2):
        st, m_single = tr.train_step(st, params, lat8, ctx8, jax.random.PRNGKey(9))

    mesh = make_mesh(n_data=8, n_model=1)
    tr2 = DiffusionTrainer(engine, cfg)
    with mesh:
        p = shard_params(params, mesh)
        st2 = tr2.init_state(p, key=jax.random.PRNGKey(7))
        lat_s, ctx_s = shard_batch(mesh, lat8, ctx8)
        for _ in range(2):
            st2, m_mesh = tr2.train_step(st2, p, lat_s, ctx_s, jax.random.PRNGKey(9))

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_mesh["loss"]), rtol=1e-5, atol=1e-6
    )
    fa, fb = W.flatten(st.trainable), W.flatten(st2.trainable)
    for k in fa:
        np.testing.assert_allclose(
            np.asarray(fa[k]), np.asarray(fb[k]), rtol=1e-4, atol=1e-5, err_msg=k
        )


def test_controlnet_training(engine, params, batch):
    """ControlNet target: UNet frozen, loss decreases, zero convs wake up,
    and the trained tree drops into engine.sample(control=...)."""
    lat, ctx = batch
    hint = jax.random.uniform(jax.random.PRNGKey(5), (4, 64, 64, 3))
    tr = DiffusionTrainer(
        engine, TrainConfig(learning_rate=1e-3, train_target="controlnet")
    )
    st = tr.init_state(params)
    zero0 = np.abs(np.asarray(W.flatten(st.trainable)["control_mid/kernel"])).max()
    assert zero0 == 0.0
    base_before = W.flatten(jax.tree.map(np.asarray, params["unet"]))
    losses = []
    for _ in range(8):
        st, m = tr.train_step(st, params, lat, ctx, jax.random.PRNGKey(42), hint=hint)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    # Gradients reached the ControlNet (the encoder copy moved)...
    moved = np.abs(
        np.asarray(W.flatten(st.trainable)["conv_in/kernel"], np.float32)
        - np.asarray(base_before["conv_in/kernel"], np.float32)
    ).max()
    assert moved > 0
    # ...while the UNet stayed frozen.
    for k, v in base_before.items():
        np.testing.assert_array_equal(
            v, np.asarray(W.flatten(params["unet"])[k]), err_msg=k
        )
    # Export drops into the sampler.
    from sonicdiffusionbayeslab_tpu.models.tokenizer import HashTokenizer
    from sonicdiffusionbayeslab_tpu.schedulers import DPMSolverScheduler

    cn = tr.controlnet_params(st)
    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    c = engine.encode_prompts(params, tok(["a cat"]))
    out = engine.sample(
        params, DPMSolverScheduler(solver_order=1).build_plan(2), c, None,
        jax.random.PRNGKey(0), guidance_scale=0.0, latent_hw=(8, 8),
        control={"params": cn, "image": hint[:1], "scale": 1.0},
    )
    assert bool(jnp.isfinite(out.images).all())

    with pytest.raises(ValueError, match="hint"):
        tr.train_step(st, params, lat, ctx, jax.random.PRNGKey(0))


def test_remat_same_loss_less_memory_profile(engine, params, batch):
    """remat=True must not change the math — same loss trajectory as the
    plain step (jax.checkpoint recomputes, never alters, the forward)."""
    lat, ctx = batch
    key = jax.random.PRNGKey(42)
    tr_a = DiffusionTrainer(engine, TrainConfig(learning_rate=1e-3))
    tr_b = DiffusionTrainer(engine, TrainConfig(learning_rate=1e-3, remat=True))
    st_a, st_b = tr_a.init_state(params), tr_b.init_state(params)
    for _ in range(3):
        st_a, m_a = tr_a.train_step(st_a, params, lat, ctx, key)
        st_b, m_b = tr_b.train_step(st_b, params, lat, ctx, key)
        np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                                   rtol=1e-5, atol=1e-6)
    # Parameters advanced to the same place up to Adam's normalization of
    # fp32 recompute noise (updates are lr-scaled ~1e-3; allow a small
    # fraction of that).
    la = jax.tree_util.tree_leaves(st_a.trainable)
    lb = jax.tree_util.tree_leaves(st_b.trainable)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_run_training_prefetch_matches_inline(tmp_path):
    """The overlapped input pipeline (training.prefetch) must produce the
    SAME loss sequence as inline prep — same per-step RNG, same order."""
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
    pf = tmp_path / "prompts.json"
    pf.write_text(json.dumps(prompts))

    base = {
        "experiment": {"seed": 29},
        "model": {"model_name": "stable_diffusion_model", "pretrained_model": "x",
                  "tiny": True, "image_size": 64, "dtype": "float32"},
        "dataset": {"img_dataset": str(img_dir), "prompts": str(pf), "image_size": 64},
        "training": {"num_steps": 4, "batch_size": 2, "log_every": 1,
                     "learning_rate": 1e-3, "lora_rank": 2},
    }
    outs = {}
    for depth in (0, 2):
        cfg = json.loads(json.dumps(base))
        cfg["training"]["prefetch"] = depth
        p = tmp_path / f"train_{depth}.yaml"
        p.write_text(yaml.safe_dump(cfg))
        outs[depth] = run_training(load_config(str(p)))["losses"]
    assert len(outs[0]) == len(outs[2]) >= 4
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-6, atol=1e-7)


def test_run_training_from_config(tmp_path):
    """End-to-end config loop on a synthetic image+caption dataset."""
    import json

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
    pf = tmp_path / "prompts.json"
    pf.write_text(json.dumps(prompts))

    import yaml

    cfg = {
        "experiment": {"seed": 29},
        "model": {"model_name": "stable_diffusion_model", "pretrained_model": "x",
                  "tiny": True, "image_size": 64, "dtype": "float32"},
        "dataset": {"img_dataset": str(img_dir), "prompts": str(pf), "image_size": 64},
        "training": {"num_steps": 4, "batch_size": 2, "log_every": 2,
                     "learning_rate": 1e-3, "lora_rank": 2,
                     "save_dir": str(tmp_path / "ckpt")},
    }
    p = tmp_path / "train.yaml"
    p.write_text(yaml.safe_dump(cfg))
    out = run_training(load_config(str(p)))
    assert len(out["losses"]) >= 1
    assert all(np.isfinite(l) for l in out["losses"])
    assert (tmp_path / "ckpt" / "final" / "lora_peft.npz").exists()

    # Guard: a dataset smaller than the batch is an error, not a silent
    # infinite loop (batched(drop_remainder=True) would yield no batches).
    cfg["training"]["batch_size"] = 64
    p2 = tmp_path / "train_toobig.yaml"
    p2.write_text(yaml.safe_dump(cfg))
    with pytest.raises(ValueError, match="batch_size"):
        run_training(load_config(str(p2)))


# -------------------------------------------------------- flow objective
# Rectified-flow training for the SD3/MMDiT family (Esser et al. 2024):
# x_t = (1-sigma) x0 + sigma eps with sigma = sigmoid(u), u ~ logit-normal;
# the model regresses the velocity eps - x0.


@pytest.fixture(scope="module")
def sd3_engine():
    from sonicdiffusionbayeslab_tpu.models.mmdit import MMDiTConfig
    from sonicdiffusionbayeslab_tpu.models.sampler import SDXLTextConfigs
    from sonicdiffusionbayeslab_tpu.models.sd3 import SD3Engine
    from sonicdiffusionbayeslab_tpu.models.vae import VAEConfig

    return SD3Engine(MMDiTConfig.tiny(), VAEConfig.tiny16(), SDXLTextConfigs.tiny(),
                     dtype=jnp.float32, param_dtype=jnp.float32)


@pytest.fixture(scope="module")
def sd3_params(sd3_engine):
    return sd3_engine.init_params(seed=0, latent_hw=8)


@pytest.fixture(scope="module")
def sd3_batch(sd3_engine):
    cfg = sd3_engine.unet_config
    return (
        jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, cfg.in_channels)),
        jax.random.normal(jax.random.PRNGKey(2), (4, 5, cfg.joint_attention_dim)),
        {"text_embeds": jax.random.normal(
            jax.random.PRNGKey(3), (4, cfg.pooled_projection_dim))},
    )


def _loss_at_step0(tr, st, params, lat, ctx, added, key):
    """Loss on the EXACT step-0 noise/sigma draw (train_step folds state.step
    into the key, so resetting step=0 re-evaluates the same minibatch) —
    the flow objective's per-step logit-normal sigma makes raw step losses
    too noisy for a first-vs-last comparison."""
    from sonicdiffusionbayeslab_tpu.training.trainer import TrainState

    probe = TrainState(step=jnp.zeros((), jnp.int32), trainable=st.trainable,
                       opt_state=st.opt_state, ema=st.ema)
    _, m = tr.train_step(probe, params, lat, ctx, key, added=added)
    return float(m["loss"])


def test_sd3_flow_full_finetune_loss_decreases(sd3_engine, sd3_params, sd3_batch):
    lat, ctx, added = sd3_batch
    key = jax.random.PRNGKey(42)
    tr = DiffusionTrainer(
        sd3_engine, TrainConfig(objective="flow", learning_rate=1e-3, donate=False))
    st = tr.init_state(sd3_params)
    before = _loss_at_step0(tr, st, sd3_params, lat, ctx, added, key)
    losses = []
    for _ in range(8):
        st, m = tr.train_step(st, sd3_params, lat, ctx, key, added=added)
        losses.append(float(m["loss"]))
    after = _loss_at_step0(tr, st, sd3_params, lat, ctx, added, key)
    assert after < before
    assert all(np.isfinite(l) for l in losses)


def test_sd3_lora_flow_covers_both_attention_streams(sd3_engine, sd3_params, sd3_batch):
    from sonicdiffusionbayeslab_tpu.training.lora import MMDIT_TARGETS

    lat, ctx, added = sd3_batch
    tr = DiffusionTrainer(
        sd3_engine,
        TrainConfig(objective="flow", learning_rate=1e-2, lora_rank=2,
                    lora_targets=MMDIT_TARGETS, donate=False),
    )
    st = tr.init_state(sd3_params, key=jax.random.PRNGKey(0))
    flat = {"/".join(str(k) for k in p): None
            for p, _ in jax.tree_util.tree_flatten_with_path(st.trainable)[0]}
    paths = "\n".join(flat)
    # both joint-attention streams get adapters
    for name in ("to_q", "add_q_proj", "to_add_out", "to_out"):
        assert name in paths, f"no adapter on {name}"
    base_before = jax.tree.map(np.asarray, sd3_params["unet"])
    key = jax.random.PRNGKey(7)
    before = _loss_at_step0(tr, st, sd3_params, lat, ctx, added, key)
    losses = []
    for _ in range(6):
        st, m = tr.train_step(st, sd3_params, lat, ctx, key, added=added)
        losses.append(float(m["loss"]))
    after = _loss_at_step0(tr, st, sd3_params, lat, ctx, added, key)
    assert after < before
    assert all(np.isfinite(l) for l in losses)
    # the frozen base is untouched
    jax.tree.map(np.testing.assert_array_equal, base_before,
                 jax.tree.map(np.asarray, sd3_params["unet"]))


def test_flow_objective_guards(sd3_engine):
    with pytest.raises(ValueError, match="snr_gamma"):
        DiffusionTrainer(sd3_engine, TrainConfig(objective="flow", snr_gamma=5.0))
    with pytest.raises(ValueError, match="ControlNet"):
        DiffusionTrainer(
            sd3_engine, TrainConfig(objective="flow", train_target="controlnet"))
    with pytest.raises(ValueError, match="objective"):
        DiffusionTrainer(sd3_engine, TrainConfig(objective="banana"))


def test_run_training_sd3_flow_from_config(tmp_path):
    """End-to-end config loop on the SD3 family: objective defaults to
    flow, tokenizer2 + pooled added_cond plumbing, MMDiT LoRA export."""
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
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            img_dir / f)
        prompts[f] = f"synthetic image {i}"
    pf = tmp_path / "prompts.json"
    pf.write_text(json.dumps(prompts))

    cfg = {
        "experiment": {"seed": 29},
        "model": {"model_name": "stable_diffusion_3_model", "pretrained_model": "x",
                  "tiny": True, "image_size": 64, "dtype": "float32"},
        "dataset": {"img_dataset": str(img_dir), "prompts": str(pf), "image_size": 64},
        "training": {"num_steps": 3, "batch_size": 2, "log_every": 1,
                     "learning_rate": 1e-3, "lora_rank": 2,
                     "save_dir": str(tmp_path / "ckpt")},
    }
    p = tmp_path / "train.yaml"
    p.write_text(yaml.safe_dump(cfg))
    out = run_training(load_config(str(p)))
    assert out["trainer"].config.objective == "flow"  # family default
    assert len(out["losses"]) >= 1
    assert all(np.isfinite(l) for l in out["losses"])
    npz = np.load(tmp_path / "ckpt" / "final" / "lora_peft.npz")
    # peft layout through mmdit_name_map: diffusers-style transformer names
    assert any("lora_A" in k for k in npz.files)

    # distill mode is a UNet-family concept — loud error on MMDiT
    cfg["training"]["mode"] = "distill"
    p2 = tmp_path / "train_distill.yaml"
    p2.write_text(yaml.safe_dump(cfg))
    with pytest.raises(ValueError, match="flow"):
        run_training(load_config(str(p2)))

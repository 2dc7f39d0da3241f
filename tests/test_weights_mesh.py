"""Weight-converter round-trips + mesh sharding on the 8-device CPU mesh."""

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
from sonicdiffusionbayeslab_tpu.parallel import make_mesh, shard_batch, shard_params


@pytest.fixture(scope="module")
def engine():
    return StableDiffusionEngine(
        UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny(),
        dtype=jnp.float32, param_dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def params(engine):
    return engine.init_params(seed=0, latent_hw=8)


@pytest.mark.parametrize("part", ["unet", "vae", "text"])
def test_weight_conversion_round_trip(engine, params, part):
    """Flax tree -> synthetic torch state dict -> Flax tree must be exact:
    validates name mapping coverage and every transpose/reshape transform."""
    if part == "unet":
        nm = W.unet_name_map(engine.unet_config)
    elif part == "vae":
        nm = W.vae_name_map(
            len(engine.vae_config.block_out_channels), engine.vae_config.layers_per_block
        )
    else:
        nm = W.clip_text_name_map(engine.text_config.num_layers)
    tree = jax.tree.map(np.asarray, params[part])
    torch_sd = W.invert(tree, nm)
    back = W.convert(torch_sd, nm, W.flatten(tree).keys())
    flat_a, flat_b = W.flatten(tree), W.flatten(back)
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k], err_msg=k)


def test_convert_reports_missing(engine, params):
    nm = W.unet_name_map(engine.unet_config)
    tree = jax.tree.map(np.asarray, params["unet"])
    sd = W.invert(tree, nm)
    key = next(iter(sd))
    del sd[key]
    with pytest.raises(KeyError, match="missing"):
        W.convert(sd, nm, W.flatten(tree).keys())


def test_mesh_dp_sampling(engine, params):
    """8-way data-parallel UNet forward on the virtual CPU mesh: sharded
    batch in, sharded result out, identical to single-device."""
    mesh = make_mesh(n_data=8, n_model=1)
    x = np.random.default_rng(0).standard_normal((8, 8, 8, 4)).astype(np.float32)
    ctx = np.random.default_rng(1).standard_normal((8, 77, 32)).astype(np.float32)
    t = np.full((8,), 501, np.int32)

    ref = engine.unet.apply({"params": params["unet"]}, x, t, ctx)

    with mesh:
        p = shard_params(params["unet"], mesh)
        xs, ts, ctxs = shard_batch(mesh, x, t, ctx)
        out = jax.jit(lambda p, a, b, c: engine.unet.apply({"params": p}, a, b, c))(
            p, xs, ts, ctxs
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
    assert len(out.sharding.device_set) == 8


def test_mesh_tp_dense_matches_replicated(engine, params):
    """2-way tensor parallel (attention/MLP split) reproduces the replicated
    result — GSPMD inserts the collectives."""
    mesh = make_mesh(n_data=4, n_model=2)
    x = np.random.default_rng(0).standard_normal((4, 8, 8, 4)).astype(np.float32)
    ctx = np.random.default_rng(1).standard_normal((4, 77, 32)).astype(np.float32)
    t = np.full((4,), 501, np.int32)
    ref = engine.unet.apply({"params": params["unet"]}, x, t, ctx)
    with mesh:
        p = shard_params(params["unet"], mesh)
        xs, ts, ctxs = shard_batch(mesh, x, t, ctx)
        out = jax.jit(lambda p, a, b, c: engine.unet.apply({"params": p}, a, b, c))(
            p, xs, ts, ctxs
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_make_mesh_validates():
    with pytest.raises(ValueError, match="devices"):
        make_mesh(n_data=3, n_model=3)


def test_lora_merge_applies_delta(engine, params):
    """Synthetic kohya-layout LoRA on one attention projection and one conv:
    merged tree differs exactly by fwd(up @ down * alpha/rank * scale)."""
    import numpy as np

    nm = W.unet_name_map(engine.unet_config)
    tree = jax.tree.map(np.asarray, params["unet"])
    # Pick a dense target (to_q of the first down attention) and a conv.
    dense_dst = "down_0_attn_0/block_0/attn1/to_q/kernel"
    dense_src = nm[dense_dst][0][: -len(".weight")]
    conv_dst = "down_0_res_0/conv1/kernel"
    conv_src = nm[conv_dst][0][: -len(".weight")]

    rng = np.random.default_rng(0)
    d_out, d_in = tree["down_0_attn_0"]["block_0"]["attn1"]["to_q"]["kernel"].shape[::-1]
    r = 4
    down = rng.standard_normal((r, d_in)).astype(np.float32)
    up = rng.standard_normal((d_out, r)).astype(np.float32)
    kh, kw, c_in, c_out = tree["down_0_res_0"]["conv1"]["kernel"].shape
    cdown = rng.standard_normal((r, c_in, kh, kw)).astype(np.float32)
    cup = rng.standard_normal((c_out, r, 1, 1)).astype(np.float32)

    sd = {
        f"lora_unet_{dense_src.replace('.', '_')}.lora_down.weight": down,
        f"lora_unet_{dense_src.replace('.', '_')}.lora_up.weight": up,
        f"lora_unet_{dense_src.replace('.', '_')}.alpha": np.float32(8.0),
        f"unet.{conv_src}.lora_A.weight": cdown,
        f"unet.{conv_src}.lora_B.weight": cup,
    }
    merged = W.merge_lora(tree, sd, nm, scale=0.5)

    want_dense = tree["down_0_attn_0"]["block_0"]["attn1"]["to_q"]["kernel"] + (
        (up @ down) * (8.0 / r) * 0.5
    ).T
    got_dense = merged["down_0_attn_0"]["block_0"]["attn1"]["to_q"]["kernel"]
    np.testing.assert_allclose(got_dense, want_dense, rtol=1e-5)

    # peft layout has no alpha entry -> alpha defaults to rank (factor 1).
    delta_conv = np.einsum("or,rikl->oikl", cup[:, :, 0, 0], cdown) * 0.5
    want_conv = tree["down_0_res_0"]["conv1"]["kernel"] + np.transpose(delta_conv, (2, 3, 1, 0))
    np.testing.assert_allclose(merged["down_0_res_0"]["conv1"]["kernel"], want_conv, rtol=1e-5)

    with pytest.raises(KeyError, match="no LoRA"):
        W.merge_lora(tree, {"bogus": np.zeros(1)}, nm)


def test_engine_sample_on_mesh(engine, params):
    """engine.sample(mesh=...): 8-way DP sampling equals single-device."""
    import jax.numpy as jnp

    from sonicdiffusionbayeslab_tpu.models.tokenizer import HashTokenizer
    from sonicdiffusionbayeslab_tpu.schedulers import DPMSolverScheduler

    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    plan = DPMSolverScheduler(solver_order=2).build_plan(3)
    prompts = [f"prompt {i}" for i in range(8)]
    emb = engine.encode_prompts(params, tok(prompts))
    neg = engine.encode_prompts(params, tok([""] * 8))
    key = jax.random.PRNGKey(29)

    ref = engine.sample(params, plan, emb, neg, key, latent_hw=(8, 8))
    mesh = make_mesh(n_data=8, n_model=1)
    with mesh:
        p = shard_params(params, mesh)
        out = engine.sample(p, plan, emb, neg, key, latent_hw=(8, 8), mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(out.images), np.asarray(ref.images), atol=2e-4
    )
    with pytest.raises(ValueError, match="divisible"):
        engine.sample(params, plan, emb[:3], neg[:3], key, latent_hw=(8, 8), mesh=mesh)


def test_clip_dual_conversion_round_trip(tmp_path):
    """CLIPDualEncoder (vision+text+projections) <-> HF CLIPModel layout,
    exact round trip, plus the snapshot-dir loader and backend wiring."""
    import torch

    from sonicdiffusionbayeslab_tpu.models.clip_vision import CLIPDualEncoder, CLIPVisionConfig

    vcfg, tcfg = CLIPVisionConfig.tiny(), CLIPTextConfig.tiny()
    model = CLIPDualEncoder(vcfg, tcfg, projection_dim=16)
    px = jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3))
    ids = jnp.zeros((1, tcfg.max_length), jnp.int32)
    tree = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(0), px, ids)["params"])

    nm = W.clip_dual_name_map(vcfg.num_layers, tcfg.num_layers)
    torch_sd = W.invert(tree, nm)
    assert "vision_model.pre_layrnorm.weight" in torch_sd  # HF's spelling
    back = W.convert(torch_sd, nm, W.flatten(tree).keys())
    flat_a, flat_b = W.flatten(tree), W.flatten(back)
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k], err_msg=k)

    # Snapshot-dir loader path (pytorch_model.bin).
    torch.save({k: torch.tensor(v) for k, v in torch_sd.items()},
               tmp_path / "pytorch_model.bin")
    loaded = W.load_clip_checkpoint(
        tmp_path, tree, vision_layers=vcfg.num_layers, text_layers=tcfg.num_layers
    )
    for k, v in W.flatten(loaded).items():
        np.testing.assert_array_equal(v, flat_a[k], err_msg=k)


def test_clip_backend_loads_snapshot(tmp_path):
    """_ClipBackend._try_load picks up a torch snapshot dir end-to-end."""
    import torch

    from sonicdiffusionbayeslab_tpu.metrics.metrics import _ClipBackend
    from sonicdiffusionbayeslab_tpu.models.clip_vision import CLIPDualEncoder, CLIPVisionConfig

    vcfg, tcfg = CLIPVisionConfig.tiny(), CLIPTextConfig.tiny()
    model = CLIPDualEncoder(vcfg, tcfg, projection_dim=16)
    px = jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3))
    ids = jnp.zeros((1, tcfg.max_length), jnp.int32)
    tree = jax.tree.map(
        np.asarray, model.init(jax.random.PRNGKey(7), px, ids)["params"])
    nm = W.clip_dual_name_map(vcfg.num_layers, tcfg.num_layers)
    torch.save({k: torch.tensor(v) for k, v in W.invert(tree, nm).items()},
               tmp_path / "pytorch_model.bin")

    backend = _ClipBackend(str(tmp_path), tiny=True)
    got = W.flatten(jax.tree.map(np.asarray, backend.params))
    want = W.flatten(tree)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_engine_sample_seq_parallel(engine, params):
    """('data','seq','model') = (2,2,2): context-parallel latent-height
    sharding composed with DP and TP reproduces the single-device images
    (GSPMD halo exchange for convs, gathers for attention)."""
    from sonicdiffusionbayeslab_tpu.models.tokenizer import HashTokenizer
    from sonicdiffusionbayeslab_tpu.schedulers import DPMSolverScheduler

    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    plan = DPMSolverScheduler(solver_order=2).build_plan(3)
    prompts = [f"prompt {i}" for i in range(4)]
    emb = engine.encode_prompts(params, tok(prompts))
    neg = engine.encode_prompts(params, tok([""] * 4))
    key = jax.random.PRNGKey(29)

    ref = engine.sample(params, plan, emb, neg, key, latent_hw=(8, 8))
    mesh = make_mesh(n_data=2, n_model=2, n_seq=2)
    assert mesh.shape == {"data": 2, "seq": 2, "model": 2}
    with mesh:
        p = shard_params(params, mesh)
        out = engine.sample(p, plan, emb, neg, key, latent_hw=(8, 8), mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(out.images), np.asarray(ref.images), atol=2e-4
    )


def test_fused_qkv_conversion_and_lora_match_separate(engine, params, monkeypatch):
    """SDBL_FUSED_QKV=1 param tree: converting the same torch state dict into
    the fused tree gives bit-identical forwards to the separate tree, and a
    LoRA targeting to_q/to_k/to_v lands in the right fused columns."""
    nm = W.unet_name_map(engine.unet_config)
    sep_tree = jax.tree.map(np.asarray, params["unet"])
    torch_sd = W.invert(sep_tree, nm)

    monkeypatch.setenv("SDBL_FUSED_QKV", "1")
    fused_ref = engine.unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, 32)),
    )["params"]
    fused = W.convert(torch_sd, nm, W.flatten(fused_ref).keys())

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 4)), jnp.float32)
    t = jnp.array([501.0, 501.0])
    ctx = jnp.asarray(np.random.default_rng(1).standard_normal((2, 77, 32)), jnp.float32)
    out_fused = engine.unet.apply({"params": fused}, x, t, ctx)
    monkeypatch.delenv("SDBL_FUSED_QKV")
    out_sep = engine.unet.apply({"params": sep_tree}, x, t, ctx)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_sep),
                               rtol=1e-5, atol=1e-5)

    # LoRA on to_k: separate merge and fused merge must agree on the slice.
    rng = np.random.default_rng(2)
    k_src = "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_k"
    kern = sep_tree["down_0_attn_0"]["block_0"]["attn1"]["to_k"]["kernel"]
    d_in, d_out = kern.shape
    r = 4
    down = rng.standard_normal((r, d_in)).astype(np.float32)
    up = rng.standard_normal((d_out, r)).astype(np.float32)
    sd = {f"unet.{k_src}.lora_A.weight": down, f"unet.{k_src}.lora_B.weight": up}

    merged_sep = W.merge_lora(sep_tree, sd, nm)
    merged_fused = W.merge_lora(jax.tree.map(np.asarray, fused), sd, nm)
    got = merged_fused["down_0_attn_0"]["block_0"]["attn1"]["to_qkv"]["kernel"][:, d_out:2 * d_out]
    want = merged_sep["down_0_attn_0"]["block_0"]["attn1"]["to_k"]["kernel"]
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # q slice untouched.
    np.testing.assert_array_equal(
        merged_fused["down_0_attn_0"]["block_0"]["attn1"]["to_qkv"]["kernel"][:, :d_out],
        np.asarray(fused["down_0_attn_0"]["block_0"]["attn1"]["to_qkv"]["kernel"])[:, :d_out],
    )


def test_pipeline_level_mesh_matches_single_device():
    """mesh_data in the MODEL CONFIG section runs the whole pipeline
    (params sharded at load, every call batch-sharded) and matches the
    single-device pipeline bit-for-bit on the same seed."""
    from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry
    from sonicdiffusionbayeslab_tpu.schedulers import DPMSolverScheduler

    load_all_plugins()
    kw = dict(pretrained_model="x", tiny=True, image_size=64, dtype="float32")
    single = models_registry["stable_diffusion_model"](**kw)
    single.scheduler = DPMSolverScheduler(solver_order=2)
    meshy = models_registry["stable_diffusion_model"](**kw, mesh_data=8)
    meshy.scheduler = DPMSolverScheduler(solver_order=2)
    assert meshy.mesh is not None and meshy.mesh.shape["data"] == 8

    prompts = [f"prompt {i}" for i in range(8)]
    key = jax.random.PRNGKey(29)
    img_a, _, _ = single(prompts, num_inference_steps=3, guidance_scale=5.0, key=key)
    img_b, _, _ = meshy(prompts, num_inference_steps=3, guidance_scale=5.0, key=key)
    np.testing.assert_allclose(img_a, img_b, rtol=2e-4, atol=2e-4)

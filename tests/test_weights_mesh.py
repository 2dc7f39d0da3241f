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

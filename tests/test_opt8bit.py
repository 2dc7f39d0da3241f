"""Blockwise 8-bit AdamW (training/opt8bit.py): quantizer fidelity, Adam
parity on a convex problem, state-size claim, and trainer integration."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sonicdiffusionbayeslab_tpu.training.opt8bit import (
    BLOCK,
    _dequantize,
    _dynamic_code,
    _quantize,
    adamw8bit,
    scale_by_adam8bit,
)


def test_dynamic_code_shape_and_coverage():
    for signed in (True, False):
        code = _dynamic_code(signed)
        assert code.shape == (256,)
        assert np.all(np.diff(code) > 0)  # strictly sorted (searchsorted contract)
        assert 0.0 in code  # exact zero representable
        assert code.max() == pytest.approx(1.0)
        if signed:
            assert code.min() == pytest.approx(-1.0)
        else:
            assert code.min() == 0.0


@pytest.mark.parametrize("signed", [True, False])
def test_quantize_roundtrip_error(signed):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 700)).astype(np.float32)  # non-multiple of BLOCK
    if not signed:
        x = np.abs(x)
    xq = jnp.asarray(x)
    codes, scales = _quantize(xq, signed)
    back = np.asarray(_dequantize(codes, scales, signed, x.shape, x.size))
    assert back.shape == x.shape
    # dynamic code: relative error small for large entries, absolute error
    # bounded by the code's resolution near zero
    big = np.abs(x) > 0.1 * np.abs(x).max()
    rel = np.abs(back[big] - x[big]) / np.abs(x[big])
    assert np.median(rel) < 0.05
    assert np.max(np.abs(back - x)) < 0.25 * np.abs(x).max()


def test_zero_block_roundtrips_exactly():
    x = jnp.zeros((BLOCK * 2,), jnp.float32)
    codes, scales = _quantize(x, True)
    back = _dequantize(codes, scales, True, x.shape, x.size)
    np.testing.assert_array_equal(np.asarray(back), 0.0)


def test_adam8bit_tracks_fp32_adam_on_convex_problem():
    """Same trajectory as optax.adam to within quantization noise: a
    quadratic bowl in 5000 dims reaches the same loss decade."""
    rng = np.random.default_rng(1)
    target = jnp.asarray(rng.normal(size=(5000,)), jnp.float32)

    def loss_fn(p):
        return jnp.mean((p - target) ** 2)

    losses = {}
    for name, tx in [("fp32", optax.adam(0.05)),
                     ("8bit", optax.chain(scale_by_adam8bit(),
                                          optax.scale_by_learning_rate(0.05)))]:
        p = jnp.zeros((5000,), jnp.float32)
        st = tx.init(p)

        @jax.jit
        def step(p, st, tx=tx):
            g = jax.grad(loss_fn)(p)
            u, st = tx.update(g, st, p)
            return optax.apply_updates(p, u), st

        for _ in range(60):
            p, st = step(p, st)
        losses[name] = float(loss_fn(p))
    assert losses["8bit"] < losses["fp32"] * 3 + 1e-4
    assert losses["8bit"] < 0.05  # actually converging, not just "close"


def test_state_is_one_byte_per_param_per_moment():
    p = {"w": jnp.zeros((BLOCK * 4,), jnp.float32),
         "b": jnp.zeros((100,), jnp.float32)}  # padding case
    tx = scale_by_adam8bit()
    st = tx.init(p)
    total_param = sum(x.size for x in jax.tree.leaves(p))
    code_bytes = sum(x.size for x in jax.tree.leaves(st.leaves)
                     if x.dtype == jnp.uint8)
    scale_floats = sum(x.size for x in jax.tree.leaves(st.leaves)
                       if x.dtype == jnp.float32)
    # 2 moment trees, padded to BLOCK
    assert code_bytes <= 2 * (total_param + 2 * BLOCK)
    assert scale_floats <= code_bytes // BLOCK + 4
    # vs fp32 adam: 8 bytes/param -> ~4x smaller (toy leaves pad to BLOCK;
    # real UNet leaves are ~1e5-1e7 elements so padding is negligible)
    padded = sum((x.size + BLOCK - 1) // BLOCK * BLOCK
                 for x in jax.tree.leaves(p))
    assert code_bytes == 2 * padded
    assert code_bytes + 4 * scale_floats < 0.35 * (8 * total_param)


def test_trainer_integration_adamw8bit():
    """TrainConfig(optimizer='adamw8bit'): full fine-tune loss decreases on
    the tiny engine, and the opt state carries uint8 moments."""
    from sonicdiffusionbayeslab_tpu.models import (
        CLIPTextConfig,
        StableDiffusionEngine,
        UNetConfig,
        VAEConfig,
    )
    from sonicdiffusionbayeslab_tpu.training.trainer import (
        DiffusionTrainer,
        TrainConfig,
    )

    eng = StableDiffusionEngine(
        UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny(),
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    prm = eng.init_params(seed=0, latent_hw=8)
    lat = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (4, 77, 32))

    tr = DiffusionTrainer(eng, TrainConfig(learning_rate=1e-3,
                                           optimizer="adamw8bit"))
    st = tr.init_state(prm)
    dtypes = {x.dtype for x in jax.tree.leaves(st.opt_state)
              if hasattr(x, "dtype")}
    assert np.dtype(np.uint8) in dtypes
    losses = []
    for _ in range(8):
        st, m = tr.train_step(st, prm, lat, ctx, jax.random.PRNGKey(42))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(l) for l in losses)

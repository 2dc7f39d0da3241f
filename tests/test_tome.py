"""Token Merging (ops/tome.py) — op-level invariants + engine integration.

ToMe is the beyond-reference approximate acceleration method (Bolya &
Hoffman, ToMeSD 2023) registered alongside DeepCache.  The op tests pin
the matching/merge/unmerge math; the engine tests pin composition with
the scan sampler, CFG shared prefix and micro-batching.
"""

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
from sonicdiffusionbayeslab_tpu.models.tokenizer import HashTokenizer
from sonicdiffusionbayeslab_tpu.ops.tome import TomeConfig, bipartite_soft_matching_2d
from sonicdiffusionbayeslab_tpu.schedulers import DPMSolverScheduler


# ------------------------------------------------------------------ op level


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape), jnp.float32)


def test_merge_unmerge_shapes():
    B, h, w, C = 2, 8, 8, 16
    x = _rand((B, h * w, C))
    cfg = TomeConfig(ratio=0.5)
    r = cfg.r_for(h, w)
    assert r == 32  # min(64*0.5, 64 - 16 dst)
    m, u = bipartite_soft_matching_2d(x, h, w, cfg, jax.random.PRNGKey(1))
    y = m(x)
    assert y.shape == (B, h * w - r, C)
    assert u(y).shape == (B, h * w, C)


def test_ratio_capped_at_src_count():
    # ratio so large every src merges; never exceeds N - n_dst.
    cfg = TomeConfig(ratio=0.95, sx=2, sy=2)
    assert cfg.r_for(8, 8) == 64 - 16


def test_constant_tokens_roundtrip_exact():
    """All-identical tokens: merging averages identical rows, unmerge must
    reproduce the input bit-for-bit (mean of equals is the same value)."""
    B, h, w, C = 2, 8, 8, 8
    x = jnp.full((B, h * w, C), 3.25)
    cfg = TomeConfig(ratio=0.5)
    m, u = bipartite_soft_matching_2d(x, h, w, cfg, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(u(m(x))), np.asarray(x), atol=1e-6)


def test_kept_tokens_pass_through_exactly():
    """Merge->unmerge is the identity on every KEPT source token (merged
    sources take their destination's average; destinations receiving a
    merge change too — only the n_src - r kept sources are guaranteed)."""
    B, h, w, C = 1, 8, 8, 4
    x = _rand((B, h * w, C), seed=3)
    cfg = TomeConfig(ratio=0.25)
    r = cfg.r_for(h, w)
    n_dst = (h // cfg.sy) * (w // cfg.sx)
    n_src = h * w - n_dst
    m, u = bipartite_soft_matching_2d(x, h, w, cfg, jax.random.PRNGKey(3))
    z = np.asarray(u(m(x)))
    exact = (np.abs(z - np.asarray(x)).max(axis=-1) < 1e-6).sum()
    assert exact >= B * (n_src - r)
    assert np.isfinite(z).all()


def test_merged_sources_take_destination_value():
    """After unmerge, every token equals one of the merged token set's rows
    (sources read their destination's row — no new values invented)."""
    B, h, w, C = 1, 4, 4, 4
    x = _rand((B, h * w, C), seed=4)
    cfg = TomeConfig(ratio=0.5, rand=False)
    m, u = bipartite_soft_matching_2d(x, h, w, cfg, None)
    y = np.asarray(m(x))[0]  # [N-r, C]
    z = np.asarray(u(m(x)))[0]  # [N, C]
    for row in z:
        assert np.abs(y - row).max(axis=-1).min() < 1e-6


def test_rand_key_changes_partition_deterministically():
    B, h, w, C = 1, 8, 8, 8
    x = _rand((B, h * w, C), seed=5)
    cfg = TomeConfig(ratio=0.5, rand=True)
    m1, _ = bipartite_soft_matching_2d(x, h, w, cfg, jax.random.PRNGKey(10))
    m2, _ = bipartite_soft_matching_2d(x, h, w, cfg, jax.random.PRNGKey(10))
    m3, _ = bipartite_soft_matching_2d(x, h, w, cfg, jax.random.PRNGKey(11))
    np.testing.assert_array_equal(np.asarray(m1(x)), np.asarray(m2(x)))
    assert not np.array_equal(np.asarray(m1(x)), np.asarray(m3(x)))


def test_indivisible_map_is_skipped_in_transformer():
    """SpatialTransformer silently disables ToMe when H/W don't divide the
    stride (partition undefined) — output matches the tome=None path."""
    from sonicdiffusionbayeslab_tpu.models.layers import SpatialTransformer

    st = SpatialTransformer(num_heads=2, head_dim=4)
    x = _rand((1, 7, 6, 8), seed=6)  # H=7 not divisible by sy=2
    ctx = _rand((1, 5, 8), seed=7)
    params = st.init(jax.random.PRNGKey(0), x, ctx)["params"]
    base = st.apply({"params": params}, x, ctx)
    tm = st.apply({"params": params}, x, ctx, tome=TomeConfig(0.5),
                  tome_key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(tm), np.asarray(base), atol=1e-6)


def test_config_hashable_and_validated():
    assert hash(TomeConfig(0.5)) == hash(TomeConfig(0.5))
    assert TomeConfig(0.5) == TomeConfig(0.5)
    assert TomeConfig(0.5) != TomeConfig(0.4)
    with pytest.raises(ValueError):
        TomeConfig(ratio=1.0)
    with pytest.raises(ValueError):
        TomeConfig(ratio=0.0)


# ------------------------------------------------------------ engine level


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
def embeds(engine, params):
    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    pos = engine.encode_prompts(params, tok(["a cat", "a dog"]))
    neg = engine.encode_prompts(params, tok(["", ""]))
    return pos, neg


def _sample(engine, params, embeds, **kw):
    plan = DPMSolverScheduler(solver_order=2).build_plan(4)
    pos, neg = embeds
    return engine.sample(
        params, plan, pos, neg, jax.random.PRNGKey(7), latent_hw=(8, 8),
        guidance_scale=7.5, **kw,
    )


def test_sampler_tome_runs_and_differs(engine, params, embeds):
    base = _sample(engine, params, embeds)
    tm = _sample(engine, params, embeds, tome=0.4)
    assert tm.images.shape == base.images.shape
    assert np.isfinite(np.asarray(tm.images)).all()
    # approximate method: output differs from the exact path
    assert not np.allclose(np.asarray(tm.images), np.asarray(base.images))


def test_sampler_tome_deterministic(engine, params, embeds):
    a = _sample(engine, params, embeds, tome=0.4)
    b = _sample(engine, params, embeds, tome=0.4)
    np.testing.assert_array_equal(np.asarray(a.images), np.asarray(b.images))


def test_sampler_tome_accepts_config_and_env(engine, params, embeds, monkeypatch):
    cfg = TomeConfig(ratio=0.4)
    a = _sample(engine, params, embeds, tome=cfg)
    b = _sample(engine, params, embeds, tome=0.4)
    np.testing.assert_array_equal(np.asarray(a.images), np.asarray(b.images))
    monkeypatch.setenv("SDBL_TOME_RATIO", "0.4")
    c = _sample(engine, params, embeds)
    np.testing.assert_array_equal(np.asarray(c.images), np.asarray(a.images))


def test_tome_composes_with_cfg_prefix(engine, params, embeds, monkeypatch):
    """cfg_prefix is exact dedup, so tome+prefix == tome alone."""
    base = _sample(engine, params, embeds, tome=0.4)
    monkeypatch.setenv("SDBL_CFG_PREFIX", "1")
    pfx = _sample(engine, params, embeds, tome=0.4)
    np.testing.assert_allclose(
        np.asarray(pfx.images), np.asarray(base.images), atol=2e-4
    )


def test_tome_composes_with_microbatch(engine, params, embeds, monkeypatch):
    base = _sample(engine, params, embeds, tome=0.4)
    monkeypatch.setenv("SDBL_UNET_MICROBATCH", "2")
    mb = _sample(engine, params, embeds, tome=0.4)
    np.testing.assert_allclose(
        np.asarray(mb.images), np.asarray(base.images), atol=2e-4
    )


def test_tome_share_and_metric_channel_knobs(engine, params, embeds):
    """share=False (per-block matching, official ToMeSD semantics) and
    metric_channels=0 (full-C similarity) both run; both are approximate
    variants so they differ from the shared/subsampled default."""
    default = _sample(engine, params, embeds, tome=TomeConfig(ratio=0.4))
    per_block = _sample(engine, params, embeds,
                        tome=TomeConfig(ratio=0.4, share=False))
    full_c = _sample(engine, params, embeds,
                     tome=TomeConfig(ratio=0.4, metric_channels=0))
    for out in (per_block, full_c):
        assert out.images.shape == default.images.shape
        assert np.isfinite(np.asarray(out.images)).all()


def test_tome_closure_tiles_to_batch_multiples():
    """Closures built at batch B apply at 2B by tiling their index maps
    (the CFG shared-prefix path) — each half gets the same matching."""
    B, h, w, C = 2, 8, 8, 8
    x = _rand((B, h * w, C), seed=8)
    m, u = bipartite_soft_matching_2d(x, h, w, TomeConfig(0.5),
                                      jax.random.PRNGKey(4))
    x2 = jnp.concatenate([x, x], axis=0)
    y2 = m(x2)
    assert y2.shape[0] == 2 * B
    np.testing.assert_allclose(np.asarray(y2[:B]), np.asarray(m(x)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(y2[B:]), np.asarray(m(x)), atol=1e-6)
    z2 = u(y2)
    np.testing.assert_allclose(np.asarray(z2[:B]), np.asarray(z2[B:]), atol=1e-6)


def test_tome_method_registered():
    from sonicdiffusionbayeslab_tpu.registry import methods_registry
    import sonicdiffusionbayeslab_tpu.experiments.methods  # noqa: F401

    assert "tome" in methods_registry

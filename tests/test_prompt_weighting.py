"""Prompt emphasis syntax: parser semantics, id/weight alignment, embedding
renormalization, plain-prompt bit-identity, pipeline e2e."""

import numpy as np
import pytest

from sonicdiffusionbayeslab_tpu.models.prompt_weighting import (
    ROUND_FACTOR,
    apply_prompt_weights,
    batch_weighted_ids,
    parse_segments,
    weighted_ids,
)
from sonicdiffusionbayeslab_tpu.models.tokenizer import HashTokenizer


def test_parse_plain():
    assert parse_segments("a cat on a mat") == [("a cat on a mat", 1.0)]


def test_parse_emphasis_and_weights():
    segs = parse_segments("a (cat) and a ((dog)) plus (bird:1.5) minus [fish]")
    d = {t.strip(): w for t, w in segs if t.strip()}
    assert abs(d["cat"] - ROUND_FACTOR) < 1e-9
    assert abs(d["dog"] - ROUND_FACTOR**2) < 1e-9
    assert abs(d["bird"] - 1.5) < 1e-9
    assert abs(d["fish"] - 1.0 / ROUND_FACTOR) < 1e-9


def test_parse_escapes_and_unclosed():
    assert parse_segments(r"a \(literal\) x") == [("a (literal) x", 1.0)]
    # Unclosed bracket applies to the rest (A1111 behavior).
    segs = parse_segments("a (cat and dog")
    d = {t.strip(): w for t, w in segs if t.strip()}
    assert abs(d["cat and dog"] - ROUND_FACTOR) < 1e-9
    # Nested explicit weight overrides only its own span's 1.1.
    segs = parse_segments("(a (b:2.0) c)")
    d = {t.strip(): w for t, w in segs if t.strip()}
    assert abs(d["b"] - 2.0 * ROUND_FACTOR) < 1e-9
    assert abs(d["a"] - ROUND_FACTOR) < 1e-9


def test_parse_literal_colon_paren_and_dot_weights():
    # ':3)' with no open paren is a literal smiley, not a whole-prompt x3.
    segs = parse_segments("a smiley :3) on a wall")
    assert all(abs(w - 1.0) < 1e-9 for _, w in segs)
    assert "".join(t for t, _ in segs) == "a smiley :3) on a wall"
    # Leading-dot weights are legal A1111 syntax.
    d = {t.strip(): w for t, w in parse_segments("(cat:.5)") if t.strip()}
    assert abs(d["cat"] - 0.5) < 1e-9
    # Unparsable weight stays literal (and the open paren still closes late).
    segs = parse_segments("(cat:1.2.3)")
    joined = "".join(t for t, _ in segs)
    assert ":1.2.3)" in joined


def test_weighted_ids_align_with_plain_tokenization():
    tok = HashTokenizer(vocab_size=1000)
    plain = tok(["a cat on a mat"])[0]
    ids, w = weighted_ids(tok, "a cat on a mat")
    np.testing.assert_array_equal(np.asarray(ids), plain[: len(ids)])
    assert all(x == 1.0 for x in w)

    ids2, w2 = weighted_ids(tok, "a (cat:1.5) on a mat")
    # Same ids as the plain prompt; only weights differ.
    np.testing.assert_array_equal(np.asarray(ids2), plain[: len(ids2)])
    assert abs(w2[2] - 1.5) < 1e-9  # bos, 'a', 'cat'
    assert w2[1] == 1.0 and w2[3] == 1.0


def test_apply_weights_preserves_mean_and_scales():
    rng = np.random.default_rng(0)
    states = rng.standard_normal((2, 8, 16)).astype(np.float32) + 0.3
    w = np.ones((2, 8), np.float32)
    w[0, 3] = 2.0
    out = np.asarray(apply_prompt_weights(states, w))
    np.testing.assert_allclose(out.mean(axis=(1, 2)), states.mean(axis=(1, 2)), rtol=1e-5)
    assert not np.allclose(out[0], states[0])
    np.testing.assert_allclose(out[1], states[1], rtol=1e-5)  # all-1 row: rescale is identity


def test_pipeline_weighting_e2e():
    from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry
    from sonicdiffusionbayeslab_tpu.schedulers import EulerScheduler

    load_all_plugins()
    pipe = models_registry["stable_diffusion_model"](
        pretrained_model="x", tiny=True, image_size=64, dtype="float32",
        prompt_weighting=True,
    )
    pipe.scheduler = EulerScheduler()
    import jax

    key = jax.random.PRNGKey(29)
    plain, _, _ = pipe(["a cat on a mat"], num_inference_steps=2, guidance_scale=5.0, key=key)
    same, _, _ = pipe(["a cat on a mat"], num_inference_steps=2, guidance_scale=5.0, key=key)
    np.testing.assert_array_equal(plain, same)  # no-syntax path is bit-stable
    emph, _, _ = pipe(["a (cat:1.8) on a mat"], num_inference_steps=2,
                      guidance_scale=5.0, key=key)
    assert np.isfinite(emph).all()
    assert np.abs(emph - plain).max() > 1e-6  # emphasis steers the result

    # Off by default: literal parens in reference captions stay literal.
    off = models_registry["stable_diffusion_model"](
        pretrained_model="x", tiny=True, image_size=64, dtype="float32"
    )
    off.scheduler = EulerScheduler()
    a, _, _ = off(["a cat (on a mat)"], num_inference_steps=2, guidance_scale=5.0, key=key)
    assert np.isfinite(a).all() and not off.prompt_weighting


def test_batch_weighted_ids_padding():
    tok = HashTokenizer(vocab_size=1000)
    ids, w = batch_weighted_ids(tok, ["a cat", "a (dog:1.2)"])
    assert ids.shape == (2, 77) and w.shape == (2, 77)
    assert (ids[:, -1] == tok.eos).all()
    assert w[0].max() == 1.0 and abs(w[1].max() - 1.2) < 1e-9

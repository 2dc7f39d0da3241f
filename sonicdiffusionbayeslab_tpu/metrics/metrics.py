"""Metric implementations (reference surface: src/metrics/metrics.py:25-131)."""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sonicdiffusionbayeslab_tpu.metrics.frechet import StreamingMoments, frechet_distance
from sonicdiffusionbayeslab_tpu.parallel.distributed import all_sum_array, all_sum_scalar
from sonicdiffusionbayeslab_tpu.registry import metrics_registry


class Metric:
    """update()/compute()/reset() protocol (torchmetrics-style).

    compute() reduces each metric's sufficient statistics across JAX
    processes (all_sum_*, identity single-process) so multi-host validation
    reports global numbers — the reference declared torchmetrics
    ``dist_reduce_fx='sum'`` states but never ran distributed (SURVEY §2.3).
    Reductions go into locals, never back into state, so compute() stays
    idempotent.
    """

    def update(self, *a, **k):  # pragma: no cover - interface
        raise NotImplementedError

    def compute(self):  # pragma: no cover - interface
        raise NotImplementedError

    def reset(self):  # pragma: no cover - interface
        raise NotImplementedError


@metrics_registry.add_to_registry("time_metric")
class TimeMetric(Metric):
    """sec/image = sum(denoise-loop seconds) / sum(batch sizes).

    Exact reference semantics (metrics.py:115-131 fed from
    base_experiment.py:161): update(inference_time, batch_size).
    """

    def __init__(self):
        self.reset()

    def update(self, inference_time: float, batch_size: int) -> None:
        self.time_sum += float(inference_time)
        self.images += int(batch_size)

    def compute(self) -> float:
        t = all_sum_scalar(self.time_sum)
        n = all_sum_scalar(self.images)
        return t / max(n, 1)

    def reset(self) -> None:
        self.time_sum = 0.0
        self.images = 0


class _ClipBackend:
    """Shared CLIP dual-encoder + jitted scoring fns (lazy singleton per
    (config, checkpoint) so clip_score / fid / image_reward reuse it)."""

    def __init__(self, model_name_or_path: Optional[str] = None, tiny: bool = False,
                 geometry: str = "b16"):
        import jax

        from sonicdiffusionbayeslab_tpu.models.clip_text import CLIPTextConfig
        from sonicdiffusionbayeslab_tpu.models.clip_vision import (
            CLIP_B16_TEXT,
            CLIPDualEncoder,
            CLIPVisionConfig,
        )
        from sonicdiffusionbayeslab_tpu.models.tokenizer import load_tokenizer

        if tiny:
            vcfg = CLIPVisionConfig.tiny()
            tcfg = CLIPTextConfig.tiny()
            proj = 16
        elif geometry == "l14":
            # openai/clip-vit-large-patch14: the aesthetic predictor's
            # embedding space (its text tower is SD-1.5's, projection 768).
            vcfg, tcfg, proj = CLIPVisionConfig.vit_l14(), CLIPTextConfig.sd15(), 768
        else:
            vcfg, tcfg, proj = CLIPVisionConfig(), CLIP_B16_TEXT, 512
        self.model = CLIPDualEncoder(vcfg, tcfg, projection_dim=proj)
        self.tokenizer = load_tokenizer(model_name_or_path, tcfg.vocab_size, tcfg.max_length)
        px = jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3))
        ids = jnp.zeros((1, tcfg.max_length), jnp.int32)
        self.params = self.model.init(jax.random.PRNGKey(0), px, ids)["params"]
        if model_name_or_path:
            self._try_load(model_name_or_path)

        self.score_fn = jax.jit(
            lambda p, px, ids: self.model.apply({"params": p}, px, ids)
        )
        self.embed_image_fn = jax.jit(
            lambda p, px: self.model.apply({"params": p}, px, method=self.model.embed_image)
        )

    def _try_load(self, path: str) -> None:
        """Load converted CLIP weights from a local snapshot if present."""
        from pathlib import Path

        p = Path(path)
        if not p.exists():
            return  # hub model-id string with no local snapshot: keep random init
        ckpt = p / "flax_params"
        if ckpt.exists():  # pre-converted orbax cache
            from sonicdiffusionbayeslab_tpu.models.weights import load_params

            self.params = load_params(ckpt)
            return
        from sonicdiffusionbayeslab_tpu.models.weights import load_clip_checkpoint

        self.params = load_clip_checkpoint(
            p, self.params,
            vision_layers=self.model.vision_config.num_layers,
            text_layers=self.model.text_config.num_layers,
        )

    def scores(self, images: np.ndarray, prompts: Sequence[str]) -> np.ndarray:
        ids = self.tokenizer(list(prompts))
        return np.asarray(self.score_fn(self.params, jnp.asarray(images), jnp.asarray(ids)))

    def image_features(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(self.embed_image_fn(self.params, jnp.asarray(images)))


@functools.lru_cache(maxsize=4)
def _clip_backend_cached(model_name_or_path: Optional[str], tiny: bool,
                         geometry: str) -> _ClipBackend:
    return _ClipBackend(model_name_or_path, tiny, geometry)


def _clip_backend(model_name_or_path: Optional[str], tiny: bool,
                  geometry: str = "b16") -> _ClipBackend:
    # tiny ignores geometry — normalize the cache key so tiny sweeps with
    # aesthetic_score + clip_score share one backend.
    return _clip_backend_cached(model_name_or_path, tiny, "b16" if tiny else geometry)


@metrics_registry.add_to_registry("clip_score")
class ClipScoreMetric(Metric):
    """Mean CLIP score over (image, prompt) pairs (reference metrics.py:25-41)."""

    def __init__(self, model_name_or_path: str = "openai/clip-vit-base-patch16", tiny: bool = False):
        self.backend = _clip_backend(model_name_or_path, tiny)
        self.reset()

    def update(self, images: np.ndarray, prompts: Sequence[str]) -> None:
        """images: [N, H, W, 3] float in [0, 1]."""
        s = self.backend.scores(images, prompts)
        self.score_sum += float(s.sum())
        self.n += len(s)

    # Reference helper name (metrics.py calc_metric): batch convenience.
    def calc_metric(self, images, prompts) -> float:
        self.update(images, prompts)
        return self.compute()

    def compute(self) -> float:
        s = all_sum_scalar(self.score_sum)
        n = all_sum_scalar(self.n)
        return s / max(n, 1)

    def reset(self) -> None:
        self.score_sum = 0.0
        self.n = 0


@metrics_registry.add_to_registry("image_reward")
class RewardModel(Metric):
    """Win-rate of generated vs real image under a reward scorer.

    Reference contract (metrics.py:62-95): for each (prompt, real, gen)
    triple score both images; win = 1 if gen >= real; compute = mean.  The
    reference's scorer is ImageReward-v1.0 (BLIP) — the operative scorer
    here whenever a checkpoint is available (explicit ``checkpoint=``, the
    ``SDBL_IMAGE_REWARD_CKPT`` env var, or ``data/models/ImageReward.pt``);
    the BLIP tower is forward-verified against HF transformers
    (tests/test_hf_forward_parity.py).  Without a checkpoint the metric
    falls back to CLIP text-image similarity and warns loudly: win rates
    under the fallback are NOT comparable to the reference's.
    """

    def __init__(
        self,
        model_name: str = "ImageReward-v1.0",
        scorer: Optional[Callable[[np.ndarray, Sequence[str]], np.ndarray]] = None,
        checkpoint: Optional[str] = None,
        vocab_path: Optional[str] = None,
        tiny: bool = False,
    ):
        import logging
        import os
        from pathlib import Path

        self.model_name = model_name
        if scorer is None:
            if checkpoint is None and not tiny:
                env = os.environ.get("SDBL_IMAGE_REWARD_CKPT")
                default = Path("data/models/ImageReward.pt")
                checkpoint = env or (str(default) if default.exists() else None)
            if checkpoint is not None:
                from sonicdiffusionbayeslab_tpu.metrics.image_reward_model import ImageRewardScorer

                scorer = ImageRewardScorer(checkpoint, tiny=tiny, vocab_path=vocab_path)
            elif not tiny:
                logging.getLogger(__name__).warning(
                    "image_reward: no ImageReward checkpoint found (checkpoint=, "
                    "$SDBL_IMAGE_REWARD_CKPT, or data/models/ImageReward.pt) — "
                    "falling back to CLIP text-image similarity. Win rates are "
                    "NOT comparable to the reference's BLIP-based ImageReward-v1.0."
                )
        self._scorer = scorer or (lambda imgs, prompts: _clip_backend(None, tiny).scores(imgs, prompts))
        self.reset()

    def update(self, prompts: Sequence[str], real: np.ndarray, gen: np.ndarray) -> None:
        s_real = self._scorer(real, prompts)
        s_gen = self._scorer(gen, prompts)
        self.wins += int(np.sum(s_gen >= s_real))
        self.n += len(prompts)

    def compute(self) -> float:
        wins = all_sum_scalar(self.wins)
        n = all_sum_scalar(self.n)
        return wins / max(n, 1)

    def reset(self) -> None:
        self.wins = 0
        self.n = 0


@metrics_registry.add_to_registry("aesthetic_score")
class AestheticScoreMetric(Metric):
    """Mean LAION aesthetic score of the generated images.

    The reference SHIPS this model (aethetic_score_model.pth + the MLP
    definition, src/metrics/aethetic_score_model.py:8-54) but never imports
    it from any experiment (SURVEY §2.1) — here it is a first-class
    registered quality metric: CLIP ViT-L/14 image embeddings (the space
    the LAION predictor was trained on) -> normalized -> MLP -> mean.
    """

    def __init__(
        self,
        checkpoint: str = "data/models/aethetic_score_model.pth",
        clip_model_name_or_path: Optional[str] = None,
        tiny: bool = False,
    ):
        import logging
        from pathlib import Path

        from sonicdiffusionbayeslab_tpu.metrics.aesthetic import AestheticScorer

        self.backend = _clip_backend(clip_model_name_or_path, tiny, "l14")
        ckpt = checkpoint if (checkpoint and Path(checkpoint).exists() and not tiny) else None
        if checkpoint and ckpt is None and not tiny:
            logging.getLogger(__name__).warning(
                "aesthetic_score: checkpoint %s not found — RANDOM-INIT MLP "
                "(scores are not comparable to the LAION predictor)", checkpoint
            )
        self.scorer = AestheticScorer(ckpt, input_size=16 if tiny else 768)
        self.reset()

    def update(self, images: np.ndarray, prompts: Sequence[str] = ()) -> None:
        """images: [N, H, W, 3] float in [0, 1] (prompts unused)."""
        emb = self.backend.image_features(np.asarray(images))
        s = self.scorer(emb)
        self.score_sum += float(s.sum())
        self.n += len(s)

    def compute(self) -> float:
        s = all_sum_scalar(self.score_sum)
        n = all_sum_scalar(self.n)
        return s / max(n, 1)

    def reset(self) -> None:
        self.score_sum = 0.0
        self.n = 0


@metrics_registry.add_to_registry("fid")
class FID(Metric):
    """Fréchet distance between real/generated feature Gaussians.

    Protocol parity with torchmetrics FID as configured by the reference
    (feature=64, metrics.py:98-112; configs e.g. ddim_config.yaml:19-22):
    two streaming moment accumulators + Fréchet math (metrics/frechet.py).
    Feature extractor: the full Flax FID-Inception for all four standard
    taps 64/192/768/2048 (metrics/inception.py, real weights loadable
    offline via ``inception_checkpoint``); non-standard dims fall back to
    CLIP image embeddings + fixed random projection.
    """

    def __init__(
        self,
        feature: int = 64,
        input_img_size: int = 512,
        normalize: bool = False,
        tiny: bool = False,
        inception_checkpoint: Optional[str] = None,
    ):
        self.feature = int(feature)
        self.input_img_size = input_img_size
        self.normalize = normalize
        self._inception = None
        self._proj: Optional[np.ndarray] = None
        from sonicdiffusionbayeslab_tpu.metrics.inception import TAPS

        if not tiny and self.feature in TAPS:
            from sonicdiffusionbayeslab_tpu.metrics.inception import InceptionFeatures

            self._inception = InceptionFeatures(self.feature, inception_checkpoint)
        else:
            self.backend = _clip_backend(None, tiny)
        self.real = StreamingMoments(self.feature)
        self.fake = StreamingMoments(self.feature)

    def _features(self, images: np.ndarray) -> np.ndarray:
        if self._inception is not None:
            return self._inception(images)
        f = self.backend.image_features(images)
        if f.shape[1] != self.feature:
            if self._proj is None or self._proj.shape != (f.shape[1], self.feature):
                rng = np.random.default_rng(0)  # fixed: comparable across runs
                self._proj = rng.standard_normal((f.shape[1], self.feature)) / np.sqrt(f.shape[1])
            f = f @ self._proj
        return f

    def update(self, images: np.ndarray, real: bool) -> None:
        (self.real if real else self.fake).update(self._features(images))

    @staticmethod
    def _global_mean_cov(m: StreamingMoments):
        """mean_cov over the moments summed across all processes."""
        n = int(all_sum_scalar(m.n))
        if n < 2:
            raise ValueError("need >= 2 samples for covariance")
        s = all_sum_array(m.sum)
        outer = all_sum_array(m.outer)
        mu = s / n
        cov = (outer - n * np.outer(mu, mu)) / (n - 1)
        return mu, cov

    def compute(self) -> float:
        mu1, c1 = self._global_mean_cov(self.real)
        mu2, c2 = self._global_mean_cov(self.fake)
        return frechet_distance(mu1, c1, mu2, c2)

    def reset(self) -> None:
        self.real.reset()
        self.fake.reset()

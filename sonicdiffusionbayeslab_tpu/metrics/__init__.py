"""Quality/speed metrics (registry parity: reference ``src/metrics/metrics.py``
— ``clip_score``, ``image_reward``, ``fid``, ``time_metric``), JAX-native.

Each metric follows the update()/compute()/reset() protocol the reference
inherits from torchmetrics, with device-friendly internals: scoring runs as
jitted batched functions, accumulation state is tiny host scalars/moments,
and multi-chip runs shard the batch (state reduction is a sum — SURVEY §2.3
'distributed metric reduction').

Offline-weights note (no hub in this environment): CLIP towers initialize
randomly unless a local checkpoint is supplied, so absolute metric values
are only meaningful with real weights; the protocol, batching, and math are
exercised and tested regardless.  ImageReward's BLIP ranking model is
represented by a pluggable scorer (default: CLIP similarity) — same
win-rate contract (gen >= real), documented divergence until a BLIP port
lands.
"""

from sonicdiffusionbayeslab_tpu.metrics.metrics import (  # noqa: F401
    ClipScoreMetric,
    FID,
    Metric,
    RewardModel,
    TimeMetric,
)
from sonicdiffusionbayeslab_tpu.metrics.frechet import frechet_distance  # noqa: F401

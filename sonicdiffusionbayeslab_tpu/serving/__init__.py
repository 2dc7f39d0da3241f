"""Serving subsystem (beyond-reference capability).

Production deployment story for the sampling engine: a micro-batching
inference server (``serving/batcher.py``) that coalesces concurrent
requests into full device batches — one jit signature per step count, so
steady-state serving never recompiles — and a dependency-free HTTP front
end (``serving/server.py``, ``sdbl-serve``).
"""

from sonicdiffusionbayeslab_tpu.serving.batcher import (
    GenerateRequest,
    InferenceServer,
    ServerOverloadedError,
)

__all__ = ["GenerateRequest", "InferenceServer", "ServerOverloadedError"]

from sonicdiffusionbayeslab_tpu.experiments.base import BaseMethod  # noqa: F401
from sonicdiffusionbayeslab_tpu.experiments.methods import (  # noqa: F401
    ConsistencyModelMethod,
    DDIMMethod,
    DeepCacheMethod,
    DefaultStableDiffusion,
    DPMSolverMethod,
    InterlivingSchedulerMethod,
    SkipStepsMethod,
    TwoSchedulerMethod,
)

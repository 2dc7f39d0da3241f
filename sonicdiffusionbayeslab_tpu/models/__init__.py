from sonicdiffusionbayeslab_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel  # noqa: F401
from sonicdiffusionbayeslab_tpu.models.controlnet import ControlNet  # noqa: F401
from sonicdiffusionbayeslab_tpu.models.ip_adapter import ImageProjection  # noqa: F401
from sonicdiffusionbayeslab_tpu.models.sampler import (  # noqa: F401
    CachePlan,
    SampleOutput,
    SDXLEngine,
    SDXLTextConfigs,
    StableDiffusionEngine,
)
from sonicdiffusionbayeslab_tpu.models.unet import UNet2DCondition, UNetConfig  # noqa: F401
from sonicdiffusionbayeslab_tpu.models.vae import AutoencoderKL, VAEConfig  # noqa: F401

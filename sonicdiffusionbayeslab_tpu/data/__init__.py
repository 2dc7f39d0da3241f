from sonicdiffusionbayeslab_tpu.data.dataset import (  # noqa: F401
    ImageDatasetWithPrompts,
    PromptDataset,
    batched,
)

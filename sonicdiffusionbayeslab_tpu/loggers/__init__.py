from sonicdiffusionbayeslab_tpu.loggers.logger import Logger, LocalRunLogger, WandbLogger  # noqa: F401

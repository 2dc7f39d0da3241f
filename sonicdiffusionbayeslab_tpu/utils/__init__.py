from sonicdiffusionbayeslab_tpu.utils.class_registry import ClassRegistry  # noqa: F401

"""Global plugin registries (parity: reference ``src/registry.py:3-6``).

Registration happens when the plugin modules are imported; call
:func:`load_all_plugins` (the CLI does) to populate everything.
"""

from __future__ import annotations

from sonicdiffusionbayeslab_tpu.utils.class_registry import ClassRegistry

models_registry: ClassRegistry = ClassRegistry("models_registry")
methods_registry: ClassRegistry = ClassRegistry("methods_registry")
metrics_registry: ClassRegistry = ClassRegistry("metrics_registry")
schedulers_registry: ClassRegistry = ClassRegistry("schedulers_registry")

_LOADED = False


def load_all_plugins() -> None:
    """Import every module that registers plugins (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imported for registration side effects.
    import sonicdiffusionbayeslab_tpu.schedulers  # noqa: F401
    import sonicdiffusionbayeslab_tpu.models.pipelines  # noqa: F401
    import sonicdiffusionbayeslab_tpu.metrics  # noqa: F401
    import sonicdiffusionbayeslab_tpu.experiments  # noqa: F401

    _LOADED = True

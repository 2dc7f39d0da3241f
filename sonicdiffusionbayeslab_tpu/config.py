"""YAML experiment-config loader.

Keeps the reference's config surface — a YAML with sections
``experiment / model / scheduler / dataset / quality_metrics / logger /
inference / experiment_params`` (reference ``configs/*.yaml``,
``main.py:11``) — without the omegaconf dependency: :class:`ConfigNode`
gives dotted attribute access plus ``.get(key, default)``, and
:func:`validate_config` enforces the section schema up front instead of
failing with attribute errors mid-run.
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Iterator, Mapping

import yaml


class ConfigError(ValueError):
    pass


class ConfigNode(Mapping[str, Any]):
    """Read-only dict wrapper with attribute access, nesting-aware."""

    __slots__ = ("_data",)

    def __init__(self, data: Mapping[str, Any]):
        object.__setattr__(self, "_data", dict(data))

    # -- mapping protocol -------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return _wrap(self._data[key])

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __contains__(self, key: object) -> bool:
        return key in self._data

    # -- attribute access --------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        try:
            return _wrap(self._data[key])
        except KeyError:
            raise AttributeError(
                f"config has no key {key!r}; available: {sorted(self._data)}"
            ) from None

    def __setattr__(self, key: str, value: Any) -> None:
        raise TypeError("ConfigNode is read-only; use .replace(**updates)")

    def get(self, key: str, default: Any = None) -> Any:
        return _wrap(self._data.get(key, default))

    def to_dict(self) -> dict:
        return copy.deepcopy(self._data)

    def replace(self, **updates: Any) -> "ConfigNode":
        d = self.to_dict()
        d.update(updates)
        return ConfigNode(d)

    def __repr__(self) -> str:
        return f"ConfigNode({self._data!r})"


def _wrap(value: Any) -> Any:
    if isinstance(value, ConfigNode):
        return value
    if isinstance(value, Mapping):
        return ConfigNode(value)
    return value


REQUIRED_SECTIONS = ("experiment", "model", "dataset", "inference")
KNOWN_SECTIONS = REQUIRED_SECTIONS + (
    "experiment_name",
    "scheduler",
    "quality_metrics",
    "logger",
    "experiment_params",
    "training",
)
# sdbl-train configs: no sweep method / inference protocol, a training section.
REQUIRED_TRAINING_SECTIONS = ("model", "dataset", "training")


def validate_config(cfg: ConfigNode) -> ConfigNode:
    required = REQUIRED_TRAINING_SECTIONS if "training" in cfg else REQUIRED_SECTIONS
    missing = [s for s in required if s not in cfg]
    if missing:
        raise ConfigError(f"config missing required sections {missing}")
    unknown = [s for s in cfg if s not in KNOWN_SECTIONS]
    if unknown:
        raise ConfigError(
            f"config has unknown sections {unknown}; known: {sorted(KNOWN_SECTIONS)}"
        )
    if "training" not in cfg and "method" not in cfg.experiment:
        raise ConfigError("config experiment section must set 'method'")
    if "model_name" not in cfg.model:
        raise ConfigError("config model section must set 'model_name'")
    return cfg


def apply_overrides(raw: dict, overrides: Mapping[str, Any]) -> dict:
    """Apply dotted-key overrides (``{"dataset.max_count": 32}``) in place.

    Intermediate mappings are created as needed; a non-mapping in the
    middle of a path is a :class:`ConfigError` (overriding ``a.b`` when
    ``a`` is a scalar would silently drop the scalar otherwise).
    """
    for dotted, value in overrides.items():
        parts = dotted.split(".")
        node = raw
        for p in parts[:-1]:
            nxt = node.setdefault(p, {})
            if not isinstance(nxt, dict):
                raise ConfigError(
                    f"override {dotted!r}: {p!r} is {type(nxt).__name__}, not a section")
            node = nxt
        node[parts[-1]] = value
    return raw


def load_config(path: str | Path, overrides: Mapping[str, Any] | None = None) -> ConfigNode:
    """Load + validate a YAML experiment config.

    ``overrides`` maps dotted keys to values, applied before validation —
    the CLI's repeatable ``--set section.key=value`` flag feeds this.
    """
    path = Path(path)
    if not path.exists():
        # Parity with the reference CLI: bare names resolve under ./configs
        # (reference main.py:11,17-24).
        alt = Path("configs") / path.name
        if alt.exists():
            path = alt
        else:
            raise FileNotFoundError(f"config not found: {path}")
    with open(path) as f:
        raw = yaml.safe_load(f)
    if not isinstance(raw, Mapping):
        raise ConfigError(f"config root must be a mapping, got {type(raw).__name__}")
    raw = dict(raw)
    if overrides:
        apply_overrides(raw, overrides)
    return validate_config(ConfigNode(raw))

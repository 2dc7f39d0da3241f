"""Experiment CLI (parity: reference main.py:10-24).

    sdbl --config dpm_solver_config.yaml
    python -m sonicdiffusionbayeslab_tpu.cli --config configs/smoke.yaml

Loads the YAML (bare names resolve under ./configs), seeds RNG, instantiates
the registered method, runs the sweep.
"""

from __future__ import annotations

import argparse

from sonicdiffusionbayeslab_tpu.config import load_config
from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, methods_registry
from sonicdiffusionbayeslab_tpu.utils.rng import setup_seed


def _parse_sets(pairs):
    """``--set a.b=v`` strings -> {dotted: YAML-parsed value}."""
    import yaml

    out = {}
    for p in pairs or ():
        key, sep, val = p.partition("=")
        if not sep or not key:
            raise SystemExit(f"--set expects key=value, got {p!r}")
        out[key] = yaml.safe_load(val)
    return out


def run(config_path: str, overrides=None):
    from sonicdiffusionbayeslab_tpu.parallel.distributed import initialize as init_distributed
    from sonicdiffusionbayeslab_tpu.utils.compilation_cache import enable as enable_cache

    init_distributed()
    enable_cache()
    load_all_plugins()
    config = load_config(config_path, overrides)
    setup_seed(config.experiment.get("seed", 29))
    method = methods_registry[config.experiment.method](config)
    metrics = method.run_experiment()
    print(f"run dir: {method.logger.local.dir}")
    for k, v in metrics.items():
        print(f"{k}: {v}")
    return metrics


def main() -> None:
    parser = argparse.ArgumentParser(description="SonicDiffusionBayesLab-TPU experiment runner")
    parser.add_argument("--config", "--config_file", dest="config", required=True,
                        help="YAML config path (bare names resolve under ./configs)")
    parser.add_argument("--set", dest="sets", action="append", metavar="KEY=VALUE",
                        help="override a config key by dotted path, e.g. "
                             "--set dataset.max_count=32 (repeatable; value is YAML)")
    args = parser.parse_args()
    run(args.config, _parse_sets(args.sets))


if __name__ == "__main__":
    main()

"""Training hardware receipts (VERDICT r3 #3 -> docs/TRAINING.md).

Measures real step times on the attached chip for every capability
docs/TRAINING.md claims.  The reference has no training subsystem (this is
a beyond-reference capability), so the evidence bar is the repo's own:
every claim gets a measured number or an honest "does not fit".

Modes (one JSON line each, bench.py-style):

  python train_bench.py full512          # full-UNet fine-tune, 512px, remat, AdamW
  python train_bench.py full512_noremat  # the OOM control for the remat claim
  python train_bench.py full512_adafactor # factored optimizer state (fits headroom)
  python train_bench.py full512_adam8bit # blockwise-int8 Adam moments (opt8bit.py)
  python train_bench.py lora512          # LoRA rank-8, 512px
  python train_bench.py sd3_lora         # MMDiT LoRA rank-8, flow objective, 1024px
  python train_bench.py prefetch         # e2e loop it/s, prefetch 2 vs 0 (PNG decode overlap)

Env: SDBL_TRAIN_BATCH (default per mode), SDBL_TRAIN_STEPS (default 12).
Timing: first step compiles (excluded); steps/sec = median over the rest,
block_until_ready'd.  Synthetic data — random weights and random
latents/pixels exercise the identical compiled graph as a real fine-tune.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sonicdiffusionbayeslab_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()  # 512px training-step compiles take minutes; persist them


def _mem_gb():
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use") or 0
    # The axon tunnel reports no memory stats; None > a misleading 0.0.
    return round(peak / 2**30, 2) if peak else None


def _time_steps(step_once, n_steps):
    """step_once() -> state; returns (sec_per_step median, compile_s)."""
    t0 = time.perf_counter()
    step_once()
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(n_steps):
        t0 = time.perf_counter()
        step_once()
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), compile_s


def _emit(mode, fits, sec_per_step=None, compile_s=None, batch=None, extra=None):
    rec = {
        "metric": f"train_{mode}",
        "value": round(1.0 / sec_per_step, 3) if (fits and sec_per_step) else 0.0,
        "unit": "steps/sec",
        "fits": fits,
        "batch": batch,
        "sec_per_step": round(sec_per_step, 4) if sec_per_step else None,
        "compile_s": round(compile_s, 1) if compile_s else None,
        "peak_hbm_gb": _mem_gb(),
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec))


TINY = bool(int(os.environ.get("SDBL_TRAIN_TINY", "0")))  # CPU smoke only


def _unet_bench(remat: bool, lora_rank: int, batch: int, steps: int,
                optimizer: str = "adamw"):
    from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry
    from sonicdiffusionbayeslab_tpu.training.trainer import DiffusionTrainer, TrainConfig

    load_all_plugins()
    pipe = models_registry["stable_diffusion_model"](
        pretrained_model="x", image_size=512, dtype="bfloat16", tiny=TINY)
    engine, params = pipe.engine, pipe.params
    trainer = DiffusionTrainer(engine, TrainConfig(
        remat=remat, lora_rank=lora_rank, optimizer=optimizer))
    state = trainer.init_state(params, key=jax.random.PRNGKey(0))
    hw = 8 if TINY else 64
    cdim = engine.text_config.hidden_size
    lat = jnp.asarray(np.random.default_rng(0).normal(size=(batch, hw, hw, 4)),
                      jnp.float32)
    ctx = jnp.asarray(np.random.default_rng(1).normal(size=(batch, 77, cdim)),
                      jnp.float32)
    key = jax.random.PRNGKey(7)
    holder = {"state": state}

    def once():
        holder["state"], metrics = trainer.train_step(
            holder["state"], params, lat, ctx, key)
        # Block on the FULL output state, not just the scalar loss: over the
        # axon tunnel the scalar future can resolve before the big state
        # buffers finish, which under-times the step (measured: an
        # impossible 11.5 ms/step for full-UNet adam8bit when blocking on
        # loss alone).
        jax.block_until_ready((holder["state"], metrics))

    return _time_steps(once, steps)


def _sd3_lora_bench(batch: int, steps: int):
    from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry
    from sonicdiffusionbayeslab_tpu.training.lora import MMDIT_TARGETS
    from sonicdiffusionbayeslab_tpu.training.trainer import DiffusionTrainer, TrainConfig

    load_all_plugins()
    pipe = models_registry["stable_diffusion_3_model"](
        pretrained_model="x", image_size=1024, dtype="bfloat16", tiny=TINY)
    engine, params = pipe.engine, pipe.params
    trainer = DiffusionTrainer(engine, TrainConfig(
        objective="flow", lora_rank=8, lora_targets=MMDIT_TARGETS, remat=True))
    state = trainer.init_state(params, key=jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    hw = 8 if TINY else 128
    ucfg = engine.unet_config
    T_ctx = engine.text_config.max_length + engine.text2_config.max_length
    lat = jnp.asarray(rng.normal(size=(batch, hw, hw, ucfg.in_channels)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(batch, T_ctx, ucfg.joint_attention_dim)),
                      jnp.float32)
    added = {"text_embeds": jnp.asarray(
        rng.normal(size=(batch, ucfg.pooled_projection_dim)), jnp.float32)}
    key = jax.random.PRNGKey(7)
    holder = {"state": state}

    def once():
        holder["state"], metrics = trainer.train_step(
            holder["state"], params, lat, ctx, key, added=added)
        jax.block_until_ready((holder["state"], metrics))  # see _unet_bench

    return _time_steps(once, steps)


def _prefetch_bench(steps: int):
    """End-to-end run_training it/s with the overlapped input pipeline on
    vs inline prep — the loop does real PNG decode + VAE encode + CLIP
    encode per batch (training/loop.py raw prep)."""
    import tempfile
    from pathlib import Path

    from PIL import Image

    from sonicdiffusionbayeslab_tpu.config import load_config
    from sonicdiffusionbayeslab_tpu.training.loop import run_training

    tmp = Path(tempfile.mkdtemp(prefix="sdbl_train_bench_"))
    img_dir = tmp / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    n_imgs, batch = 32, 8
    ann = {}
    for i in range(n_imgs):
        f = f"img_{i}.png"
        Image.fromarray(rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)).save(
            img_dir / f)
        ann[f] = f"a synthetic training image number {i}"
    (tmp / "ann.json").write_text(json.dumps(ann))

    rates = {}
    # Inline (depth 0) FIRST: it pays the XLA compiles, which the
    # persistent cache + in-run first-step exclusion then keep out of both
    # measured windows (run_training's steps_per_sec starts after step 1).
    for depth in (0, 2):
        cfg = {
            "experiment_name": "train_bench",
            "experiment": {"method": "default", "seed": 29},
            "model": {"model_name": "stable_diffusion_model",
                      "pretrained_model": "x", "image_size": 512,
                      "dtype": "bfloat16"},
            "scheduler": {"scheduler_name": "ddim_scheduler"},
            "dataset": {"img_dataset": str(img_dir), "prompts": str(tmp / "ann.json"),
                        "image_size": 512},
            "logger": {"wandb_enable": False, "save": False,
                       "save_dir": str(tmp / "out")},
            "inference": {"batch_size": batch},
            "training": {"num_steps": steps, "batch_size": batch, "log_every": steps,
                         "lora_rank": 8, "prefetch": depth},
        }
        p = tmp / f"cfg_{depth}.yaml"
        import yaml

        p.write_text(yaml.safe_dump(cfg))
        rates[depth] = run_training(load_config(str(p)))["steps_per_sec"]
    print(json.dumps({
        "metric": "train_prefetch_delta",
        "value": round(rates[2] / rates[0], 3),
        "unit": "x (prefetch 2 vs inline, steady-state steps 2..N)",
        "it_s_prefetch2": round(rates[2], 3),
        "it_s_inline": round(rates[0], 3),
        "batch": batch, "steps": steps,
    }))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "lora512"
    steps = int(os.environ.get("SDBL_TRAIN_STEPS", "12"))
    if mode == "prefetch":
        _prefetch_bench(steps)
        return
    defaults = {"full512": 8, "full512_noremat": 8, "full512_adafactor": 8,
                "full512_adam8bit": 8, "lora512": 8, "sd3_lora": 2}
    batch = int(os.environ.get("SDBL_TRAIN_BATCH", defaults.get(mode, 4)))
    try:
        if mode == "full512":
            sec, comp = _unet_bench(remat=True, lora_rank=0, batch=batch, steps=steps)
        elif mode == "full512_noremat":
            sec, comp = _unet_bench(remat=False, lora_rank=0, batch=batch, steps=steps)
        elif mode == "full512_adafactor":
            sec, comp = _unet_bench(remat=True, lora_rank=0, batch=batch, steps=steps,
                                    optimizer="adafactor")
        elif mode == "full512_adam8bit":
            sec, comp = _unet_bench(remat=True, lora_rank=0, batch=batch, steps=steps,
                                    optimizer="adamw8bit")
        elif mode == "lora512":
            sec, comp = _unet_bench(remat=False, lora_rank=8, batch=batch, steps=steps)
        elif mode == "sd3_lora":
            sec, comp = _sd3_lora_bench(batch=batch, steps=steps)
        else:
            raise SystemExit(f"unknown mode {mode!r}")
    except (jax.errors.JaxRuntimeError, RuntimeError) as e:
        msg = str(e)
        low = msg.lower()
        if ("resource_exhausted" in low or "out of memory" in low
                or "exceeded hbm capacity" in low):
            for line in msg.splitlines():  # the informative line, not the HTTP shim
                if "memory" in line.lower():
                    msg = line.strip()
                    break
            _emit(mode, fits=False, batch=batch, extra={"error": msg[:240]})
            return
        raise
    _emit(mode, fits=True, sec_per_step=sec, compile_s=comp, batch=batch,
          extra={"images_per_sec": round(batch / sec, 2)})


if __name__ == "__main__":
    main()

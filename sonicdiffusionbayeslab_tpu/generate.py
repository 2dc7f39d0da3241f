"""One-off generation CLI (usability addition beyond the reference's
sweep-only surface):

    sdbl-generate --prompt "a lighthouse at sunset" --steps 20 --out out.png
    sdbl-generate --prompt "..." --scheduler ddim_scheduler --tiny

Runs the flagship pipeline once and writes PNGs.
"""

from __future__ import annotations

import argparse

import jax


def main() -> None:
    p = argparse.ArgumentParser(description="Generate images with the TPU SD pipeline")
    p.add_argument("--prompt", action="append", required=True,
                   help="repeatable; one image per prompt")
    p.add_argument("--negative_prompt", default="")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--scheduler", default="dpm_solver_scheduler")
    p.add_argument("--solver_order", type=int, default=2)
    p.add_argument("--scheduler_kwargs", default="{}",
                   help='JSON, e.g. \'{"use_karras_sigmas": true}\'')
    p.add_argument("--seed", type=int, default=29)
    p.add_argument("--pretrained_model", default="runwayml/stable-diffusion-v1-5")
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--out", default="outputs/generate/img_{i:03d}.png")
    p.add_argument("--tiny", action="store_true", help="tiny random-weight model (smoke)")
    p.add_argument("--cache_interval", type=int, default=0, help="DeepCache interval (0=off)")
    p.add_argument("--cache_branch_id", type=int, default=0, help="DeepCache split depth")
    p.add_argument("--init_image", default=None, help="img2img source image path")
    p.add_argument("--strength", type=float, default=0.8, help="img2img noising strength")
    p.add_argument("--mask_image", default=None,
                   help="inpainting mask path (white = regenerate); needs --init_image")
    p.add_argument("--height", type=int, default=None, help="non-square height (mult of 8)")
    p.add_argument("--width", type=int, default=None, help="non-square width (mult of 8)")
    p.add_argument("--variant", default="auto", help="sd15 | sd21 | auto")
    p.add_argument("--prompt_weighting", action="store_true",
                   help="enable (word:1.3) emphasis syntax")
    args = p.parse_args()

    from sonicdiffusionbayeslab_tpu.data.imageio import write_png
    from sonicdiffusionbayeslab_tpu.models.sampler import CachePlan
    from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry, schedulers_registry
    from sonicdiffusionbayeslab_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()
    load_all_plugins()
    model = models_registry["stable_diffusion_model"](
        pretrained_model=args.pretrained_model,
        image_size=args.image_size,
        tiny=args.tiny,
        variant=args.variant,
        prompt_weighting=args.prompt_weighting,
    )
    import json

    skw = {"solver_order": args.solver_order} if args.scheduler == "dpm_solver_scheduler" else {}
    skw.update(json.loads(args.scheduler_kwargs))
    model.scheduler = schedulers_registry[args.scheduler](**skw)
    if args.cache_interval > 0:
        model.cache_plan_fn = lambda n: CachePlan.every(n, args.cache_interval, args.cache_branch_id)

    call_kw = {}
    if args.height or args.width:
        call_kw["height"], call_kw["width"] = args.height, args.width
    if args.init_image:
        from sonicdiffusionbayeslab_tpu.data.imageio import read_image
        import numpy as np

        size = args.image_size if not args.tiny else 16
        img = read_image(args.init_image, image_size=size)
        call_kw["init_image"] = np.repeat(img[None], len(args.prompt), axis=0)
        call_kw["strength"] = args.strength
        if args.mask_image:
            m = read_image(args.mask_image, image_size=size).mean(axis=-1, keepdims=True)
            call_kw["mask_image"] = np.repeat((m > 0.5).astype(np.float32)[None],
                                              len(args.prompt), axis=0)

    images, exec_time, _ = model(
        args.prompt,
        num_inference_steps=args.steps,
        guidance_scale=args.guidance_scale,
        negative_prompt=[args.negative_prompt] * len(args.prompt),
        key=jax.random.PRNGKey(args.seed),
        **call_kw,
    )
    for i, img in enumerate(images):
        path = args.out.format(i=i)
        write_png(path, img)
        print(f"wrote {path}")
    print(f"denoise loop: {exec_time:.2f}s for {len(images)} image(s) "
          f"({exec_time / len(images):.3f} s/img)")


if __name__ == "__main__":
    main()

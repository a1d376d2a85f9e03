"""One-command ingestion of a published diffusers pipeline directory
(VERDICT r2 item 3 / ref scripts/shift_ldm_ffhq.py:165-170): walk the
subfolder layout the `SingleZombie/*` checkpoints ship —

    unet/diffusion_pytorch_model.safetensors + config.json
    vae/...                                  (AF keys ride in the config,
                                              ref af_api.py:63-67)
    controlnet/...                           (normal estimation)
    scheduler/scheduler_config.json
    text_encoder/ + tokenizer/               (SD-based pipelines)

— convert every state dict through models.convert.torch_to_flax, and emit
a pipeline directory that `pipelines.loading.load_pipeline` (or the SD
pipeline constructors) load with zero new code:

    python scripts/convert_reference_checkpoint.py <src_dir> <out_dir>

Conversion must be CLEAN (no unmatched torch keys, no unfilled flax
leaves) or the script exits non-zero; --lenient downgrades that to a
warning. The day real weights appear locally, this is the only command
between them and the five acceptance benchmarks
(scripts/run_all_benchmarks.py --ldm_pipeline_dir <out_dir>).
"""

import argparse
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WEIGHT_FILES = ("diffusion_pytorch_model.safetensors",
                "diffusion_pytorch_model.bin",
                "model.safetensors", "pytorch_model.bin")


def _find_weights(subdir):
    for name in WEIGHT_FILES:
        p = os.path.join(subdir, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"no weight file in {subdir} "
                            f"(looked for {WEIGHT_FILES})")


def convert_component(subdir, kind, alias_free):
    """Returns (config_dict, converted_flax_params, report)."""
    import jax
    import jax.numpy as jnp
    from afldm_tpu.models import (UNet2DModel, UNet2DConfig,
                                  UNet2DConditionModel, UNet2DConditionConfig,
                                  ControlNetModel, ControlNetConfig,
                                  AutoencoderKL, AutoencoderKLConfig)
    from afldm_tpu.models.convert import torch_to_flax, load_torch_state_dict

    with open(os.path.join(subdir, "config.json")) as f:
        cfg_dict = json.load(f)
    cfg_dict = {k: v for k, v in cfg_dict.items() if not k.startswith("_")}
    key = jax.random.PRNGKey(0)

    if kind == "vae":
        cfg = AutoencoderKLConfig.from_diffusers(cfg_dict,
                                                 alias_free=alias_free)
        model = AutoencoderKL(cfg)
        res = cfg_dict.get("sample_size", 256)
        params = jax.jit(model.init)(
            key, jnp.zeros((1, res, res, cfg.in_channels)))
        out_cfg = dict(cfg_dict, alias_free=alias_free)
    elif kind == "unet":
        if "cross_attention_dim" in cfg_dict:
            cfg = UNet2DConditionConfig.from_diffusers(cfg_dict,
                                                       alias_free=alias_free)
            model = UNet2DConditionModel(cfg)
            lat = jnp.zeros((1, cfg.sample_size, cfg.sample_size,
                             cfg.in_channels))
            ehs = jnp.zeros((1, 77, cfg.cross_attention_dim))
            params = jax.jit(model.init)(key, lat,
                                         jnp.zeros((1,), jnp.int32), ehs)
        else:
            cfg = UNet2DConfig.from_diffusers(cfg_dict,
                                              alias_free=alias_free)
            model = UNet2DModel(cfg)
            lat = jnp.zeros((1, cfg.sample_size, cfg.sample_size,
                             cfg.in_channels))
            params = jax.jit(model.init)(key, lat,
                                         jnp.zeros((1,), jnp.int32))
        out_cfg = dict(cfg_dict, alias_free=alias_free)
    elif kind == "controlnet":
        cfg = ControlNetConfig.from_diffusers(cfg_dict,
                                              alias_free=alias_free)
        model = ControlNetModel(cfg)
        res = cfg_dict.get("sample_size", 32)
        lat = jnp.zeros((1, res, res, cfg.in_channels))
        ehs = jnp.zeros((1, 77, cfg.cross_attention_dim))
        params = jax.jit(model.init)(key, lat, jnp.zeros((1,), jnp.int32),
                                     ehs, lat)
        out_cfg = dict(cfg_dict, alias_free=alias_free)
    else:
        raise ValueError(kind)

    sd = load_torch_state_dict(_find_weights(subdir))
    new_params, report = torch_to_flax(sd, params)
    return out_cfg, new_params, report


def convert_pipeline_dir(src, out, alias_free=True, lenient=False,
                         log=print):
    os.makedirs(out, exist_ok=True)
    state = {}
    problems = []

    for kind in ("unet", "vae", "controlnet"):
        subdir = os.path.join(src, kind)
        if not os.path.isdir(subdir):
            continue
        log(f"converting {kind}/ ...")
        cfg_dict, params, report = convert_component(subdir, kind,
                                                     alias_free)
        if report["unmatched_torch_keys"]:
            problems.append((kind, "unmatched_torch_keys",
                             report["unmatched_torch_keys"][:10]))
        if report["unfilled_flax_leaves"]:
            problems.append((kind, "unfilled_flax_leaves",
                             report["unfilled_flax_leaves"][:10]))
        with open(os.path.join(out, f"{kind}_config.json"), "w") as f:
            json.dump(cfg_dict, f, indent=2)
        state[kind] = params
        log(f"  {kind}: {report['n_converted']} leaves converted; "
            f"unmatched={len(report['unmatched_torch_keys'])} "
            f"unfilled={len(report['unfilled_flax_leaves'])}")

    if "unet" not in state or "vae" not in state:
        raise SystemExit(f"{src}: expected at least unet/ and vae/ "
                         f"subfolders, found {sorted(os.listdir(src))}")

    sched = os.path.join(src, "scheduler", "scheduler_config.json")
    if os.path.exists(sched):
        with open(sched) as f:
            s = {k: v for k, v in json.load(f).items()
                 if not k.startswith("_")}
        with open(os.path.join(out, "scheduler_config.json"), "w") as f:
            json.dump(s, f, indent=2)

    for aux in ("text_encoder", "tokenizer"):
        sub = os.path.join(src, aux)
        if os.path.isdir(sub):
            dst = os.path.join(out, aux)
            if not os.path.isdir(dst):
                shutil.copytree(sub, dst)
            log(f"copied {aux}/")

    if problems:
        for kind, what, sample in problems:
            log(f"PROBLEM {kind}: {what}: {sample}")
        if not lenient:
            raise SystemExit("conversion not clean (pass --lenient to "
                             "write anyway)")

    # same checkpoint layout the trainers' save_pipeline writes, so
    # load_pipeline picks it up unchanged (unet_ema={} -> raw unet used)
    from afldm_tpu.train.checkpoint import (save_checkpoint,
                                            wait_for_checkpoints)
    ckpt_state = {"unet": state["unet"], "unet_ema": {},
                  "vae": state["vae"]}
    if "controlnet" in state:
        ckpt_state["controlnet"] = state["controlnet"]
    save_checkpoint(out, 0, ckpt_state)
    wait_for_checkpoints()
    # provenance marker: benchmark runners label these numbers 'converted'
    # (vs 'trained'/'random') so parity evidence is never mislabeled
    with open(os.path.join(out, "provenance.json"), "w") as f:
        json.dump({"provenance": "converted",
                   "source": os.path.abspath(src)}, f, indent=2)
    log(f"wrote {out} (checkpoint-0)")
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src", help="diffusers pipeline directory "
                               "(unet/, vae/, scheduler/, ...)")
    p.add_argument("out", help="output afldm_tpu pipeline directory")
    p.add_argument("--alias_free", dest="alias_free", action="store_true",
                   default=True)
    p.add_argument("--no_alias_free", dest="alias_free",
                   action="store_false",
                   help="skip the AF surgery flags (the reference scripts "
                        "always apply make_af_* after from_pretrained, so "
                        "alias-free is the default)")
    p.add_argument("--lenient", action="store_true")
    p.add_argument("--platform", default="cpu",
                   help="conversion runs on CPU by default — it only "
                        "builds param trees, and must not queue work on a "
                        "TPU that may be mid-benchmark")
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    convert_pipeline_dir(args.src, args.out, alias_free=args.alias_free,
                         lenient=args.lenient)


if __name__ == "__main__":
    main()

"""Flagship-scale naive-vs-alias-free equivariance A/B (VERDICT r2 item 1).

Trains the REAL flagship configs — 256px AF-VAE (configs/vae/model_afvae.json
shapes) and the 274M-param 32x32-latent UNet (configs/ldm/model_unet.json) —
on procedural dead-leaves data, one arm naive and one alias-free+shift-loss,
then runs the exact shift_equivariance_eval protocol
(ref scripts/shift_ldm_ffhq.py:131-151): 50 DDIM steps, 16 eighth-latent-pixel
shifts, masked PSNR at 256px, GIF strips of (output | GT shift | 10x|diff|).

Stages are separate processes so a preempted run resumes from checkpoints:

  python scripts/flagship_ab.py data
  python scripts/flagship_ab.py vae  --arm af    --minutes 60
  python scripts/flagship_ab.py ldm  --arm af    --minutes 90
  python scripts/flagship_ab.py eval --arm af
  ... same for --arm naive ...
  python scripts/flagship_ab.py report
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
ROOT = os.path.join(REPO, "results", "flagship_ab")
DATA = os.path.join(ROOT, "data")
PY = sys.executable


def arm_dir(arm):
    return os.path.join(ROOT, arm)


def stage_data(args):
    from afldm_tpu.train.data import render_dead_leaves_folder
    render_dead_leaves_folder(os.path.join(DATA, "train"),
                              resolution=args.resolution,
                              length=args.num_images, seed=0)
    render_dead_leaves_folder(os.path.join(DATA, "valid"),
                              resolution=args.resolution, length=16,
                              seed=777)
    print("data:", DATA)


def _run_train(cfg, out_dir, minutes, max_steps=None, platform=None):
    os.makedirs(out_dir, exist_ok=True)
    cfg_path = os.path.join(out_dir, "train_cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=2)
    cmd = [PY, os.path.join(REPO, "train.py"), cfg_path]
    if minutes:
        cmd += ["--max_minutes", str(minutes)]
    if max_steps:
        cmd += ["--max_steps", str(max_steps)]
    if platform:
        cmd += ["--platform", platform]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)


def stage_vae(args):
    arm = args.arm
    out = os.path.join(arm_dir(arm), "vae")
    with open(os.path.join(REPO, "configs/vae/model_afvae.json")) as f:
        model_cfg = json.load(f)
    model_cfg["sample_size"] = args.resolution
    if arm == "naive":
        model_cfg["alias_free"] = False
    mpath = os.path.join(arm_dir(arm), "vae_model_cfg.json")
    os.makedirs(arm_dir(arm), exist_ok=True)
    with open(mpath, "w") as f:
        json.dump(model_cfg, f, indent=2)
    cfg = {
        "base": {
            "output_dir": out, "logging_dir": "logs",
            "resolution": args.resolution,
            "train_batch_size": args.vae_batch,
            "num_epochs": 100000, "seed": 0,
            "checkpointing_steps": 500, "checkpoints_total_limit": 2,
            "save_model_epochs": 2, "valid_epochs": 0,
            "mixed_precision": None, "random_flip": True,
            "gradient_checkpointing": True,
            "train_data_dir": os.path.join(DATA, "train"),
            "valid_data_dir": os.path.join(DATA, "valid"),
            "resume_from_checkpoint": "latest",
        },
        "vae": {
            "model_cfg": mpath,
            "use_shift_loss": arm == "af",
            "use_disc": False, "perceptual_weight": 0.0,
            "kl_weight": 1e-6, "use_ema": False,
            "learning_rate": 1e-4, "lr_warmup_steps": 100,
            "gradient_accumulation_steps": 1,
        },
    }
    _run_train(cfg, out, args.minutes, args.max_steps, args.platform)


def stage_ldm(args):
    arm = args.arm
    out = os.path.join(arm_dir(arm), "ldm")
    vae_pipe = os.path.join(arm_dir(arm), "vae", "pipeline")
    assert os.path.isdir(vae_pipe), f"train the VAE first ({vae_pipe})"
    cfg = {
        "base": {
            "output_dir": out, "logging_dir": "logs",
            "resolution": args.resolution,
            "train_batch_size": args.ldm_batch,
            "num_epochs": 100000, "seed": 0,
            "checkpointing_steps": 500, "checkpoints_total_limit": 2,
            "save_model_epochs": 4, "valid_epochs": 0,
            "mixed_precision": "bf16", "gradient_checkpointing": True,
            "random_flip": True,
            "train_data_dir": os.path.join(DATA, "train"),
            "resume_from_checkpoint": "latest",
        },
        "ldm": {
            "vae_path": vae_pipe,
            "scheduler_path": os.path.join(
                REPO, "configs/ldm/noise_scheduler.json"),
            "unet_config": os.path.join(
                REPO, "configs/ldm/model_unet.json"),
            "af_models": arm == "af",
            "use_shift_loss": arm == "af",
            "use_cross_attn": True, "use_ema": True,
            "learning_rate": 1e-4, "lr_warmup_steps": 200,
        },
    }
    _run_train(cfg, out, args.minutes, args.max_steps, args.platform)


def stage_eval(args):
    import numpy as np
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from afldm_tpu.pipelines.loading import load_pipeline
    from afldm_tpu.pipelines.shift_eval import shift_equivariance_eval
    from afldm_tpu.utils.io import save_gif_from_tensors

    arm = args.arm
    pipe_dir = os.path.join(arm_dir(arm), "ldm", "pipeline")
    pipe = load_pipeline(pipe_dir, use_ema=True)
    # BOTH flags must match the arm — round 3's naive VAE silently trained
    # alias-free because only the UNet flag was asserted (VERDICT r3 #1/#2)
    assert pipe.unet.config.alias_free == (arm == "af"), \
        ("unet", arm, pipe.unet.config.alias_free)
    assert pipe.vae.config.alias_free == (arm == "af"), \
        ("vae", arm, pipe.vae.config.alias_free)

    # record trained step counts so step-matching between arms is auditable
    from afldm_tpu.train.checkpoint import latest_checkpoint
    steps = {}
    for stage in ("vae", "ldm"):
        ck = latest_checkpoint(os.path.join(arm_dir(arm), stage))
        steps[stage] = (int(os.path.basename(ck).split("-")[-1])
                        if ck else None)
    res = shift_equivariance_eval(
        pipe, key=jax.random.PRNGKey(args.seed),
        num_inference_steps=args.eval_steps,
        num_shift_steps=args.shift_steps,
        batch_shifts=not args.sequential)

    d = pipe.vae.config.downsample_ratio
    psnrs = np.asarray(res.psnrs, np.float64)
    frac = [float(p) for k, p in enumerate(psnrs, 1) if k % d]
    intg = [float(p) for k, p in enumerate(psnrs, 1) if not k % d]
    out = {
        "arm": arm, "weights": "trained",
        "protocol": "shift_ldm_ffhq.py:131-151 (50-step DDIM, CFA, "
                    "ideal_crop k/8 latent shifts, masked PSNR @256px)",
        "vae_alias_free": bool(pipe.vae.config.alias_free),
        "unet_alias_free": bool(pipe.unet.config.alias_free),
        "vae_train_steps": steps["vae"], "ldm_train_steps": steps["ldm"],
        "eval_steps": args.eval_steps, "shift_steps": args.shift_steps,
        "mean_masked_psnr": round(float(psnrs.mean()), 3),
        "frac_shift_psnr": round(float(np.mean(frac)), 3),
        "int_shift_psnr": round(float(np.mean(intg)), 3) if intg else None,
        "psnrs": [round(float(p), 2) for p in psnrs],
    }
    os.makedirs(arm_dir(arm), exist_ok=True)
    with open(os.path.join(arm_dir(arm), "eval.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))

    # GIF strip: output | GT shift | 10x|diff|  (ref shift_ldm_ffhq.py:146)
    strip = np.concatenate(
        [res.outputs, res.targets,
         np.clip(np.abs(res.outputs - res.targets) * 10 - 1, -1, 1)],
        axis=2)
    save_gif_from_tensors(strip, os.path.join(arm_dir(arm), "shift.gif"))
    # half-res copy for git (ADVICE r4: ~10 MB/arm per eval adds up; the
    # full-res strip stays on disk, the committed artifact is ~4x smaller)
    small = strip.reshape(strip.shape[0], strip.shape[1] // 2, 2,
                          strip.shape[2] // 2, 2, -1).mean(axis=(2, 4))
    save_gif_from_tensors(small, os.path.join(arm_dir(arm),
                                              "shift_small.gif"))


def stage_report(args):
    evs = {}
    for arm in ("naive", "af"):
        p = os.path.join(arm_dir(arm), "eval.json")
        with open(p) as f:
            evs[arm] = json.load(f)
    # refuse to compare arms with mismatched wiring or step budgets — the
    # round-3 report was invalid on both axes (VERDICT r3 #1/#2)
    for arm in ("naive", "af"):
        want = arm == "af"
        for flag in ("vae_alias_free", "unet_alias_free"):
            assert evs[arm].get(flag) is want, (arm, flag, evs[arm].get(flag))
    step_matched = all(
        evs["naive"].get(f"{s}_train_steps") == evs["af"].get(f"{s}_train_steps")
        for s in ("vae", "ldm"))
    assert step_matched or args.allow_step_mismatch, {
        a: {s: evs[a].get(f"{s}_train_steps") for s in ("vae", "ldm")}
        for a in evs}
    rep = {
        "naive": evs["naive"], "af": evs["af"],
        "step_matched": step_matched,
        "af_psnr_gain_db": round(evs["af"]["mean_masked_psnr"]
                                 - evs["naive"]["mean_masked_psnr"], 3),
        "af_frac_shift_gain_db": round(evs["af"]["frac_shift_psnr"]
                                       - evs["naive"]["frac_shift_psnr"], 3),
    }
    with open(os.path.join(ROOT, "report.json"), "w") as f:
        json.dump(rep, f, indent=2)
    print(json.dumps(rep, indent=2))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("stage", choices=["data", "vae", "ldm", "eval", "report"])
    p.add_argument("--arm", choices=["naive", "af"], default="af")
    p.add_argument("--minutes", type=float, default=None)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--num_images", type=int, default=2048)
    p.add_argument("--vae_batch", type=int, default=8)
    p.add_argument("--ldm_batch", type=int, default=16)
    p.add_argument("--eval_steps", type=int, default=50)
    p.add_argument("--shift_steps", type=int, default=16)
    p.add_argument("--sequential", action="store_true",
                   help="denoise shifts one-by-one (less device memory)")
    p.add_argument("--allow_step_mismatch", action="store_true",
                   help="report even when the arms' train steps differ")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu"])
    args = p.parse_args()
    {"data": stage_data, "vae": stage_vae, "ldm": stage_ldm,
     "eval": stage_eval, "report": stage_report}[args.stage](args)


if __name__ == "__main__":
    main()

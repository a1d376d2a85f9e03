"""Trainer smoke tests on tiny models + synthetic data (SURVEY.md §4):
losses finite and decreasing, EMA updates, checkpoint save/restore/rotation,
config loading of the reference-format JSONs."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from afldm_tpu.train import (load_training_config, create_trainer,
                             BaseTrainingConfig, VAETrainingConfig,
                             LDMTrainingConfig, I2SBLDMTrainingConfig,
                             SyntheticDataset, epoch_batches,
                             save_checkpoint, restore_checkpoint,
                             latest_checkpoint)
from afldm_tpu.models import UNet2DConfig, AutoencoderKLConfig


TINY_VAE_CFG = AutoencoderKLConfig(
    block_out_channels=(8, 8), layers_per_block=1, latent_channels=4,
    norm_num_groups=4, sample_size=16, scaling_factor=0.6, alias_free=True,
    down_filtered_act=(False, True), up_filtered_act=(True, False),
    up_rescale=(True,))

TINY_UNET_CFG = UNet2DConfig(
    sample_size=8, in_channels=4, out_channels=4,
    down_block_types=("AttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "AttnUpBlock2D"),
    block_out_channels=(16, 32), layers_per_block=1,
    attention_head_dim=8, norm_num_groups=4, alias_free=True)

SCHED_CFG = dict(num_train_timesteps=100, beta_schedule="scaled_linear",
                 beta_start=0.0015, beta_end=0.0195, clip_sample=False)


def _base(tmp_path, **kw):
    return BaseTrainingConfig(
        logging_dir="logs", output_dir=str(tmp_path), resolution=16,
        train_batch_size=4, num_epochs=1, seed=0, **kw)


def test_config_loader_reference_format(tmp_path):
    cfg = {"base": {"logging_dir": "logs", "output_dir": "out",
                    "train_batch_size": 16, "resolution": 256},
           "ldm": {"vae_path": "vp", "scheduler_path": "sp",
                   "af_models": True, "use_shift_loss": True,
                   "use_ema": True}}
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    out = load_training_config(str(p))
    assert isinstance(out["base"], BaseTrainingConfig)
    assert isinstance(out["ldm"], LDMTrainingConfig)
    assert out["ldm"].use_shift_loss and out["base"].train_batch_size == 16


def test_repo_configs_load():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rel in ("configs/vae/train_afvae_imagenet.json",
                "configs/ldm/train_unet_ffhq.json",
                "configs/sr/train_i2sb_imagenet.json"):
        out = load_training_config(os.path.join(root, rel))
        assert "base" in out and len(out) == 2


def _run_steps(trainer, n_steps, ds):
    logs = []
    step = 0
    for batch in epoch_batches(ds, 4, seed=0):
        logs.append(trainer.training_step(step, batch))
        step += 1
        if step >= n_steps:
            break
    return logs


def test_ldm_trainer_loss_decreases(tmp_path):
    base = _base(tmp_path)
    base.gradient_checkpointing = True  # exercise the remat path
    cfg = LDMTrainingConfig(vae_path="", scheduler_path="",
                            af_models=True, use_shift_loss=True,
                            use_cross_attn=True, use_ema=True,
                            learning_rate=2e-3, lr_warmup_steps=0)
    tr = create_trainer("ldm", base, cfg)
    tr.init_modules(vae_config=TINY_VAE_CFG, unet_config=TINY_UNET_CFG,
                    scheduler_config=SCHED_CFG)
    tr.init_optimizers(100)
    tr.prepare_modules()
    ds = SyntheticDataset(resolution=16, length=64)
    logs = _run_steps(tr, 12, ds)
    assert all(np.isfinite(l["train_loss"]) for l in logs)
    assert all(np.isfinite(l["shift_loss"]) for l in logs)
    first = np.mean([l["train_loss"] for l in logs[:4]])
    last = np.mean([l["train_loss"] for l in logs[-4:]])
    assert last < first, (first, last)
    # EMA params moved away from init
    d = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               tr.state.ema_params, tr.state.params))
    assert max(d) > 0


def test_vae_trainer_with_disc(tmp_path):
    base = _base(tmp_path)
    cfg = VAETrainingConfig(model_cfg="", use_shift_loss=True,
                            use_disc=True, learning_rate=1e-3,
                            lr_warmup_steps=0,
                            gradient_accumulation_steps=1)
    tr = create_trainer("vae", base, cfg)
    tr.init_modules(vae_config=TINY_VAE_CFG,
                    disc_config={"depth": 2, "hidden_channels": 16})
    tr.init_optimizers(100)
    tr.prepare_modules()
    ds = SyntheticDataset(resolution=16, length=32)
    logs = _run_steps(tr, 6, ds)
    gen_logs = [l for l in logs if "train_loss" in l]
    disc_logs = [l for l in logs if "train_loss_disc" in l]
    assert gen_logs and disc_logs
    assert all(np.isfinite(l["train_loss"]) for l in gen_logs)
    assert all(np.isfinite(l["train_loss_disc"]) for l in disc_logs)


def test_i2sb_trainer_runs(tmp_path):
    base = _base(tmp_path)
    cfg = I2SBLDMTrainingConfig(scheduler_path="", af_models=True,
                                use_cfa=True, learning_rate=1e-3,
                                lr_warmup_steps=0)
    tr = create_trainer("i2sb", base, cfg)
    tr.init_modules(vae_config=TINY_VAE_CFG, unet_config=TINY_UNET_CFG,
                    scheduler_config=dict(num_train_timesteps=100))
    tr.init_optimizers(100)
    tr.prepare_modules()
    ds = SyntheticDataset(resolution=16, length=32)
    logs = _run_steps(tr, 4, ds)
    assert all(np.isfinite(l["train_loss"]) for l in logs)


def test_checkpoint_roundtrip_and_rotation(tmp_path):
    state = {"a": np.arange(10, dtype=np.float32),
             "nested": {"b": np.ones((2, 3), np.float32)}}
    for step in (10, 20, 30, 40):
        s = {k: (v if not isinstance(v, dict)
                 else {kk: vv * step for kk, vv in v.items()})
             for k, v in state.items()}
        save_checkpoint(str(tmp_path), step, s, total_limit=2)
    dirs = sorted(os.listdir(tmp_path))
    assert [d for d in dirs if d.startswith("checkpoint-")] == \
        ["checkpoint-30", "checkpoint-40"]
    latest = latest_checkpoint(str(tmp_path))
    assert latest.endswith("checkpoint-40")
    restored = restore_checkpoint(latest, state)
    np.testing.assert_allclose(restored["nested"]["b"],
                               np.ones((2, 3)) * 40)


def test_train_cli_smoke(tmp_path):
    """Drive the CLI end-to-end for a few steps on synthetic data."""
    import subprocess, sys
    cfg = {"base": {"logging_dir": "logs", "output_dir": str(tmp_path / "o"),
                    "train_batch_size": 2, "resolution": 16,
                    "num_epochs": 1, "checkpointing_steps": 4,
                    "save_model_epochs": 1, "seed": 0},
           "ldm": {"vae_path": "", "scheduler_path": "",
                   "unet_config": "", "af_models": True,
                   "use_shift_loss": False, "learning_rate": 1e-3}}
    # the CLI loads configs from paths; write tiny model/scheduler jsons
    ucfg = {"sample_size": 8, "in_channels": 4, "out_channels": 4,
            "down_block_types": ["DownBlock2D"],
            "up_block_types": ["UpBlock2D"],
            "block_out_channels": [8], "layers_per_block": 1,
            "attention_head_dim": 4, "norm_num_groups": 4,
            "add_attention": False}
    vcfg = {"block_out_channels": [8, 8], "layers_per_block": 1,
            "latent_channels": 4, "norm_num_groups": 4, "sample_size": 16,
            "scaling_factor": 0.6, "up_rescale": [True],
            "down_filtered_act": [False, True],
            "up_filtered_act": [True, False]}
    scfg = {"num_train_timesteps": 100}
    (tmp_path / "unet.json").write_text(json.dumps(ucfg))
    (tmp_path / "vae").mkdir()
    (tmp_path / "vae" / "config.json").write_text(json.dumps(vcfg))
    (tmp_path / "sched.json").write_text(json.dumps(scfg))
    cfg["ldm"]["unet_config"] = str(tmp_path / "unet.json")
    cfg["ldm"]["vae_path"] = str(tmp_path / "vae")
    cfg["ldm"]["scheduler_path"] = str(tmp_path / "sched.json")
    (tmp_path / "cfg.json").write_text(json.dumps(cfg))

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(root, "train.py"),
         str(tmp_path / "cfg.json"), "--max_steps", "5",
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=600, cwd=root, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    ckpts = [d for d in os.listdir(tmp_path / "o")
             if d.startswith("checkpoint-")]
    assert ckpts, os.listdir(tmp_path / "o")


def test_spike_guard_logs_ratio(tmp_path):
    """--spike_guard reports loss_spike_ratio once >=50 steps of history
    exist (the guard behind BENCH_NOTES' shift-loss-variance analysis)."""
    import subprocess, sys
    cfg = {"base": {"logging_dir": "logs", "output_dir": str(tmp_path / "o"),
                    "train_batch_size": 2, "resolution": 16,
                    "num_epochs": 9, "checkpointing_steps": 1000,
                    "save_model_epochs": 100, "seed": 0},
           "ldm": {"vae_path": "", "scheduler_path": "",
                   "unet_config": "", "af_models": False,
                   "use_shift_loss": False, "learning_rate": 1e-3}}
    ucfg = {"sample_size": 8, "in_channels": 4, "out_channels": 4,
            "down_block_types": ["DownBlock2D"],
            "up_block_types": ["UpBlock2D"],
            "block_out_channels": [8], "layers_per_block": 1,
            "attention_head_dim": 4, "norm_num_groups": 4,
            "add_attention": False}
    vcfg = {"block_out_channels": [8, 8], "layers_per_block": 1,
            "latent_channels": 4, "norm_num_groups": 4, "sample_size": 16,
            "scaling_factor": 0.6, "up_rescale": [True],
            "down_filtered_act": [False, False],
            "up_filtered_act": [False, False]}
    (tmp_path / "unet.json").write_text(json.dumps(ucfg))
    (tmp_path / "vae").mkdir()
    (tmp_path / "vae" / "config.json").write_text(json.dumps(vcfg))
    (tmp_path / "sched.json").write_text(
        json.dumps({"num_train_timesteps": 100}))
    cfg["ldm"]["unet_config"] = str(tmp_path / "unet.json")
    cfg["ldm"]["vae_path"] = str(tmp_path / "vae")
    cfg["ldm"]["scheduler_path"] = str(tmp_path / "sched.json")
    (tmp_path / "cfg.json").write_text(json.dumps(cfg))

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(root, "train.py"),
         str(tmp_path / "cfg.json"), "--max_steps", "62",
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=600, cwd=root, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(l) for l in
            open(tmp_path / "o" / "logs" / "metrics.jsonl")]
    # windows before history fills must NOT carry the ratio; later must
    early = [r for r in rows if r["step"] <= 40]
    late = [r for r in rows if r["step"] >= 60]
    assert early and all("loss_spike_ratio" not in r for r in early), early
    assert late and all(
        np.isfinite(r["loss_spike_ratio"]) for r in late), late


def test_scale_lr(tmp_path):
    """scale_lr multiplies lr by grad_accum * batch (ldm_trainer.py:163)."""
    from afldm_tpu.train.trainer import make_optimizer
    import optax
    cfg = LDMTrainingConfig(vae_path="", scheduler_path="",
                            learning_rate=1e-4, lr_warmup_steps=0,
                            scale_lr=True)
    tx = make_optimizer(cfg, 10, grad_accum=1, train_batch_size=16)
    params = {"w": jnp.ones((2,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((2,))}
    updates, _ = tx.update(grads, state, params)
    # adam first step of unit grads ~= -lr * (1 + weight_decay);
    # scaled lr = 1e-4 * 16
    np.testing.assert_allclose(np.asarray(updates["w"]), -1.6e-3, rtol=0.05)


def test_ldm_pretrained_paths(tmp_path):
    """vae_path / unet_path load weights from save_pipeline dirs
    (ref ldm_trainer.py:113-123)."""
    base = _base(tmp_path)
    cfg = LDMTrainingConfig(vae_path="", scheduler_path="",
                            use_shift_loss=False, use_cross_attn=False,
                            use_ema=True, learning_rate=1e-3,
                            lr_warmup_steps=0)
    tr = create_trainer("ldm", base, cfg)
    tr.init_modules(vae_config=TINY_VAE_CFG, unet_config=TINY_UNET_CFG,
                    scheduler_config=SCHED_CFG)
    tr.init_optimizers(10)
    tr.prepare_modules()
    ds = SyntheticDataset(resolution=16, length=8)
    _run_steps(tr, 2, ds)
    pipe_dir = str(tmp_path / "pipeline")
    tr.save_pipeline(pipe_dir)

    cfg2 = LDMTrainingConfig(vae_path=pipe_dir, unet_path=pipe_dir,
                             scheduler_path="", use_shift_loss=False,
                             use_cross_attn=False, use_ema=False,
                             learning_rate=1e-3, lr_warmup_steps=0)
    tr2 = create_trainer("ldm", base, cfg2)
    tr2.init_modules(vae_config=TINY_VAE_CFG, scheduler_config=SCHED_CFG)
    tr2.init_optimizers(10)
    tr2.prepare_modules()
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.params),
                    jax.tree_util.tree_leaves(tr2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_vae_validate_defaults(tmp_path):
    """validate() reconstructs the first train samples without explicit
    images (ref vae_trainer.py:288-291)."""
    base = _base(tmp_path)
    cfg = VAETrainingConfig(model_cfg="", use_shift_loss=False,
                            use_disc=False, learning_rate=1e-3,
                            lr_warmup_steps=0,
                            gradient_accumulation_steps=1)
    tr = create_trainer("vae", base, cfg)
    tr.init_modules(vae_config=TINY_VAE_CFG)
    tr.init_optimizers(10)
    tr.prepare_modules()
    tr.set_dataset(SyntheticDataset(resolution=16, length=8))
    out = tr.validate(0)
    assert "val_mse" in out and np.isfinite(out["val_mse"])
    assert out["recon"].shape[0] == 5


def test_ldm_trainer_vqvae(tmp_path):
    """is_vqvae swaps the autoencoder for the VQModel (pre-quantize
    latents in training, ref ldm_trainer.py:113-115,213-214)."""
    from afldm_tpu.models import VQModelConfig
    base = _base(tmp_path)
    cfg = LDMTrainingConfig(vae_path="", scheduler_path="", is_vqvae=True,
                            use_shift_loss=False, use_cross_attn=False,
                            use_ema=False, learning_rate=1e-3,
                            lr_warmup_steps=0)
    vq_cfg = VQModelConfig(block_out_channels=(8, 8), layers_per_block=1,
                           norm_num_groups=4, latent_channels=4,
                           vq_embed_dim=4, num_vq_embeddings=16,
                           sample_size=16, scaling_factor=1.0)
    tr = create_trainer("ldm", base, cfg)
    tr.init_modules(vae_config=vq_cfg, unet_config=TINY_UNET_CFG,
                    scheduler_config=SCHED_CFG)
    tr.init_optimizers(10)
    tr.prepare_modules()
    ds = SyntheticDataset(resolution=16, length=16)
    logs = _run_steps(tr, 3, ds)
    assert all(np.isfinite(l["train_loss"]) for l in logs)


def test_ldm_vae_path_from_ema_free_vae_pipeline(tmp_path):
    """Regression: a VAE-trainer save_pipeline dir written with use_ema=False
    stores model_ema={}; the LDM trainer's vae_path restore must still load
    the real VAE weights (the earlier strict-restore + swallowed exception
    silently trained the LDM against a RANDOM vae)."""
    base = _base(tmp_path)
    vcfg = VAETrainingConfig(model_cfg="", use_shift_loss=False,
                             use_disc=False, use_ema=False,
                             learning_rate=1e-3, lr_warmup_steps=0,
                             gradient_accumulation_steps=1)
    vt = create_trainer("vae", base, vcfg)
    vt.init_modules(vae_config=TINY_VAE_CFG)
    vt.init_optimizers(4)
    vt.prepare_modules()
    _run_steps(vt, 1, SyntheticDataset(resolution=16, length=4))
    vae_dir = str(tmp_path / "vae_pipeline")
    vt.save_pipeline(vae_dir)

    cfg = LDMTrainingConfig(vae_path=vae_dir, scheduler_path="",
                            use_shift_loss=False, use_cross_attn=False,
                            use_ema=False, learning_rate=1e-3,
                            lr_warmup_steps=0)
    tr = create_trainer("ldm", base, cfg)
    tr.init_modules(vae_config=TINY_VAE_CFG, unet_config=TINY_UNET_CFG,
                    scheduler_config=SCHED_CFG)
    tr.init_optimizers(4)
    tr.prepare_modules()
    for a, b in zip(jax.tree_util.tree_leaves(vt.state.params),
                    jax.tree_util.tree_leaves(tr.vae_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_vae_validate_ffd(tmp_path):
    """With valid_data_dir set, validate() reports the reconstruction
    Frechet feature distance through utils.metric_utils.FeatureStats."""
    from afldm_tpu.train.data import render_dead_leaves_folder
    vdir = str(tmp_path / "valid")
    render_dead_leaves_folder(vdir, resolution=16, length=4, seed=1)
    base = _base(tmp_path, valid_data_dir=vdir)
    cfg = VAETrainingConfig(model_cfg="", use_shift_loss=False,
                            use_disc=False, learning_rate=1e-3,
                            lr_warmup_steps=0,
                            gradient_accumulation_steps=1)
    tr = create_trainer("vae", base, cfg)
    tr.init_modules(vae_config=TINY_VAE_CFG)
    tr.init_optimizers(10)
    tr.prepare_modules()
    tr.set_dataset(SyntheticDataset(resolution=16, length=8))
    out = tr.validate(0)
    assert "valid_recon_ffd" in out
    assert np.isfinite(out["valid_recon_ffd"])
    assert out["valid_recon_ffd"] >= -1e-6  # a distance


def test_ldm_remat_policy_dots_matches_full(tmp_path):
    """remat_policy only changes WHAT is rematerialized, never the math:
    a "dots" run must produce the same losses as "full" (same seeds)."""
    def run(policy):
        base = _base(tmp_path / policy)
        base.gradient_checkpointing = True
        base.remat_policy = policy
        cfg = LDMTrainingConfig(vae_path="", scheduler_path="",
                                af_models=True, use_shift_loss=False,
                                use_cross_attn=False, use_ema=False,
                                learning_rate=2e-3, lr_warmup_steps=0)
        tr = create_trainer("ldm", base, cfg)
        tr.init_modules(vae_config=TINY_VAE_CFG, unet_config=TINY_UNET_CFG,
                        scheduler_config=SCHED_CFG)
        tr.init_optimizers(100)
        tr.prepare_modules()
        ds = SyntheticDataset(resolution=16, length=16)
        return [l["train_loss"] for l in _run_steps(tr, 3, ds)]

    full = run("full")
    dots = run("dots")
    np.testing.assert_allclose(dots, full, rtol=1e-5)

    import pytest
    from afldm_tpu.train.trainer import remat_policy as rp
    with pytest.raises(ValueError):
        rp("bogus")


def test_af_precision_config_knob(tmp_path):
    """base.af_precision flows from JSON to ops.ideal_lpf.set_af_precision
    (the training-MFU lever measured in BENCH_NOTES round 5)."""
    import json
    import jax
    from afldm_tpu.train import load_training_config
    from afldm_tpu.ops import ideal_lpf

    cfg = {"base": {"output_dir": str(tmp_path), "af_precision": "high"},
           "vae": {"model_cfg": ""}}
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    loaded = load_training_config(str(p))
    assert loaded["base"].af_precision == "high"
    # default stays exact
    assert ideal_lpf.af_precision() == jax.lax.Precision.HIGHEST
    try:
        ideal_lpf.set_af_precision(loaded["base"].af_precision)
        assert ideal_lpf.af_precision() == jax.lax.Precision.HIGH
    finally:
        ideal_lpf.set_af_precision("highest")

"""End-to-end smoke of scripts/eval_gen_fd.py — the live consumer of
utils/metric_utils (FeatureStats + ProgressMonitor + frechet_distance)
over a real saved pipeline and a real image folder."""

import json
import os
import subprocess
import sys

import jax


def test_eval_gen_fd_script(tmp_path):
    from afldm_tpu.models import UNet2DConfig, AutoencoderKLConfig
    from afldm_tpu.train import (BaseTrainingConfig, LDMTrainingConfig,
                                 SyntheticDataset, epoch_batches)
    from afldm_tpu.train.trainer import create_trainer
    from afldm_tpu.train.data import render_dead_leaves_folder

    vae_cfg = AutoencoderKLConfig(
        block_out_channels=(8, 8), layers_per_block=1, latent_channels=4,
        norm_num_groups=4, sample_size=16, scaling_factor=0.6)
    unet_cfg = UNet2DConfig(
        sample_size=8, down_block_types=("DownBlock2D",),
        up_block_types=("UpBlock2D",), block_out_channels=(8,),
        layers_per_block=1, attention_head_dim=4, norm_num_groups=4,
        add_attention=False)

    base = BaseTrainingConfig(logging_dir="logs", output_dir=str(tmp_path),
                              resolution=16, train_batch_size=4,
                              num_epochs=1, seed=0)
    cfg = LDMTrainingConfig(vae_path="", scheduler_path="", af_models=False,
                            use_shift_loss=False, learning_rate=1e-3,
                            lr_warmup_steps=0, use_ema=True)
    tr = create_trainer("ldm", base, cfg)
    tr.init_modules(vae_config=vae_cfg, unet_config=unet_cfg,
                    scheduler_config=dict(num_train_timesteps=100))
    tr.init_optimizers(10)
    tr.prepare_modules()
    ds = SyntheticDataset(resolution=16, length=4)
    for i, b in enumerate(epoch_batches(ds, 4, seed=0)):
        tr.training_step(i, b)
    pipe_dir = tmp_path / "pipeline"
    tr.save_pipeline(str(pipe_dir))

    data_dir = tmp_path / "train"
    render_dead_leaves_folder(str(data_dir), resolution=16, length=8,
                              seed=0)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "gen_fd.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "eval_gen_fd.py"),
         "--pipeline_dir", str(pipe_dir), "--data_dir", str(data_dir),
         "--out", str(out), "--num_samples", "4", "--num_real", "8",
         "--batch", "4", "--steps", "2", "--resolution", "16",
         "--pool", "4", "--platform", "cpu"],
        capture_output=True, text=True, timeout=600, cwd=root, env=env)
    assert r.returncode == 0, r.stderr[-2000:]

    res = json.loads(out.read_text())
    assert res["num_real"] == 8 and res["num_samples"] == 4
    assert res["pixel_feature_dim"] == 4 * 4 * 3
    assert res["rvgg_feature_dim"] == 896  # 4x4 cells x (8+16+32) channels
    for k in ("fd_pixel_pool", "fd_rvgg", "fd_vae_latent"):
        v = res[k]
        assert isinstance(v, float) and v >= 0.0, (k, v)

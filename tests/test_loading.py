"""Pipeline serialization round trip + CLI resume-from-checkpoint."""

import json
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from afldm_tpu.models import UNet2DConfig, AutoencoderKLConfig
from afldm_tpu.train import (BaseTrainingConfig, LDMTrainingConfig,
                             SyntheticDataset, epoch_batches)
from afldm_tpu.train.trainer import create_trainer
from afldm_tpu.pipelines.loading import load_pipeline


TINY_VAE = AutoencoderKLConfig(
    block_out_channels=(8, 8), layers_per_block=1, latent_channels=4,
    norm_num_groups=4, sample_size=16, scaling_factor=0.6, alias_free=True,
    down_filtered_act=(False, True), up_filtered_act=(True, False),
    up_rescale=(True,))
TINY_UNET = UNet2DConfig(
    sample_size=8, down_block_types=("DownBlock2D",),
    up_block_types=("UpBlock2D",), block_out_channels=(8,),
    layers_per_block=1, attention_head_dim=4, norm_num_groups=4,
    add_attention=False, alias_free=True)


def test_save_pipeline_then_load(tmp_path):
    base = BaseTrainingConfig(logging_dir="logs", output_dir=str(tmp_path),
                              resolution=16, train_batch_size=4,
                              num_epochs=1, seed=0)
    cfg = LDMTrainingConfig(vae_path="", scheduler_path="", af_models=True,
                            use_shift_loss=False, learning_rate=1e-3,
                            lr_warmup_steps=0, use_ema=True)
    tr = create_trainer("ldm", base, cfg)
    tr.init_modules(vae_config=TINY_VAE, unet_config=TINY_UNET,
                    scheduler_config=dict(num_train_timesteps=100))
    tr.init_optimizers(10)
    tr.prepare_modules()
    ds = SyntheticDataset(resolution=16, length=8)
    for i, b in enumerate(epoch_batches(ds, 4, seed=0)):
        tr.training_step(i, b)

    out = tmp_path / "pipeline"
    tr.save_pipeline(str(out))
    assert (out / "unet_config.json").exists()
    assert (out / "vae_config.json").exists()

    pipe = load_pipeline(str(out))
    # loaded EMA params equal the trainer's
    for a, b in zip(jax.tree_util.tree_leaves(pipe.unet_params),
                    jax.tree_util.tree_leaves(tr.state.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    img = pipe(batch_size=1, key=jax.random.PRNGKey(0),
               num_inference_steps=2)
    assert img.shape == (1, 16, 16, 3) and np.isfinite(img).all()


def test_cli_resume(tmp_path):
    """Train 4 steps, kill, resume from checkpoint-4, continue."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ucfg = {"sample_size": 8, "down_block_types": ["DownBlock2D"],
            "up_block_types": ["UpBlock2D"], "block_out_channels": [8],
            "layers_per_block": 1, "attention_head_dim": 4,
            "norm_num_groups": 4, "add_attention": False}
    vcfg = {"block_out_channels": [8, 8], "layers_per_block": 1,
            "latent_channels": 4, "norm_num_groups": 4, "sample_size": 16,
            "scaling_factor": 0.6, "up_rescale": [True],
            "down_filtered_act": [False, True],
            "up_filtered_act": [True, False]}
    (tmp_path / "unet.json").write_text(json.dumps(ucfg))
    (tmp_path / "vae").mkdir()
    (tmp_path / "vae" / "config.json").write_text(json.dumps(vcfg))
    (tmp_path / "sched.json").write_text(json.dumps(
        {"num_train_timesteps": 100}))
    cfg = {"base": {"logging_dir": "logs",
                    "output_dir": str(tmp_path / "o"),
                    "train_batch_size": 2, "resolution": 16,
                    "num_epochs": 2, "checkpointing_steps": 4,
                    "save_model_epochs": 10, "seed": 0,
                    "resume_from_checkpoint": "latest"},
           "ldm": {"vae_path": str(tmp_path / "vae"),
                   "scheduler_path": str(tmp_path / "sched.json"),
                   "unet_config": str(tmp_path / "unet.json"),
                   "af_models": True, "use_shift_loss": False,
                   "learning_rate": 1e-3}}
    (tmp_path / "cfg.json").write_text(json.dumps(cfg))

    env = dict(os.environ, JAX_PLATFORMS="cpu")

    def run(max_steps):
        return subprocess.run(
            [sys.executable, os.path.join(root, "train.py"),
             str(tmp_path / "cfg.json"), "--max_steps", str(max_steps),
             "--platform", "cpu"],
            capture_output=True, text=True, timeout=600, cwd=root, env=env)

    out1 = run(4)
    assert out1.returncode == 0, out1.stderr[-2000:]
    assert (tmp_path / "o" / "checkpoint-4").exists()

    out2 = run(6)
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert "resuming from" in out2.stderr + out2.stdout
    assert (tmp_path / "o" / "checkpoint-6").exists()


def test_async_checkpoint_roundtrip(tmp_path):
    """block=False schedules a background write; wait_for_checkpoints (or
    restore) commits it. Rotation only ever sees committed dirs."""
    import jax.numpy as jnp
    from afldm_tpu.train import (save_checkpoint, restore_checkpoint,
                                 latest_checkpoint, wait_for_checkpoints)

    state = {"w": jnp.arange(8, dtype=jnp.float32), "step": jnp.asarray(3)}
    for step in (1, 2, 3):
        save_checkpoint(str(tmp_path), step, state, total_limit=2,
                        block=False)
    wait_for_checkpoints()
    # rotation (applied at schedule time over committed dirs) keeps <= 2 +
    # any write that was still in flight; after the final wait the newest
    # must exist and restore exactly
    latest = latest_checkpoint(str(tmp_path))
    assert latest.endswith("checkpoint-3")
    got = restore_checkpoint(latest, state)
    assert float(got["w"][5]) == 5.0 and int(got["step"]) == 3


def test_convert_reference_checkpoint_rehearsal(tmp_path):
    """End-to-end ingestion rehearsal (VERDICT r2 item 2): synthesize a
    diffusers pipeline directory (unet/ + vae/ + scheduler/ subfolders,
    torch-side keys in safetensors — the exact layout
    SingleZombie/alias_free_ldm_ffhq ships, ref shift_ldm_ffhq.py:165-170),
    run scripts/convert_reference_checkpoint.py's converter, load the
    result with load_pipeline, and require the loaded pipeline's UNet+VAE
    forwards to match the source params exactly."""
    import json
    import numpy as np
    import jax
    import jax.numpy as jnp
    pytest.importorskip("safetensors")
    from safetensors.numpy import save_file

    from afldm_tpu.models import (UNet2DModel, UNet2DConfig,
                                  AutoencoderKL, AutoencoderKLConfig)
    from afldm_tpu.models.convert import flax_to_torch
    from afldm_tpu.pipelines.loading import load_pipeline
    sys_path = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(sys_path, "scripts"))
    from convert_reference_checkpoint import convert_pipeline_dir

    unet_cfg = {"sample_size": 8, "in_channels": 4, "out_channels": 4,
                "down_block_types": ["DownBlock2D", "AttnDownBlock2D"],
                "up_block_types": ["AttnUpBlock2D", "UpBlock2D"],
                "block_out_channels": [8, 16], "layers_per_block": 1,
                "attention_head_dim": 8, "norm_num_groups": 4}
    vae_cfg = {"block_out_channels": [8, 8], "layers_per_block": 1,
               "latent_channels": 4, "norm_num_groups": 4,
               "sample_size": 16, "scaling_factor": 0.6,
               "up_rescale": [True], "down_filtered_act": [False, True],
               "up_filtered_act": [True, False], "mid_act": True}

    key = jax.random.PRNGKey(7)
    unet = UNet2DModel(UNet2DConfig.from_diffusers(unet_cfg,
                                                   alias_free=True))
    vae = AutoencoderKL(AutoencoderKLConfig.from_diffusers(vae_cfg))
    lat = jnp.zeros((1, 8, 8, 4))
    img = jnp.zeros((1, 16, 16, 3))
    k1, k2 = jax.random.split(key)
    unet_params = unet.init(k1, lat, jnp.zeros((1,), jnp.int32))
    vae_params = vae.init(k2, img)

    # ---- synthesize the published-checkpoint layout
    src = tmp_path / "hub"
    for sub, cfg, params in (("unet", unet_cfg, unet_params),
                             ("vae", vae_cfg, vae_params)):
        (src / sub).mkdir(parents=True)
        (src / sub / "config.json").write_text(json.dumps(cfg))
        sd = {k: np.ascontiguousarray(v)
              for k, v in flax_to_torch(params).items()}
        save_file(sd, str(src / sub / "diffusion_pytorch_model.safetensors"))
    (src / "scheduler").mkdir()
    (src / "scheduler" / "scheduler_config.json").write_text(json.dumps(
        {"num_train_timesteps": 1000, "beta_schedule": "scaled_linear",
         "beta_start": 0.0015, "beta_end": 0.0195, "clip_sample": False}))

    # ---- one command
    out = str(tmp_path / "converted")
    convert_pipeline_dir(str(src), out, alias_free=True, log=lambda *a: None)

    # ---- and the result must load + run with zero new code
    pipe = load_pipeline(out)
    assert pipe.unet.config.alias_free
    assert pipe.scheduler.num_train_timesteps == 1000

    r = np.random.default_rng(0)
    z = jnp.asarray(r.standard_normal((1, 8, 8, 4)), jnp.float32)
    x = jnp.asarray(r.standard_normal((1, 16, 16, 3)), jnp.float32)
    t = jnp.asarray([3], jnp.int32)

    want_eps = unet.apply(unet_params, z, t)[0]
    got_eps = pipe.unet.apply(pipe.unet_params, z, t)[0]
    np.testing.assert_allclose(np.asarray(got_eps), np.asarray(want_eps),
                               atol=1e-5)
    want_mu = vae.apply(vae_params, x, method="encode")[0]
    got_mu = pipe.vae.apply(pipe.vae_params, x, method="encode")[0]
    np.testing.assert_allclose(np.asarray(got_mu), np.asarray(want_mu),
                               atol=1e-5)


def test_convert_sd_checkpoint_with_controlnet(tmp_path):
    """SD-family ingestion rehearsal: conditional UNet + controlnet +
    text_encoder/tokenizer subfolders convert and load through
    load_sd_components with weights preserved and the REAL tokenizer."""
    import json
    import numpy as np
    import jax
    import jax.numpy as jnp
    pytest.importorskip("safetensors")
    pytest.importorskip("torch")
    from safetensors.numpy import save_file
    from transformers import CLIPTextConfig, CLIPTextModel

    from afldm_tpu.models import (UNet2DConditionModel,
                                  UNet2DConditionConfig, ControlNetModel,
                                  ControlNetConfig, AutoencoderKL,
                                  AutoencoderKLConfig)
    from afldm_tpu.models.convert import flax_to_torch
    from afldm_tpu.pipelines.loading import load_sd_components
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    from convert_reference_checkpoint import convert_pipeline_dir

    unet_cfg = {"sample_size": 8, "in_channels": 4, "out_channels": 4,
                "down_block_types": ["CrossAttnDownBlock2D", "DownBlock2D"],
                "up_block_types": ["UpBlock2D", "CrossAttnUpBlock2D"],
                "block_out_channels": [16, 32], "layers_per_block": 1,
                "attention_head_dim": 2, "cross_attention_dim": 16,
                "norm_num_groups": 8}
    vae_cfg = {"block_out_channels": [8, 8], "layers_per_block": 1,
               "latent_channels": 4, "norm_num_groups": 4,
               "sample_size": 16, "scaling_factor": 0.6}

    key = jax.random.PRNGKey(3)
    ucfg = UNet2DConditionConfig.from_diffusers(unet_cfg, alias_free=True)
    unet = UNet2DConditionModel(ucfg)
    vae = AutoencoderKL(AutoencoderKLConfig.from_diffusers(vae_cfg))
    ccfg = ControlNetConfig.from_unet_config(ucfg)
    cn = ControlNetModel(ccfg)
    lat = jnp.zeros((1, 8, 8, 4))
    ehs = jnp.zeros((1, 77, 16))
    k1, k2, k3 = jax.random.split(key, 3)
    up = unet.init(k1, lat, jnp.zeros((1,), jnp.int32), ehs)
    vp = vae.init(k2, jnp.zeros((1, 16, 16, 3)))
    cp = cn.init(k3, lat, jnp.zeros((1,), jnp.int32), ehs, lat)

    src = tmp_path / "hub"
    cn_diffusers_cfg = dict(unet_cfg)  # controlnet config mirrors the unet's
    for sub, cfg, params in (("unet", unet_cfg, up), ("vae", vae_cfg, vp),
                             ("controlnet", cn_diffusers_cfg, cp)):
        (src / sub).mkdir(parents=True)
        (src / sub / "config.json").write_text(json.dumps(cfg))
        save_file({k: np.ascontiguousarray(v)
                   for k, v in flax_to_torch(params).items()},
                  str(src / sub / "diffusion_pytorch_model.safetensors"))

    # tiny real CLIP text encoder + vocab (zero egress)
    toks = (["<|startoftext|>", "<|endoftext|>"]
            + [c for c in "abcdefghij"] + [c + "</w>" for c in "abcdefghij"])
    vocab = {t: i for i, t in enumerate(toks)}
    (src / "tokenizer").mkdir()
    (src / "tokenizer" / "vocab.json").write_text(json.dumps(vocab))
    (src / "tokenizer" / "merges.txt").write_text("#version: 0.2\n")
    tc = CLIPTextConfig(vocab_size=len(vocab), hidden_size=16,
                        intermediate_size=32, num_hidden_layers=2,
                        num_attention_heads=2, max_position_embeddings=12,
                        projection_dim=16,
                        bos_token_id=vocab["<|startoftext|>"],
                        eos_token_id=vocab["<|endoftext|>"])
    (src / "text_encoder").mkdir()
    CLIPTextModel(tc).save_pretrained(src / "text_encoder")

    out = str(tmp_path / "converted")
    convert_pipeline_dir(str(src), out, alias_free=True, log=lambda *a: None)
    parts = load_sd_components(out)

    # weights preserved through torch round-trip
    r = np.random.default_rng(0)
    z = jnp.asarray(r.standard_normal((1, 8, 8, 4)), jnp.float32)
    e = jnp.asarray(r.standard_normal((1, 77, 16)), jnp.float32)
    t = jnp.asarray([5], jnp.int32)
    want, _ = unet.apply(up, z, t, e)
    got, _ = parts["unet"].apply(parts["unet_params"], z, t, e)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    wd, wm, _ = cn.apply(cp, z, t, e, z)
    gd, gm, _ = parts["controlnet"].apply(parts["controlnet_params"], z, t,
                                          e, z)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(wm), atol=1e-5)
    for a, b in zip(gd, wd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # real tokenizer branch active (from the tokenizer/ subfolder)
    te = parts["text_encoder"]
    assert te._tokenizer is not None
    ids = te.tokenize(["abc"])
    assert ids.shape == (1, 12)


def test_load_pipeline_fails_loud_without_checkpoint(tmp_path):
    """VERDICT r3 item 4: a pipeline dir without checkpoint-* must raise,
    never silently score random weights. allow_random=True opts back in."""
    out = tmp_path / "pipeline"
    os.makedirs(out)
    with open(out / "unet_config.json", "w") as f:
        json.dump(TINY_UNET.to_dict(), f)
    with open(out / "vae_config.json", "w") as f:
        json.dump(TINY_VAE.to_dict(), f)

    with pytest.raises(FileNotFoundError, match="no checkpoint"):
        load_pipeline(str(out))
    pipe = load_pipeline(str(out), allow_random=True)
    assert pipe.unet.config.sample_size == TINY_UNET.sample_size


def test_load_pipeline_fails_loud_on_missing_subtree(tmp_path):
    """A checkpoint that holds a unet but no vae subtree must raise too."""
    from afldm_tpu.train.checkpoint import save_checkpoint
    from afldm_tpu.pipelines.loading import init_random_pipeline

    out = tmp_path / "pipeline"
    os.makedirs(out)
    with open(out / "unet_config.json", "w") as f:
        json.dump(TINY_UNET.to_dict(), f)
    with open(out / "vae_config.json", "w") as f:
        json.dump(TINY_VAE.to_dict(), f)
    ref = init_random_pipeline(TINY_UNET.to_dict(), TINY_VAE.to_dict(),
                               {"num_train_timesteps": 100}, seed=3)
    save_checkpoint(str(out), 1, {"unet": jax.device_get(ref.unet_params)})

    with pytest.raises(FileNotFoundError, match="vae"):
        load_pipeline(str(out))
    pipe = load_pipeline(str(out), allow_random=True, use_ema=False)
    for a, b in zip(jax.tree_util.tree_leaves(pipe.unet_params),
                    jax.tree_util.tree_leaves(ref.unet_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_load_pipeline_af_precision_knob(tmp_path):
    """load_pipeline(af_precision=...) is the serving-side counterpart of
    BaseConfig.af_precision: it reconfigures the process-global circulant
    MXU precision before the pipeline traces; None leaves it untouched."""
    from afldm_tpu.ops.ideal_lpf import af_precision, set_af_precision

    out = tmp_path / "pipeline"
    os.makedirs(out)
    with open(out / "unet_config.json", "w") as f:
        json.dump(TINY_UNET.to_dict(), f)
    with open(out / "vae_config.json", "w") as f:
        json.dump(TINY_VAE.to_dict(), f)

    assert af_precision() == jax.lax.Precision.HIGHEST
    try:
        load_pipeline(str(out), allow_random=True, af_precision="default")
        assert af_precision() == jax.lax.Precision.DEFAULT
        # None must not reset an operator-chosen setting
        load_pipeline(str(out), allow_random=True)
        assert af_precision() == jax.lax.Precision.DEFAULT
        with pytest.raises(KeyError):
            load_pipeline(str(out), allow_random=True, af_precision="bogus")
    finally:
        set_af_precision("highest")

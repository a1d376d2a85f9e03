"""Config-flag precedence audit across every ``from_diffusers`` (VERDICT r3
items 1a/5). Contract for the ``alias_free`` flag:

    explicit key in the dict  >  kwarg  >  heuristic/default

The round-3 failure artifact was `AutoencoderKLConfig.from_diffusers`
clobbering an explicit ``"alias_free": false`` whenever AF shape keys
(``up_rescale`` etc.) were present — which silently trained the flagship
"naive" VAE with the alias-free wiring ON (results/flagship_ab/naive).
These tests pin that class of drift for all five config classes and check
``to_dict`` round-trips.
"""

import json
import os

import jax
import jax.numpy as jnp
import pytest

from afldm_tpu.models import (AutoencoderKL, AutoencoderKLConfig,
                              UNet2DConfig, UNet2DConditionConfig,
                              ControlNetConfig, VQModelConfig)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (config class, minimal-but-valid diffusers dict with AF extras retained)
CASES = [
    (AutoencoderKLConfig, {
        "block_out_channels": [8, 16], "layers_per_block": 1,
        "norm_num_groups": 8, "latent_channels": 4, "sample_size": 32,
        # AF shape keys present — the heuristic bait
        "up_rescale": [True], "down_filtered_act": [True, True],
        "up_filtered_act": [True, True], "mid_act": True,
    }),
    (VQModelConfig, {
        "block_out_channels": [8, 16], "layers_per_block": 1,
        "norm_num_groups": 8, "latent_channels": 3, "sample_size": 32,
    }),
    (UNet2DConfig, {
        "block_out_channels": [8, 16], "layers_per_block": 1,
        "norm_num_groups": 8, "in_channels": 4, "out_channels": 4,
        "sample_size": 8,
    }),
    (UNet2DConditionConfig, {
        "block_out_channels": [8, 16], "layers_per_block": 1,
        "norm_num_groups": 8, "in_channels": 4, "out_channels": 4,
        "sample_size": 8, "cross_attention_dim": 16,
    }),
    (ControlNetConfig, {
        "block_out_channels": [8, 16], "layers_per_block": 1,
        "norm_num_groups": 8, "in_channels": 4,
        "sample_size": 8, "cross_attention_dim": 16,
    }),
]


@pytest.mark.parametrize("cls,base", CASES,
                         ids=[c.__name__ for c, _ in CASES])
@pytest.mark.parametrize("explicit", [False, True])
def test_explicit_key_beats_kwarg_and_heuristic(cls, base, explicit):
    cfg = dict(base, alias_free=explicit)
    # explicit key wins over every kwarg value
    for kwarg in (None, False, True):
        kw = {} if kwarg is None else {"alias_free": kwarg}
        assert cls.from_diffusers(cfg, **kw).alias_free is explicit, \
            (cls.__name__, kwarg)


@pytest.mark.parametrize("cls,base", CASES,
                         ids=[c.__name__ for c, _ in CASES])
def test_kwarg_beats_heuristic_and_default(cls, base):
    assert cls.from_diffusers(dict(base), alias_free=True).alias_free is True
    assert cls.from_diffusers(dict(base),
                              alias_free=False).alias_free is False


@pytest.mark.parametrize("cls,base", CASES,
                         ids=[c.__name__ for c, _ in CASES])
def test_to_dict_roundtrip(cls, base):
    for flag in (False, True):
        c = cls.from_diffusers(dict(base, alias_free=flag))
        c2 = cls.from_diffusers(c.to_dict())
        assert c2.alias_free is flag
        assert c2.to_dict() == c.to_dict()


def test_vae_heuristic_only_without_explicit_key():
    """The AF-keys heuristic still works when nothing explicit is given."""
    base = dict(CASES[0][1])
    assert AutoencoderKLConfig.from_diffusers(base).alias_free is True
    base.pop("up_rescale")
    assert AutoencoderKLConfig.from_diffusers(base).alias_free is False


def test_flagship_naive_artifact_regression():
    """The exact round-3 failure: configs/vae/model_afvae.json with
    ``alias_free`` forced false (AF shape keys retained, as
    scripts/flagship_ab.py writes it) must produce genuinely naive wiring —
    config flag false AND no filtered-activation / AF-resample modules in
    the bound model (vae.py Encoder/Decoder gate every AF branch on
    cfg.alias_free)."""
    with open(os.path.join(REPO, "configs/vae/model_afvae.json")) as f:
        model_cfg = json.load(f)
    model_cfg["sample_size"] = 32
    model_cfg["alias_free"] = False

    cfg = AutoencoderKLConfig.from_diffusers(model_cfg)
    assert cfg.alias_free is False
    # the saved pipeline config (what load_pipeline reads back) stays naive
    assert AutoencoderKLConfig.from_diffusers(
        cfg.to_dict()).alias_free is False

    # and the wiring is functionally naive: a naive-config VAE must equal a
    # from-scratch naive VAE (no AF keys at all) on the same params/input
    naive_cfg = AutoencoderKLConfig.from_diffusers(
        {k: v for k, v in model_cfg.items()
         if k not in ("alias_free", "mid_act", "down_filtered_act",
                      "up_filtered_act", "up_rescale")})
    assert naive_cfg.alias_free is False
    m1, m2 = AutoencoderKL(cfg), AutoencoderKL(naive_cfg)
    x = jnp.linspace(-1, 1, 32 * 32 * 3).reshape(1, 32, 32, 3)
    p = jax.jit(m1.init)(jax.random.PRNGKey(0), x)
    y1, _, _ = jax.jit(m1.apply)(p, x)
    y2, _, _ = jax.jit(m2.apply)(p, x)
    assert jnp.allclose(y1, y2, atol=1e-6)


def test_flagship_report_refuses_invalid_arms(tmp_path, monkeypatch):
    """scripts/flagship_ab.py report must refuse wiring-mismatched or
    step-mismatched arms (the round-3 failure artifact) and compute the
    gains when both arms are valid."""
    import importlib
    import json
    import sys
    import types

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    fab = importlib.import_module("flagship_ab")
    monkeypatch.setattr(fab, "ROOT", str(tmp_path))

    def write(arm, vae_af, unet_af, vae_steps, ldm_steps, psnr):
        d = os.path.join(str(tmp_path), arm)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "eval.json"), "w") as f:
            json.dump({"arm": arm, "vae_alias_free": vae_af,
                       "unet_alias_free": unet_af,
                       "vae_train_steps": vae_steps,
                       "ldm_train_steps": ldm_steps,
                       "mean_masked_psnr": psnr,
                       "frac_shift_psnr": psnr - 0.1}, f)

    args = types.SimpleNamespace(allow_step_mismatch=False)

    # AF-wired "naive" arm (the r3 artifact) -> refused
    write("naive", True, False, 2020, 4500, 20.0)
    write("af", True, True, 2020, 4500, 21.7)
    with pytest.raises(AssertionError):
        fab.stage_report(args)

    # step-mismatched arms -> refused unless explicitly allowed
    write("naive", False, False, 2020, 2000, 20.0)
    with pytest.raises(AssertionError):
        fab.stage_report(args)

    # valid arms -> report with the PSNR gains
    write("naive", False, False, 2020, 4500, 20.0)
    fab.stage_report(args)
    with open(os.path.join(str(tmp_path), "report.json")) as f:
        rep = json.load(f)
    assert rep["step_matched"] is True
    assert abs(rep["af_psnr_gain_db"] - 1.7) < 1e-6

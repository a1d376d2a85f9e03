"""Fused bias + activation + gain + clamp (API parity with the reference's
``bias_act`` CUDA plugin, ``afldm/af_libs/torch_utils/ops/bias_act.py:21-139``).

On TPU this whole chain is a single VPU fusion under jit — XLA fuses the
add/act/mul/clamp into neighbouring ops for free — so unlike the CUDA build
there is no separate kernel; the value of this module is API + semantics
parity (activation table incl. per-activation default gains) and a seam for
profiling. First- and second-order gradients come from JAX AD (the
reference hand-derives them at bias_act.py:142-203).
"""

import math
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class _Act:
    func: Callable
    def_alpha: float = 0.0
    def_gain: float = 1.0


_SQRT2 = math.sqrt(2.0)

activation_funcs = {
    "linear": _Act(lambda x, alpha: x),
    "relu": _Act(lambda x, alpha: jax.nn.relu(x), def_gain=_SQRT2),
    "lrelu": _Act(lambda x, alpha: jax.nn.leaky_relu(x, alpha),
                  def_alpha=0.2, def_gain=_SQRT2),
    "tanh": _Act(lambda x, alpha: jnp.tanh(x)),
    "sigmoid": _Act(lambda x, alpha: jax.nn.sigmoid(x)),
    "elu": _Act(lambda x, alpha: jax.nn.elu(x)),
    "selu": _Act(lambda x, alpha: jax.nn.selu(x)),
    "softplus": _Act(lambda x, alpha: jax.nn.softplus(x)),
    "swish": _Act(lambda x, alpha: jax.nn.silu(x), def_gain=_SQRT2),
}


def bias_act(x, b=None, dim=-1, act="linear", alpha=None, gain=None,
             clamp=None):
    """y = clamp(act(x + b) * gain). ``dim`` is the channel axis of ``b``
    (defaults to -1: NHWC, vs the reference's dim=1 NCHW default)."""
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)
    clamp = float(clamp if clamp is not None else -1.0)
    assert clamp >= 0 or clamp == -1.0

    if b is not None:
        assert b.ndim == 1
        shape = [1] * x.ndim
        shape[dim] = b.shape[0]
        x = x + b.reshape(shape)
    x = spec.func(x, alpha)
    if gain != 1.0:
        x = x * gain
    if clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x


def fma(a, b, c):
    """Fused multiply-add a*b + c (API parity with the reference's fma op,
    torch_utils/ops/fma.py:15; XLA fuses this on its own — the symbol
    exists as a seam)."""
    return a * b + c


def filtered_lrelu(x, fu=None, fd=None, b=None, up=1, down=1, padding=0,
                   gain=_SQRT2, slope=0.2, clamp=None, flip_filter=False):
    """The StyleGAN-3 FIR-path mega-kernel as the documented composition
    (ref torch_utils/ops/filtered_lrelu.py:121-157 _filtered_lrelu_ref):
    bias -> zero-stuff upsample + FIR (gain up^2) -> leaky-ReLU(gain, clamp)
    -> FIR + decimate. NHWC. Not called by any live AFLDM path (the models
    use the FFT WarpedNonlinearity instead) but provided for toolkit parity;
    under jit XLA fuses the elementwise stages into the convs."""
    from .upfirdn2d import upfirdn2d, _parse_padding

    px0, px1, py0, py1 = _parse_padding(padding)
    if b is not None:
        x = bias_act(x, b)
    x = upfirdn2d(x, fu, up=up, padding=(px0, px1, py0, py1),
                  gain=up ** 2, flip_filter=flip_filter)
    x = bias_act(x, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down, flip_filter=flip_filter)
    return x

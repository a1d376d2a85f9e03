"""Import helper for golden tests against the actual reference code at
/root/reference (SingleZombie/AFLDM, torch). The reference's torch-only
modules import cleanly once three tiny third-party shims are installed:

- ``pkg_resources`` (removed from modern setuptools): only
  ``parse_version`` is used (conv2d_gradfix.py:14) — backed by
  ``packaging.version.parse``.
- ``numba``: only ``njit`` is used (flow_utils_np.py:3); an identity
  decorator makes the kernels run as plain Python (fine at test sizes).
- ``diffusers``: the I2SB scheduler (i2sb_scheduler.py:24-27) needs
  ``ConfigMixin``/``register_to_config``, ``BaseOutput``, ``randn_tensor``
  and ``SchedulerMixin``/``KarrasDiffusionSchedulers`` names; minimal
  functional stand-ins suffice (the scheduler only reads ``self.config``).

Nothing in /root/reference is modified or executed beyond importing these
modules and calling their public functions from the tests.
"""

import functools
import inspect
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _install_pkg_resources():
    if "pkg_resources" in sys.modules:
        return
    from packaging.version import parse as parse_version

    mod = types.ModuleType("pkg_resources")
    mod.parse_version = parse_version
    sys.modules["pkg_resources"] = mod


def _install_numba():
    if "numba" in sys.modules:
        return

    def njit(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]
        return lambda f: f

    mod = types.ModuleType("numba")
    mod.njit = njit
    sys.modules["numba"] = mod


def _install_diffusers():
    if "diffusers" in sys.modules:
        return
    import torch

    root = types.ModuleType("diffusers")

    cfg = types.ModuleType("diffusers.configuration_utils")

    class ConfigMixin:
        pass

    def register_to_config(init):
        @functools.wraps(init)
        def wrapper(self, *args, **kwargs):
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            params = {k: v for k, v in bound.arguments.items() if k != "self"}
            self.config = types.SimpleNamespace(**params)
            init(self, *args, **kwargs)

        return wrapper

    cfg.ConfigMixin = ConfigMixin
    cfg.register_to_config = register_to_config

    utils = types.ModuleType("diffusers.utils")

    class BaseOutput:
        pass

    utils.BaseOutput = BaseOutput

    torch_utils = types.ModuleType("diffusers.utils.torch_utils")

    def randn_tensor(shape, generator=None, device=None, dtype=None):
        return torch.randn(shape, generator=generator, device=device,
                           dtype=dtype)

    torch_utils.randn_tensor = randn_tensor
    utils.torch_utils = torch_utils

    schedulers = types.ModuleType("diffusers.schedulers")
    scheduling_utils = types.ModuleType(
        "diffusers.schedulers.scheduling_utils")

    class SchedulerMixin:
        pass

    scheduling_utils.SchedulerMixin = SchedulerMixin
    scheduling_utils.KarrasDiffusionSchedulers = types.SimpleNamespace()
    schedulers.scheduling_utils = scheduling_utils

    root.configuration_utils = cfg
    root.utils = utils
    root.schedulers = schedulers
    sys.modules["diffusers"] = root
    sys.modules["diffusers.configuration_utils"] = cfg
    sys.modules["diffusers.utils"] = utils
    sys.modules["diffusers.utils.torch_utils"] = torch_utils
    sys.modules["diffusers.schedulers"] = schedulers
    sys.modules["diffusers.schedulers.scheduling_utils"] = scheduling_utils


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "afldm"))


def import_reference():
    """Install shims and return the reference's torch modules."""
    _install_pkg_resources()
    _install_numba()
    _install_diffusers()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # the vendored StyleGAN-3 ops import the vendored `dnnlib` as a
    # top-level module (bias_act.py:14, custom_ops.py)
    af_libs = os.path.join(REFERENCE_ROOT, "afldm", "af_libs")
    if af_libs not in sys.path:
        sys.path.append(af_libs)
    from afldm.af_libs import ideal_lpf, equivariance
    from afldm.af_libs.torch_utils.ops import upfirdn2d
    from afldm.shift_utils import metrics, shifters, flow_utils
    from afldm.shift_utils import flow_utils_np
    from afldm.schedulers import i2sb_scheduler

    return types.SimpleNamespace(
        ideal_lpf=ideal_lpf,
        equivariance=equivariance,
        upfirdn2d=upfirdn2d,
        metrics=metrics,
        shifters=shifters,
        flow_utils=flow_utils,
        flow_utils_np=flow_utils_np,
        i2sb_scheduler=i2sb_scheduler,
    )

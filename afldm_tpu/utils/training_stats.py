"""Distributed training-statistics collector (parity surface for the
reference's torch_utils/training_stats.py:56-234, which is vendored but
unused by its live paths). Accumulates [count, sum, sum-of-squares] per
metric; cross-device sync is a psum inside the caller's jitted step or an
explicit host-side merge."""

import numpy as np
import jax
import jax.numpy as jnp


def moments(x):
    """[num, sum, sum_sq] of a tensor (float64-ish accumulation in f32)."""
    x = jnp.asarray(x, jnp.float32)
    return jnp.stack([jnp.asarray(x.size, jnp.float32), x.sum(),
                      (x * x).sum()])


def psum_moments(m, axis_name="data"):
    return jax.lax.psum(m, axis_name)


class Collector:
    """Host-side accumulator (ref Collector, training_stats.py:113-234)."""

    def __init__(self, regex=".*", keep_previous=True):
        import re
        self._regex = re.compile(regex)
        self._keep = keep_previous
        self._moments = {}

    def report(self, name, value):
        if not self._regex.fullmatch(name):
            return value
        m = np.asarray(moments(jnp.asarray(value)))
        if name in self._moments:
            self._moments[name] = self._moments[name] + m
        else:
            self._moments[name] = m
        return value

    def names(self):
        return list(self._moments)

    def num(self, name):
        return int(self._moments.get(name, np.zeros(3))[0])

    def mean(self, name):
        m = self._moments.get(name)
        if m is None or m[0] == 0:
            return float("nan")
        return float(m[1] / m[0])

    def std(self, name):
        m = self._moments.get(name)
        if m is None or m[0] == 0:
            return float("nan")
        mean = m[1] / m[0]
        var = max(m[2] / m[0] - mean ** 2, 0.0)
        return float(np.sqrt(var))

    def as_dict(self):
        return {n: {"num": self.num(n), "mean": self.mean(n),
                    "std": self.std(n)} for n in self.names()}

    def reset(self):
        if not self._keep:
            self._moments.clear()
        else:
            self._moments = {}

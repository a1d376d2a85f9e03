"""Profiling seams (ref torch_utils/misc.py:110-118 profiled_function; TPU
equivalent per SURVEY.md §5.1: jax.profiler traces + named scopes)."""

import functools

import jax


def named_scope(name):
    return jax.named_scope(name)


def profiled_function(fn):
    """Wrap a function in a jax named scope so it shows up in profiler
    traces (the reference wraps ops in torch record_function)."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.named_scope(getattr(fn, "__name__", "fn")):
            return fn(*args, **kwargs)
    return wrapper


def trace(log_dir: str):
    """Context manager: ``with trace('/tmp/jaxtrace'): ...`` then inspect in
    TensorBoard/XProf."""
    return jax.profiler.trace(log_dir)

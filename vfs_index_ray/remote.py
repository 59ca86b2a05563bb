"""Shared lazy ``ray.remote`` wrapper.

Every per-part / per-source fan-out in the package wraps a plain
function as a 1-cpu Ray task. Building the remote lazily (and caching
per function) keeps the modules importable without initializing Ray and
gives one place to change task options (num_cpus, runtime_env, ...).
"""
from __future__ import annotations

_REMOTES: dict = {}


def remote_1cpu(fn):
    import ray
    if fn not in _REMOTES:
        _REMOTES[fn] = ray.remote(num_cpus=1)(fn)
    return _REMOTES[fn]

"""Debug-mode instrumentation: checkify'd step execution.

The jit purity + explicit key threading already make the CN RNG
race-free by construction (SURVEY §5 — the reference's mutable
``.active`` flags were the races-waiting-to-happen); this adds the
numerical guard rail: wrap any step function with ``checked`` to get
NaN/Inf/out-of-bounds checks surfaced as Python errors instead of
silent corruption.  Debug-only — checkify disables some fusions.
"""
from __future__ import annotations

import functools

import jax
from jax.experimental import checkify

__all__ = ["checked"]


def checked(fn, errors=checkify.float_checks):
    """Wrap a (possibly jitted) step fn; raises on NaN/Inf in any
    intermediate.  Usage:
        step = checked(steps.cn)   # debug runs
        state, metrics = step(state, images, labels, key)
    """
    inner = getattr(fn, "__wrapped__", fn)
    cfn = checkify.checkify(inner, errors=errors)
    jfn = jax.jit(cfn)

    @functools.wraps(inner)
    def run(*args, **kwargs):
        err, out = jfn(*args, **kwargs)
        err.throw()
        return out

    return run

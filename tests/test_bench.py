"""Regression tests for bench.py's measurement hygiene.

The jit-cache poisoning bug (round 5): tracing a jitted function with
jax.make_jaxpr while a kernel_flags.override(...) is active populates the
function's pjit trace cache with the OVERRIDDEN graph; the next call with
the same avals silently executes it. bench_train computed its analytic
FLOPs this way (use_flash=False so Pallas FLOPs are countable), then timed
the same jitted step — so every BENCH_r01..r04 train row measured the
noflash graph. The sampling section was immune only because it times
explicitly `.lower().compile()`d executables.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ctrlora_tpu.ops.kernel_flags import flags, override


def _flag_sensitive_fn():
    @jax.jit
    def f(x):
        # trace-time branch on a kernel flag, like every kernel dispatch site
        return x * (2.0 if flags().use_flash else 3.0)

    return f


def test_make_jaxpr_under_override_poisons_jit_cache():
    """Documents the failure mode the bench fix guards against."""
    f = _flag_sensitive_fn()
    x = jnp.ones((4,))
    with override(use_flash=False):
        jax.make_jaxpr(f)(x)
    poisoned = float(f(x)[0]) == 3.0
    if hasattr(f, "clear_cache"):
        assert poisoned, (
            "jax.make_jaxpr no longer shares the pjit trace cache; the "
            "clear_cache() guard in bench._traced_flops may be droppable"
        )


def test_traced_flops_leaves_fn_cache_clean():
    """bench._traced_flops must not leak its use_flash=False trace into the
    timed executions of the same jitted fn."""
    import bench

    f = _flag_sensitive_fn()
    x = jnp.ones((4,))
    got = bench._traced_flops(f, x)
    assert got is not None and got >= 0.0
    assert float(f(x)[0]) == 2.0, (
        "executed graph still carries the override: _traced_flops poisoned "
        "the jit cache (the r1-r4 train-bench bug)"
    )

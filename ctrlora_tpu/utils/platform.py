"""Platform selection helper.

Some TPU environments install a sitecustomize that force-registers their TPU
backend and overrides jax_platforms at interpreter start, which makes the
JAX_PLATFORMS env var silently ineffective. Calling this before any backend
initialization re-applies the user's env choice.
"""

from __future__ import annotations

import os


def ensure_platform_from_env(default: str | None = None) -> None:
    want = os.environ.get("CTRLORA_PLATFORM") or os.environ.get("JAX_PLATFORMS") or default
    if not want:
        return
    import jax

    if "," not in want and want != "cpu":
        # keep a host CPU backend registered alongside the accelerator:
        # param init/surgery on the host (then one device_put) is seconds,
        # while eager init through a remote-execution backend is thousands
        # of tiny device ops (~13 min for SD1.5-sized trees)
        want = want + ",cpu"
    try:
        jax.config.update("jax_platforms", want)
    except Exception:
        pass
    if want == "cpu":
        n = os.environ.get("CTRLORA_CPU_DEVICES")
        if n:
            try:
                jax.config.update("jax_num_cpu_devices", int(n))
            except Exception:
                pass


def effective_platform() -> str:
    """Platform new computations will execute on: honors an active
    jax.default_device(...) override, else the default backend.

    Pallas kernels must pick interpret mode by THIS (a default_device(cpu)
    context under a TPU backend lowers for cpu, where only interpret mode
    is supported)."""
    import jax

    dd = getattr(jax.config, "jax_default_device", None)
    if dd is not None:
        if isinstance(dd, str):  # newer jax accepts a platform string too
            return dd
        p = getattr(dd, "platform", None)
        if p:
            return p
    return jax.default_backend()


def on_accelerator() -> bool:
    """True when new computations land on a non-CPU backend. Shared by the
    Pallas ops to decide compiled-vs-interpret mode (each had a private
    copy of this check before; one helper keeps the platform logic in one
    place)."""
    try:
        return effective_platform() != "cpu"
    except Exception:  # pragma: no cover — backend probing must never raise
        return False


def pallas_interpret() -> bool:
    """Interpret-mode flag for pl.pallas_call: True off-accelerator."""
    return not on_accelerator()


def on_tpu() -> bool:
    """True when new computations land on a TPU backend with Mosaic support
    (accelerator backend AND pallas.tpu importable). The Pallas kernels'
    compiled-default gate: a non-TPU accelerator must not take an untested
    Mosaic lowering by default."""
    if not on_accelerator():
        return False
    try:
        from jax.experimental.pallas import tpu  # noqa: F401
    except Exception:  # pragma: no cover
        return False
    return True

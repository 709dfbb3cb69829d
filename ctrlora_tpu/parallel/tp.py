"""Tensor parallelism over a 2-D ``(data, model)`` mesh.

The reference scales one way only: Lightning DDP (replicate everything,
all-reduce grads). On TPU pods a second, orthogonal axis is nearly free to
express with GSPMD: shard the *attention heads* and the *GEGLU hidden* over
a ``model`` mesh axis and let XLA partition the projection matmuls and
insert the collectives. This is Megatron-style activation/compute TP:

  * self/cross-attention: q/k/v activations are sharded on the ``inner``
    (= heads * dim_head) dim. With head-major packing, contiguous shards of
    size inner/tp are whole heads, so the attention einsum partitions with
    zero communication; the output projection contracts over the sharded
    dim and XLA inserts ONE reduce per attention site (psum over ``model``).
    This layout requires ``heads % tp == 0`` (SD1.5: 8 heads at every site,
    so tp in {2,4,8}); sites where heads don't divide skip the constraint
    and run replicated rather than resharding inside dim_head.
  * GEGLU FF: the hidden activation is sharded on ``model``; up-projection
    columns split, down-projection contracts with one psum.
  * everything else (convs, norms, embeddings) stays replicated on
    ``model`` and sharded on ``data`` — at SD1.5 widths convs don't need TP
    and GroupNorm would need cross-device stats.

Params stay replicated (weights are small next to activations at SD batch
sizes; see shard_largest_axis for the ZeRO-style optimizer-state shard).
Because GSPMD is semantics-preserving, TP mode is bit-compatible with the
single-device graph up to reduction order.

Pallas kernels are *custom calls*: XLA cannot repartition their insides,
so under TP a naively-placed kernel would force all-gathers of the very
activations we sharded. ``tensor_parallel()`` handles this per kernel:
flash attention stays ON — transformer attention routes through
:func:`attention_bshd`, which ``shard_map``s the packed Pallas kernel
over whole head groups (each device runs it on its local heads, zero
collectives) — while the fused GEGLU / GroupNorm / qkv-fusion flags are
pinned to their pure-XLA paths, which GSPMD partitions cleanly.

Usage::

    mesh = create_mesh_2d(dp=2, tp=4)
    with tensor_parallel(mesh):
        step = jax.jit(train_step, ...)   # trace INSIDE the context
        state, metrics = step(state, shard_batch_2d(mesh, batch), rng)

The context is trace-time state (same contract as ops.kernel_flags):
entering it affects functions *traced* while it is active, not previously
compiled executables.
"""

from __future__ import annotations

import contextlib
import dataclasses
import functools
from typing import Any, Iterator, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh_2d(
    dp: int, tp: int, devices: Optional[Sequence[Any]] = None
) -> Mesh:
    """``(data, model)`` mesh. The model axis is the *minor* (fastest
    varying) axis so TP collectives ride adjacent-chip ICI links."""
    devs = list(devices) if devices is not None else jax.devices()
    if dp * tp > len(devs):
        raise ValueError(f"mesh {dp}x{tp} needs {dp * tp} devices, have {len(devs)}")
    grid = np.asarray(devs[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


@dataclasses.dataclass(frozen=True)
class TPContext:
    mesh: Mesh
    model_axis: str = MODEL_AXIS
    data_axis: Optional[str] = DATA_AXIS


_ACTIVE: Optional[TPContext] = None


def active() -> Optional[TPContext]:
    return _ACTIVE


@contextlib.contextmanager
def tensor_parallel(
    mesh: Mesh,
    model_axis: str = MODEL_AXIS,
    data_axis: Optional[str] = DATA_AXIS,
) -> Iterator[TPContext]:
    """Enable TP sharding constraints for functions traced in this scope."""
    global _ACTIVE
    if model_axis not in mesh.axis_names:
        raise ValueError(f"mesh has axes {mesh.axis_names}, no '{model_axis}'")
    if data_axis is not None and data_axis not in mesh.axis_names:
        raise ValueError(f"mesh has axes {mesh.axis_names}, no '{data_axis}'")
    from ctrlora_tpu.ops import kernel_flags

    ctx = TPContext(mesh=mesh, model_axis=model_axis, data_axis=data_axis)
    prev = _ACTIVE
    _ACTIVE = ctx
    try:
        # custom calls don't partition under GSPMD — take the XLA paths for
        # GEGLU/GroupNorm/qkv-fusion. Flash attention is NOT pinned off:
        # transformer attention routes through attention_bshd below, which
        # shard_maps the Pallas kernel over whole head groups; the only
        # other flash site (the VAE mid-block) runs on model-replicated
        # activations where the custom call partitions trivially.
        with kernel_flags.override(
            geglu_ffn=False, fused_group_norm=False, fuse_qkv=False,
        ):
            yield ctx
    finally:
        _ACTIVE = prev


def _spec(ctx: TPContext, names: Sequence[Optional[str]]) -> P:
    out = []
    for n in names:
        if n == "data":
            out.append(ctx.data_axis)
        elif n == "model":
            out.append(ctx.model_axis)
        else:
            out.append(None)
    return P(*out)


def constrain(
    x: Any, *names: Optional[str], model_units: Optional[int] = None
) -> Any:
    """``with_sharding_constraint`` against the active TP mesh; identity when
    no TP context is active (zero cost on the single-device path).

    ``names`` maps each dim to 'data' / 'model' / None, e.g.
    ``constrain(q, 'data', None, 'model')`` for a [B, S, inner] activation.
    Dims not divisible by their axis size are left unconstrained rather than
    silently padded (e.g. a 1-head VAE bottleneck under tp=4), and so is an
    axis name the mesh does not carry (a data-only TPContext built by hand).

    ``model_units``: when the dim carrying 'model' is a pack of larger units
    (attention's inner dim = heads x dim_head), pass the unit count; the
    model constraint is skipped unless ``model_units % tp == 0``, since a
    shard boundary inside a unit (splitting dim_head) would force XLA to
    reshard around the attention einsum — correct but collective-heavy,
    defeating the whole-heads-per-shard layout this module promises.
    """
    ctx = _ACTIVE
    if ctx is None:
        return x
    if len(names) != x.ndim:
        raise ValueError(f"spec {names} vs rank-{x.ndim} activation")
    sizes = dict(zip(ctx.mesh.axis_names, ctx.mesh.devices.shape))
    checked = []
    for dim, n in zip(x.shape, names):
        if n in ("data", "model"):
            axis = ctx.data_axis if n == "data" else ctx.model_axis
            size = sizes.get(axis) if axis is not None else None
            if size is None or dim % size != 0:
                checked.append(None)
                continue
            if (n == "model" and model_units is not None
                    and model_units % size != 0):
                checked.append(None)
                continue
        checked.append(n)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(ctx.mesh, _spec(ctx, checked))
    )


def shard_batch_2d(mesh: Mesh, batch: Any) -> Any:
    """Place a host-global batch onto a 2-D mesh: split on axis 0 over
    ``data``, replicated over ``model``."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def attention_bshd(q, k, v, use_flash: bool = True):
    """Attention under TP without surrendering the Pallas kernel.

    GSPMD cannot partition a custom call's insides, so running the flash
    kernel on model-sharded activations would force XLA to all-gather the
    very heads we sharded. Instead, when the layout divides cleanly —
    whole heads per model shard, whole batch rows per data shard — the
    kernel is ``shard_map``-ped over the mesh: each device runs the packed
    BSHD flash forward on its own head group, collective-free (the r4
    future-work item at the top of this module, now closed). Non-dividing
    geometries fall back to the XLA softmax path, which GSPMD partitions
    freely. Identity to the unsharded kernel up to reduction order.

    Inputs/outputs are [B, S, H, D] (the projections' natural layout).
    """
    from ctrlora_tpu.ops.flash_attention import dot_product_attention_bshd

    ctx = _ACTIVE
    if ctx is None:
        return dot_product_attention_bshd(q, k, v, use_flash=use_flash)
    sizes = dict(zip(ctx.mesh.axis_names, ctx.mesh.devices.shape))
    tp_size = sizes[ctx.model_axis]
    dp_size = sizes.get(ctx.data_axis, 1) if ctx.data_axis else 1
    b, h = q.shape[0], q.shape[2]
    if not use_flash or h % tp_size != 0 or b % dp_size != 0:
        return dot_product_attention_bshd(q, k, v, use_flash=False)
    from jax.experimental.shard_map import shard_map

    spec = P(ctx.data_axis, None, ctx.model_axis, None)
    local = functools.partial(dot_product_attention_bshd, use_flash=True)
    return shard_map(
        local, mesh=ctx.mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False,
    )(q, k, v)


def tp_sample_jit(fn, mesh: Mesh):
    """Model-parallel inference wrapper (the 2-D analog of
    parallel.mesh.dp_sample_jit): jit ``fn(params, *batch_arrays)`` over a
    ``(data, model)`` mesh with params replicated, batch args split on
    ``data``, and the in-model ``constrain()`` sites sharding attention
    heads / GEGLU hidden over ``model``. This drops the per-device batch
    below 1-per-chip DP's floor — the latency path for small batches, which
    pure DP cannot shard at all (dp_sample_jit needs bs % ndev == 0; TP
    needs only bs % dp == 0).

    ``fn`` is traced INSIDE ``tensor_parallel(mesh)`` at first call, so the
    wrapper owns the context; callers just call the returned function.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))

    def shard_for(x):
        if hasattr(x, "ndim") and x.ndim >= 2:
            return data
        return repl

    jitted = jax.jit(fn)

    def call(params, *batch):
        params = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), params
        )
        batch = [jax.device_put(x, shard_for(x)) for x in batch]
        with tensor_parallel(mesh):
            return jitted(params, *batch)

    return call

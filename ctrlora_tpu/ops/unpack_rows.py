"""Pallas TPU multi-output row unpack.

The DDIM scan consumes ~70 tiny per-step vectors (one [C] time-embedding
projection row per ResBlock across the UNet + ControlNet branches,
pipeline.emb_proj_tables). Producing them with per-row slices — whether
scan xs machinery, jnp static slices of a packed vector, or a one-hot
gather — costs ~22.6 ms/step on this runtime: each tiny slice compiles to
its own kernel and per-kernel dispatch is ~40-310 us (perf/step_glue2.py
bisect: loop-invariant rows 69.2 ms/step vs any per-step-varying rows
~91.9 ms/step, with the consuming adds measured free in both).

This kernel collapses all of them into ONE launch: input is the step's
padded row block [n, Cmax] (one scan-xs slice of the precomputed
[S, n, Cmax] table), outputs are the n individual [1, C_i] rows. Each row
starts at lane 0 of its own sublane, so every copy is aligned regardless
of the channel mix (320/640/1280 in SD1.5).

The reference has no analogue: torch runs the time-embedding MLP in-loop
every UNet call (ldm/modules/diffusionmodules/openaimodel.py:728-736) and
eats the per-op overhead.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _unpack_kernel(vec_ref, *out_refs, sizes: Tuple[int, ...]):
    for i, (ref, c) in enumerate(zip(out_refs, sizes)):
        ref[0, :] = vec_ref[i, :c]


def _on_tpu() -> bool:
    from ctrlora_tpu.utils.platform import on_accelerator

    return on_accelerator()


def unpack_rows(
    block: jnp.ndarray,  # [n, Cmax]
    sizes: Sequence[int],
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, ...]:
    """Split a padded row block into per-row [1, C_i] arrays in one kernel.

    Row i occupies block[i, :sizes[i]]; the tail padding is ignored. The
    [1, C_i] shape broadcasts against NHWC activations exactly like [C_i].
    """
    sizes = tuple(int(s) for s in sizes)
    n, cmax = block.shape
    assert n == len(sizes) and max(sizes) <= cmax
    if interpret is None:
        interpret = not _on_tpu()
    return pl.pallas_call(
        lambda *refs: _unpack_kernel(*refs, sizes=sizes),
        out_shape=[jax.ShapeDtypeStruct((1, c), block.dtype) for c in sizes],
        interpret=interpret,
    )(block)


def pack_row_tables(tables: dict) -> Tuple[jnp.ndarray, Tuple[str, ...], Tuple[int, ...]]:
    """Stack {name: [S, C_i]} into a padded [S, n, Cmax] table (fp32/bf16
    preserved). Returns (table, names, sizes) with names sorted for a
    deterministic layout."""
    names = tuple(sorted(tables))
    sizes = tuple(int(tables[k].shape[-1]) for k in names)
    cmax = max(sizes)
    cols = [
        jnp.pad(tables[k], ((0, 0), (0, cmax - c))) if c < cmax else tables[k]
        for k, c in zip(names, sizes)
    ]
    return jnp.stack(cols, axis=1), names, sizes

"""Device mesh and sharding rules.

The reference's only distribution strategy is Lightning DDP over NCCL
(scripts/train_ctrlora_pretrain.py:118). The TPU-native equivalent is a 1-D
`data` mesh over ICI: batch sharded across devices, params/optimizer
replicated, gradient all-reduce inserted by XLA from the sharding
annotations. Multi-host runs initialize jax.distributed and shard the global
batch per host. At SD1.5 scale (~1.2B params incl. frozen towers, 361M-param
control branch) no TP/PP is needed; the optional `fsdp` flag shards optimizer
state over `data` for memory headroom.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host-global batch dict onto the mesh, split on axis 0."""
    sharding = data_sharded(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


# Env vars that declare "this is a multi-host job" for init_distributed.
_COORDINATOR_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",       # jax.distributed's own env contract
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",  # multi-slice TPU runtimes
)


def init_distributed(coordinator_address: Optional[str] = None) -> bool:
    """Multi-host bootstrap. Returns True when distributed mode is active.

    Policy (fail LOUD, never degrade): a coordinator that is *configured* —
    via the argument or any of the standard env vars — but *unreachable*
    raises RuntimeError instead of silently falling back to single-host. A
    silent fallback would start a 1-host training run that produces wrong
    results (each host would train on its own shard with no gradient
    exchange). Only the genuinely-unconfigured case (no argument, no env)
    is a no-op single-host run.
    """
    import os

    try:
        if jax.process_count() > 1:
            return True  # already initialized
    except RuntimeError:
        pass
    configured = coordinator_address or any(
        os.environ.get(v) for v in _COORDINATOR_ENV_VARS
    )
    if not configured:
        return False  # single-host / local run
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    except Exception as e:
        src = coordinator_address or ", ".join(
            f"{v}={os.environ[v]}" for v in _COORDINATOR_ENV_VARS
            if os.environ.get(v)
        )
        raise RuntimeError(
            f"multi-host coordinator is configured ({src}) but "
            "jax.distributed.initialize() failed; refusing to silently "
            "degrade to a single-host run (it would train without gradient "
            "exchange). Unset the coordinator env to run single-host."
        ) from e
    return True


def shard_largest_axis(mesh: Mesh, tree: Any, min_size: int = 2**14) -> Any:
    """ZeRO-style sharding: place each large leaf split on its first axis
    divisible by the mesh size; small/odd leaves stay replicated.

    Used for optimizer state (Adam moments are the largest training buffers;
    params stay replicated so the forward needs no gathers — XLA inserts the
    all-gather/reduce-scatter pair around the update)."""
    n = mesh.devices.size

    def place(x):
        if not hasattr(x, "shape") or x.size < min_size:
            return jax.device_put(x, replicated(mesh))
        for axis, dim in enumerate(x.shape):
            if dim % n == 0:
                spec = [None] * x.ndim
                spec[axis] = DATA_AXIS
                return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(place, tree)


def dp_sample_jit(fn, mesh: Mesh):
    """Data-parallel inference wrapper: jit `fn(params, *batch_arrays)` with
    params replicated and every other array argument sharded on axis 0 over
    the data mesh. Outputs are batch-sharded; XLA partitions the whole DDIM
    scan per device with zero collectives on the hot path (sampling has no
    gradient all-reduce — each device denoises its own slice of the batch).

    The reference has no multi-GPU sampling at all (scripts/sample.py runs a
    single cuda device); this is the TPU-native serving path. PRNG keys count
    as batch args only if their leading dim equals the global batch; the
    usual scalar key is passed through replicated (detected by ndim<=1).
    """
    repl = replicated(mesh)
    data = data_sharded(mesh)

    def shard_for(x):
        if hasattr(x, "ndim") and x.ndim >= 2:
            return data
        return repl

    jitted = jax.jit(fn)

    def call(params, *args):
        with mesh:
            params = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, repl), params
            )
            placed = [
                jax.device_put(a, shard_for(a)) if hasattr(a, "ndim") else a
                for a in args
            ]
            return jitted(params, *placed)

    return call

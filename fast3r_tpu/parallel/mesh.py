"""Device mesh + sharding rules.

The reference delegates distribution to Lightning DDP / DeepSpeed ZeRO-2 over
NCCL (SURVEY.md §2.6).  The TPU-native equivalent is a single
jax.sharding.Mesh and sharding annotations; XLA inserts the collectives
(psum/all-gather/reduce-scatter) over ICI.

Axes:
  data   — batch parallelism (DDP equivalent); gradient all-reduce is implicit.
  model  — tensor parallelism over attention heads / MLP hidden dim.
The fused-sequence axis for 1000-view inference reuses the "model" axis
("sp") via sequence sharding in fast3r_tpu/parallel/sequence.py.

ZeRO-equivalent optimizer-state sharding: optimizer moments are sharded over
"data" on the layer-stacked leading axis (fully sharded optimizer state, the
DeepSpeed stage-2 analog used by the flagship run, deepspeed_stage_2.yaml).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, Any]


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    assert data * model == len(devices), (
        f"mesh {data}x{model} != {len(devices)} devices"
    )
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def _dim_divisible(shape: Tuple[int, ...], dim: int, size: int) -> bool:
    return dim < len(shape) and shape[dim] % size == 0


def param_pspec(path: Tuple[str, ...], shape: Tuple[int, ...], mesh: Mesh) -> P:
    """Tensor-parallel sharding rule for Fast3R params.

    Megatron-style: qkv/fc1 column-parallel (output dim over "model"),
    proj/fc2 row-parallel (input dim over "model").  Stacked block params have
    a leading layer axis, so the matmul dims shift by one.
    """
    msize = mesh.shape["model"]
    if msize == 1:
        return P()
    names = set(path)
    stacked = "blocks" in names or "layers" in names
    column = {"qkv", "fc1", "wq", "wk", "wv", "w1", "w3"}
    row = {"fc2", "wo", "w2"}
    if names & column:
        if path[-1] == "w":
            dim = 2 if stacked else 1
            if _dim_divisible(shape, dim, msize):
                return P(*([None] * dim + ["model"]))
        if path[-1] == "b":
            dim = 1 if stacked else 0
            if _dim_divisible(shape, dim, msize):
                return P(*([None] * dim + ["model"]))
    if ("proj" in names and "attn" in names) or (names & row):
        if path[-1] == "w":
            dim = 1 if stacked else 0
            if _dim_divisible(shape, dim, msize):
                return P(*([None] * dim + ["model"]))
    return P()


def shard_params(params: Params, mesh: Mesh) -> Params:
    """Place params on the mesh according to :func:`param_pspec`."""

    def place(path, leaf):
        keys = tuple(
            k.key if hasattr(k, "key") else getattr(k, "idx", str(k))
            for k in path
        )
        keys = tuple(str(k) for k in keys)
        spec = param_pspec(keys, leaf.shape, mesh)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params: Params, mesh: Mesh) -> Params:
    """The NamedSharding tree matching :func:`shard_params` (for jit specs)."""

    def spec(path, leaf):
        keys = tuple(
            str(k.key if hasattr(k, "key") else getattr(k, "idx", str(k)))
            for k in path
        )
        return NamedSharding(mesh, param_pspec(keys, leaf.shape, mesh))

    return jax.tree_util.tree_map_with_path(spec, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading dim over "data"."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def zero_opt_state_shardings(tx, params, mesh: Mesh):
    """Explicit ZeRO-style optimizer-state shardings: every param-shaped
    moment (adam mu/nu) keeps the param's tensor-parallel spec and is
    additionally sharded over the "data" axis on its first free divisible
    dimension; scalar counters replicate.  The DeepSpeed stage-2 analog used
    by the reference flagship run (configs/trainer/deepspeed_stage_2.yaml) —
    optimizer memory scales 1/data_parallelism.
    """
    dsize = mesh.shape["data"]
    pspecs = param_shardings(params, mesh)
    params_treedef = jax.tree.structure(params)
    shapes = jax.eval_shape(tx.init, params)

    def merge(pshard, leaf):
        spec = list(pshard.spec) + [None] * (len(leaf.shape)
                                             - len(pshard.spec))
        for dim, size in enumerate(leaf.shape):
            if spec[dim] is None and size % dsize == 0 and size >= dsize:
                spec[dim] = "data"
                break
        return NamedSharding(mesh, P(*spec))

    def walk(node):
        try:
            if jax.tree.structure(node) == params_treedef:
                return jax.tree.map(merge, pspecs, node)
        except (ValueError, TypeError):
            pass
        if hasattr(node, "_fields"):  # optax namedtuple states
            return type(node)(*[walk(getattr(node, f)) for f in node._fields])
        if isinstance(node, (tuple, list)):
            return type(node)(walk(x) for x in node)
        return NamedSharding(mesh, P())  # scalar counters

    return walk(shapes)


def zero_init_opt_state(tx, params, mesh: Mesh):
    """Initialize optimizer state with ZeRO sharding over the data axis."""
    shardings = zero_opt_state_shardings(tx, params, mesh)
    return jax.jit(tx.init, out_shardings=shardings)(params)


def train_state_shardings(state, mesh: Mesh, tx=None):
    """A TrainState-shaped sharding tree (params TP spec, ZeRO opt state,
    replicated scalars) for pinning jit in/out shardings."""
    from fast3r_tpu.train.step import TrainState, make_optimizer

    return TrainState(
        params=param_shardings(state.params, mesh),
        opt_state=zero_opt_state_shardings(tx, state.params, mesh),
        step=replicated(mesh),
        rng=replicated(mesh),
    )

"""Device mesh + sharding rules.

The reference is strictly single-process single-device (reference
``torch_run_physics.py:78-80``; SURVEY.md §2 confirms no distributed code
anywhere). Scale-out is therefore new capability, built the TPU way: a
``jax.sharding.Mesh`` with a ``data`` axis (batch sharding / DP) and an
optional ``model`` axis (tensor-parallel sharding of the large encoder-MLP
and VariableFromNetwork matmuls), with XLA GSPMD inserting the collectives
over ICI. There is nothing to pipeline (the model is 4 small stages whose
cost is dominated by one), no attention/sequence dimension to ring over,
and no experts — so PP/SP/EP do not apply to this model family; DP carries
the scaling, TP exists for demonstration and for the wide decoder heads.

Gradient all-reduce falls out of jit-ing the loss over batch-sharded inputs
with replicated params.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all local devices on the
    data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devices = devices[: n_data * n_model]
    return Mesh(np.asarray(devices).reshape(n_data, n_model),
                ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Video batches [B, T, C, H, W] shard over batch on the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Parameter paths whose kernels are worth tensor-sharding: the encoder MLP
# (fan-in H*W*C up to 12288 for mnist_spring) and the VariableFromNetwork
# output projections (fan-out up to 12288 for the background).
_TP_SHARD_LAST = ("var_net_content", "var_net_background", "var_net_template")
_TP_SHARD_FIRST = ("encoder",)


def _spec_for(names, leaf, mesh: Mesh):
    n_model = mesh.shape["model"]
    ndim = getattr(leaf, "ndim", 0)
    shape = getattr(leaf, "shape", ())
    if n_model > 1 and ndim == 2 and names and names[-1] == "kernel":
        # exact path-segment match ("encoder" must not catch
        # "velocity_encoder")
        if any(k in names for k in _TP_SHARD_LAST) \
                and shape[1] % n_model == 0:
            return NamedSharding(mesh, P(None, "model"))
        if any(k in names for k in _TP_SHARD_FIRST) \
                and shape[0] % n_model == 0:
            return NamedSharding(mesh, P("model", None))
    return NamedSharding(mesh, P())


def _path_names(path):
    return [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]


def param_shardings(params, mesh: Mesh):
    """Sharding tree for a PhysicsNet param pytree: replicated by default;
    the large Dense kernels shard over the 'model' axis when it exists.

    Sharding choices: VariableFromNetwork second-layer kernels
    [200, prod(shape)] shard the wide output dim; the encoder MLP
    first-layer kernel [H*W*C, 200] shards the wide input dim (GSPMD
    inserts the reduce-scatter/all-gather).
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(_path_names(path), leaf, mesh), params)


def opt_state_shardings(opt_state, mesh: Mesh):
    """Sharding tree for an optax state pytree, consistent with
    :func:`param_shardings`: moment/accumulator leaves that mirror a
    tensor-sharded kernel get the same spec (their pytree paths contain the
    same flax module segments, e.g. ``...nu/encoder/.../kernel``); scalars
    (step counters) and everything else replicate."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(_path_names(path), leaf, mesh),
        opt_state)

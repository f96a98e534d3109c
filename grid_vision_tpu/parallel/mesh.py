"""Mesh construction + parameter sharding rules.

The reference has no distributed anything (SURVEY.md §2.2: single-process,
single-GPU, DDS pub/sub only). Scaling here is TPU-native by design:

  - **rig parallelism** (the batched-rigs config, BASELINE.json
    configs[4]): independent sensor rigs are pure data parallelism over
    the ``rig`` mesh axis — zero per-step collectives; each device owns
    its rigs' grids, states stay device-resident across steps.
  - **training**: dp over the batch axis + tp over conv output channels;
    XLA inserts the psum/all-gathers from the shardings.

All collectives ride ICI (one mesh == one slice); no DCN path exists in
the reference's capability set so none is modeled.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("dp", "tp"),
              tp: int = 1) -> Mesh:
    """Build a mesh over the first n devices: (n // tp, tp)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    if n % tp:
        raise ValueError(f"n_devices {n} not divisible by tp {tp}")
    dev_array = np.array(devices[:n]).reshape(n // tp, tp)
    return Mesh(dev_array, axis_names)


def rig_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1D mesh for the independent-rigs fleet."""
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), ("rig",))


def shard_params(params, mesh: Mesh, tp_axis: str = "tp"):
    """Tensor-parallel sharding rule for conv/dense kernels: shard the
    output-channel (last) dimension over ``tp_axis`` when divisible;
    replicate everything else. XLA inserts the collectives."""
    tp_size = mesh.shape[tp_axis]

    def rule(leaf):
        if (hasattr(leaf, "ndim") and leaf.ndim >= 2
                and leaf.shape[-1] % tp_size == 0
                and leaf.shape[-1] >= tp_size * 8):
            spec = P(*([None] * (leaf.ndim - 1) + [tp_axis]))
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(rule, params)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)

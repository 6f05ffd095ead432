"""Device mesh helpers.

The reference is a single-process robotics stack (SURVEY.md §2: no
DP/TP/PP and no collective backend — ROS pub/sub is its only
"distribution"). The natural TPU scaling axes for this workload are:

* `dp` — fleet/batch parallelism: many sequences (or map shards) localized
  simultaneously, one per device; embarrassingly parallel, no collectives
  in the steady state.
* `cand` — candidate parallelism inside the brute-force first fix: the
  7776-transform grid sharded across devices with an all-gather'd
  argmin/first-hit reduction (parallel/brute_force.py).

Both ride a 1-D `jax.sharding.Mesh`; ICI handles the (tiny) control
reductions.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), axis_names=(axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

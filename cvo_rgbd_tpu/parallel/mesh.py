"""Device-mesh construction helpers.

The reference's only parallel resource is the TBB thread pool
(cvo.cpp:362); the TPU-native equivalent is a `jax.sharding.Mesh` over
ICI (intra-slice) and DCN (multi-host), built here.  SURVEY.md
section 2.6 maps each reference reduction to its collective.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a mesh from `axes` = {name: size}; -1 means "the rest".

    Default: all devices on a single "sp" (point-sharding) axis.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axes is None:
        axes = {"sp": n}
    names = list(axes.keys())
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    if total > n:
        raise ValueError(f"mesh {axes} needs {total} devices, have {n}")
    arr = np.array(devices[:total]).reshape(sizes)
    return Mesh(arr, names)


def multihost_initialize(**kwargs):
    """Initialize jax.distributed for multi-host meshes (DCN).

    Thin veneer so users have one entry point; no-op when already
    initialized or single-host.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized

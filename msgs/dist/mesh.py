"""Device mesh construction for sharded splatting.

The scaling axes for this workload (SURVEY.md §5, BASELINE.json north star):
  - "gauss": Gaussian primitives — shards parameters, Adam moments,
    preprocess compute, and per-Gaussian gradients.
  - "tile":  image tile stripes — shards binning + compositing compute and
    the ground-truth images.

Per step, preprocess outputs are all-gathered along "gauss" (transposing to a
reduce-scatter of per-Gaussian gradients in backward — XLA inserts both), and
each tile-stripe device composites only its rows. Both collectives ride ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

GAUSS_AXIS = "gauss"
TILE_AXIS = "tile"


def make_mesh(n_gauss: Optional[int] = None, n_tile: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_gauss is None and n_tile is None:
        # Favor the tile axis (compositing dominates) with a gauss axis of 2
        # when the device count allows.
        n_gauss = 2 if n % 2 == 0 and n > 2 else 1
        n_tile = n // n_gauss
    elif n_gauss is None:
        n_gauss = n // n_tile
    elif n_tile is None:
        n_tile = n // n_gauss
    assert n_gauss * n_tile == n, (n_gauss, n_tile, n)
    arr = np.asarray(devices).reshape(n_gauss, n_tile)
    return Mesh(arr, (GAUSS_AXIS, TILE_AXIS))


def gauss_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the gauss dimension (params, moments)."""
    return NamedSharding(mesh, P(GAUSS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Row-stripe sharding of (H, W, C) ground-truth images."""
    return NamedSharding(mesh, P(TILE_AXIS))

"""Host-side tiling for the Pallas aggregation kernels.

The TPU-fast formulation of neighbor aggregation (see gather_agg.py) processes
destination nodes in tiles of 128 and turns the per-edge row gather into one-hot
matmuls against a compacted, per-tile table of *unique* source nodes. This
module computes the static auxiliary arrays:

  uniq  int32 [B, T, U]      sorted unique src ids referenced by tile t (pad 0)
  lidx  int32 [B, T, TN, D]  position of nbr[b, v, d] inside uniq[b, t]
  rslot int32 [B, N, D]      for edge (u -> v) stored at nbr[u, d] = v on the
                             symmetric table: the slot j with nbr[v, j] == u
                             (first-winner gradient routing for max)

U is the max unique-count over tiles rounded up to a multiple of u_align
(default 16 — the bf16 sublane quantum, the finest Mosaic-legal second-minor
size; smaller U means fewer gathered rows AND less MXU work in every one-hot
dot). Spatially ordered supervoxel graphs (SLIC ids are raster-spatial) keep U
small because neighboring dst nodes share most of their neighborhoods.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["TiledAux", "build_tiled_aux", "gather_unique_rows", "TILE_N"]

TILE_N = 128


def gather_unique_rows(x: jax.Array, uniq: jax.Array) -> jax.Array:
    """x [B, N, W], uniq int32 [B, T, U] -> [B, T, U, W].

    The unique-block fetch feeding every Pallas aggregation kernel. Lowered as
    ONE flat global row-gather over the [B*N, W] table with batch-offset
    indices: XLA lowers a vmap-over-B batched gather ~2.5x slower than the
    equivalent flat gather (measured v5e, 55k x 1KB rows: 0.78 vs 0.31 ms
    marginal), and the train step is gather-dominated.
    """
    B, T, U = uniq.shape
    N, W = x.shape[1], x.shape[-1]
    off = jnp.arange(B, dtype=jnp.int32)[:, None, None] * N
    flat_idx = (uniq + off).reshape(B * T * U)
    g = x.reshape(B * N, W)[flat_idx]
    return g.reshape(B, T, U, W)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TiledAux:
    uniq: jax.Array   # int32 [B, T, U]
    lidx: jax.Array   # int32 [B, T, TN, D]
    rslot: jax.Array  # int32 [B, N, D]

    @property
    def num_tiles(self) -> int:
        return self.uniq.shape[1]

    @property
    def tile_n(self) -> int:
        return self.lidx.shape[2]

    @property
    def unique_budget(self) -> int:
        return self.uniq.shape[2]


def build_tiled_aux(nbr: np.ndarray, nbr_mask: np.ndarray,
                    tile: int = TILE_N, u_align: int = 16) -> TiledAux:
    """nbr [B, N, D] int32, nbr_mask [B, N, D]. N must be a multiple of `tile`
    (guaranteed by the node buckets)."""
    nbr = np.asarray(nbr)
    mask = np.asarray(nbr_mask) > 0
    B, N, D = nbr.shape
    assert N % tile == 0, (N, tile)
    T = N // tile

    uniq_lists = []
    max_u = 1
    for b in range(B):
        per_tile = []
        for t in range(T):
            ids = nbr[b, t * tile:(t + 1) * tile]
            m = mask[b, t * tile:(t + 1) * tile]
            vals = np.unique(ids[m]) if m.any() else np.zeros(1, nbr.dtype)
            per_tile.append(vals)
            max_u = max(max_u, len(vals))
        uniq_lists.append(per_tile)
    U = -(-max_u // u_align) * u_align

    uniq = np.zeros((B, T, U), np.int32)
    lidx = np.zeros((B, T, tile, D), np.int32)
    for b in range(B):
        for t in range(T):
            vals = uniq_lists[b][t]
            uniq[b, t, :len(vals)] = vals
            ids = nbr[b, t * tile:(t + 1) * tile]
            pos = np.searchsorted(vals, ids)
            pos = np.clip(pos, 0, len(vals) - 1)
            # masked slots keep 0; correctness comes from nbr_mask
            lidx[b, t] = np.where(mask[b, t * tile:(t + 1) * tile], pos, 0)

    # reciprocal slot: for edge at (u, d) with v = nbr[u, d], where does u sit
    # in v's neighbor list (symmetric tables guarantee it exists)
    rslot = np.zeros((B, N, D), np.int32)
    for b in range(B):
        rows = nbr[b][nbr[b]]                       # [N, D, D]: nbr[v_ud]
        hit = rows == np.arange(N, dtype=nbr.dtype)[:, None, None]
        rslot[b] = np.where(mask[b], hit.argmax(-1), 0).astype(np.int32)

    return TiledAux(uniq=jnp.asarray(uniq), lidx=jnp.asarray(lidx),
                    rslot=jnp.asarray(rslot))

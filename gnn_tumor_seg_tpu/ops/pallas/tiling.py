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
                    tile: int = TILE_N, u_align: int = 16,
                    as_numpy: bool = False) -> TiledAux:
    """nbr [B, N, D] int32, nbr_mask [B, N, D]. N must be a multiple of `tile`
    (guaranteed by the node buckets).

    Vectorized over tiles: one sort per (b,) instead of a Python np.unique per
    tile (this runs once per sample in the trainer's loading path — 26 ms ->
    ~8 ms per flagship graph, and first-epoch host time at BraTS-2021 scale
    is aux-build-bound).

    as_numpy=True keeps the tables host-side (for host-resident graph caches
    that transfer once per assembled batch instead of once per sample)."""
    nbr = np.asarray(nbr)
    mask = np.asarray(nbr_mask) > 0
    B, N, D = nbr.shape
    assert N % tile == 0, (N, tile)
    T = N // tile
    L = tile * D
    SENT = np.int64(N + 1)  # > any real id; marks masked slots

    # per-tile sorted ids with masked slots pushed to the end
    ids_t = nbr.reshape(B, T, L).astype(np.int64)
    ids_t = np.where(mask.reshape(B, T, L), ids_t, SENT)
    ids_s = np.sort(ids_t, axis=2)                       # [B, T, L]
    first = np.empty((B, T, L), bool)                    # first occurrence
    first[:, :, 0] = ids_s[:, :, 0] != SENT
    first[:, :, 1:] = (ids_s[:, :, 1:] != ids_s[:, :, :-1]) & \
        (ids_s[:, :, 1:] != SENT)
    counts = first.sum(axis=2)                           # uniques per tile
    max_u = max(1, int(counts.max()))
    U = -(-max_u // u_align) * u_align

    # scatter the first occurrences into the padded [B, T, U] table; padded
    # slots hold a sort-order-preserving sentinel during the searchsorted
    # phase and are zeroed afterwards (no lidx slot references them)
    pos = np.cumsum(first, axis=2) - 1                   # position within tile
    uniq = np.full((B, T, U), SENT, np.int64)
    bb, tt, _ = np.nonzero(first)
    uniq[bb, tt, pos[first]] = ids_s[first]

    # lidx via ONE searchsorted per batch over the tile-offset id space:
    # row t of uniq spans [t*K, (t+1)*K) after adding t*K, so the flattened
    # table stays globally sorted (K > SENT >= any id + 1)
    K = int(SENT) + 1
    off = (np.arange(T, dtype=np.int64) * K)[None, :, None]
    flat_uniq = (uniq + off).reshape(B, T * U)
    flat_ids = (nbr.reshape(B, T, L).astype(np.int64) + off).reshape(B, T * L)
    lidx = np.empty((B, T, tile, D), np.int32)
    for b in range(B):
        p = np.searchsorted(flat_uniq[b], flat_ids[b])
        lidx[b] = (p - (p // U) * U).reshape(T, tile, D)
    lidx = np.where(mask.reshape(B, T, tile, D), lidx, 0)
    uniq = np.where(uniq == SENT, 0, uniq).astype(np.int32)

    # reciprocal slot: for edge at (u, d) with v = nbr[u, d], where does u sit
    # in v's neighbor list (symmetric + deduped tables guarantee exactly one
    # slot). Sort each neighbor row once (masked slots pushed last so a pad 0
    # can never shadow a real id-0 neighbor), then resolve all N*D lookups
    # with ONE searchsorted over the row-offset id space — replaces the
    # [N, D, D] all-pairs compare+argmax (18 -> ~4 ms per flagship graph)
    rslot = np.zeros((B, N, D), np.int32)
    u_ids = np.arange(N, dtype=np.int64)[:, None]       # [N, 1]
    for b in range(B):
        ids = np.where(mask[b], nbr[b].astype(np.int64), SENT)
        order = np.argsort(ids, axis=1, kind="stable").astype(np.int32)
        snbr = np.take_along_axis(ids, order, axis=1)   # [N, D] rows sorted
        flat = (snbr + u_ids * K).reshape(-1)           # globally sorted
        q = nbr[b].astype(np.int64) * K + u_ids         # find u in row v
        p = np.minimum(np.searchsorted(flat, q.reshape(-1)), N * D - 1)
        j_sorted = np.minimum(p - (p // D) * D, D - 1).reshape(N, D)
        j = order[nbr[b], j_sorted]                     # slot in DEST row v
        rslot[b] = np.where(mask[b], j, 0).astype(np.int32)

    if as_numpy:
        return TiledAux(uniq=uniq, lidx=lidx, rslot=rslot)
    return TiledAux(uniq=jnp.asarray(uniq), lidx=jnp.asarray(lidx),
                    rslot=jnp.asarray(rslot))

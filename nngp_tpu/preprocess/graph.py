"""VecchiaGraph: the static device-side problem structure.

Bundles every fixed-shape array the TPU kernels need — the padded neighbor
array, the moralized-graph scatter maps, per-color and per-level padded site
lists, and the observation<->location maps.  Built once on the host
(reference: L1 preprocessing, mcmc_nngp_initialize.R:21-110) and passed to
jitted functions as a pytree argument.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import numpy as np

from nngp_tpu.preprocess.coloring import (
    dag_levels,
    greedy_coloring,
    moralized_edges,
    padded_groups,
    site_neighbor_lists,
)
from nngp_tpu.preprocess.dedupe import ObsMaps
from nngp_tpu.preprocess.neighbors import find_ordered_nn
from nngp_tpu.preprocess.ordering import lonlat_to_xyz


@dataclass(frozen=True)
class VecchiaGraph:
    # geometry (kernel_coords: coordinates fed to the covariance function —
    # 3-D unit-sphere embedding for *_sphere families, raw otherwise)
    kernel_coords: jax.Array      # f32 [n, d']
    # Vecchia DAG
    NNarray: jax.Array            # i32 [n, m+1]  (row i = [i, parents...], pad -1)
    nn_mask: jax.Array            # f32 [n, m+1]
    # moralized graph / Q = L'L assembly
    pair_edge_id: jax.Array       # i32 [n, P] -> edge id (sentinel = n_edges)
    nbr_sites: jax.Array          # i32 [n, D]  (pad = n)
    nbr_edge: jax.Array           # i32 [n, D]  (pad = n_edges)
    nbr_mask: jax.Array           # f32 [n, D]
    # chromatic schedule
    colors_idx: jax.Array         # i32 [n_colors, Smax] (pad = n)
    # triangular-solve schedule
    levels_idx: jax.Array         # i32 [n_levels, Lmax] (pad = n)
    # observation maps
    locs_match: jax.Array         # i32 [n_obs]
    hctam_scol_1: jax.Array       # i32 [n]
    obs_per_loc: jax.Array        # f32 [n]
    # static metadata
    pair_a: tuple                  # position pairs (a<b) used for Q scatter
    pair_b: tuple
    covfun: str                    # one of the 8 stationary family names
    n_edges: int                   # number of undirected moralized edges

    @property
    def n(self) -> int:
        return self.NNarray.shape[0]

    @property
    def m(self) -> int:
        return self.NNarray.shape[1] - 1

    @property
    def n_obs(self) -> int:
        return self.locs_match.shape[0]


jax.tree_util.register_dataclass(
    VecchiaGraph,
    data_fields=[
        "kernel_coords", "NNarray", "nn_mask", "pair_edge_id",
        "nbr_sites", "nbr_edge", "nbr_mask", "colors_idx", "levels_idx",
        "locs_match", "hctam_scol_1", "obs_per_loc",
    ],
    meta_fields=["pair_a", "pair_b", "covfun", "n_edges"],
)


def build_graph(
    obs_maps: ObsMaps,
    m: int,
    covfun: str,
    dtype=np.float32,
) -> tuple[VecchiaGraph, np.ndarray]:
    """Assemble the VecchiaGraph from deduped/reordered locations.

    Returns (graph, NNarray_numpy).  Covers reference steps
    mcmc_nngp_initialize.R:93-110 plus the TPU-specific level schedule.
    """
    locs = obs_maps.locs
    lonlat = "sphere" in covfun
    NN = find_ordered_nn(locs, m, lonlat=lonlat)
    n = NN.shape[0]
    edges, pair_edge_id, pa, pb = moralized_edges(NN)
    nbr_sites, nbr_edge, nbr_mask = site_neighbor_lists(n, edges)
    colors = greedy_coloring(NN)
    colors_idx, _ = padded_groups(colors, n_sentinel=n)
    levels = dag_levels(NN)
    levels_idx, _ = padded_groups(levels, n_sentinel=n)
    coords = lonlat_to_xyz(locs) if lonlat else locs
    # leaves stay NumPy on the host; the API layer device_puts the whole
    # pytree in one batched transfer before the first jitted cycle (a remote
    # TPU pays a round-trip per individual transfer)
    g = VecchiaGraph(
        kernel_coords=np.asarray(coords, dtype=dtype),
        NNarray=NN,
        nn_mask=(NN >= 0).astype(dtype),
        pair_edge_id=pair_edge_id,
        nbr_sites=nbr_sites,
        nbr_edge=nbr_edge,
        nbr_mask=nbr_mask.astype(dtype),
        colors_idx=colors_idx,
        levels_idx=levels_idx,
        locs_match=obs_maps.locs_match,
        hctam_scol_1=obs_maps.hctam_scol_1,
        obs_per_loc=obs_maps.obs_per_loc.astype(dtype),
        pair_a=tuple(int(v) for v in pa),
        pair_b=tuple(int(v) for v in pb),
        covfun=covfun,
        n_edges=int(edges.shape[0]),
    )
    return g, NN

"""Level-scheduled sparse triangular solve over the Vecchia DAG.

TPU-native replacement for the sequential sparse back-substitution
Matrix::solve(L, v) used by the reference for prior field simulation
(mcmc_nngp_initialize.R:208), the ancillary field co-transform
(mcmc_nngp_update_Gaussian.R:127) and prediction (mcmc_nngp_predict.R:46).

A sequential solve is TPU-hostile; instead, sites are grouped by their
topological depth in the DAG (preprocess.coloring.dag_levels).  Within a
level no site depends on another, so the whole level solves in one batched
gather + divide; a `lax.fori_loop` walks the levels.  Exact (not iterative):
identical result to dense back-substitution up to fp rounding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def level_solve(linv: jax.Array, v: jax.Array, graph) -> jax.Array:
    """Solve L x = v where L is the compressed [n, m+1] factor.

    Row i of the system:  linv[i,0] x_i + sum_j linv[i,j] x_{NN[i,j]} = v_i
    =>  x_i = (v_i - sum_{j>=1} linv[i,j] x_parent_j) / linv[i,0].
    Parents always live in strictly earlier levels.

    Fast path (graphs carrying ``level_segs``): a handful of
    ``fori_loop``s over tight segment-classed tables (~1.2-1.3x n gathered
    rows; preprocess.coloring.level_segments — a fully unrolled
    one-slice-per-level variant was tighter still but faulted the TPU
    worker when composed into the full Gibbs program, see that docstring).
    Fallback: ``lax.fori_loop`` over the fixed-width ``levels_idx`` blocks
    (3-4x n padded rows at Heavy-metals scale — the top measured Gibbs
    block in experiments/block_profile_r3.log before the tight schedule).
    Set ``NNGP_LEVEL_SEGS=0`` to force the fallback without a rebuild.
    """
    n = graph.n
    safe_NN = jnp.maximum(jnp.asarray(graph.NNarray), 0)
    nn_mask = jnp.asarray(graph.nn_mask)
    # x buffer with a dummy slot n that padded lanes write into; derived
    # from v (not a fresh literal) so its device-varying type matches the
    # loop body's output under shard_map
    x0 = jnp.pad(v * 0, (0, 1))

    def rows_update(rows, x):
        rows_safe = jnp.minimum(rows, n - 1)
        nn_rows = safe_NN[rows_safe]             # [W, m+1]
        lv = linv[rows_safe]                     # [W, m+1]
        msk = nn_mask[rows_safe]
        parents = x[nn_rows]                     # parent slots already solved
        acc = jnp.sum(lv[:, 1:] * msk[:, 1:] * parents[:, 1:], axis=1)
        xr = (v[rows_safe] - acc) / lv[:, 0]
        return x.at[rows].set(xr)

    import os

    segs = getattr(graph, "level_segs", None)
    if segs and os.environ.get("NNGP_LEVEL_SEGS") != "0":
        x = x0
        for tab in segs:
            tab = jnp.asarray(tab)
            if tab.shape[0] == 1:
                x = rows_update(tab[0], x)
            else:
                x = jax.lax.fori_loop(
                    0, tab.shape[0],
                    lambda l, x, t=tab: rows_update(t[l], x), x,
                )
        return x[:n]

    levels_idx = jnp.asarray(graph.levels_idx)  # [n_levels, Lmax], pad = n
    x = jax.lax.fori_loop(
        0, levels_idx.shape[0], lambda l, x: rows_update(levels_idx[l], x), x0
    )
    return x[:n]

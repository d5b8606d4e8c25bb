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
    """
    n = graph.n
    safe_NN = jnp.maximum(jnp.asarray(graph.NNarray), 0)
    nn_mask = jnp.asarray(graph.nn_mask)
    levels_idx = jnp.asarray(graph.levels_idx)  # [n_levels, Lmax], pad = n
    n_levels = levels_idx.shape[0]
    # x buffer with a dummy slot n that padded lanes write into; derived
    # from v (not a fresh literal) so its device-varying type matches the
    # loop body's output under shard_map
    x0 = jnp.pad(v * 0, (0, 1))

    def body(l, x):
        rows = levels_idx[l]                     # [Lmax]
        rows_safe = jnp.minimum(rows, n - 1)
        nn_rows = safe_NN[rows_safe]             # [Lmax, m+1]
        lv = linv[rows_safe]                     # [Lmax, m+1]
        msk = nn_mask[rows_safe]
        parents = x[nn_rows]                     # parent slots already solved
        acc = jnp.sum(lv[:, 1:] * msk[:, 1:] * parents[:, 1:], axis=1)
        xr = (v[rows_safe] - acc) / lv[:, 0]
        return x.at[rows].set(xr)

    x = jax.lax.fori_loop(0, n_levels, body, x0)
    return x[:n]

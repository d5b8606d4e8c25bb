"""Halo-sharded latent-field updates over a 'sites' mesh axis.

The SP/CP analog of docs/scaling.md: when one chip's throughput (or, far
beyond the reference's sizes, HBM) is insufficient for a single chain's
field, sites are partitioned spatially across devices; each device computes
the chromatic-sweep and level-solve rows it owns, and only *boundary*
values cross devices — static halo index sets derived from the moralized
neighbor structure (NNarray), exchanged with `lax.ppermute` ring shifts
over ICI.  (Reference scalability story: Vecchia sparsification +
chromatic blocking, mcmc_nngp_initialize.R:93-110; the reference itself has
no distributed mode.)

Design (bit-parity with the unsharded kernels by construction):

- Every device walks the *same* global block schedule (the degree-classed
  chromatic schedule of models/gaussian._chromatic_sweeps and the level
  schedule of ops/trisolve.level_solve) and draws the same per-block noise
  from the same keys; it computes only the rows it owns.
- Each device keeps a full-length local mirror of the field whose freshness
  invariant covers its owned sites plus their halo (= moralized neighbors /
  DAG parents of owned sites).  After a block step, the newly written
  values needed by another device's halo are sent with one ppermute per
  ring distance; all index tables are static, built once on the host.
- Work (gathers, m-wide dots, sampling) shards ~n/D per device; the wire
  carries only halo values — O(boundary) per block with a spatial
  partition.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

SITES_AXIS = "sites"


@dataclass(frozen=True)
class HaloPlan:
    """Static partition + exchange tables (host-built, replicated)."""

    owner: jax.Array          # i32 [n] site -> device
    # chromatic classed schedule: per degree class
    sweep_rows: tuple         # of i32 [D, nb_c, Bloc_c]; pad = B_c
    sweep_send: tuple         # of tuple over dist of (send_pos [D,nb,K],
    #                           recv_site [D,nb,K]); pads = Bloc_c, n
    # level solve
    level_rows: jax.Array     # i32 [D, nbl, Lloc]; pad = Lmax
    level_send: tuple         # tuple over dist of (send_pos, recv_site)
    # end-to-end sharded-iteration tables
    need_rows: jax.Array      # i32 [D, Nmax] owned + halo rows; pad = n
    owned_rows: jax.Array     # i32 [D, Omax] owned rows; pad = n
    obs_owner: jax.Array      # i32 [n_obs] = owner[locs_match]
    # ring distances of the send tables (static: jit-argument plans must
    # not turn the ppermute perm into tracers)
    sweep_dists: tuple        # of tuple of int, parallel to sweep_send
    level_dists: tuple        # of int, parallel to level_send
    D: int

    @property
    def n(self) -> int:
        return self.owner.shape[0]


jax.tree_util.register_dataclass(
    HaloPlan,
    data_fields=["owner", "sweep_rows", "sweep_send", "level_rows",
                 "level_send", "need_rows", "owned_rows", "obs_owner"],
    meta_fields=["sweep_dists", "level_dists", "D"],
)


def _spatial_owner(coords: np.ndarray, n: int, D: int) -> np.ndarray:
    """Contiguous stripes of the first-coordinate order: a simple spatial
    partition (a space-filling-curve cut would shrink halos further)."""
    order = np.argsort(coords[:, 0], kind="stable")
    owner = np.empty(n, dtype=np.int32)
    chunk = -(-n // D)
    for d in range(D):
        owner[order[d * chunk : (d + 1) * chunk]] = d
    return owner


def _exchange_tables(step_sites, owned_rows, owner, need_sets, D, n):
    """Static send/recv tables for one schedule.

    step_sites: [nb, B] global site per block position (pad = n)
    owned_rows: [D, nb, Bloc] positions into the block (pad = B)
    Returns list over ring distance k of (k, send_pos, recv_site) where
    send_pos [D, nb, K] indexes a device's *owned-row value vector* (pad =
    Bloc) and recv_site [D, nb, K] is the destination site (pad = n).
    """
    nb, B = step_sites.shape
    Bloc = owned_rows.shape[2]
    per_k = {}
    for b in range(nb):
        for s in range(D):
            rows = owned_rows[s, b]
            real = rows < B
            sites = step_sites[b, rows[real]]
            positions = np.nonzero(real)[0]
            keep = sites < n
            sites, positions = sites[keep], positions[keep]
            for k in range(1, D):
                dstd = (s + k) % D
                need = need_sets[dstd]
                sel = np.isin(sites, need, assume_unique=False)
                if not sel.any():
                    continue
                per_k.setdefault(k, {}).setdefault((b, s), (
                    positions[sel], sites[sel]
                ))
    out = []
    for k in sorted(per_k):
        K = max(len(v[0]) for v in per_k[k].values())
        send_pos = np.full((D, nb, K), Bloc, dtype=np.int32)
        recv_site = np.full((D, nb, K), n, dtype=np.int32)
        for (b, s), (pos, sites) in per_k[k].items():
            dstd = (s + k) % D
            send_pos[s, b, : len(pos)] = pos
            recv_site[dstd, b, : len(sites)] = sites
        out.append((k, send_pos, recv_site))
    return out


def build_halo_plan(graph, D: int, owner: np.ndarray | None = None) -> HaloPlan:
    """Build the partition + halo exchange tables from the graph structure.

    ``owner`` overrides the default spatial-stripe partition (useful in
    tests for adversarial partitions)."""
    n = graph.n
    coords = np.asarray(graph.kernel_coords)
    if owner is None:
        owner = _spatial_owner(coords, n, D)
    owner = np.asarray(owner, dtype=np.int32)

    nbr_sites = np.asarray(graph.nbr_sites)
    nbr_mask = np.asarray(graph.nbr_mask) > 0
    NN = np.asarray(graph.NNarray)
    # need set per device: owned + moralized neighbors + DAG parents of owned
    need_sets = []
    for d in range(D):
        mine = np.nonzero(owner == d)[0]
        nbrs = nbr_sites[mine][nbr_mask[mine]]
        parents = NN[mine, 1:]
        parents = parents[parents >= 0]
        need_sets.append(np.unique(np.concatenate([mine, nbrs, parents])))

    # --- chromatic classed schedule tables ---
    sweep_rows, sweep_send, sweep_dists = [], [], []
    for c_sites in graph.chrom_sites:
        c_sites = np.asarray(c_sites)
        nb, B = c_sites.shape
        own_lists = [[[] for _ in range(nb)] for _ in range(D)]
        for b in range(nb):
            row = c_sites[b]
            real = row < n
            for p in np.nonzero(real)[0]:
                own_lists[owner[row[p]]][b].append(p)
        Bloc = max(
            (len(l) for dl in own_lists for l in dl), default=1
        )
        Bloc = max(Bloc, 1)
        rows_tbl = np.full((D, nb, Bloc), B, dtype=np.int32)
        for d in range(D):
            for b in range(nb):
                l = own_lists[d][b]
                rows_tbl[d, b, : len(l)] = l
        sweep_rows.append(rows_tbl)
        tabs = _exchange_tables(c_sites, rows_tbl, owner, need_sets, D, n)
        sweep_send.append(tuple((sp, rs) for (_, sp, rs) in tabs))
        sweep_dists.append(tuple(int(k) for (k, _, _) in tabs))

    # --- level-solve tables ---
    levels_idx = np.asarray(graph.levels_idx)
    nbl, Lmax = levels_idx.shape
    own_lists = [[[] for _ in range(nbl)] for _ in range(D)]
    for b in range(nbl):
        row = levels_idx[b]
        real = row < n
        for p in np.nonzero(real)[0]:
            own_lists[owner[row[p]]][b].append(p)
    Lloc = max((len(l) for dl in own_lists for l in dl), default=1)
    Lloc = max(Lloc, 1)
    level_rows = np.full((D, nbl, Lloc), Lmax, dtype=np.int32)
    for d in range(D):
        for b in range(nbl):
            l = own_lists[d][b]
            level_rows[d, b, : len(l)] = l
    ltabs = _exchange_tables(levels_idx, level_rows, owner, need_sets, D, n)
    level_send = tuple((sp, rs) for (_, sp, rs) in ltabs)
    level_dists = tuple(int(k) for (k, _, _) in ltabs)

    Nmax = max(len(s) for s in need_sets)
    need_rows = np.full((D, Nmax), n, dtype=np.int32)
    for d in range(D):
        need_rows[d, : len(need_sets[d])] = need_sets[d]
    own_sets = [np.nonzero(owner == d)[0] for d in range(D)]
    Omax = max(len(s) for s in own_sets)
    owned_rows = np.full((D, Omax), n, dtype=np.int32)
    for d in range(D):
        owned_rows[d, : len(own_sets[d])] = own_sets[d]

    return HaloPlan(
        owner=owner,
        sweep_rows=tuple(sweep_rows),
        sweep_send=tuple(sweep_send),
        level_rows=level_rows,
        level_send=level_send,
        need_rows=need_rows,
        owned_rows=owned_rows,
        obs_owner=owner[np.asarray(graph.locs_match)],
        sweep_dists=tuple(sweep_dists),
        level_dists=level_dists,
        D=D,
    )


def _varying(x, axis):
    """Mark a replicated value as device-varying so it can be a fori_loop
    carry whose body output varies across the mesh axis."""
    return lax.pcast(x, (axis,), to="varying")


def _exchange(w, vals_pad, send_tabs, dists, d, b, D, axis):
    """Eagerly exchange freshly written values: one ppermute ring shift per
    nonempty distance; static tables (dists are python ints so the ppermute
    perm stays static when the plan is a jit argument), pad slots write to
    the dummy site."""
    for k, (send_pos, recv_site) in zip(dists, send_tabs):
        sp = jnp.asarray(send_pos)[d, b]
        sv = vals_pad[sp]
        rv = lax.ppermute(
            sv, axis, perm=[(i, (i + k) % D) for i in range(D)]
        )
        w = w.at[jnp.asarray(recv_site)[d, b]].set(rv)
    return w


def halo_chromatic_sweeps(graph, plan: HaloPlan, w, pregathered, beta_0,
                          inv_scale, inv_noise, key, n_sweeps: int,
                          dtype=jnp.float32, axis=SITES_AXIS):
    """Device-local body of the halo-sharded chromatic sweeps (call inside
    shard_map over the 'sites' axis).

    w: full-length local mirror [n+1] (fresh everywhere at entry);
    pregathered: the per-class (c_sites, c_nbrs, q_blk, P_blk, rs_blk)
    tuples exactly as models/gaussian._chromatic_sweeps builds them.
    Returns the updated mirror (fresh at owned + halo sites; globally fresh
    after the caller's final all-reconcile).
    Bit-parity: same per-block keys and noise as the unsharded path.
    """
    n = plan.n
    D = plan.D
    d = lax.axis_index(axis)

    def one_sweep(sweep, w):
        salt = sweep * 1_000_003
        for ci, (c_sites, c_nbrs, q_blk, P_blk, rs_blk) in enumerate(
            pregathered
        ):
            nb, B = c_sites.shape
            rows_tbl = plan.sweep_rows[ci]
            Bloc = rows_tbl.shape[2]
            send_tabs = plan.sweep_send[ci]
            dists = plan.sweep_dists[ci]

            def block_step(b, w, c_sites=c_sites, c_nbrs=c_nbrs,
                           q_blk=q_blk, P_blk=P_blk, rs_blk=rs_blk,
                           rows_tbl=rows_tbl, send_tabs=send_tabs,
                           dists=dists, ci=ci, B=B, Bloc=Bloc):
                kc = jax.random.fold_in(key, salt + ci * 10_007 + b)
                noise_full = jax.random.normal(kc, (B,), dtype=dtype)
                my_rows = jnp.asarray(rows_tbl)[d, b]     # [Bloc], pad = B
                safe = jnp.minimum(my_rows, B - 1)
                mask = my_rows < B
                sites1 = jnp.concatenate(
                    [c_sites[b], jnp.full((1,), n, dtype=c_sites.dtype)]
                )
                my_sites = sites1[my_rows]                # pad -> n
                prior = jnp.sum(
                    q_blk[b][safe] * (w[c_nbrs[b][safe]] - beta_0), axis=1
                )
                Pp = P_blk[b][safe]
                mean = beta_0 - (inv_scale * prior - inv_noise
                                 * rs_blk[b][safe]) / Pp
                val = mean + noise_full[safe] * lax.rsqrt(Pp)
                w = w.at[jnp.where(mask, my_sites, n)].set(val)
                vals_pad = jnp.concatenate([val, jnp.zeros(1, dtype=dtype)])
                return _exchange(w, vals_pad, send_tabs, dists, d, b, D,
                                 axis)

            w = lax.fori_loop(0, nb, block_step, w)
        return w

    return lax.fori_loop(0, n_sweeps, one_sweep, _varying(w, axis))


def halo_level_solve(graph, plan: HaloPlan, linv, v, dtype=jnp.float32,
                     axis=SITES_AXIS):
    """Halo-sharded level-scheduled triangular solve (inside shard_map):
    same math as ops/trisolve.level_solve, rows sharded by owner, parent
    values crossing devices through the halo exchange."""
    n = plan.n
    D = plan.D
    d = lax.axis_index(axis)
    safe_NN = jnp.maximum(jnp.asarray(graph.NNarray), 0)
    nn_mask = jnp.asarray(graph.nn_mask)
    levels_idx = jnp.asarray(graph.levels_idx)
    nbl, Lmax = levels_idx.shape
    x0 = jnp.pad(v * 0, (0, 1))

    def body(l, x):
        my_rows = jnp.asarray(plan.level_rows)[d, l]      # pad = Lmax
        safe = jnp.minimum(my_rows, Lmax - 1)
        mask = my_rows < Lmax
        rows1 = jnp.concatenate(
            [levels_idx[l], jnp.full((1,), n, dtype=levels_idx.dtype)]
        )
        rows = rows1[my_rows]                             # pad -> n
        rows_safe = jnp.minimum(rows, n - 1)
        nn_rows = safe_NN[rows_safe]
        lv = linv[rows_safe]
        msk = nn_mask[rows_safe]
        parents = x[nn_rows]
        acc = jnp.sum(lv[:, 1:] * msk[:, 1:] * parents[:, 1:], axis=1)
        xr = (v[rows_safe] - acc) / lv[:, 0]
        x = x.at[jnp.where(mask, rows, n)].set(xr)
        vals_pad = jnp.concatenate([xr, jnp.zeros(1, dtype=xr.dtype)])
        return _exchange(x, vals_pad, plan.level_send, plan.level_dists, d,
                         l, D, axis)

    x = lax.fori_loop(0, nbl, body, _varying(x0, axis))
    # every device's mirror is fresh at owned + halo sites; one psum of the
    # owned entries makes the result globally fresh (replicated)
    x = reconcile(x, jnp.asarray(plan.owner), axis=axis)
    return x[:n]


def reconcile(w, owner, axis=SITES_AXIS):
    """Make every device's full-length mirror [n+1] globally fresh: keep
    owned entries, zero the rest (and the dummy slot), psum over the axis."""
    d = lax.axis_index(axis)
    own1 = jnp.concatenate(
        [(owner == d).astype(w.dtype), jnp.zeros((1,), dtype=w.dtype)]
    )
    return lax.psum(w * own1, axis)
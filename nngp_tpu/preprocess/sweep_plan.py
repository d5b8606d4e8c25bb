"""Routing plan for the Pallas chromatic-sweep kernel.

TPU VPUs have no native arbitrary gather/scatter: Mosaic lowers only
*within-row* (lane) dynamic gathers over <=128 lanes, static rolls and
transposes.  The chromatic field update, however, is all irregular gathers
— each site reads its moralized neighbors' field values and the matching
precision entries (the reference realizes this as per-color sparse
crossprods, mcmc_nngp_update_Gaussian.R:261-274).

This module turns the irregular access pattern into *routed* dense ops,
planned once on the host:

  storage   the field lives on-chip as a [R, 128] tile; site s sits at
            flat position (row, column).  Positions are color-major so a
            chromatic block updates a contiguous row range (its "scatter"
            is a masked contiguous store).
  stage 1   chunked lane gathers from K transposed field copies
            wT_k[gamma, r] (sublane = mapped column
            gamma_k = (col + k*row) mod 128, lane = storage row): transit
            chunk ci reads one aligned 128-row window of storage (its
            source block a), so each gather is a supported
            [128, 128] x [128, 128] lane gather.
  stage 2   one 2-D transpose of the assembled [128, L] transit tile.
  stage 3   one lane gather per copy rearranging each transit row
            (<=128 lanes) so every element lands in its site's lane.
  reduce    prior[g, site] = sum over the group's transit rows — a
            [G, L] x [L, 128] f32 matmul against a static 0/1 matrix M
            that also encodes the transit-row -> site-group permutation.

Transit rows are labeled (source block a, site group g): a row only holds
elements whose field value comes from storage rows [128a, 128(a+1)) and
whose site belongs to group g.  Within a row, elements need distinct site
lanes and distinct (k, gamma) keys (one transit value per cell).  K > 1
diagonal column mappings multiply the key space; the greedy packer below
appends rows for the rare leftovers (Koenig's theorem bounds the rows
needed).  Rows of different groups never share, so placement is computed
independently per 128-site group and blocks are packed afterwards.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np


@dataclass(frozen=True)
class SweepPlan:
    """Static routing tiles for the Pallas sweep kernel (device pytree).

    R = field storage rows (multiple of 128), L = transit rows per block
    (NC * 128), NC = stage-1 chunks, G = max 128-site groups per block,
    K = column mappings, NB = blocks per sweep.
    """

    perm: jax.Array        # i32 [n]  site -> flat storage position
    flat_site: jax.Array   # i32 [R*128] flat position -> site (sentinel n)
    I1: jax.Array          # i32 [NB, K, NC, 128, 128] local source rows
    a_label: jax.Array     # i32 [NB, NC] source block per transit chunk
    I3: jax.Array          # i32 [NB, K, L, 128] transit column per element
    sel: jax.Array         # f32 [NB, L, 128] field copy index per element
    edge_nat: jax.Array    # i32 [NB, L, 128] undirected edge id (sent. = E)
    qsign_nat: jax.Array   # f32 [NB, L, 128] 1 for real elements else 0
    sites_nat: jax.Array   # i32 [NB, G, 128] original site id (sentinel n)
    wmask: jax.Array       # f32 [NB, G, 128] real-site mask
    M: jax.Array           # f32 [NB, G, L] 0/1 transit-row -> group matrix
    row0: jax.Array        # i32 [NB, 1] first storage row of each block
    # static meta
    R: int
    L: int
    NC: int
    G: int
    K: int
    n_blocks: int
    n_colors: int

    @property
    def n_flat(self) -> int:
        return self.R * 128


jax.tree_util.register_dataclass(
    SweepPlan,
    data_fields=[
        "perm", "flat_site", "I1", "a_label", "I3", "sel", "edge_nat",
        "qsign_nat", "sites_nat", "wmask", "M", "row0",
    ],
    meta_fields=["R", "L", "NC", "G", "K", "n_blocks", "n_colors"],
)


def _place_group(sites, nbr_sites, nbr_edge, nmask, frow, fcol, K):
    """Greedy per-group placement.  Returns rows (list of dicts keyed by
    source block a) and per-element placements
    (a, row_within_(a)-list, lane, k, gamma, b_local, edge)."""
    rows_by_a = {}   # a -> list of rows; row = (lane_used set, key_used dict)
    out = []
    for l in range(128):
        s = sites[l]
        if s < 0:
            continue
        msk = nmask[s]
        for nb, ed in zip(nbr_sites[s][msk], nbr_edge[s][msk]):
            r_src = frow[nb]
            a, b_loc = divmod(int(r_src), 128)
            gams = [(int(fcol[nb]) + k * int(r_src)) % 128 for k in range(K)]
            rows = rows_by_a.setdefault(a, [])
            ri = 0
            while True:
                if ri == len(rows):
                    rows.append(({}, {}))
                lane_used, key_used = rows[ri]
                if l not in lane_used:
                    k_pick = -1
                    for k in range(K):
                        cur = key_used.get((k, gams[k]))
                        if cur is None or cur == nb:
                            k_pick = k
                            break
                    if k_pick >= 0:
                        lane_used[l] = True
                        key_used[(k_pick, gams[k_pick])] = nb
                        out.append(
                            (a, ri, l, k_pick, gams[k_pick], b_loc, int(ed))
                        )
                        break
                ri += 1
    rows_per_a = {a: len(rows) for a, rows in rows_by_a.items()}
    return rows_per_a, out


def build_sweep_plan(
    colors: np.ndarray,
    nbr_sites: np.ndarray,
    nbr_edge: np.ndarray,
    nbr_mask: np.ndarray,
    n_edges: int,
    L_max: int = 1536,
    G: int = 64,
    K: int = 2,
) -> SweepPlan:
    """Build the routing plan from the moralized neighbor structure.

    colors: [n] proper coloring of the moralized graph; nbr_*: [n, D]
    padded per-site neighbor/edge lists (pad site = n, pad edge = n_edges).
    """
    colors = np.asarray(colors)
    nbr_sites = np.asarray(nbr_sites)
    nbr_edge = np.asarray(nbr_edge)
    nmask = np.asarray(nbr_mask).astype(bool)
    n = len(colors)
    n_colors = int(colors.max()) + 1 if n else 1
    deg = nmask.sum(axis=1).astype(np.int64)

    # ---- storage layout: color-major, degree-sorted within color,
    # each color padded to whole 128-site groups ----
    flat_site_list = []
    group_sites = []      # per group: array of 128 site ids (pad -1)
    group_color = []
    for c in range(n_colors):
        sc = np.where(colors == c)[0]
        sc = sc[np.argsort(-deg[sc], kind="stable")]
        pad = (-len(sc)) % 128
        scp = np.concatenate([sc, np.full(pad, -1, dtype=np.int64)])
        flat_site_list.append(scp)
        for g0 in range(0, len(scp), 128):
            group_sites.append(scp[g0 : g0 + 128])
            group_color.append(c)
    flat_site = (np.concatenate(flat_site_list)
                 if flat_site_list else np.zeros(0, np.int64))
    n_groups = len(group_sites)

    frow = np.zeros(n, dtype=np.int64)   # site -> storage row
    fcol = np.zeros(n, dtype=np.int64)   # site -> storage column
    real = flat_site >= 0
    pos = np.nonzero(real)[0]
    frow[flat_site[real]] = pos // 128
    fcol[flat_site[real]] = pos % 128

    # ---- per-group placement (independent: rows are (a, g)-labeled) ----
    grp_rows_per_a = []
    grp_place = []
    for g in range(n_groups):
        rpa, out = _place_group(
            group_sites[g], nbr_sites, nbr_edge, nmask, frow, fcol, K
        )
        grp_rows_per_a.append(rpa)
        grp_place.append(out)

    # ---- pack consecutive same-color groups into blocks:
    # transit rows = sum over a of ceil(rows_a / 128) * 128 <= L_max ----
    def block_L(rows_per_a):
        return sum(-(-r // 128) * 128 for r in rows_per_a.values())

    blocks, cur, cur_rpa, cur_color = [], [], {}, None
    for g in range(n_groups):
        c = group_color[g]
        trial = dict(cur_rpa)
        for a, r in grp_rows_per_a[g].items():
            trial[a] = trial.get(a, 0) + r
        if cur and (c != cur_color or block_L(trial) > L_max or len(cur) == G):
            blocks.append((tuple(cur), cur_rpa))
            cur, cur_rpa = [], {}
            trial = dict(grp_rows_per_a[g])
        cur.append(g)
        cur_rpa = trial
        cur_color = c
    if cur:
        blocks.append((tuple(cur), cur_rpa))
    NB = len(blocks)
    NC = max((block_L(rpa) // 128 for _, rpa in blocks), default=1)
    NC = max(NC, 1)
    L = NC * 128

    # storage rows padded so every block's G-row RMW window exists
    max_row0 = max((bg[0] for bg, _ in blocks), default=0)
    R = -(-max(n_groups, max_row0 + G) // 128) * 128
    flat_site = np.concatenate(
        [flat_site, np.full(R * 128 - len(flat_site), -1, dtype=np.int64)])
    perm = np.zeros(n, dtype=np.int32)
    perm[flat_site[flat_site >= 0]] = np.nonzero(flat_site >= 0)[0].astype(
        np.int32)

    # ---- emit tiles ----
    I1 = np.zeros((NB, K, NC, 128, 128), dtype=np.int32)
    a_label = np.zeros((NB, NC), dtype=np.int32)
    I3 = np.zeros((NB, K, L, 128), dtype=np.int32)
    sel = np.full((NB, L, 128), -1.0, dtype=np.float32)
    edge_nat = np.full((NB, L, 128), n_edges, dtype=np.int32)
    qsign = np.zeros((NB, L, 128), dtype=np.float32)
    sites_nat = np.full((NB, G, 128), n, dtype=np.int32)
    wmask = np.zeros((NB, G, 128), dtype=np.float32)
    M = np.zeros((NB, G, L), dtype=np.float32)
    row0 = np.zeros((NB, 1), dtype=np.int32)

    for bi, (bg, rpa) in enumerate(blocks):
        row0[bi, 0] = bg[0]  # group index == storage row
        # transit-row base per (a, g): chunks laid out a-major, groups
        # sequential within each a's row span
        a_sorted = sorted(rpa)
        a_base, off = {}, 0
        for a in a_sorted:
            a_rows = -(-rpa[a] // 128) * 128
            a_base[a] = off
            for ci in range(off // 128, (off + a_rows) // 128):
                a_label[bi, ci] = a
            off += a_rows
        # per (a): running row offset as groups are emitted
        a_cursor = {a: 0 for a in a_sorted}
        for gi, g in enumerate(bg):
            sites = group_sites[g]
            realm = sites >= 0
            sites_nat[bi, gi, realm] = sites[realm]
            wmask[bi, gi] = realm.astype(np.float32)
            g_row_base = {
                a: a_base[a] + a_cursor[a] for a in grp_rows_per_a[g]
            }
            for (a, ri, l, k, gam, b_loc, ed) in grp_place[g]:
                u = g_row_base[a] + ri
                I3[bi, k, u, l] = gam
                sel[bi, u, l] = k
                edge_nat[bi, u, l] = ed
                qsign[bi, u, l] = 1.0
                I1[bi, k, u // 128, gam, u % 128] = b_loc
                M[bi, gi, u] = 1.0
            for a, r in grp_rows_per_a[g].items():
                a_cursor[a] += r

    return SweepPlan(
        perm=perm,
        flat_site=np.where(flat_site >= 0, flat_site, n).astype(np.int32),
        I1=I1, a_label=a_label, I3=I3, sel=sel,
        edge_nat=edge_nat, qsign_nat=qsign, sites_nat=sites_nat,
        wmask=wmask, M=M, row0=row0,
        R=R, L=L, NC=NC, G=G, K=K, n_blocks=NB, n_colors=n_colors,
    )

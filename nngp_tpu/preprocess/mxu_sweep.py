"""MXU (matmul) routing plan for the chromatic sweep.

The chromatic field update is gather-bound: per sweep every site reads its
moralized neighbors' values (mcmc_nngp_update_Gaussian.R:261-274).  XLA's
batched HBM gather issues ~1-2 elements/ns; the MXU moves ~10^5
multiply-accumulates/ns.  This plan re-expresses the bulk of the gather as
**one-hot 128x128 matmul chunks** with the chain axis on lanes:

  - the field is stored [R, C] (storage row, chain); rows are ordered
    hot-first then Morton (space-filling curve), so a chromatic block's
    neighbor reads concentrate in a few 128-row *windows*;
  - *hot* sites (top in-degree — the early maxmin sites referenced from
    everywhere, whose own neighbor lists also span the whole domain) are
    excluded from the matmul blocks and updated by one plain-gather block
    per color: they are few (~1k), so their irregular traffic is cheap,
    and removing them collapses the window spread of everyone else;
  - per (block, window) the needed elements are packed into 128-row chunks
    with a static 0/1 matrix G_chunk[128, 128]:
        vals[128, C] = G_chunk @ w_store[window*128 : (window+1)*128, :]
    — one matmul fetches 128 neighbor values for every chain at once;
  - a second 0/1 matmul M[B, NC*128] segment-sums the q-weighted element
    rows into per-site priors.

G and M entries are 0/1 so they are exact in bf16; the field/product is
split into bf16 hi+lo halves so the matmuls keep ~16 mantissa bits (a
single-pass bf16 matmul loses ~3 digits — the failure mode the Pallas
hardware preflight caught).  Blocks are grouped into power-of-two
chunk-count (NC) classes for uniform shapes.

Every block is single-color (supertile x color), so this is the same
chromatic Gibbs as the classed schedule in a different — equally valid —
block order.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np


def morton_order(coords: np.ndarray, bits: int = 16) -> np.ndarray:
    """Sites sorted by Morton code of the (quantized) coordinates."""
    c = np.asarray(coords, dtype=np.float64)
    n, d = c.shape
    q = np.zeros((n, d), dtype=np.uint64)
    for j in range(d):
        lo, hi = c[:, j].min(), c[:, j].max()
        span = hi - lo if hi > lo else 1.0
        q[:, j] = np.minimum(
            ((c[:, j] - lo) / span * ((1 << bits) - 1)).astype(np.uint64),
            (1 << bits) - 1,
        )
    code = np.zeros(n, dtype=np.uint64)
    for b in range(bits):
        for j in range(d):
            code |= ((q[:, j] >> np.uint64(b)) & np.uint64(1)) << np.uint64(
                b * d + j
            )
    return np.argsort(code, kind="stable")


@dataclass(frozen=True)
class MxuSweepPlan:
    """Static tiles.  Matmul blocks come in NC (chunk-count) classes with
    uniform shapes; hot sites form one plain-gather block per color."""

    store_site: jax.Array    # i32 [R] storage row -> site (pad = n)
    frow: jax.Array          # i32 [n] site -> storage row
    # per NC class (tuples over classes; each class carries one trailing
    # DUMMY block — all-pad sites/rows, zero G/M — as the pad target of the
    # color groups):
    sites: tuple             # i32 [nb+1, B]     (pad = n)
    srows: tuple             # i32 [nb, B]       (pad = R: dummy row)
    win_ids: tuple           # i32 [nb, NC]      source window per chunk (pad 0)
    G: tuple                 # bf16 [nb, NC, 128, 128] one-hot chunk gather
    M: tuple                 # bf16 [nb, B, NC*128] element-row -> site reduce
    eid_rows: tuple          # i32 [nb, NC*128]  q-edge id per element row
    #                          (pad = n_edges -> q value 0)
    # hot blocks (plain row-gather path), one per color:
    hot_sites: jax.Array     # i32 [n_colors, Hc]      (pad = n)
    hot_srows: jax.Array     # i32 [n_colors, Hc]      (pad = R)
    hot_nrows: jax.Array     # i32 [n_colors, Hc, W]   neighbor storage rows
    #                          (pad = R: zero row... see executor)
    hot_eids: jax.Array      # i32 [n_colors, Hc, W]   (pad = n_edges)
    hot_mask: jax.Array      # f32 [n_colors, Hc, W]
    # color-batched execution: per class, the blocks of one color are
    # mutually non-adjacent (single-color blocks), so one batched einsum
    # step updates a whole color group — ~n_colors launches per class per
    # sweep instead of ~n_blocks (the round-2 MXU path was launch-bound at
    # 560 ms/iter, VERDICT r2 weak #4)
    groups: tuple            # i32 [n_groups, gmax] class-local block ids
    #                          (pad = nb -> the dummy block)
    R: int
    B: int
    ncs: tuple               # NC per class
    n_blocks: tuple          # nb per class (excluding the dummy)

    @property
    def n(self) -> int:
        return self.frow.shape[0]


jax.tree_util.register_dataclass(
    MxuSweepPlan,
    data_fields=["store_site", "frow", "sites", "srows", "win_ids", "G",
                 "M", "eid_rows", "hot_sites", "hot_srows", "hot_nrows",
                 "hot_eids", "hot_mask", "groups"],
    meta_fields=["R", "B", "ncs", "n_blocks"],
)


def build_mxu_sweep_plan(
    colors: np.ndarray,
    nbr_sites: np.ndarray,
    nbr_edge: np.ndarray,
    nbr_mask: np.ndarray,
    coords: np.ndarray,
    n_edges: int,
    B: int = 128,
    hot_count: int = 1024,
    supertile: int | None = None,
) -> MxuSweepPlan:
    import jax.numpy as jnp

    colors = np.asarray(colors)
    nbr_sites = np.asarray(nbr_sites)
    nbr_edge = np.asarray(nbr_edge)
    nmask_in = np.asarray(nbr_mask) > 0
    n, D = nbr_sites.shape
    n_colors = int(colors.max()) + 1 if n else 1

    # ---- hot set: top in-degree sites (early maxmin sites) ----
    indeg = np.zeros(n, dtype=np.int64)
    np.add.at(indeg, nbr_sites[nmask_in], 1)
    n_hot = min(hot_count, n)
    hot = np.argsort(-indeg, kind="stable")[:n_hot]
    hot_set = np.zeros(n, dtype=bool)
    hot_set[hot] = True

    # ---- storage order: hot first, Morton for the rest ----
    morton = morton_order(coords)
    rest = morton[~hot_set[morton]]
    order = np.concatenate([hot, rest])
    frow = np.empty(n, dtype=np.int64)
    frow[order] = np.arange(n)
    R = -(-n // 128) * 128
    store_site = np.full(R, n, dtype=np.int32)
    store_site[: n] = order

    if supertile is None:
        supertile = B * max(n_colors, 1)

    # ---- hot blocks: one per color, plain-gather path ----
    Wd = int(nmask_in[hot].sum(axis=1).max()) if n_hot else 1
    Hc = max(
        (int((colors[hot] == c).sum()) for c in range(n_colors)), default=1
    )
    Hc = max(Hc, 1)
    hot_sites = np.full((n_colors, Hc), n, dtype=np.int32)
    hot_srows = np.full((n_colors, Hc), R, dtype=np.int32)
    hot_nrows = np.full((n_colors, Hc, Wd), R, dtype=np.int32)
    hot_eids = np.full((n_colors, Hc, Wd), n_edges, dtype=np.int32)
    hot_mask = np.zeros((n_colors, Hc, Wd), dtype=np.float32)
    frow_pad = np.concatenate([frow, [R]])  # site n -> dummy row
    for c in range(n_colors):
        sc = hot[colors[hot] == c]
        hot_sites[c, : len(sc)] = sc
        hot_srows[c, : len(sc)] = frow[sc]
        for i, s in enumerate(sc):
            m = nmask_in[s]
            k = int(m.sum())
            hot_nrows[c, i, :k] = frow[nbr_sites[s][m]]
            hot_eids[c, i, :k] = nbr_edge[s][m]
            hot_mask[c, i, :k] = 1.0

    # ---- matmul blocks over non-hot sites: (storage supertile x color) ----
    blocks = []
    block_colors = []
    nonhot_stream = order[n_hot:]
    for t0 in range(0, len(nonhot_stream), supertile):
        tile = nonhot_stream[t0 : t0 + supertile]
        cs = colors[tile]
        for c in np.unique(cs):
            sc = tile[cs == c]
            for b0 in range(0, len(sc), B):
                blocks.append(sc[b0 : b0 + B])
                block_colors.append(int(c))
    block_colors = np.asarray(block_colors, dtype=np.int64)

    # ---- vectorized element lists per block ----
    # global element table: (block, local site idx, edge, source row)
    blk_of = np.full(n, -1, dtype=np.int64)
    loc_of = np.zeros(n, dtype=np.int64)
    for bi, s in enumerate(blocks):
        blk_of[s] = bi
        loc_of[s] = np.arange(len(s))
    src_site = nbr_sites.copy()
    e_site = np.repeat(np.arange(n), D).reshape(n, D)
    sel = nmask_in & (blk_of[e_site] >= 0)
    eb = blk_of[e_site[sel]]
    eloc = loc_of[e_site[sel]]
    eed = nbr_edge[sel]
    erow = frow[src_site[sel]]
    ewin = erow // 128
    # sort by (block, window) and chunk into <=128-row groups per window
    so = np.lexsort((ewin, eb))
    eb, eloc, eed, erow, ewin = (a[so] for a in (eb, eloc, eed, erow, ewin))
    new_grp = np.ones(len(eb), dtype=bool)
    new_grp[1:] = (eb[1:] != eb[:-1]) | (ewin[1:] != ewin[:-1])
    grp_id = np.cumsum(new_grp) - 1
    pos_in_grp = np.arange(len(eb)) - np.maximum.accumulate(
        np.where(new_grp, np.arange(len(eb)), 0)
    )
    sub = pos_in_grp // 128
    new_chunk = new_grp | ((pos_in_grp % 128 == 0) & (pos_in_grp > 0))
    chunk_id = np.cumsum(new_chunk) - 1
    row_in_chunk = pos_in_grp % 128
    # chunk -> (block, window)
    ch_first = np.nonzero(new_chunk)[0]
    ch_blk = eb[ch_first]
    ch_win = ewin[ch_first]
    # chunk index within block
    nb = len(blocks)
    ch_new_blk = np.ones(len(ch_blk), dtype=bool)
    ch_new_blk[1:] = ch_blk[1:] != ch_blk[:-1]
    ch_in_blk = np.arange(len(ch_blk)) - np.maximum.accumulate(
        np.where(ch_new_blk, np.arange(len(ch_blk)), 0)
    )
    ncs_per_block = np.zeros(nb, dtype=np.int64)
    np.add.at(ncs_per_block, ch_blk, 1)

    # ---- NC classes (pow2) ----
    classes = []
    ncv = np.maximum(ncs_per_block, 1)
    ncv_max = int(ncv.max()) if nb else 1
    w = 8
    widths = []
    while w < ncv_max:
        widths.append(w)
        w *= 2
    widths.append(int(max(ncv_max, 8)))
    cls_of = np.searchsorted(widths, ncv)
    used = sorted(set(cls_of.tolist()))
    widths = [widths[u] for u in used]
    remap = {u: i for i, u in enumerate(used)}
    cls_of = np.array([remap[u] for u in cls_of])

    bf16 = jnp.bfloat16
    sites_t, srows_t, win_t, G_t, M_t, eid_t, ncs_out, nb_out = (
        [], [], [], [], [], [], [], []
    )
    groups_t = []
    # per-element class-local block index
    blk_local = np.zeros(nb, dtype=np.int64)
    for ci, NC in enumerate(widths):
        idxs = np.nonzero(cls_of == ci)[0]
        blk_local[idxs] = np.arange(len(idxs))
    e_cls = cls_of[eb]
    e_lb = blk_local[eb]
    ch_cls = cls_of[ch_blk]
    ch_lb = blk_local[ch_blk]
    e_chunk_in_blk = ch_in_blk[chunk_id]

    for ci, NC in enumerate(widths):
        idxs = np.nonzero(cls_of == ci)[0]
        nbc = len(idxs)
        sites = np.full((nbc, B), n, dtype=np.int32)
        srows = np.full((nbc, B), R, dtype=np.int32)
        for li, gi in enumerate(idxs):
            s = blocks[gi]
            sites[li, : len(s)] = s
            srows[li, : len(s)] = frow[s]
        win_ids = np.zeros((nbc, NC), dtype=np.int32)
        cm = ch_cls == ci
        win_ids[ch_lb[cm], ch_in_blk[cm]] = ch_win[cm]
        G = np.zeros((nbc, NC, 128, 128), dtype=np.float32)
        M = np.zeros((nbc, B, NC * 128), dtype=np.float32)
        eid_rows = np.full((nbc, NC * 128), n_edges, dtype=np.int32)
        em = e_cls == ci
        lb = e_lb[em]
        cb = e_chunk_in_blk[em]
        rr = row_in_chunk[em]
        G[lb, cb, rr, erow[em] % 128] = 1.0
        M[lb, eloc[em], cb * 128 + rr] = 1.0
        eid_rows[lb, cb * 128 + rr] = eed[em]
        # color groups (class-local block ids, padded with the dummy nbc)
        bc = block_colors[idxs]
        present = np.unique(bc)
        gmax = max((int((bc == c).sum()) for c in present), default=1)
        groups = np.full((max(len(present), 1), max(gmax, 1)), nbc,
                         dtype=np.int32)
        for gi, c in enumerate(present):
            ids = np.nonzero(bc == c)[0]
            groups[gi, : len(ids)] = ids
        # trailing dummy block: all-pad sites, dummy rows, zero routing
        sites = np.concatenate([sites, np.full((1, B), n, np.int32)])
        srows = np.concatenate([srows, np.full((1, B), R, np.int32)])
        win_ids = np.concatenate([win_ids, np.zeros((1, NC), np.int32)])
        G = np.concatenate([G, np.zeros((1, NC, 128, 128), G.dtype)])
        M = np.concatenate([M, np.zeros((1, B, NC * 128), M.dtype)])
        eid_rows = np.concatenate(
            [eid_rows, np.full((1, NC * 128), n_edges, np.int32)])
        sites_t.append(sites)
        srows_t.append(srows)
        win_t.append(win_ids)
        G_t.append(jnp.asarray(G, dtype=bf16))
        M_t.append(jnp.asarray(M, dtype=bf16))
        eid_t.append(eid_rows)
        ncs_out.append(int(NC))
        nb_out.append(nbc)
        groups_t.append(groups)

    return MxuSweepPlan(
        store_site=store_site,
        frow=frow.astype(np.int32),
        sites=tuple(sites_t),
        srows=tuple(srows_t),
        win_ids=tuple(win_t),
        G=tuple(G_t),
        M=tuple(M_t),
        eid_rows=tuple(eid_t),
        hot_sites=hot_sites,
        hot_srows=hot_srows,
        hot_nrows=hot_nrows,
        hot_eids=hot_eids,
        hot_mask=hot_mask,
        groups=tuple(groups_t),
        R=R,
        B=B,
        ncs=tuple(ncs_out),
        n_blocks=tuple(nb_out),
    )


def plan_stats(plan: MxuSweepPlan) -> dict:
    per_class, g_bytes, flops = [], 0, 0
    for nb, NC in zip(plan.n_blocks, plan.ncs):
        gb = nb * NC * 128 * 128 * 2
        mb = nb * plan.B * NC * 128 * 2
        g_bytes += gb + mb
        flops += nb * NC * 128 * 128 * 128 * 2 * 2 + nb * plan.B * NC * 128 * 128 * 2 * 2
        per_class.append({"nb": nb, "NC": NC,
                          "G+M_MB": round((gb + mb) / 1e6, 1)})
    return {
        "R": plan.R,
        "classes": per_class,
        "hot": {"Hc": int(plan.hot_sites.shape[1]),
                "colors": int(plan.hot_sites.shape[0]),
                "W": int(plan.hot_nrows.shape[2])},
        "G+M_total_GB": round(g_bytes / 1e9, 3),
        "flops_per_sweep_GF_at_C128": round(flops / 1e9, 1),
    }

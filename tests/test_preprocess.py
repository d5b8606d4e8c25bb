"""Preprocessing unit tests: orderings, NN search, coloring, levels, dedupe."""

import numpy as np
import pytest

from nngp_tpu.preprocess.ordering import (
    order_maxmin,
    order_coordinate,
    order_dist_to_point,
    order_middleout,
    reorder_locations,
)
from nngp_tpu.preprocess.neighbors import find_ordered_nn
from nngp_tpu.preprocess.coloring import (
    moralized_adjacency,
    moralized_edges,
    greedy_coloring,
    dag_levels,
    padded_groups,
    site_neighbor_lists,
)
from nngp_tpu.preprocess.dedupe import dedupe_and_match


def brute_force_ordered_nn(locs, m):
    n = len(locs)
    NN = np.full((n, m + 1), -1, dtype=np.int32)
    NN[:, 0] = np.arange(n)
    for i in range(1, n):
        d = ((locs[:i] - locs[i]) ** 2).sum(axis=1)
        order = np.argsort(d, kind="stable")[:m]
        NN[i, 1 : 1 + len(order)] = order
    return NN


def test_ordered_nn_matches_brute_force(rng):
    for n in (5, 37, 700, 2600):
        locs = rng.normal(size=(n, 2))
        m = 6
        NN = find_ordered_nn(locs, m)
        ref = brute_force_ordered_nn(locs, m)
        # compare as sets per row (ties may order differently)
        for i in range(n):
            assert set(NN[i][NN[i] >= 0]) == set(ref[i][ref[i] >= 0]), i


def test_ordered_nn_neighbors_precede(rng):
    locs = rng.normal(size=(500, 3))
    NN = find_ordered_nn(locs, 8)
    for i in range(500):
        nb = NN[i, 1:]
        nb = nb[nb >= 0]
        assert np.all(nb < i)
        assert len(set(nb.tolist())) == len(nb)


def test_maxmin_is_permutation_and_spreads(rng):
    locs = rng.uniform(size=(300, 2))
    perm = order_maxmin(locs)
    assert sorted(perm.tolist()) == list(range(300))
    # the first k maxmin points should be more spread than k random points
    def min_pairwise(x):
        d = ((x[:, None] - x[None]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        return d.min()
    sel = locs[perm[:20]]
    rnd = locs[rng.permutation(300)[:20]]
    assert min_pairwise(sel) > min_pairwise(rnd)


def test_other_orderings(rng):
    locs = rng.normal(size=(50, 2))
    assert np.array_equal(
        order_coordinate(locs, 1), np.argsort(locs[:, 0], kind="stable")
    )
    p = order_dist_to_point(locs, np.zeros(2))
    d = (locs**2).sum(1)
    assert np.all(np.diff(d[p]) >= 0)
    p = order_middleout(locs)
    dc = ((locs - locs.mean(0)) ** 2).sum(1)
    assert np.all(np.diff(dc[p]) >= 0)
    p = reorder_locations(locs, "random", rng=np.random.default_rng(0))
    assert sorted(p.tolist()) == list(range(50))


def test_coloring_is_proper(rng):
    locs = rng.normal(size=(400, 2))
    NN = find_ordered_nn(locs, 5)
    colors = greedy_coloring(NN)
    A = moralized_adjacency(NN).tocoo()
    assert np.all(colors >= 0)
    # no adjacent pair shares a color (the chromatic correctness invariant)
    assert np.all(colors[A.row] != colors[A.col])


def test_moralized_edges_match_LtL_structure(rng):
    from scipy import sparse

    locs = rng.normal(size=(60, 2))
    NN = find_ordered_nn(locs, 4)
    n = 60
    rows, cols = [], []
    for i in range(n):
        for j in NN[i][NN[i] >= 0]:
            rows.append(i)
            cols.append(j)
    L = sparse.csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    Q = (L.T @ L).tocoo()
    expected = {(min(r, c), max(r, c)) for r, c in zip(Q.row, Q.col) if r != c}
    edges, pair_ids, pa, pb = moralized_edges(NN)
    got = {(int(r), int(c)) for r, c in edges}
    assert got == expected
    # pair_edge_id maps real pairs to edges and pads to sentinel E
    E = len(edges)
    NNl = NN.astype(np.int64)
    for i in range(n):
        for k, (a, b) in enumerate(zip(pa, pb)):
            r, c = NNl[i, a], NNl[i, b]
            if r < 0 or c < 0:
                assert pair_ids[i, k] == E
            else:
                e = pair_ids[i, k]
                assert {int(edges[e, 0]), int(edges[e, 1])} == {int(r), int(c)}


def test_site_neighbor_lists(rng):
    locs = rng.normal(size=(80, 2))
    NN = find_ordered_nn(locs, 4)
    edges, _, _, _ = moralized_edges(NN)
    nbr_sites, nbr_edge, nbr_mask = site_neighbor_lists(80, edges)
    A = moralized_adjacency(NN)
    for i in range(80):
        expected = set(A.indices[A.indptr[i] : A.indptr[i + 1]].tolist())
        got = set(nbr_sites[i][nbr_mask[i]].tolist())
        assert got == expected


def test_dag_levels(rng):
    locs = rng.normal(size=(300, 2))
    NN = find_ordered_nn(locs, 5)
    lev = dag_levels(NN)
    for i in range(300):
        parents = NN[i, 1:]
        parents = parents[parents >= 0]
        if len(parents) == 0:
            assert lev[i] == 0
        else:
            assert lev[i] == lev[parents].max() + 1


def test_padded_groups(rng):
    labels = rng.integers(0, 7, size=100).astype(np.int64)
    groups, counts = padded_groups(labels, n_sentinel=100)
    assert groups.shape[0] == 7
    for g in range(7):
        got = sorted(groups[g][groups[g] < 100].tolist())
        assert got == sorted(np.where(labels == g)[0].tolist())
        assert counts[g] == len(got)


def test_dedupe_and_match(rng):
    base = rng.normal(size=(40, 2))
    idx = rng.integers(0, 40, size=120)
    obs_locs = base[idx]
    maps = dedupe_and_match(obs_locs, perm_fn=lambda L: order_maxmin(L))
    n = maps.locs.shape[0]
    assert n == len(np.unique(idx))
    # every observation maps back to its own location
    assert np.allclose(maps.locs[maps.locs_match], obs_locs)
    # obs_per_loc counts
    assert maps.obs_per_loc.sum() == 120
    for i in range(n):
        js = np.where(maps.locs_match == i)[0]
        assert maps.obs_per_loc[i] == len(js)
        assert maps.hctam_scol_1[i] == js.min()

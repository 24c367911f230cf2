"""Triangulation integrity checker — the reference's sanitizer as a test oracle.

The reference wires structural asserts and a global Delaunay check into the
hot path (``linear_simplex_integrity_check.c``; called after every insert at
linear_simplex.c:489).  Here the same invariants are vectorized numpy
passes, run from tests (and on demand), not inside the build loop:

* :func:`check_structure` — per-leaf invariants from
  integrity_check.c:62-119: no repeated vertex, not self-neighbor, no
  repeated neighbor, reverse links exist, and the vertex opposite a shared
  face appears in neither simplex.
* :func:`check_delaunay` — the global empty-circumsphere property
  (integrity_check.c:134-168) as ONE broadcast distance computation of all
  points against all leaf circumspheres, with the reference's
  ``r2*(1-sqrt(eps))`` tolerance, instead of the O(n*s) nested loop.
* :func:`output_triangulation` — gnuplot-ready edge/point/circle dumps
  (integrity_check.c:246-284), optionally standardized.
"""

from __future__ import annotations

import numpy as np

from . import machine


def check_structure(tree) -> None:
    """Assert per-leaf structural invariants over all current leaves."""
    d = tree.dim
    leaves = tree.leaves()
    leaf_set = set(leaves)
    for node in leaves:
        pts = tree.tri_points[node]
        links = tree.tri_links[node]
        assert len(set(pts.tolist())) == d + 1, f"repeated vertex in {node}"
        nz = [l for l in links if l != 0]
        assert node not in nz, f"{node} is its own neighbor"
        assert len(nz) == len(set(nz)), f"repeated neighbor in {node}"
        for i in range(d + 1):
            nbr = int(links[i])
            if nbr == 0:
                continue
            assert nbr in leaf_set, f"neighbor {nbr} of {node} is not a leaf"
            # The vertex opposite the shared face is in neither simplex.
            assert pts[i] not in tree.tri_points[nbr], (
                f"face vertex {pts[i]} of {node} also in neighbor {nbr}"
            )
            back = np.where(tree.tri_links[nbr] == node)[0]
            assert back.size == 1, f"no unique reverse link {nbr}->{node}"
            assert tree.tri_points[nbr, back[0]] not in pts, (
                f"far vertex of {nbr} also in {node}"
            )


def check_delaunay(tree, dtype=np.float64) -> None:
    """Assert the global empty-circumsphere property, vectorized.

    Every inserted data point must lie outside (or on, within the
    ``1-sqrt(eps)`` slack of integrity_check.c:155-156) every leaf's
    circumsphere.
    """
    leaves = tree.leaves()
    if tree.n_points == 0:
        return
    d = tree.dim
    # Standardized coords of all point ids used by leaves.
    centers = []
    r2s = []
    for node in leaves:
        c, r2 = tree._circumsphere_pts(tree.tri_points[node])
        if c is None:
            continue  # degenerate simplex: skip, as its sphere is undefined
        centers.append(c)
        r2s.append(r2)
    if not centers:
        return
    centers = np.asarray(centers)  # [L, d]
    r2s = np.asarray(r2s)  # [L]
    pts = np.stack([tree.point_std(i) for i in range(tree.n_points)])  # [N, d]
    d2 = np.sum((pts[:, None, :] - centers[None, :, :]) ** 2, axis=-1)  # [N, L]
    ok = d2 > r2s[None, :] * (1 - machine.sqrt_eps(dtype))
    if not np.all(ok):
        bad = np.argwhere(~ok)
        i, l = bad[0]
        raise AssertionError(
            f"Delaunay violated: point {i} inside circumsphere of leaf "
            f"{leaves[int(l)]} (d2={d2[i, l]:.3e} < r2={r2s[l]:.3e}); "
            f"{bad.shape[0]} violations total"
        )


def check_arrays(pts_std, tri_v, tri_n, n_data: int, dtype=np.float64):
    """Integrity checks on compacted device arrays.

    Same invariants as :func:`check_structure` + :func:`check_delaunay`,
    vectorized over [T, d+1] vertex/neighbor arrays (-1 = boundary) and
    points [P, d] (rows 0..d cage, then ``n_data`` data rows).
    """
    from ..ops import geometry
    import jax.numpy as jnp

    tri_v = np.asarray(tri_v)
    tri_n = np.asarray(tri_n)
    pts = np.asarray(pts_std)
    T, k = tri_v.shape
    d = k - 1
    # No repeated vertex.
    for i in range(k):
        for j in range(i + 1, k):
            assert (tri_v[:, i] != tri_v[:, j]).all(), "repeated vertex"
    # Neighbor reciprocity + face-sharing.
    for m in range(k):
        n = tri_n[:, m]
        has = n >= 0
        ns = np.where(has, n, 0)
        assert (n[has] != np.arange(T)[has]).all(), "self neighbor"
        back = (tri_n[ns] == np.arange(T)[:, None]).sum(axis=1)
        assert (back[has] == 1).all(), "reverse link missing/duplicated"
        # Shared face: my verts minus slot m all appear in the neighbor.
        mine = np.delete(tri_v, m, axis=1)  # [T, d]
        shared = (
            (mine[:, :, None] == tri_v[ns][:, None, :]).any(-1).all(-1)
        )
        assert shared[has].all(), "face vertices not shared with neighbor"
        # My slot-m vertex is NOT in the neighbor.
        in_nbr = (tri_v[:, m][:, None] == tri_v[ns]).any(-1)
        assert (~in_nbr[has]).all(), "opposite vertex leaked into neighbor"
    # Global empty-circumsphere (reference tolerance, integrity_check.c:155).
    center, r2, ok = geometry.circumsphere(jnp.asarray(pts[tri_v]))
    center = np.asarray(center)
    r2 = np.asarray(r2)
    ok = np.asarray(ok)
    data = pts[d + 1 : d + 1 + n_data]
    d2 = np.sum(
        (data[:, None, :] - center[None, ok.nonzero()[0], :]) ** 2, axis=-1
    )
    good = d2 > r2[ok][None, :] * (1 - machine.sqrt_eps(dtype))
    if not good.all():
        bad = np.argwhere(~good)
        raise AssertionError(
            f"Delaunay violated on device arrays: {bad.shape[0]} pairs; "
            f"first point {bad[0,0]} vs alive tri #{bad[0,1]}"
        )


def output_triangulation(
    tree,
    response=None,
    standardize: bool = False,
    lines_path=None,
    points_path=None,
    circles_path=None,
) -> None:
    """Dump gnuplot-ready triangulation files (integrity_check.c:246-284).

    Edges between data vertices (seed/cage vertices skipped), one blank-line
    separated segment pair per edge with the response as third column;
    points in standardized coords; per-leaf circumcircles as x y r rows.
    """
    leaves = tree.leaves()

    def coord(pid):
        if standardize:
            return tree.point_std(pid)
        return tree.point_coords(pid)

    if lines_path:
        with open(lines_path, "w") as f:
            for node in leaves:
                pts = tree.tri_points[node]
                for i in range(tree.dim + 1):
                    for j in range(i + 1, tree.dim + 1):
                        i1, i2 = int(pts[i]), int(pts[j])
                        if i1 < 0 or i2 < 0:
                            continue
                        for pid in (i1, i2):
                            r = (
                                float(response[tree.shuffle[pid]])
                                if response is not None
                                else 0.0
                            )
                            xy = " ".join(f"{v:g}" for v in coord(pid))
                            f.write(f"{xy} {r:g}\n")
                        f.write("\n\n")
    if points_path:
        with open(points_path, "w") as f:
            for i in range(tree.n_points):
                xy = " ".join(f"{v:g}" for v in tree.point_std(i))
                f.write(f"{xy}\n")
    if circles_path:
        with open(circles_path, "w") as f:
            for node in leaves:
                c, r2 = tree._circumsphere_pts(tree.tri_points[node])
                if c is None:
                    continue
                f.write(f"{c[0]:g} {c[1]:g} {np.sqrt(r2):g}\n")

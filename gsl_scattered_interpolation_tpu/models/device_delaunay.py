"""TPU-native 2D Delaunay build: batched insertion rounds + parallel flips.

The reference builds its triangulation one point at a time — locate, split
1->3, then a recursive flip cascade (linear_simplex.c:283-293, 404-492;
edge_flip.c:211-320) — an inherently serial CPU algorithm.  This module is
the TPU-first redesign: the whole build is ONE jit-compiled program over
fixed-capacity SoA arrays, processing sites in **parallel rounds** in the
spirit of GPU Delaunay builders (cf. gDel2D), but expressed as XLA
scatters/gathers instead of CUDA kernels:

  round:
    1. every empty leaf claims the lowest-id uninserted site it contains
       (segment-min scatter) — up to #leaves simultaneous insertions;
    2. all claimed leaves split 1->3 in one shot (parent slot becomes one
       child, two fresh slots); neighbor back-pointers are repaired by a
       GATHER pass (each triangle re-resolves stale neighbor ids against
       the split table) — no write conflicts by construction;
    3. uninserted sites whose leaf split re-locate among its 3 children
       (max-min-weight, the reference's best-worst fallback semantics,
       linear_simplex.c:363-400);
    4. parallel flip sub-rounds until the empty-circumcircle property
       holds: every violating shared edge becomes a candidate; a
       mutual-minimum matching picks a conflict-free independent set
       (a 2-cycle of the "pick smallest partner" map always exists, so
       progress is guaranteed); matched pairs rewrite themselves in place,
       stale neighbor ids are gather-repaired, and straddling sites
       re-locate between the two rewritten triangles.

Numerics follow the reference: the in-circumcircle test runs in
standardized coordinates with the ``r^2 (1 - 10 eps)`` tie-break
(linear_simplex.c:535-536, dtype-parameterized), degenerate circumcircles
count as violated (:517-521), and a flip additionally requires the quad to
be strictly convex — the 2D specialization of the reference's Gram-Schmidt
``flippable`` test (edge_flip.c:39-95).  In 2D this flip repertoire is
complete, so the result is a true Delaunay triangulation (unlike in 3D,
see host_tree docstring; higher dimensions use the host cavity engine).

Point ids: 0..2 are the cage vertices, 3..N+2 the sites in the caller's
(pre-shuffled) order — matching the device_tri layout.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geometry, robust
from ..utils import machine
from ..utils.aot import aot_compile as _aot_compile

INT_MAX = np.iinfo(np.int32).max


class SeedLocateError(RuntimeError):
    """Raised when the Qhull-seed bootstrap's exact-predicate walk failed
    to locate some sites (walk budget exhausted).  Distinct from
    RuntimeError so the seeded->self-seeded fallback in :func:`triangulate`
    cannot swallow genuine device/compile failures (jaxlib's
    XlaRuntimeError subclasses RuntimeError)."""


def bucket_size(n: int, floor: int = 256) -> int:
    """Smallest {1, 1.5} x 2^k >= n: the shape-bucket ladder (<=33% pad
    waste) that keeps the number of distinct compiled build programs —
    and persistent-cache entries — logarithmic in problem size."""
    n = max(n, floor)
    p = 1 << (n - 1).bit_length()
    if 3 * p // 4 >= n:  # 1.5 * 2^(k-1)
        return 3 * p // 4
    return p


class BuildState(NamedTuple):
    tri_v: jax.Array     # [M, 3] int32 vertex ids (-1 rows = unallocated)
    tri_n: jax.Array     # [M, 3] int32 neighbor ids, -1 = boundary
    cc: jax.Array        # [M, 2] triangle meta cache: (ok, vsum)
    n_tris: jax.Array    # scalar int32: allocated slots
    site_tri: jax.Array  # [N] int32: containing leaf per site; -1 = inserted
    n_left: jax.Array    # scalar int32: uninserted site count


def _incircle_det(a, b, c, d):
    """2D incircle determinant: >0 iff d strictly inside the circumcircle of
    (a,b,c) when (a,b,c) is counter-clockwise (multiply by sign(orient))."""
    adx = a[..., 0] - d[..., 0]
    ady = a[..., 1] - d[..., 1]
    bdx = b[..., 0] - d[..., 0]
    bdy = b[..., 1] - d[..., 1]
    cdx = c[..., 0] - d[..., 0]
    cdy = c[..., 1] - d[..., 1]
    ad2 = adx * adx + ady * ady
    bd2 = bdx * bdx + bdy * bdy
    cd2 = cdx * cdx + cdy * cdy
    return (
        adx * (bdy * cd2 - cdy * bd2)
        - ady * (bdx * cd2 - cdx * bd2)
        + ad2 * (bdx * cdy - cdx * bdy)
    )


def _assign_split_child(pts, tri_v, cAB_map, t_of, q):
    """Post-split child selection by sector tests around the new vertex.

    A 1->3 split partitions the parent into the three sectors between the
    rays s->v0, s->v1, s->v2 from the inserted vertex s; membership needs
    only the signs of ``orient(s, v_i, q)`` — 4 compensated predicates per
    site instead of the 12 of a generic min-barycentric-weight candidate
    scan (the relocation passes are the dominant per-round cost at 1M
    sites).  Child layout (see _split_round): parent slot P=(s,v1,v2),
    cA=(s,v2,v0), cB=(s,v0,v1).  Decisions stay on the compensated
    predicates: plain f32 signs carry kappa-amplified noise that
    misassigns boundary sites at fine spacings (~1e-3 at 1M sites),
    seeding inverted splits — assignment must be as reliable as the flip
    tests.  Ties (q on a ray) resolve deterministically (A, then B,
    else P).
    """
    # Kernel-count discipline (the ~2-3ms/kernel tax dwarfs predicate
    # flops): THREE batched row gathers — the (cA, cB) pair from the
    # [M, 2] map, triangle rows for (P, cA) together, then all four
    # point rows together.
    ab = geometry.take_rows(cAB_map, t_of)  # [B, 2]
    A, B = ab[:, 0], ab[:, 1]
    tv2 = geometry.take_rows(
        tri_v, jnp.stack([t_of, jnp.maximum(A, 0)], -1)
    )  # [B, 2, 3]: P=(s,v1,v2), cA=(s,v2,v0)
    pid4 = jnp.stack(
        [tv2[:, 0, 0], tv2[:, 1, 2], tv2[:, 0, 1], tv2[:, 0, 2]], -1
    )  # (s, v0, v1, v2)
    p4 = geometry.take_rows(pts, pid4)  # [B, 4, 2]
    s_pt, v0_pt, v1_pt, v2_pt = (
        p4[:, 0], p4[:, 1], p4[:, 2], p4[:, 3]
    )
    a0 = robust.orient2d_ds(s_pt, v0_pt, q)
    a1 = robust.orient2d_ds(s_pt, v1_pt, q)
    a2 = robust.orient2d_ds(s_pt, v2_pt, q)
    # Child-P orientation carries the parent's orientation sign (s is
    # interior); a CW parent flips every sector test.
    D = robust.orient2d_ds(s_pt, v1_pt, v2_pt)
    o = jnp.where(D < 0, -1.0, 1.0).astype(a0.dtype)
    b0, b1, b2 = a0 * o, a1 * o, a2 * o
    in_A = (b2 >= 0) & (b0 < 0)
    in_B = (b0 >= 0) & (b1 < 0)
    return jnp.where(in_A, A, jnp.where(in_B, B, t_of))


def _assign_flip_side(pts, tri_v, flip_info, t_of, q):
    """Post-flip side selection: one side-of-new-diagonal test.

    Both rewritten rows of an executed flip hold the new diagonal in
    slots (0, 1) — see _match_and_flip — so membership is the sign of
    ``orient(e, c, q)`` against each apex's side: 3 compensated
    predicates per site instead of the generic 8.  Three batched
    gathers: the (partner, apexes) info row, t's vertex row (for the
    diagonal ids), and the four point rows together.
    """
    info = geometry.take_rows(flip_info, t_of)  # [B, 3]
    us = jnp.maximum(info[:, 0], 0)
    tvt = geometry.take_rows(tri_v, t_of)  # (e, c, apex_t)
    pid4 = jnp.stack(
        [tvt[:, 0], tvt[:, 1], info[:, 1], jnp.maximum(info[:, 2], 0)],
        -1,
    )
    p4 = geometry.take_rows(pts, jnp.maximum(pid4, 0))  # [B, 4, 2]
    e_pt, c_pt, at_pt, au_pt = p4[:, 0], p4[:, 1], p4[:, 2], p4[:, 3]
    dq = robust.orient2d_ds(e_pt, c_pt, q)
    dt = robust.orient2d_ds(e_pt, c_pt, at_pt)
    du = robust.orient2d_ds(e_pt, c_pt, au_pt)
    # On-diagonal ties (dq == 0) and degenerate apexes keep t.
    take_u = (dq * du > 0) & ~(dq * dt > 0)
    return jnp.where(take_u, us, t_of)


def _cc_update(cc, pts, tri_v, rows, rows_valid, M):
    """Refresh the per-triangle metadata cache for the given rows.

    The cache row is [ok, vsum]: ``ok`` marks a non-degenerate triangle
    (compensated orientation != 0 — exactly the condition under which the
    reference's circumcircle solve is singular, linear_simplex.c:517-521),
    and ``vsum`` is the VERTEX-ID SUM (exact in f32 for ids < 2^24): the
    flip candidate pass needs each neighbor's far vertex, and
    ``far = vsum(u) - shared_a - shared_b`` turns two [R,3,3] gathers +
    a slot search into a column of a gather it already performs.  Only
    rows touched by a split/flip are refreshed — O(#changed), not O(M).
    """
    safe = jnp.where(rows_valid, rows, 0)
    tv_rows = tri_v[safe]
    verts = geometry.take_rows(pts, tv_rows)  # [K, 3, 2]
    D = robust.orient2d_ds(verts[:, 0], verts[:, 1], verts[:, 2])
    ok = (D != 0).astype(cc.dtype)
    vsum = jnp.sum(tv_rows, axis=-1).astype(cc.dtype)
    packed = jnp.stack([ok, vsum], axis=-1)
    tgt = jnp.where(rows_valid, rows, M + 1)
    return cc.at[tgt].set(packed, mode="drop")


def _init_state(
    pts, N: int, n_real: int | None = None, cap: int | None = None
) -> BuildState:
    """Initial build state.  ``n_real < N`` marks rows [n_real, N) as
    padding (pre-inserted, never claimed) — shape bucketing pads N up to a
    bucket size so one compiled program (and one persistent-cache entry)
    serves a whole range of problem sizes.  ``cap`` sets the triangle-array
    capacity (default 2N+3, the exact upper bound); the staged build starts
    small and grows."""
    M = 2 * N + 3 if cap is None else cap
    if n_real is None:
        n_real = N
    n_real = jnp.asarray(n_real, jnp.int32)  # traced: keeps the program
    # independent of the real site count within a shape bucket
    dtype = pts.dtype
    tri_v = jnp.full((M, 3), -1, jnp.int32).at[0].set(
        jnp.arange(3, dtype=jnp.int32)
    )
    tri_n = jnp.full((M, 3), -1, jnp.int32)
    cc0 = jnp.zeros((M, 2), dtype)
    cc0 = _cc_update(
        cc0, pts, tri_v, jnp.zeros(1, jnp.int32), jnp.ones(1, bool), M
    )
    return BuildState(
        tri_v=tri_v,
        tri_n=tri_n,
        cc=cc0,
        n_tris=jnp.int32(1),
        site_tri=jnp.where(
            jnp.arange(N) < n_real, jnp.int32(0), jnp.int32(-1)
        ),
        n_left=n_real,
    )


def _split_round(pts, st: BuildState) -> BuildState:
    """One parallel insertion round (module-level; jit separately for the
    host-orchestrated path)."""
    M = st.tri_v.shape[0]
    N = st.site_tri.shape[0]
    site_ids = jnp.arange(N, dtype=jnp.int32)
    tri_v, tri_n, cc, n_tris, site_tri, n_left = st
    # 1. Each leaf claims its lowest-id uninserted site.
    tgt = jnp.where(site_tri >= 0, site_tri, M)  # dead sites -> dummy
    claim = jnp.full(M + 1, INT_MAX, jnp.int32).at[tgt].min(site_ids)[:M]
    has = claim != INT_MAX  # [M] triangles splitting this round
    # 2. Allocate child slots by prefix rank — capped by array capacity:
    # claims whose two fresh slots would overflow [M] are simply deferred
    # (the capped set is a prefix of the ranks, so surviving slot ids stay
    # contiguous).  The staged orchestrator (build_2d_chunked) grows
    # capacity between dispatches; with M = 2N+3 the cap never binds.
    rank = jnp.cumsum(has.astype(jnp.int32)) - 1  # [M]
    has = has & (n_tris + 2 * (rank + 1) <= M)
    cA = jnp.where(has, n_tris + 2 * rank, -1).astype(jnp.int32)
    cB = jnp.where(has, n_tris + 2 * rank + 1, -1).astype(jnp.int32)
    n_new = jnp.sum(has.astype(jnp.int32))

    # All-rows masked form (no jnp.nonzero: its sort-based lowering
    # kills the axon compile helper at M ~ 2e6).
    p = jnp.arange(M, dtype=jnp.int32)
    pmask = has
    s_pid = (claim[p] + 3).astype(jnp.int32)  # point id of claimed site
    v0, v1, v2 = tri_v[p, 0], tri_v[p, 1], tri_v[p, 2]
    n0, n1, n2 = tri_n[p, 0], tri_n[p, 1], tri_n[p, 2]
    ca, cb = cA[p], cB[p]

    def scat(arr, rows, vals):
        rows = jnp.where(pmask, rows, M + 1)  # drop pads
        return arr.at[rows].set(vals, mode="drop")

    # Child in parent slot keeps face 0 (old n0); cA gets n1; cB gets n2.
    tri_v = scat(tri_v, p, jnp.stack([s_pid, v1, v2], -1))
    tri_n = scat(tri_n, p, jnp.stack([n0, ca, cb], -1))
    tri_v = scat(tri_v, ca, jnp.stack([s_pid, v2, v0], -1))
    tri_n = scat(tri_n, ca, jnp.stack([n1, cb, p.astype(jnp.int32)], -1))
    tri_v = scat(tri_v, cb, jnp.stack([s_pid, v0, v1], -1))
    tri_n = scat(tri_n, cb, jnp.stack([n2, p.astype(jnp.int32), ca], -1))
    n_tris = (n_tris + 2 * n_new).astype(jnp.int32)

    # 3. Gather-repair stale neighbor pointers: if my neighbor split,
    # its face owner is now whichever of (parent, cA, cB) holds both of
    # my shared-face vertices.
    tri_n = _repair_after_split(tri_v, tri_n, has, cA, cB, n_tris)

    # Refresh circumcircle cache for the 3 children of every split.
    rows3 = jnp.concatenate([p, ca, cb])
    cc = _cc_update(
        cc, pts, tri_v, rows3, jnp.concatenate([pmask] * 3), M
    )

    # 4. Re-locate uninserted sites whose leaf split; retire claimed.
    t_of = jnp.where(site_tri >= 0, site_tri, 0)
    needs = (site_tri >= 0) & has[t_of]
    q = pts[site_ids + 3]
    new_tri = _assign_split_child(
        pts, tri_v, jnp.stack([cA, cB], -1), jnp.where(needs, t_of, 0), q
    )
    site_tri = jnp.where(needs, new_tri, site_tri)
    claimed = (site_tri >= 0) & (claim[t_of] == site_ids) & has[t_of]
    site_tri = jnp.where(claimed, -1, site_tri)
    n_left = (n_left - jnp.sum(claimed.astype(jnp.int32))).astype(jnp.int32)
    return BuildState(tri_v, tri_n, cc, n_tris, site_tri, n_left)


def _edge_candidates(pts, tri_v, tri_n, cc, rows, rvalid):
    """Canonical flip-candidate mask for the 3 edges of the listed rows.

    ``rows`` holds global triangle ids ([M] arange for the dense path, a
    compacted dirty subset for the sweep path); ``rvalid`` masks pads.
    Returns ``(tv, tn, cand_ok)`` — the gathered vertex/neighbor rows plus
    the per-edge candidacy.

    Flip decisions are CANONICAL per 4-point quad: the incircle
    determinant is evaluated with the quad's vertices in sorted-id
    order, so both orientations of the pair compute the *same* number
    and reach the *same* verdict.  A configuration-dependent test
    (reference tie-break at linear_simplex.c:535-536) lets fp noise
    declare BOTH diagonals violated on near-cocircular quads — the
    parallel loop then flips back and forth until its cap, a
    minutes-long TPU execution that trips the worker watchdog.
    Consistent verdicts make oscillation structurally impossible;
    exact ties (S == 0) keep the current diagonal, matching the
    reference's shrunken-sphere no-flip semantics.

    All 3 edges are evaluated in ONE [R, 3]-batched pass (not a python
    loop): the compensated predicates are large expressions, and
    instantiating them 3x tripled the XLA program — TPU compile time
    through the axon tunnel is ~50x execution for this build, so
    program size is a first-class cost here.
    """
    rs = jnp.where(rvalid, rows, 0)
    tv = geometry.take_rows(tri_v, rs)  # [R, 3]
    tn = geometry.take_rows(tri_n, rs)
    alive = rvalid & (tv[:, 0] >= 0)
    cok = geometry.take_rows(cc, rs)[:, 0] > 0.5

    u3 = tn  # [R, 3]
    valid3 = alive[:, None] & (u3 >= 0)
    uu3 = jnp.where(valid3, u3, 0)
    # Neighbor circumcircle rows carry (ok, vsum); the far vertex is
    # vsum(u) - shared_a - shared_b — no [R,3,3] neighbor-row gathers,
    # no back-pointer slot search (gathered bytes are the dominant cost
    # at 1e6 rows; multi-dim index gathers are routed flat via
    # geometry.take_rows — the dimension-numbers form compiles
    # minutes-slow at 1e6 shapes).
    ccu = geometry.take_rows(cc, uu3)  # [R, 3, 2]
    degen_u = ~(ccu[..., 0] > 0.5)
    p1_id = jnp.roll(tv, -1, axis=1)
    p2_id = jnp.roll(tv, -2, axis=1)
    far3 = ccu[..., 1].astype(jnp.int32) - p1_id - p2_id
    far3 = jnp.clip(far3, 0, pts.shape[0] - 1)  # garbage rows: masked
    # Apex + far coordinates in ONE point gather.
    p6 = geometry.take_rows(
        pts, jnp.concatenate([tv, far3], axis=1)
    )  # [R, 6, 2]
    apex3, fq3 = p6[:, :3], p6[:, 3:]
    # p1/p2 coordinates are rolls of the already-gathered apex rows —
    # global point gathers are the dominant kernel cost at 1e6 rows.
    cand_ok = _edge_candidates_math(
        apex3, fq3, tv, p1_id, far3, p2_id, valid3, cok, degen_u
    )
    return tv, tn, cand_ok


def _edge_candidates_math(
    apex3, fq3, tv, p1_id, far3, p2_id, valid3, cok, degen_u
):
    """Pure per-candidate flip verdicts on pre-gathered quad data.

    Elementwise over the [R, 3] candidate grid — no gathers, no
    reductions beyond the fixed-size quad argmax — so the whole pass is
    one fusable expression (and the seam for a fused Pallas version).
    """
    p1q = jnp.roll(apex3, -1, axis=1)
    p2q = jnp.roll(apex3, -2, axis=1)
    # convexity: segment (apex, far) must cross the shared edge.
    # Compensated predicates: plain f32 determinant signs are wrong on
    # cage-scale quads (ops/robust.py docstring).
    o1 = robust.orient2d_ds(apex3, fq3, p1q)
    o2 = robust.orient2d_ds(apex3, fq3, p2q)
    convex3 = jnp.sign(o1) * jnp.sign(o2) < 0
    # Canonical quad decision.  Cyclic order (apex, p1, far, p2):
    # current diagonal = positions (1,3); flip target = (0,2).
    # Sort the 4 (id, coord) triples by id with a 5-comparator sorting
    # network — pure fused selects, replacing an XLA sort + gather.
    ids = (tv, p1_id, far3, p2_id)
    xs = (apex3[..., 0], p1q[..., 0], fq3[..., 0], p2q[..., 0])
    ys = (apex3[..., 1], p1q[..., 1], fq3[..., 1], p2q[..., 1])
    ids, xs, ys = list(ids), list(xs), list(ys)
    for i, j in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
        sw = ids[i] > ids[j]
        for arr in (ids, xs, ys):
            lo = jnp.where(sw, arr[j], arr[i])
            hi = jnp.where(sw, arr[i], arr[j])
            arr[i], arr[j] = lo, hi
    sp = [
        jnp.stack([xs[k], ys[k]], axis=-1) for k in range(4)
    ]  # 4 x [R, 3, 2], ascending id order
    O = robust.orient2d_ds(sp[0], sp[1], sp[2])
    S = robust.incircle_ds(sp[0], sp[1], sp[2], sp[3]) * jnp.sign(O)
    # Cyclic position of the largest-id vertex in (apex, p1, far, p2).
    quad = jnp.stack([tv, p1_id, far3, p2_id], -1)  # [R, 3, 4] ids
    p3 = jnp.argmax(quad, axis=-1)
    p3_on_flip_diag = (p3 == 0) | (p3 == 2)
    want = jnp.where(S > 0, p3_on_flip_diag, ~p3_on_flip_diag)
    want = want & (S != 0)
    # Degenerate (zero-area) triangles must still be flipped away
    # (linear_simplex.c:517-521): the canonical test with three
    # collinear points is consistent but may elect to keep them.
    degen_t = ~cok[:, None]
    return valid3 & convex3 & (want | degen_t | degen_u)


def _match_and_flip(
    pts, tri_v, tri_n, cc, rows, rvalid, tv, tn, cand_ok, want_frec=False,
    rf_div: int = 4,
):
    """Mutual-minimum matching + in-place execution of the matched flips.

    Neighbor repair is INTEGRATED (no post-pass needed): the pair rows'
    outward pointers (Np, Up, Nq, Uq) are resolved through the round's
    flip_info map *before* the single tri_n pair write, and the only two
    outer rows whose pointer into the pair goes stale — Up (held ``us``,
    face {e,qv} now owned by row ``ts``) and Nq (held ``ts``, face
    {c,pv} now owned by ``us``) — get a slot-targeted single-element fix.
    Np ({c,qv} stays with row ts) and Uq ({e,pv} stays with us) keep
    valid pointers by construction, which is why the old 6Rf-row
    re-derivation pass (_repair_rows) was 4x more work than required
    (~115 ms of a 353 ms sweep round at R=524k, measured r4).

    Returns ``(tri_v, tri_n, cc, flip_info [M, 3], pair_rows [2*Rf],
    pair_valid [2*Rf], any_flip, n_exec)`` — the rewritten arrays, the
    EXECUTED-pair (partner, own_apex, partner_apex) map, the rewritten
    pair rows (+ validity mask, for dirty marking), and the progress
    flag.  With ``want_frec`` an [M, 6] float relocation record
    (new-diagonal coordinates, own-apex side sign, partner id) is
    appended for :func:`_assign_flip_side_rec`.
    """
    M = tri_v.shape[0]
    rs = jnp.where(rvalid, rows, 0)
    partner_cand = jnp.where(cand_ok, tn, INT_MAX)
    pick = jnp.min(partner_cand, axis=-1)  # [R] best partner or INT_MAX
    pick_ok = pick != INT_MAX
    pick_safe = jnp.where(pick_ok, pick, 0)
    # Mutuality needs the partner's own pick.  Both sides of a violating
    # edge are always in the processed set on the dense path; on the
    # sweep path the partner may sit beyond the batch — its slot reads
    # INT_MAX and the flip defers to a later round.
    pick_g = jnp.full(M, INT_MAX, jnp.int32).at[
        jnp.where(rvalid, rows, M + 1)
    ].set(pick, mode="drop")
    mutual = pick_ok & (pick_g[pick_safe] == rs) & (pick_safe != rs)
    # Partner OUTSIDE the processed window: candidacy is canonical (the
    # partner would compute the same verdict), and a processed partner
    # with any candidate always scatters a pick < INT_MAX — so
    # pick_g == INT_MAX identifies absent partners exactly.  Execute
    # those flips UNILATERALLY, arbitrated by a scatter-min claim so two
    # window rows never rewrite the same absent row.  (Before this, such
    # flips deferred until the partner rotated into the window — which
    # forced flips to mark all 4 outer neighbors dirty for mutuality,
    # 6 re-dirty marks per flip; unilateral execution needs only the
    # rewritten pair marked, collapsing sweep re-dirty volume ~3x.)
    absent = pick_ok & (pick_g[pick_safe] == INT_MAX) & (pick_safe != rs)
    claim_g = jnp.full(M, INT_MAX, jnp.int32).at[
        jnp.where(absent, pick_safe, M + 1)
    ].min(rs, mode="drop")
    won = absent & (claim_g[pick_safe] == rs)
    # Execute each mutual edge once, from the lower id.  Terminate on
    # "no executed flips" (not "no candidates"): an fp-asymmetric
    # candidate with no mutual partner must not spin the loop — the
    # reference likewise leaves un-flippable violations in place
    # (edge_flip.c:244-254).
    do = (mutual & (rs < pick_safe)) | won
    # Cap executed flips at R//rf_div (deferring the overflow pairs —
    # they stay candidates and re-match next round), then COMPACT the
    # executed set: everything below — slot search, rewrites, repair
    # rows, the circumcircle refresh, the partner map — runs on [Rf]
    # rows instead of [R].  Per-round cost is ~LINEAR in R and Rf at
    # these sizes (measured: R 524k->1M with Rf R//4->R//2 took the
    # sweep round 0.24 s -> 0.82 s), so rf_div trades rounds against
    # per-round work: the dirt-saturated final sweep runs rf_div=2, the
    # insert-phase sweeps (small fresh dirt per round) keep rf_div=4.
    R = do.shape[0]
    Rf = max(R // rf_div, 64)
    frank = jnp.cumsum(do.astype(jnp.int32)) - 1
    do = do & (frank < Rf)
    any_flip = jnp.any(do)

    fidx = jnp.full(Rf + 1, -1, jnp.int32).at[
        jnp.where(do, frank, Rf)
    ].set(jnp.arange(R, dtype=jnp.int32), mode="drop")[:Rf]
    fvalid = fidx >= 0
    fs = jnp.where(fvalid, fidx, 0)
    ts = jnp.where(fvalid, rs[fs], 0)          # [Rf] lower-id triangle
    us = jnp.where(fvalid, pick_safe[fs], 0)   # [Rf] its partner
    tvf = geometry.take_rows(tv, fs)
    tnf = geometry.take_rows(tn, fs)

    # Slots: k in t facing u; j in u facing t.  One gather each of u's
    # vertex/neighbor rows, reused below.
    uvv = tri_v[us]  # [Rf, 3]
    unn = tri_n[us]
    k_slot = jnp.argmax(tnf == us[:, None], axis=-1)
    j_slot = jnp.argmax(unn == ts[:, None], axis=-1)
    c = jnp.take_along_axis(tvf, k_slot[:, None], -1)[:, 0]
    e = jnp.take_along_axis(uvv, j_slot[:, None], -1)[:, 0]
    # t's other verts/nbrs: p at k+1, q at k+2 (slot order).
    pv = jnp.take_along_axis(tvf, ((k_slot + 1) % 3)[:, None], -1)[:, 0]
    qv = jnp.take_along_axis(tvf, ((k_slot + 2) % 3)[:, None], -1)[:, 0]
    Np = jnp.take_along_axis(tnf, ((k_slot + 1) % 3)[:, None], -1)[:, 0]
    Nq = jnp.take_along_axis(tnf, ((k_slot + 2) % 3)[:, None], -1)[:, 0]
    # u's neighbors across faces {e,q} and {e,p}: match by vertex value.
    p_in_u = jnp.argmax(uvv == pv[:, None], axis=-1)
    q_in_u = jnp.argmax(uvv == qv[:, None], axis=-1)
    Up = jnp.take_along_axis(unn, p_in_u[:, None], -1)[:, 0]
    Uq = jnp.take_along_axis(unn, q_in_u[:, None], -1)[:, 0]

    # T1=(e,c,q): slot0 opp e -> face {c,q} = old t's face opp p -> Np;
    # slot1 opp c -> face {e,q} = old u's face opp p -> Up; slot2 -> u.
    # T2=(e,c,p): slot0 -> Nq (t's face opp q); slot1 -> Uq; slot2 -> t.
    # One scatter per array: t and u rows are distinct.
    rows_tu = jnp.where(
        jnp.concatenate([fvalid, fvalid]),
        jnp.concatenate([ts, us]),
        M + 1,
    )
    new_tv = tri_v.at[rows_tu].set(
        jnp.concatenate(
            [jnp.stack([e, c, qv], -1), jnp.stack([e, c, pv], -1)]
        ),
        mode="drop",
    )
    # EXECUTED-only flip-info map over the global id space (see
    # docstring), built BEFORE the tri_n write: the pair's outward
    # pointers (gathered pre-round) may name rows that flipped in this
    # same round, and resolve through this map in one [4Rf] gather.
    flip_info = jnp.full((M, 3), -1, jnp.int32).at[rows_tu].set(
        jnp.concatenate(
            [
                jnp.stack([us, qv, pv], -1),
                jnp.stack([ts, pv, qv], -1),
            ]
        ),
        mode="drop",
    )
    # Outward resolution: pointer value v with face (a, b) belongs to v
    # itself when the face contains v's own apex, to v's partner when it
    # contains the partner apex (one hop suffices: the face is an OUTER
    # face of v's pair, so it contains exactly one of the two apexes).
    out_ids = jnp.concatenate([Np, Up, Nq, Uq])  # [4Rf]
    info4 = geometry.take_rows(
        flip_info, jnp.where(out_ids >= 0, out_ids, 0)
    )  # [4Rf, 3]
    fa4 = jnp.concatenate([c, e, c, e])
    fb4 = jnp.concatenate([qv, qv, pv, pv])
    partner4, ap_own4, ap_par4 = info4[:, 0], info4[:, 1], info4[:, 2]
    hit_par = (fa4 == ap_par4) | (fb4 == ap_par4)
    res4 = jnp.where(
        (out_ids >= 0) & (partner4 >= 0) & hit_par, partner4, out_ids
    )
    Rf_ = Np.shape[0]
    Np_r, Up_r = res4[:Rf_], res4[Rf_ : 2 * Rf_]
    Nq_r, Uq_r = res4[2 * Rf_ : 3 * Rf_], res4[3 * Rf_ :]
    new_tn = tri_n.at[rows_tu].set(
        jnp.concatenate(
            [jnp.stack([Np_r, Up_r, us], -1),
             jnp.stack([Nq_r, Uq_r, ts], -1)]
        ),
        mode="drop",
    )
    # Incoming fixes: un-flipped Up must now point at ts (held us);
    # un-flipped Nq at us (held ts).  A flipped Up/Nq already resolved
    # its pointer into the pair via its own outward resolution above.
    # Distinct (row, slot) targets across all executed flips (a row
    # shares at most one face with any pair, and rows_tu are unique), so
    # a flat single-element scatter applies every fix at once.
    x2 = jnp.concatenate([Up, Nq])
    old2 = jnp.concatenate([us, ts])
    new2 = jnp.concatenate([ts, us])
    x_flipped = (
        jnp.concatenate(
            [partner4[Rf_ : 2 * Rf_], partner4[2 * Rf_ : 3 * Rf_]]
        )
        >= 0
    )
    ok2 = jnp.concatenate([fvalid, fvalid]) & (x2 >= 0) & ~x_flipped
    xrows = geometry.take_rows(new_tn, jnp.where(ok2, x2, 0))  # [2Rf, 3]
    is_old = xrows == old2[:, None]
    slot2 = jnp.argmax(is_old, axis=-1).astype(jnp.int32)
    flat2 = jnp.where(
        ok2 & jnp.any(is_old, axis=-1), x2 * 3 + slot2, 3 * M + 1
    )
    new_tn = (
        new_tn.reshape(-1).at[flat2].set(new2, mode="drop").reshape(M, 3)
    )

    # Refresh circumcircle metadata for rewritten pairs from the
    # orientation predicates on the pair's four points — one [Rf, 4, 2]
    # coordinate gather instead of re-gathering the rewritten vertex rows
    # (T1 = (e, c, qv), T2 = (e, c, pv); same operand order as
    # _cc_update, so identical values).  The same predicates give the
    # apex side signs for the relocation record.
    pid4 = jnp.stack([e, c, qv, pv], -1)
    p4 = geometry.take_rows(pts, jnp.clip(pid4, 0, pts.shape[0] - 1))
    e_pt, c_pt, q_pt, p_pt = p4[:, 0], p4[:, 1], p4[:, 2], p4[:, 3]
    D1 = robust.orient2d_ds(e_pt, c_pt, q_pt)
    D2 = robust.orient2d_ds(e_pt, c_pt, p_pt)
    fcc = lambda x: x.astype(cc.dtype)
    cc = cc.at[rows_tu].set(
        jnp.concatenate(
            [
                jnp.stack([fcc(D1 != 0), fcc(e + c + qv)], -1),
                jnp.stack([fcc(D2 != 0), fcc(e + c + pv)], -1),
            ]
        ),
        mode="drop",
    )
    # The rewritten pair rows (for the caller's dirty re-marking).
    rep = jnp.concatenate([ts, us])
    repv = jnp.concatenate([fvalid, fvalid])
    n_exec = jnp.sum(fvalid, dtype=jnp.int32)  # x64: plain sum -> int64
    if not want_frec:
        return new_tv, new_tn, cc, flip_info, rep, repv, any_flip, n_exec
    dtype = pts.dtype
    sg1 = jnp.where(D1 < 0, -1.0, 1.0).astype(dtype)
    sg2 = jnp.where(D2 < 0, -1.0, 1.0).astype(dtype)
    diag = jnp.concatenate([e_pt, c_pt], -1)  # [Rf, 4]
    frec = jnp.full((M, 6), -1.0, dtype).at[rows_tu].set(
        jnp.concatenate(
            [
                jnp.concatenate(
                    [diag, sg1[:, None], us.astype(dtype)[:, None]], -1
                ),
                jnp.concatenate(
                    [diag, sg2[:, None], ts.astype(dtype)[:, None]], -1
                ),
            ]
        ),
        mode="drop",
    )
    return new_tv, new_tn, cc, flip_info, rep, repv, any_flip, n_exec, frec


def _assign_flip_side_rec(frec, t_of, q):
    """Record-based post-flip side selection (see _assign_flip_side).

    The executed pair's apexes sit strictly on opposite sides of the new
    diagonal (the flip required strict convexity), so "move to the
    partner" is exactly ``sign(orient(e, c, q)) == -sign(own apex side)``
    — ONE [B, 6] record gather + one compensated predicate per site;
    on-diagonal ties (orient == 0) keep the current triangle, as in
    :func:`_assign_flip_side`.
    """
    r = geometry.take_rows(frec, t_of)  # [B, 6]
    e_pt, c_pt = r[:, 0:2], r[:, 2:4]
    sg, partner = r[:, 4], r[:, 5].astype(jnp.int32)
    dq = robust.orient2d_ds(e_pt, c_pt, q)
    take_u = (dq * sg < 0) & (partner >= 0)
    return jnp.where(take_u, partner, t_of)


def _flip_round(pts, carry, relocate=True):
    M = carry[0].shape[0]
    N = carry[4].shape[0]
    tri_v, tri_n, cc, n_tris, site_tri, _changed = carry
    rows = jnp.arange(M, dtype=jnp.int32)
    rvalid = jnp.ones((M,), bool)
    tv, tn, cand_ok = _edge_candidates(pts, tri_v, tri_n, cc, rows, rvalid)
    new_tv, new_tn, cc, flip_info, _rep, _repv, any_flip, _n_exec = (
        _match_and_flip(pts, tri_v, tri_n, cc, rows, rvalid, tv, tn, cand_ok)
    )
    # Neighbor repair is integrated into _match_and_flip.

    if relocate:
        # Re-locate sites straddling an executed flip (insert phase only;
        # cleanup runs with n_left == 0, where this [N]-sized pass is
        # pure waste).
        site_ids = jnp.arange(N, dtype=jnp.int32)
        t_of = jnp.where(site_tri >= 0, site_tri, 0)
        in_flipped = (site_tri >= 0) & (
            geometry.take_rows(flip_info, t_of)[:, 0] >= 0
        )
        q = pts[site_ids + 3]
        new_t = _assign_flip_side(
            pts, new_tv, flip_info, jnp.where(in_flipped, t_of, 0), q
        )
        site_tri = jnp.where(in_flipped, new_t, site_tri)

    return (new_tv, new_tn, cc, n_tris, site_tri, any_flip)


def _flip_rounds(pts, st: BuildState, cap: int, relocate: bool = True):
    """Up to ``cap`` flip sub-rounds; returns (state, rounds_used)."""
    def cond(c):
        *_, changed, it = c
        return jnp.logical_and(changed, it < cap)

    def body(c):
        tri_v, tri_n, cc, n_tris, site_tri, _changed, it = c
        out = _flip_round(
            pts, (tri_v, tri_n, cc, n_tris, site_tri, True),
            relocate=relocate,
        )
        return (*out, it + 1)

    tri_v, tri_n, cc, n_tris, site_tri, _, it = jax.lax.while_loop(
        cond,
        body,
        (
            st.tri_v,
            st.tri_n,
            st.cc,
            st.n_tris,
            st.site_tri,
            True,
            jnp.int32(0),
        ),
    )
    return BuildState(tri_v, tri_n, cc, n_tris, site_tri, st.n_left), it


def build_2d(
    sites_std,
    cage_std,
    max_flip_rounds: int = 4096,
    flips_per_round: int = 2,
    max_rounds: int = 0,
    n_real: int | None = None,
):
    """Build the Delaunay triangulation of cage+sites on device.

    One jit-compiled program (single device execution).  For very large N
    prefer :func:`build_2d_chunked` — a multi-minute single execution can
    exceed the TPU runtime watchdog.

    Args:
      sites_std: [N, 2] standardized site coords, insertion-shuffled.
      cage_std: [3, 2] standardized cage vertices.

    Returns:
      (tri_v [M,3], tri_n [M,3], alive [M], n_tris) with M = 2N+3 slots;
      `alive` marks current leaves.  Ids: 0..2 cage, 3.. sites.
    """
    N = sites_std.shape[0]
    dtype = sites_std.dtype
    pts = jnp.concatenate([cage_std.astype(dtype), sites_std])  # [N+3, 2]
    state = _init_state(pts, N, n_real)

    def outer_cond(carry):
        st, rounds = carry
        more = st.n_left > 0
        if max_rounds:  # debug cap for fault isolation
            more = jnp.logical_and(more, rounds < max_rounds)
        return more

    def outer_body(carry):
        st, rounds = carry
        # A bounded number of flip sub-rounds per insertion round keeps the
        # per-round cost O(M); intermediate states may be locally
        # non-Delaunay, which is geometrically fine (still a valid
        # triangulation — location and splits don't require Delaunayness).
        st = _split_round(pts, st)
        st, _ = _flip_rounds(pts, st, flips_per_round)
        return st, rounds + 1

    final, _ = jax.lax.while_loop(outer_cond, outer_body, (state, jnp.int32(0)))
    # Final cleanup: flip to convergence, restoring the global
    # empty-circumcircle property (all sites inserted: skip relocation).
    final, _ = _flip_rounds(pts, final, max_flip_rounds, relocate=False)
    alive = final.tri_v[:, 0] >= 0
    return final.tri_v, final.tri_n, alive, final.n_tris


def _pack_walk_rows(pts, tri_v, tri_n):
    """[M, 9] per-triangle walk record: CCW-ordered vertex coordinates +
    slot-matched neighbor ids (as floats — exact for ids < 2^24).

    One row gather per walk step replaces the two-level tri_v -> pts
    gather plus the tri_n gather plus a per-step orientation predicate
    (the CCW reorder bakes the orientation sign in); per-step gathered
    bytes and kernel count both drop ~3x.  Swapping v1<->v2 swaps the
    faces opposite them, so slots 1 and 2 of tri_n swap along.
    """
    p3 = geometry.take_rows(pts, jnp.maximum(tri_v, 0))  # [M, 3, 2]
    o = robust.orient2d_ds(p3[:, 0], p3[:, 1], p3[:, 2])
    sw = (o < 0)[:, None]
    v1 = jnp.where(sw, p3[:, 2], p3[:, 1])
    v2 = jnp.where(sw, p3[:, 1], p3[:, 2])
    n1 = jnp.where(sw[:, 0], tri_n[:, 2], tri_n[:, 1])
    n2 = jnp.where(sw[:, 0], tri_n[:, 1], tri_n[:, 2])
    nbrs = jnp.stack([tri_n[:, 0], n1, n2], -1).astype(pts.dtype)
    return jnp.concatenate([p3[:, 0], v1, v2, nbrs], -1)


def _walk_step(packed, q, state):
    """One visibility-walk step (shared by both phases below)."""
    cur, prev, done, steps = state
    row = geometry.take_rows(packed, cur)  # [B, 9]
    v0, v1, v2 = row[:, 0:2], row[:, 2:4], row[:, 4:6]
    # Face i is opposite vertex i: (v1,v2), (v2,v0), (v0,v1) — one
    # batched predicate over the [B, 3] face grid (CCW: inside >= 0).
    A = jnp.stack([v1, v2, v0], 1)
    Bv = jnp.stack([v2, v0, v1], 1)
    s3 = robust.orient2d_ds(A, Bv, q[:, None, :])  # [B, 3]
    inside = jnp.all(s3 >= 0, axis=-1)
    worst = jnp.argmin(s3, axis=-1)
    s2 = jnp.where(jnp.arange(3) == worst[:, None], jnp.inf, s3)
    second = jnp.argmin(s2, axis=-1)
    two_neg = jnp.sum((s3 < 0).astype(jnp.int32), axis=-1) > 1
    worst = jnp.where(
        two_neg & ((steps & 1) == 1), second, worst
    ).astype(jnp.int32)
    nbr = jnp.take_along_axis(
        row[:, 6:9], worst[:, None], -1
    )[:, 0].astype(jnp.int32)
    cycling = (nbr == prev) & ~inside
    newly_done = inside | (nbr < 0) | cycling
    advance = ~(done | newly_done)
    new_cur = jnp.where(advance, nbr, cur)
    new_prev = jnp.where(advance, cur, prev)
    return new_cur, new_prev, done | newly_done, steps + 1


def _walk_contained(packed, cur, q):
    """Exact containment of q in triangle cur (packed CCW rows)."""
    row = geometry.take_rows(packed, cur)
    v0, v1, v2 = row[:, 0:2], row[:, 2:4], row[:, 4:6]
    A = jnp.stack([v1, v2, v0], 1)
    Bv = jnp.stack([v2, v0, v1], 1)
    return jnp.all(
        robust.orient2d_ds(A, Bv, q[:, None, :]) >= 0, axis=-1
    )


def _locate_walk_exact(
    packed, start, q, max_steps: int = 256, lockstep: int = 8,
    tail_div: int = 16,
):
    """Exact-predicate visibility walk over packed per-triangle rows.

    Steps across the most-violated face by the SIGN of the compensated
    orientation predicates (ops/robust.py), so the final containment
    verdict is exact on the build coordinates — unlike the f32
    affine-weight walk (device_tri.locate), whose ~1e-6 containment
    slack could hand a boundary site to a non-containing triangle and
    seed an inverted split.  Rows come from :func:`_pack_walk_rows`
    (CCW order, so no per-step orientation normalization); odd steps
    take the second-most-violated face when several are violated; on-edge
    queries (orient == 0) count as contained, matching the build's tie
    handling.

    TWO PHASES: nearest-site hints put ~99.5%% of queries home within a
    few steps, but ~0.1-0.2%% take 20-50 step visibility-walk DETOURS
    (measured; inherent — per-query randomized face choice does not
    shrink the tail), and a lockstep loop pays its slowest query on the
    full [B] every iteration.  So: ``lockstep`` full-width steps, then
    the unfinished tail prefix-compacts into a [B/tail_div] workspace
    and walks to ``max_steps`` there.  A tail overflowing the workspace
    (>> measured tail x16 headroom) or exhausting max_steps reports
    ok=False — the caller must treat those as NOT located (the split
    machinery's correctness rests on containment).

    Returns (cur [B] int32, ok [B] bool).
    """
    B = q.shape[0]
    cur = jnp.asarray(start, jnp.int32)
    prev = jnp.full(B, -1, jnp.int32)
    done = jnp.zeros(B, bool)
    state = (cur, prev, done, jnp.int32(0))
    for _ in range(lockstep):
        state = _walk_step(packed, q, state)
    cur, prev, done, steps = state

    # Prefix-compact the unfinished tail.
    B2 = min(B, max(B // tail_div, 256))
    ids = jnp.arange(B, dtype=jnp.int32)
    rank = jnp.cumsum((~done).astype(jnp.int32)) - 1
    sel = ~done & (rank < B2)
    slot = jnp.full(B2 + 1, -1, jnp.int32).at[
        jnp.where(sel, rank, B2)
    ].set(ids, mode="drop")[:B2]
    valid2 = slot >= 0
    sl = jnp.where(valid2, slot, 0)
    q2 = geometry.take_rows(q, sl)
    state2 = (
        jnp.where(valid2, cur[sl], 0),
        jnp.where(valid2, prev[sl], -1),
        ~valid2,
        steps,
    )

    def cond2(s):
        return jnp.logical_and(s[3] < max_steps, ~jnp.all(s[2]))

    cur2, _, _, _ = jax.lax.while_loop(
        cond2, lambda s: _walk_step(packed, q2, s), state2
    )
    cur = cur.at[jnp.where(valid2, slot, B + 1)].set(cur2, mode="drop")
    # Containment re-checked for EVERY query (phase-1 `done` also covers
    # boundary/cycling stops, which are not containment).
    return cur, _walk_contained(packed, cur, q)


def _seed_state_2d(
    sites_padded, cage_std, n_real: int, dtype, seed_frac: int = 8,
    grid_res: int | None = None,
):
    """Qhull-import bootstrap for the chunked 2D build (README:18).

    The self-seeded build spends its first ~half on doubling rounds: with
    few leaves, claims per split round are capped by the leaf count, so
    ~log2(N) round-trips insert almost nothing (the same ramp the 3D
    cavity engine measured — device_cavity.py seed rationale).  Importing
    the exact Delaunay triangulation of the first ``n_pad/seed_frac``
    shuffled sites (cage included, so the seed covers the whole cage —
    Qhull milliseconds-to-a-second) starts the rounds dense: remaining
    sites spread ~evenly over the seed leaves and the claim schedule
    saturates immediately.  Qhull runs on the dtype-ROUNDED jittered
    coords, so its exact predicates see exactly the device's point set
    and the seed is Delaunay for the device's compensated predicates too
    (zero initial dirty rows).

    Remaining sites are located ON DEVICE by an exact-predicate walk
    (:func:`_locate_walk_exact`) — scipy's ``find_simplex`` measured
    10-25 s for ~0.9M queries on this 1-core host, ~20x the walk.

    Returns ``(pts_dev, BuildState, dirty)`` ready for
    :func:`build_2d_chunked`, or None when scipy/Qhull is unavailable.
    """
    try:
        from scipy.spatial import Delaunay as _SciDelaunay
    except Exception:  # pragma: no cover - scipy is baked in
        return None
    n_pad = sites_padded.shape[0]
    m = n_pad // seed_frac
    if m < 32 or m > n_real:
        return None
    if n_pad >= (1 << 24):
        # n_left rides the saturated bad-locate count in bits 24..30 (see
        # seed_init below); a remaining-site count that can reach 2^24
        # would spill into the flag bits and masquerade as a failed seed
        # locate.  Fall back to the self-seeded build above that size.
        return None
    if grid_res is None:
        # ~1 seed site per 2 cells: hints stay the query's own/adjacent
        # site without drowning the BFS dilation in empty cells.
        grid_res = 1 << int(np.ceil(np.log2(max(np.sqrt(2.0 * m), 16))))
    np_dtype = np.dtype(dtype)
    full_m = 2 * n_pad + 3
    rounded = sites_padded[:m].astype(np_dtype).astype(np.float64)
    cage_r = np.asarray(cage_std, np.float64)
    sd = _SciDelaunay(np.concatenate([cage_r, rounded]))
    tv0 = np.asarray(sd.simplices, np.int32)  # point ids == global ids
    tn0 = np.asarray(sd.neighbors, np.int32)
    T0 = tv0.shape[0]
    # Host cc: the orientation determinant of f32-rounded coords is exact
    # in f64 (diffs and 24-bit products exact; the final subtraction is
    # sign-exact), so the ok flag matches the device predicates.
    p = np.concatenate([cage_r, rounded])
    pa, pb, pc = p[tv0[:, 0]], p[tv0[:, 1]], p[tv0[:, 2]]
    det = (pb[:, 0] - pa[:, 0]) * (pc[:, 1] - pa[:, 1]) - (
        pb[:, 1] - pa[:, 1]
    ) * (pc[:, 0] - pa[:, 0])
    # Ship only the [PK]-prefix (PK = 2m+1 >= T0 by Euler) — the
    # full-workspace pad rows are constants, appended device-side: the
    # host->device transfer drops ~8x (67 MB -> 8 MB at 1M sites).
    PK = 2 * m + 1
    tv_h = np.full((PK, 3), -1, np.int32)
    tv_h[:T0] = tv0
    tn_h = np.full((PK, 3), -1, np.int32)
    tn_h[:T0] = tn0
    cc_h = np.zeros((PK, 2), np_dtype)
    cc_h[:T0, 0] = (det != 0).astype(np_dtype)
    cc_h[:T0, 1] = tv0.sum(1).astype(np_dtype)
    # Sites Qhull merged away (duplicates/coplanar): not vertices of the
    # seed — locate and insert them like the rest.
    inserted = np.zeros(n_pad, bool)
    inserted[:m] = True
    if len(sd.coplanar):
        cop = sd.coplanar[:, 0] - 3  # input ids -> site ids
        inserted[cop[(cop >= 0) & (cop < m)]] = False
    inserted[n_real:] = True  # bucket pads: never claimed
    n_left = int((~inserted).sum())

    from ..utils import config as _config

    # Walk-start hints: a triangle INCIDENT to the nearest seed site
    # (Qhull's vertex_to_simplex), rasterized to a host grid.  The
    # triangle-centroid grid hinted some queries across long detours —
    # the lockstep walk pays its SLOWEST query every iteration, and the
    # detour tail alone put the 1M walk at 2.2 s (64-iteration cap).
    # With per-site hints the hint triangle touches a site ~one spacing
    # away, so walks stay a handful of steps for every query.
    v2s = np.asarray(sd.vertex_to_simplex, np.int32)[3:]  # per seed site
    cells = np.clip(
        ((rounded + 0.5) * grid_res).astype(np.int64), 0, grid_res - 1
    )
    flat = cells[:, 0] * grid_res + cells[:, 1]
    g = np.full(grid_res * grid_res, -1, np.int32)
    g[flat] = v2s  # last writer wins; any incident triangle is fine
    g = g.reshape(grid_res, grid_res)
    while (g < 0).any():  # BFS dilation (vectorized; a few rounds)
        for ax in (0, 1):
            for s in (1, -1):
                cand = np.roll(g, s, axis=ax)
                if ax == 0:
                    cand[0 if s == 1 else -1, :] = -1
                else:
                    cand[:, 0 if s == 1 else -1] = -1
                g = np.where(g < 0, cand, g)

    def make_seed_init():
        @jax.jit
        def seed_init(sites, cage, tvp, tnp, ccp, ins, n_tris, grid):
            pts = jnp.concatenate([cage.astype(sites.dtype), sites])
            q = pts[3:]
            qc = jnp.clip(
                ((q + 0.5) * grid_res).astype(jnp.int32), 0, grid_res - 1
            )
            start = grid.reshape(-1)[qc[:, 0] * grid_res + qc[:, 1]]
            packed = _pack_walk_rows(pts, tvp, tnp)
            loc, ok = _locate_walk_exact(packed, start, q)
            site_tri = jnp.where(ins, jnp.int32(-1), loc)
            n_bad = jnp.minimum(
                jnp.sum(~ok & ~ins, dtype=jnp.int32), 127
            )
            pad = full_m - PK
            tv = jnp.concatenate(
                [tvp, jnp.full((pad, 3), -1, jnp.int32)]
            )
            tn = jnp.concatenate(
                [tnp, jnp.full((pad, 3), -1, jnp.int32)]
            )
            cc = jnp.concatenate([ccp, jnp.zeros((pad, 2), ccp.dtype)])
            st = BuildState(
                tv, tn, cc, n_tris, site_tri,
                # n_left rides the (saturated) bad-location count in its
                # high bits (n_left < 2^24): ONE ~0.5 s scalar readback
                # surfaces both at the orchestrator's first sync.
                jnp.sum(~ins, dtype=jnp.int32) + (n_bad << 24),
            )
            # f32: the 8-ulp jitter (~1e-7 of the unit box) dwarfs Qhull's
            # f64 merge tolerance, so the seed is exactly Delaunay for the
            # device's compensated predicates and starts clean.  f64: the
            # 8-f64-ulp jitter sits INSIDE Qhull's tolerance-merging band
            # on near-degenerate input, so seed diagonals can violate the
            # compensated incircle test — start the seed rows dirty and
            # let the first sweep verify them (clean rows drain in one
            # cheap pass; ADVICE r4 medium).
            if np_dtype == np.float64:
                dirty0 = jnp.arange(full_m, dtype=jnp.int32) < n_tris
            else:
                dirty0 = jnp.zeros(full_m, bool)
            return pts, st, dirty0

        return seed_init

    args = (
        jnp.asarray(sites_padded, dtype),
        jnp.asarray(cage_std, dtype),
        jnp.asarray(tv_h),
        jnp.asarray(tn_h),
        jnp.asarray(cc_h),
        jnp.asarray(inserted),
        jnp.int32(T0),
        jnp.asarray(g),
    )
    fn = _aot_compile(
        ("seed_init", n_pad, full_m, grid_res, str(np_dtype)),
        make_seed_init,
        args,
    )
    pts, st, dirty = fn(*args)
    _config.log.info(
        "build: qhull seed %d sites, %d tris, %d left to insert",
        m, T0, n_left,
    )
    return pts, st, dirty


def build_2d_chunked(
    sites_std,
    cage_std,
    flips_per_round: int = 2,
    splits_per_round: int = 4,
    cleanup_chunk: int = 32,
    max_cleanup_chunks: int = 256,
    n_real: int | None = None,
    k_batch: int = 32,
    start_cap: int = 1 << 30,
    ladder_factor: int = 8,
    r_compact: int = 524288,
    r_site: int = 1 << 21,
    sweep_rounds: int = 8,
    sweep_rf_div: int = 2,
    sweep_r: int | None = None,
    sweep_rf_big: int | None = None,
    sweep_adaptive: bool = True,
    tail_floor: int | None = None,
    seed=None,
):
    """Host-orchestrated chunked build: short device executions in batches
    of up to ``k_batch`` insertion rounds per dispatch.

    Identical algorithm to :func:`build_2d`; the structural differences
    that took the 1M-site build from ~1090 s (round 1) to the tens of
    seconds:

    * **compact rounds** — splits and flips run on [R]-compacted
      workspaces (:func:`_split_round_compact`,
      :func:`_flip_sweep_compact`) with packed-record site relocation, so
      a round costs O(R + activity), not O(2N+3).  The narrow per-array
      layout (tri_v/tri_n/cc as separate tables) is deliberate: a merged
      [M, 8]-row variant measured ~16x slower per sweep round on a v5e —
      TPU row-slice gathers pay for the full padded row, so packing
      unrelated columns into one row multiplies gathered bytes for no
      kernel saving (measured 2026-08; see git history for the variant);
    * **one program per phase** — a single (R, rsite) rung serves the
      whole insert phase and another the final sweep, and both are
      AOT-compiled through the module-wide executable cache
      (:func:`_aot_compile`): per-dispatch cost is pure device execution,
      not re-trace/re-lower/cache-probe (~20 s per shape otherwise);
    * the outer loop runs in Python with donated on-device state: a
      single multi-minute device execution trips the TPU runtime
      watchdog, and each dispatch costs one ~0.3 s scalar readback, so
      rounds are batched (``k_batch``; the device loop self-terminates
      the moment every site is inserted), while sweep dispatches stay
      SHORT (``sweep_rounds``, a traced operand — one compiled program
      serves every batch size).

    ``start_cap``/``ladder_factor`` keep the capacity-staged mode for
    memory-constrained builds (each rung compiles its own programs);
    the default is a single full-size stage.
    """
    import time as _time

    from ..utils import config

    N = sites_std.shape[0]
    n_sites = N if n_real is None else n_real
    dtype = sites_std.dtype
    full_m = 2 * N + 3
    t_entry = _time.perf_counter()
    cap_now = min(start_cap, full_m)

    def make_init():
        @functools.partial(jax.jit, static_argnums=(2, 4))
        def init_all(sites, cage, Np, n_real_, cap):
            p = jnp.concatenate([cage.astype(sites.dtype), sites])
            return (
                p,
                _init_state(p, Np, n_real_, cap=cap),
                jnp.zeros(cap, bool),
            )

        return init_all

    if seed is not None:
        # Qhull-import bootstrap (_seed_state_2d): state arrives built.
        pts, st, dirty = seed
        cap_now = st.tri_v.shape[0]
        # Decode the seed locate's bad count from n_left's high bits
        # (this int() is the build's first device sync).
        v = int(st.n_left)
        if v >> 24:
            raise SeedLocateError(
                f"seed locate failed for {v >> 24}(+) sites"
            )
        st = st._replace(n_left=jnp.int32(v & 0xFFFFFF))
    else:
        sites_dev = jnp.asarray(sites_std)
        cage_dev = jnp.asarray(cage_std)
        nreal_dev = jnp.int32(N if n_real is None else n_real)
        init_c = _aot_compile(
            ("init_all", N, cap_now), make_init,
            (sites_dev, cage_dev, N, nreal_dev, cap_now),
        )
        pts, st, dirty = init_c(sites_dev, cage_dev, nreal_dev)
        t_disp = _time.perf_counter()
        jax.block_until_ready(st.site_tri)
        config.log.info(
            "build: init state %.2fs (trace+enqueue %.2fs)",
            _time.perf_counter() - t_entry,
            t_disp - t_entry,
        )

    def make_k_rounds(R, rsite, spr, fpr):
        # k and floor are traced operands: one program serves every batch
        # size; the device loop exits once n_left <= floor so the host
        # can switch to the cheap tail program (see the insert loop).
        @functools.partial(
            jax.jit, static_argnums=(), donate_argnums=(1, 2)
        )
        def k_rounds(pts, st, dirty, k, floor):
            M = st.tri_v.shape[0]

            def cond(c):
                st, dirty, it, progress = c
                return (st.n_left > floor) & (it < k) & progress

            def body(c):
                st, dirty, it, _progress = c
                # Splits run on a quarter workspace (two fit the fresh-
                # child block budget 2*R_s <= M//2); a split round costs
                # ~1/4 of a flip round, and batching several per flip
                # block cuts the dominant round count — site_tri stays
                # exact through each split's own relocation, and Delaunay
                # restoration is the sweep's job.
                R_s = max(min(R // 2, M // 4), 1)
                n_new = jnp.int32(0)
                for _ in range(spr):
                    # Skip drained split rounds (lax.cond executes one
                    # branch): the last iteration of the insert loop
                    # otherwise pays up to splits_per_round-1 full-R_s
                    # claim/split/relocate rounds that insert nothing.
                    def _do_split(pts, st, dirty):
                        st, dirty, k = _split_round_compact(
                            pts, st, dirty, R_s, rsite
                        )
                        return st, dirty, k.astype(jnp.int32)

                    st, dirty, n_new_i = jax.lax.cond(
                        st.n_left > 0,
                        _do_split,
                        lambda pts, st, dirty: (st, dirty, jnp.int32(0)),
                        pts, st, dirty,
                    )
                    n_new = n_new + n_new_i
                tri_v, tri_n, cc, dirty, _, _, site_tri, _nf, _nc = (
                    _flip_sweep_compact(
                        pts, st.tri_v, st.tri_n, st.cc, dirty,
                        R, jnp.int32(fpr),
                        site_tri=st.site_tri, r_site=rsite,
                    )
                )
                st = BuildState(
                    tri_v, tri_n, cc, st.n_tris, site_tri, st.n_left
                )
                # A claim-less round at a full capacity is a stall:
                # return to the host for a grow instead of spinning.
                return st, dirty, it + 1, n_new > 0

            st, dirty, _, _ = jax.lax.while_loop(
                cond, body, (st, dirty, jnp.int32(0), True)
            )
            return st, dirty

        return k_rounds

    def make_sweep(R, rf):
        # k (rounds per dispatch) is a traced operand: one program serves
        # every batch size, and the host keeps each device execution
        # short — a long saturated-sweep execution trips the TPU runtime
        # watchdog (observed as "worker crashed" on slow axon servers).
        @functools.partial(
            jax.jit, donate_argnums=(1, 2, 3, 4)
        )
        def sweep(pts, tri_v, tri_n, cc, dirty, k):
            # Pre-claims the sweep was cascade-depth-limited and rf_div
            # stayed 4; unilateral claims made it flip-CAP-limited
            # (measured 131k = R//4 executed every early round), so the
            # cap is now a tunable (sweep_rf_div).
            return _flip_sweep_compact(
                pts, tri_v, tri_n, cc, dirty, R, k, rf_div=rf
            )

        return sweep

    @functools.partial(jax.jit, static_argnums=(3,))
    def grow(pts, st, dirty, new_cap):
        M = st.tri_v.shape[0]
        pad = new_cap - M
        return BuildState(
            jnp.concatenate([st.tri_v, jnp.full((pad, 3), -1, jnp.int32)]),
            jnp.concatenate([st.tri_n, jnp.full((pad, 3), -1, jnp.int32)]),
            jnp.concatenate([st.cc, jnp.zeros((pad, 2), st.cc.dtype)]),
            st.n_tris,
            st.site_tri,
            st.n_left,
        ), jnp.concatenate([dirty, jnp.zeros(pad, bool)])

    @functools.partial(jax.jit, donate_argnums=(1,))
    def cleanup(pts, st, cap):
        return _flip_rounds(pts, st, cap, relocate=False)

    rounds = 0
    t0 = _time.perf_counter()
    while True:
        t_rb = _time.perf_counter()
        n_left = int(st.n_left)
        t_rb = _time.perf_counter() - t_rb
        if t_rb > 1.0:
            config.log.info("build: n_left readback %.2fs", t_rb)
        if n_left == 0:
            break
        n_tris = 1 + 2 * (n_sites - n_left)
        # Grow when the next round would be materially capacity-bound.
        if cap_now < full_m and (cap_now - n_tris) // 2 < min(
            n_left, n_tris
        ):
            new_cap = cap_now
            while new_cap < full_m and (new_cap - n_tris) // 2 < min(
                n_left, 3 * n_tris
            ):
                new_cap = min(new_cap * ladder_factor, full_m)
            st, dirty = grow(pts, st, dirty, new_cap)
            cap_now = new_cap
            config.log.info("build: grow capacity -> %d", cap_now)
        # Two insert rungs: the BIG program (full windows, several split
        # rounds per flip block) runs while the remaining-site count
        # carries it, then exits at `tail_min` (a traced floor) so the
        # TAIL program — one split round on small windows — finishes the
        # last few percent.  Without the tail rung, the final iterations
        # claim ~nothing but pay full-R_s rounds (measured: 2 of the
        # seeded build's 3 iterations inserted 51k + 36 sites for 2.1 s
        # of its 3.4 s insert phase).
        tail_min = (
            min(131072, r_compact // 4) if tail_floor is None
            else tail_floor
        )
        tail = n_left <= tail_min
        R = min(131072 if tail else r_compact, cap_now)
        spr = 1 if tail else splits_per_round
        # Tail iterations also sweep only ONE flip round: their job is
        # exact site relocation, and deferred restorations drain cheaper
        # in the final sweep (bigger windows, no relocation work).
        fpr = 1 if tail else flips_per_round
        floor = jnp.int32(0 if tail else tail_min)
        rsite = min(r_site, 1 << 21)
        kr = _aot_compile(
            ("k_rounds", cap_now, R, rsite, spr,
             fpr, N, str(dtype)),
            lambda: make_k_rounds(R, rsite, spr, fpr),
            (pts, st, dirty, jnp.int32(k_batch), floor),
        )
        td = _time.perf_counter()
        st, dirty = kr(pts, st, dirty, jnp.int32(k_batch), floor)
        n_left = int(st.n_left)  # forces the sync; count it in the wall
        rounds += k_batch
        config.log.info(
            "build rounds <=%d (cap=%d, R=%d, %.2fs): %d left, %.2fs total",
            rounds, cap_now, R, _time.perf_counter() - td, n_left,
            _time.perf_counter() - t0,
        )
    if cap_now < full_m:
        # Cleanup may still flip anywhere; capacity only gates splits,
        # but freeze/downstream expect the full 2N+3 layout.
        st, dirty = grow(pts, st, dirty, full_m)
    t1 = _time.perf_counter()
    # Dirty-compacted cleanup, continuing from the insert rounds' carried
    # dirty set (the non-dirty remainder is already locally Delaunay).
    tri_v, tri_n, cc = st.tri_v, st.tri_n, st.cc
    swept = 0
    nd = full_m  # upper bound; refined by each dispatch's readback
    # Tail rung sized so the post-bulk residue (measured ~100k dirty rows
    # after the seeded build's first big dispatch) routes straight to the
    # cheap rung instead of paying full-window rounds on a nearly-drained
    # set (16 x 276 ms of waste in the r3 layout).
    r_small = min(131072, r_compact, full_m)
    # Adaptive big-rung dispatch depth: start short (cheap diagnostics,
    # watchdog-safe on degraded servers), double while dispatches stay
    # fast — k is traced, so every depth reuses one compiled program.
    k_sweep = sweep_rounds
    while True:
        # Two-rung drain: the first dispatches chew the post-insert bulk
        # on the full workspace; the long convergence tail (flip cascades
        # re-dirtying a few thousand rows) runs on a small one, where
        # every [R]-sized pass (candidates, matching, repair) is ~4x
        # cheaper.  Tail rounds are cheap enough to batch deep (fewer
        # ~0.3 s scalar readbacks); big-rung dispatches stay short for
        # the watchdog.
        # Route to the tail rung as soon as the residue fits a couple of
        # tail windows: a 149k-dirty residue that just missed a 3/4
        # threshold measured 16 full-window rounds (4.6 s) of waste.
        tail = nd < 2 * r_small
        # Big-rung window: the final sweep has NO relocation work, and its
        # first dispatches face the whole post-insert violation backlog —
        # a wider window + deeper flip cap (sweep_r, sweep_rf_div) drains
        # it in fewer rounds, each amortizing the fixed per-round kernel
        # overhead over more executed flips.
        r_big = min(r_compact if sweep_r is None else sweep_r, full_m)
        R = r_small if tail else r_big
        rf = sweep_rf_div if tail or sweep_rf_big is None else sweep_rf_big
        cap_rounds = 16 * sweep_rounds if tail else k_sweep
        sw = _aot_compile(
            ("sweep", full_m, R, N, str(dtype), rf),
            lambda: make_sweep(R, rf),
            (pts, tri_v, tri_n, cc, dirty, jnp.int32(cap_rounds)),
        )
        t_dispatch = _time.perf_counter()
        tri_v, tri_n, cc, dirty, used, nd, _, nf, nc = sw(
            pts, tri_v, tri_n, cc, dirty, jnp.int32(cap_rounds)
        )
        used = int(used)
        t_dispatch = _time.perf_counter() - t_dispatch
        swept += used
        nd = int(nd)
        config.log.info(
            "build: sweep dispatch %d rounds (%.2fs), %d flips, "
            "%d cand-edges, %d dirty", used, t_dispatch, int(nf),
            int(nc), nd,
        )
        if nd == 0:
            break
        if used == cap_rounds:
            # Cap-limited (the per-dispatch round bound keeps a single
            # device execution under the TPU runtime watchdog) — still
            # progressing, keep sweeping; go deeper while execution
            # stays comfortably under the watchdog horizon.
            if sweep_adaptive and not tail and t_dispatch < 10.0:
                k_sweep = min(2 * k_sweep, 64)
            config.log.info(
                "build: sweep continues, %d dirty (%d rounds)", nd, swept
            )
            continue
        # Fixpoint with dirt left (un-executable candidates): finish on
        # the dense path, whose termination rule ignores candidates.
        config.log.info("build: sweep fixpoint with %d dirty rows", nd)
        st = BuildState(
            tri_v, tri_n, cc, st.n_tris, st.site_tri, st.n_left
        )
        flip_rounds_used = 0
        cap = max(1, cleanup_chunk // 8)
        for _ in range(max_cleanup_chunks):
            st, used = cleanup(pts, st, jnp.int32(cap))
            used = int(used)
            flip_rounds_used += used
            if used < cap:
                break
            if cap < cleanup_chunk:
                cap *= 2
        tri_v, tri_n, cc = st.tri_v, st.tri_n, st.cc
        break
    config.log.info(
        "build: <=%d insert rounds %.1fs, %d sweep rounds %.1fs",
        rounds, t1 - t0, swept, _time.perf_counter() - t1,
    )
    alive = tri_v[:, 0] >= 0
    return tri_v, tri_n, alive, st.n_tris


def triangulate(
    sites_raw,
    lo=None,
    hi=None,
    flags: int = 0,
    key=None,
    dtype=jnp.float64,
    grid_res: int = 256,
    chunk_threshold: int = 400_000,
    seed_import: str = "auto",
    seed_min: int = 200_000,
    seed_frac: int = 8,
    build_opts: dict | None = None,
):
    """End-to-end device Delaunay: standardize, cage, shuffle, build, freeze.

    The device analog of ``simplex_tree_init`` (linear_simplex.c:134-296)
    for d=2, returning a query-ready DeviceTriangulation plus the shuffle
    permutation (map user response rows via ``response[shuffle]`` and
    prepend d+1 cage zeros — see device_tri.reindex_response semantics).
    Flags are host_tree.DEFAULT / NOSTANDARDIZE / ISOSCALE
    (linear_simplex.h:109-112).
    """
    from . import device_tri, host_tree
    from ..utils import rng as rng_util

    sites_raw = np.asarray(sites_raw, np.float64)
    n, d = sites_raw.shape
    if d != 2:
        raise NotImplementedError(
            "device build is 2D; use models.host_tree for general d"
        )
    if flags & host_tree.NOSTANDARDIZE:
        lo_, hi_ = np.full(d, -0.5), np.full(d, 0.5)
    else:
        lo_ = np.asarray(lo, np.float64) if lo is not None else sites_raw.min(0)
        hi_ = np.asarray(hi, np.float64) if hi is not None else sites_raw.max(0)
    shift = (lo_ + hi_) / 2.0
    ext = hi_ - lo_
    scale = np.where(ext > 0, 1.0 / np.where(ext > 0, ext, 1.0), 1.0)
    if (flags & host_tree.ISOSCALE) and not (flags & host_tree.NOSTANDARDIZE):
        scale = np.full(d, scale.min())

    shuffle = rng_util.insertion_shuffle(key, n)
    sites_shuffled = sites_raw[shuffle]
    cage_raw = geometry.cage_vertices(d, shift, scale, np.dtype(dtype).type)
    cage_std = jnp.asarray(scale * (cage_raw - shift), dtype)

    # Deterministic symbolic perturbation for the BUILD's predicates only:
    # exactly-degenerate input (collinear runs, cocircular lattices) breaks
    # the parallel flip schedule's tie handling, where the reference's
    # sequential insertion leans on epsilon tie-breaks
    # (linear_simplex.c:535-536, edge_flip.c:244-254).  A few ulps suffice —
    # the flip predicates are compensated (ops/robust.py), so they resolve
    # jittered ties exactly.  Keep it SMALL: jitter displaces the
    # triangulation from the exact points, costing O(jitter/local-spacing)
    # incircle slack and eval error (512 ulps in f32 measurably hurt).
    jit_mag = 8.0 * machine.eps(dtype)
    prng = np.random.default_rng(12345)

    # Shape bucketing: pad the site count up to the next {1, 1.5}x2^k
    # bucket with pre-inserted (never-claimed) pad rows, so the compiled
    # build program — and its persistent-cache entry — is reused across a
    # whole range of N.  XLA compile through the axon remote tunnel costs
    # ~50x execution for this program; shape reuse is the difference
    # between a one-time and a per-problem-size cost.
    # (Standardize + jitter in place on the one padded buffer: the
    # shuffle/standardize/jitter chain materialized three extra [N, 2]
    # f64 arrays on this 1-core host.)
    n_pad = bucket_size(n)
    sites_padded = np.zeros((n_pad, d), np.float64)
    sites_padded[:n] = sites_shuffled
    sites_padded[:n] -= shift
    sites_padded[:n] *= scale
    sites_padded[:n] += jit_mag * prng.uniform(-1, 1, (n, d))
    if n > chunk_threshold:
        # Host-orchestrated round batches: a single multi-minute device
        # execution would trip the TPU runtime watchdog at this scale.
        # (chunk_threshold is a tuning knob, exposed so tests can force the
        # chunked path on small inputs and assert build equivalence.)
        # At scale, bootstrap from a Qhull seed of the first n_pad/seed_frac
        # sites (the reference's planned import feature, README:18): the
        # early doubling rounds vanish and the seed fraction arrives
        # already Delaunay.  seed_import="self" disables.
        seed = None
        if seed_import in ("auto", "qhull") and n >= seed_min:
            seed = _seed_state_2d(
                sites_padded, np.asarray(cage_std, np.float64), n, dtype,
                seed_frac=seed_frac,
            )
        try:
            tri_v, tri_n, alive, _ = build_2d_chunked(
                jnp.asarray(sites_padded, dtype), cage_std, n_real=n,
                seed=seed, **(build_opts or {}),
            )
        except SeedLocateError:
            if seed is None:
                raise
            from ..utils import config as _config

            # Seed locate exhausted its walk budget (loud, never silent
            # corruption — see _locate_walk_exact): redo self-seeded.
            _config.log.warning("build: seed locate failed; self-seeding")
            tri_v, tri_n, alive, _ = build_2d_chunked(
                jnp.asarray(sites_padded, dtype), cage_std, n_real=n,
                **(build_opts or {}),
            )
    else:
        tri_v, tri_n, alive, _ = jax.jit(build_2d)(
            jnp.asarray(sites_padded, dtype),
            cage_std,
            n_real=jnp.int32(n),
        )
    points_raw = np.concatenate([cage_raw, sites_shuffled])
    tri = device_tri.from_arrays(
        points_raw, shift, scale, tri_v, tri_n, alive, grid_res=grid_res
    )
    return tri, shuffle


def _owner_of_face(tri_v, cands, a, b):
    """Among candidate triangle ids [..., C], the first containing verts
    a, b (shapes [...]).  One batched gather for any leading shape —
    callers fold their per-face loops into the leading dims."""
    cv = geometry.take_rows(tri_v, cands)  # [..., C, 3]
    has_a = jnp.any(cv == a[..., None, None], axis=-1)
    has_b = jnp.any(cv == b[..., None, None], axis=-1)
    okc = has_a & has_b & (cands >= 0)
    idx = jnp.argmax(okc, axis=-1)
    found = jnp.any(okc, axis=-1)
    owner = jnp.take_along_axis(cands, idx[..., None], -1)[..., 0]
    return jnp.where(found, owner, cands[..., 0])


def _repair_after_split(tri_v, tri_n, split_flag, cA, cB, n_tris):
    """Re-resolve neighbor ids pointing at triangles that just split."""
    M = tri_v.shape[0]
    out = tri_n
    for m in range(3):
        n = tri_n[:, m]
        stale = (n >= 0) & split_flag[jnp.where(n >= 0, n, 0)]
        ns = jnp.where(stale, n, 0)
        a = tri_v[:, (m + 1) % 3]
        b = tri_v[:, (m + 2) % 3]
        cands = jnp.stack([ns, cA[ns], cB[ns]], -1)
        owner = _owner_of_face(tri_v, cands, a, b)
        out = out.at[:, m].set(jnp.where(stale, owner, n))
    return out


def _relocate_sites_chunked(pts, site_tri, affected, decide, r_site):
    """Re-locate the affected sites via the given decision rule.

    The dense rounds re-evaluate containment for every one of N sites
    every round (masked); here the affected ids are prefix-compacted and
    processed in ``r_site``-sized chunks inside a while_loop, so the work
    tracks the actual affected count (all of N early, a handful late).

    ``decide(t_of [B], q [B, 2]) -> [B]`` maps each site's stale
    containing-triangle id to its new one (a specialized sector /
    side-of-diagonal test — see _assign_split_child, _assign_flip_side).
    """
    N = site_tri.shape[0]
    if 3 * r_site >= 2 * N:
        # The chunk would cover (nearly) every site.  Two regimes, picked
        # per round by a cond on the affected count:
        # * DENSE — decide on the full masked array (pts rows 3.. ARE the
        #   sites in order: no compaction cumsum/scatter, no query
        #   gather).  Right when most sites relocate (early insert
        #   rounds: every triangle splits).
        # * COMPACT — prefix-compact the affected ids and decide on ONE
        #   [N//4]-sized chunk.  Late insert rounds relocate a few
        #   thousand sites; the dense pass still paid the full [N, 11]
        #   record gather + predicates (~40% of a split round) for them.
        C = max(1024, N // 4)

        def _dense(site_tri):
            t_of = jnp.where(affected, site_tri, 0)
            new_t = decide(t_of, pts[3 : 3 + N])
            return jnp.where(affected, new_t, site_tri)

        def _compact(site_tri):
            site_ids = jnp.arange(N, dtype=jnp.int32)
            srank = jnp.cumsum(affected.astype(jnp.int32)) - 1
            sel = affected & (srank < C)
            sb = jnp.zeros(C, jnp.int32).at[
                jnp.where(sel, srank, C)
            ].set(site_ids, mode="drop")
            valid = jnp.arange(C, dtype=jnp.int32) <= jnp.max(
                jnp.where(sel, srank, -1)
            )
            t_of = jnp.where(valid, site_tri[sb], 0)
            q = geometry.take_rows(pts, sb + 3)
            new_t = decide(t_of, q)
            return site_tri.at[jnp.where(valid, sb, N + 1)].set(
                new_t, mode="drop"
            )

        cnt = jnp.sum(affected.astype(jnp.int32))

        def _route(site_tri):
            return jax.lax.cond(cnt <= C, _compact, _dense, site_tri)

        return jax.lax.cond(
            cnt > 0, _route, lambda s: s, site_tri
        )
    site_ids = jnp.arange(N, dtype=jnp.int32)
    cnt = jnp.sum(affected.astype(jnp.int32))
    srank = jnp.cumsum(affected.astype(jnp.int32)) - 1
    csite = jnp.zeros(N + r_site, jnp.int32).at[
        jnp.where(affected, srank, N + r_site - 1)
    ].set(site_ids, mode="drop")

    def chunk_body(c):
        site_tri, ci = c
        sb = jax.lax.dynamic_slice(csite, (ci * r_site,), (r_site,))
        valid = (ci * r_site + jnp.arange(r_site, dtype=jnp.int32)) < cnt
        sb = jnp.where(valid, sb, 0)
        t_of = jnp.where(valid, site_tri[sb], 0)
        q = geometry.take_rows(pts, sb + 3)
        new_t = decide(t_of, q)
        site_tri = site_tri.at[jnp.where(valid, sb, N + 1)].set(
            new_t, mode="drop"
        )
        return site_tri, ci + 1

    site_tri, _ = jax.lax.while_loop(
        lambda c: c[1] * r_site < cnt, chunk_body, (site_tri, jnp.int32(0))
    )
    return site_tri


def _assign_split_child_rec(rec_f, t_of, q):
    """Record-based post-split child selection (see _assign_split_child).

    Identical decisions to :func:`_assign_split_child`, but every input —
    the four vertex coordinates, the parent orientation sign, and the two
    fresh child ids (exact as floats: ids < 2^24) — rides in ONE
    [B, 11] row gather of the per-parent split record built at [R] cost
    inside the split round, instead of three chained id/point gathers per
    site.  Gathered bytes and gather count are the dominant relocation
    cost at 1M sites.
    """
    r = geometry.take_rows(rec_f, t_of)  # [B, 11]
    s_pt, v0_pt = r[:, 0:2], r[:, 2:4]
    v1_pt, v2_pt = r[:, 4:6], r[:, 6:8]
    o = r[:, 8]
    A = r[:, 9].astype(jnp.int32)
    B = r[:, 10].astype(jnp.int32)
    a0 = robust.orient2d_ds(s_pt, v0_pt, q)
    a1 = robust.orient2d_ds(s_pt, v1_pt, q)
    a2 = robust.orient2d_ds(s_pt, v2_pt, q)
    b0, b1, b2 = a0 * o, a1 * o, a2 * o
    in_A = (b2 >= 0) & (b0 < 0)
    in_B = (b0 >= 0) & (b1 < 0)
    return jnp.where(in_A & (A >= 0), A,
                     jnp.where(in_B & (B >= 0), B, t_of))


def _split_round_compact(pts, st: BuildState, dirty, R: int, r_site: int):
    """Activity-compacted insertion round.

    Same semantics as :func:`_split_round` (identical claims, identical
    relocation decisions), but engineered around the measured per-phase
    costs at 1M sites (claims 50 / child writes 148 / repair 149 / cc 50 /
    relocation 145 ms before this layout):

    * the two FRESH children of split ``i`` get ids ``n_tris + 2i`` /
      ``n_tris + 2i + 1`` — a CONTIGUOUS block, written with one
      ``dynamic_update_slice`` instead of a 2R-row scatter (only the
      reused parent slot needs a real scatter);
    * each child's single external pointer (slot 0) is RESOLVED against
      the split records *before* the rows are written, so child rows are
      never stale and need no repair pass;
    * a non-split neighbor has exactly ONE stale slot (the one pointing
      at a split parent, which re-resolves to the child owning the shared
      face) — repaired with a flat single-element scatter instead of
      re-deriving all 3 slots of all 6R affected rows;
    * child circumcircle metadata comes from the orientation predicates
      the round already evaluates (no vertex re-gather);
    * site relocation reads ONE packed [., 11] float record per site
      (:func:`_assign_split_child_rec`).

    Claims beyond R (or beyond capacity) are deferred to the next round.
    Requires ``2 * R < M`` (the chunked orchestrator guarantees it).
    Returns ``(state, dirty, n_new)`` with the new children and their
    neighbors marked dirty for the flip sweep.
    """
    M = st.tri_v.shape[0]
    if 2 * R >= M:
        raise ValueError(f"_split_round_compact needs 2R < M ({R=}, {M=})")
    N = st.site_tri.shape[0]
    dtype = pts.dtype
    site_ids = jnp.arange(N, dtype=jnp.int32)
    tri_v, tri_n, cc, n_tris, site_tri, n_left = st

    # 1. Each leaf claims its lowest-id uninserted site.
    tgt = jnp.where(site_tri >= 0, site_tri, M)
    claim = jnp.full(M + 1, INT_MAX, jnp.int32).at[tgt].min(site_ids)[:M]
    has = claim != INT_MAX
    rank = jnp.cumsum(has.astype(jnp.int32)) - 1
    has = has & (n_tris + 2 * (rank + 1) <= M) & (rank < R)

    # 2. Compact the splitting rows.
    prow = jnp.full(R + 1, -1, jnp.int32).at[
        jnp.where(has, rank, R)
    ].set(jnp.arange(M, dtype=jnp.int32), mode="drop")[:R]
    pvalid = prow >= 0
    ps = jnp.where(pvalid, prow, 0)
    i_r = jnp.arange(R, dtype=jnp.int32)
    ca = jnp.where(pvalid, n_tris + 2 * i_r, -1)
    cb = jnp.where(pvalid, n_tris + 2 * i_r + 1, -1)
    s_pid = (claim[ps] + 3).astype(jnp.int32)
    tvr = geometry.take_rows(tri_v, ps)
    tnr = geometry.take_rows(tri_n, ps)
    v0, v1, v2 = tvr[:, 0], tvr[:, 1], tvr[:, 2]
    n0, n1, n2 = tnr[:, 0], tnr[:, 1], tnr[:, 2]
    n_new = jnp.sum(pvalid.astype(jnp.int32))

    # 3. Split records (also the relocation decision table).
    rows_p = jnp.where(pvalid, prow, M + 1)
    srec = jnp.full((M, 4), -1, jnp.int32).at[rows_p].set(
        jnp.stack([v0, v1, ca, cb], -1), mode="drop"
    )
    split_flag = srec[:, 2] >= 0

    # 4. Pre-resolve each child's external (slot-0) pointer: if the old
    # neighbor across that face ALSO split this round, the face's owner
    # among its children follows from the omit rule — a face omitting the
    # record's v0 stays with the parent slot, omitting v1 goes to cA,
    # else cB.  Faces: parent slot (v1,v2) ext n0; cA (v2,v0) ext n1;
    # cB (v0,v1) ext n2.
    nall = jnp.where(jnp.concatenate([pvalid] * 3),
                     jnp.concatenate([n0, n1, n2]), -1)
    rec3 = geometry.take_rows(srec, jnp.where(nall >= 0, nall, 0))
    nsplit = (nall >= 0) & (rec3[:, 2] >= 0)
    fa = jnp.concatenate([v1, v2, v0])
    fb = jnp.concatenate([v2, v0, v1])
    rv0, rv1 = rec3[:, 0], rec3[:, 1]
    owner = jnp.where(
        (fa != rv0) & (fb != rv0),
        nall,
        jnp.where((fa != rv1) & (fb != rv1), rec3[:, 2], rec3[:, 3]),
    )
    next0 = jnp.where(nsplit, owner, nall)
    e0, e1, e2 = next0[:R], next0[R : 2 * R], next0[2 * R :]

    # 5. Coordinates + orientation predicates (shared by the circumcircle
    # metadata and the relocation record).
    pid4 = jnp.stack([s_pid, v0, v1, v2], -1)
    p4 = geometry.take_rows(pts, pid4)  # [R, 4, 2]
    s_pt, v0_pt, v1_pt, v2_pt = p4[:, 0], p4[:, 1], p4[:, 2], p4[:, 3]
    D0 = robust.orient2d_ds(s_pt, v1_pt, v2_pt)  # parent-slot child
    D1 = robust.orient2d_ds(s_pt, v2_pt, v0_pt)  # cA
    D2 = robust.orient2d_ds(s_pt, v0_pt, v1_pt)  # cB
    o = jnp.where(D0 < 0, -1.0, 1.0).astype(dtype)
    f32 = lambda x: x.astype(cc.dtype)
    cc_ps = jnp.stack([f32(D0 != 0), f32(s_pid + v1 + v2)], -1)
    cc_ca = jnp.stack([f32(D1 != 0), f32(s_pid + v2 + v0)], -1)
    cc_cb = jnp.stack([f32(D2 != 0), f32(s_pid + v0 + v1)], -1)

    rec_f = jnp.full((M, 11), -1.0, dtype).at[rows_p].set(
        jnp.concatenate(
            [p4.reshape(R, 8), o[:, None],
             ca.astype(dtype)[:, None], cb.astype(dtype)[:, None]],
            -1,
        ),
        mode="drop",
    )

    # 6. Write the rows.  Fresh children are a contiguous block at
    # [n_tris, n_tris + 2*n_new): ONE dynamic_update_slice per array.
    # When capacity runs short the block start clamps to M - 2R and the
    # overlap keeps its current contents (claims were capped, so live
    # children still land at exactly n_tris + k).
    blk_v = jnp.stack(
        [jnp.stack([s_pid, v2, v0], -1), jnp.stack([s_pid, v0, v1], -1)],
        axis=1,
    ).reshape(2 * R, 3)
    psl = jnp.where(pvalid, prow, -1)
    blk_n = jnp.stack(
        [jnp.stack([e1, cb, psl], -1), jnp.stack([e2, psl, ca], -1)],
        axis=1,
    ).reshape(2 * R, 3)
    blk_c = jnp.stack([cc_ca, cc_cb], axis=1).reshape(2 * R, 2)
    start = jnp.minimum(n_tris, M - 2 * R)
    ofs = n_tris - start
    j2 = jnp.arange(2 * R, dtype=jnp.int32)
    use = (j2 >= ofs) & (j2 < ofs + 2 * n_new)

    def blk_write(arr, blk):
        idx = (start,) + (jnp.int32(0),) * (arr.ndim - 1)
        cur = jax.lax.dynamic_slice(arr, idx, (2 * R,) + arr.shape[1:])
        mask = use.reshape((2 * R,) + (1,) * (arr.ndim - 1))
        blk = jnp.where(mask, jnp.roll(blk, ofs, axis=0), cur)
        return jax.lax.dynamic_update_slice(arr, blk, idx)

    tri_v = blk_write(tri_v, blk_v)
    tri_n = blk_write(tri_n, blk_n)
    cc = blk_write(cc, blk_c)
    tri_v = tri_v.at[rows_p].set(jnp.stack([s_pid, v1, v2], -1), mode="drop")
    tri_n = tri_n.at[rows_p].set(jnp.stack([e0, ca, cb], -1), mode="drop")
    cc = cc.at[rows_p].set(cc_ps, mode="drop")
    n_tris = (n_tris + 2 * n_new).astype(jnp.int32)

    # 7. One-slot repair of NON-split neighbors: their pointer at a split
    # parent re-resolves to cA (face (v2,v0)) / cB (face (v0,v1)); the
    # n0 pointer stays at the parent slot.  Disjoint (row, slot) targets
    # by construction -> flat single-element scatter.
    nb = jnp.concatenate([n1, n2])
    own = jnp.concatenate([ca, cb])
    nb_split = jnp.concatenate([nsplit[R : 2 * R], nsplit[2 * R :]])
    nb_ok = jnp.concatenate([pvalid] * 2) & (nb >= 0) & ~nb_split
    nrow = geometry.take_rows(tri_n, jnp.where(nb_ok, nb, 0))  # [2R, 3]
    ps2 = jnp.concatenate([ps] * 2)
    slot = jnp.argmax(nrow == ps2[:, None], axis=-1).astype(jnp.int32)
    flat = jnp.where(nb_ok, nb * 3 + slot, 3 * M + 1)
    tri_n = (
        tri_n.reshape(-1).at[flat].set(own, mode="drop").reshape(M, 3)
    )

    # 8. Re-locate sites whose leaf split (chunked); retire claimed.
    t_of = jnp.where(site_tri >= 0, site_tri, 0)
    needs = (site_tri >= 0) & split_flag[t_of]
    site_tri = _relocate_sites_chunked(
        pts,
        site_tri,
        needs,
        lambda t, q: _assign_split_child_rec(rec_f, t, q),
        r_site,
    )
    claimed = needs & (claim[t_of] == site_ids)
    site_tri = jnp.where(claimed, -1, site_tri)
    n_left = (n_left - jnp.sum(claimed.astype(jnp.int32))).astype(jnp.int32)

    # 9. Mark the flip frontier dirty: parents (their slots now hold
    # children) and the fresh block.  Outer neighbors stay clean — every
    # new edge has a child side, and the canonical verdict + unilateral
    # claim (see _match_and_flip) execute its flip from that side.
    dirty = blk_write(dirty, jnp.ones(2 * R, bool))
    dirty = dirty.at[rows_p].set(True, mode="drop")
    st = BuildState(tri_v, tri_n, cc, n_tris, site_tri, n_left)
    return st, dirty, n_new


def _flip_sweep_compact(
    pts, tri_v, tri_n, cc, dirty, R: int, cap,
    site_tri=None, r_site: int = 65536, rf_div: int = 4,
):
    """Dirty-set flip rounds on an [R]-compacted workspace.

    The dense flip round touches all M slots every sub-round; the set of
    possibly-violating edges collapses geometrically, so each round here
    gathers (up to) R dirty rows, evaluates the candidate predicates on
    [R, 3] only, flips, and re-marks just the rewritten pairs dirty.
    Invariant: at least ONE side of any possibly-violating edge is dirty
    (a flip re-marks its two rewritten rows, and every new violation a
    flip can create involves a rewritten row).  The dirty side alone
    suffices: verdicts are canonical per quad, and a candidate whose
    partner is outside the window executes unilaterally via the
    scatter-min claim in :func:`_match_and_flip`.  When #dirty > R the
    overflow rows simply stay dirty for a later round.

    With ``site_tri`` given (insert phase), sites straddling a flipped
    pair re-locate after every round, chunked over the affected set; pass
    None for the final cleanup (every site inserted — no [N] work at
    all).

    Returns (tri_v, tri_n, cc, dirty, rounds_used, n_dirty, site_tri,
    n_flips) — n_flips is the total executed-flip count (volume
    diagnostics; the sweep is volume- vs depth-limited tuning input).
    """
    M = tri_v.shape[0]
    arange_m = jnp.arange(M, dtype=jnp.int32)
    relocate = site_tri is not None
    if site_tri is None:
        site_tri = jnp.zeros((1,), jnp.int32)  # carry placeholder

    def body(carry):
        (tri_v, tri_n, cc, dirty, site_tri, it, _progress, n_flips,
         n_cands) = carry
        n_dirty0 = jnp.sum(dirty.astype(jnp.int32))
        didx = jnp.cumsum(dirty.astype(jnp.int32)) - 1
        sel = dirty & (didx < R)
        rows = jnp.full(R + 1, -1, jnp.int32).at[
            jnp.where(sel, didx, R)
        ].set(arange_m, mode="drop")[:R]
        rvalid = rows >= 0
        tv, tn, cand_ok = _edge_candidates(
            pts, tri_v, tri_n, cc, rows, rvalid
        )
        out = _match_and_flip(
            pts, tri_v, tri_n, cc, rows, rvalid, tv, tn, cand_ok,
            want_frec=relocate, rf_div=rf_div,
        )
        tri_v, tri_n, cc, flip_info, rep, repv, any_flip, n_exec = out[:8]
        n_flips = n_flips + n_exec
        # candidate EDGES this round (each flippable edge counted from
        # both sides): executed/(candidates/2) is the matching yield
        n_cands = n_cands + jnp.sum(cand_ok, dtype=jnp.int32)
        # Neighbor repair is integrated into _match_and_flip; rep/repv
        # are the rewritten pair rows.
        # Processed rows stay dirty iff they still carry a candidate edge
        # (lost the matching / claim arbitration); rewritten PAIR rows are
        # re-marked.  Outer neighbors are NOT marked: any newly-violating
        # outer edge has one side on a rewritten row, and the canonical
        # verdict + unilateral claim execute it from that side alone.
        # Overflow rows keep their flag.
        dirty = dirty.at[jnp.where(rvalid, rows, M + 1)].set(
            jnp.any(cand_ok, axis=-1), mode="drop"
        )
        dirty = dirty.at[
            jnp.where(repv, rep, M + 1)
        ].set(True, mode="drop")
        if relocate:
            frec = out[8]
            # Affected detection from the record's (contiguous) partner
            # column: 4 bytes gathered per site instead of a 12-byte
            # flip_info row.
            pcol = frec[:, 5]
            t_of = jnp.where(site_tri >= 0, site_tri, 0)
            affected = (site_tri >= 0) & (pcol[t_of] >= 0)
            site_tri = _relocate_sites_chunked(
                pts,
                site_tri,
                affected,
                lambda t, q: _assign_flip_side_rec(frec, t, q),
                r_site,
            )
        # Progress = a flip executed OR the dirty set shrank (a cleaning
        # round rotates overflow rows into the next batch).  A round with
        # neither is a fixpoint: deterministic selection would repeat it
        # verbatim — the host falls back to the dense path.
        progress = any_flip | (
            jnp.sum(dirty.astype(jnp.int32)) < n_dirty0
        )
        return (
            tri_v, tri_n, cc, dirty, site_tri, it + 1, progress, n_flips,
            n_cands,
        )

    def cond(carry):
        *_, it, progress, _n_flips, _n_cands = carry
        dirty = carry[3]
        return jnp.any(dirty) & (it < cap) & progress

    (tri_v, tri_n, cc, dirty, site_tri, it, _, n_flips,
     n_cands) = jax.lax.while_loop(
        cond,
        body,
        (tri_v, tri_n, cc, dirty, site_tri, jnp.int32(0), True,
         jnp.int32(0), jnp.int32(0)),
    )
    return (
        tri_v, tri_n, cc, dirty, it,
        jnp.sum(dirty.astype(jnp.int32)), site_tri, n_flips, n_cands,
    )


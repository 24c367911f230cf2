"""Compensated predicate correctness (ops/robust.py), 2D and 3D.

Oracle: exact rational arithmetic (fractions.Fraction) on the float
inputs — floats convert to Fraction exactly, so the oracle sign is the
true sign of the determinant.  The double-single predicates must match
it in float32 even on adversarial near-degenerate inputs where plain
f32 (and marginally plain f64) evaluation flips signs.
"""

from fractions import Fraction

import numpy as np
import jax.numpy as jnp

from gsl_scattered_interpolation_tpu.ops import robust


def _orient3d_exact(a, b, c, d):
    m = [[Fraction(float(p[j])) - Fraction(float(d[j])) for j in range(3)]
         for p in (a, b, c)]
    return (
        m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
        - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
        + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
    )


def _insphere_exact(a, b, c, d, e):
    rows = []
    for p in (a, b, c, d):
        r = [Fraction(float(p[j])) - Fraction(float(e[j])) for j in range(3)]
        r.append(r[0] * r[0] + r[1] * r[1] + r[2] * r[2])
        rows.append(r)

    def det3(r0, r1, r2, cols):
        i, j, k = cols
        return (
            r0[i] * (r1[j] * r2[k] - r1[k] * r2[j])
            - r0[j] * (r1[i] * r2[k] - r1[k] * r2[i])
            + r0[k] * (r1[i] * r2[j] - r1[j] * r2[i])
        )

    # expansion along the lift column (Shewchuk convention, as
    # robust.insphere_ds)
    c3 = (0, 1, 2)
    det = (
        -rows[0][3] * det3(rows[1], rows[2], rows[3], c3)
        + rows[1][3] * det3(rows[0], rows[2], rows[3], c3)
        - rows[2][3] * det3(rows[0], rows[1], rows[3], c3)
        + rows[3][3] * det3(rows[0], rows[1], rows[2], c3)
    )
    return det


def _sgn(x):
    return int(x > 0) - int(x < 0)


class TestOrient3d:
    def test_random_matches_exact(self):
        rng = np.random.default_rng(0)
        P = rng.uniform(-0.5, 0.5, size=(256, 4, 3)).astype(np.float32)
        out = np.asarray(
            robust.orient3d_ds(
                jnp.asarray(P[:, 0]), jnp.asarray(P[:, 1]),
                jnp.asarray(P[:, 2]), jnp.asarray(P[:, 3]),
            )
        )
        for i in range(P.shape[0]):
            ex = _orient3d_exact(*P[i])
            assert _sgn(out[i]) == _sgn(ex), i

    def test_near_coplanar_signs(self):
        # coplanar quadruple with one coordinate nudged by +-k ulps: the
        # predicate must recover the exact sign where plain f32 cannot.
        rng = np.random.default_rng(1)
        base = rng.uniform(-0.5, 0.5, size=(128, 3, 3)).astype(np.float32)
        for k, nudge in enumerate((2.0**-22, -(2.0**-23), 2.0**-24, 0.0)):
            # d in the plane spanned by (a, b, c): d = a + s(b-a) + t(c-a)
            s, t = 0.375, 0.25  # exact in f32
            d = base[:, 0] + s * (base[:, 1] - base[:, 0]) + t * (
                base[:, 2] - base[:, 0]
            )
            d = d.astype(np.float32)
            d[:, 2] += np.float32(nudge)
            out = np.asarray(
                robust.orient3d_ds(
                    jnp.asarray(base[:, 0]), jnp.asarray(base[:, 1]),
                    jnp.asarray(base[:, 2]), jnp.asarray(d),
                )
            )
            for i in range(base.shape[0]):
                ex = _orient3d_exact(base[i, 0], base[i, 1], base[i, 2], d[i])
                assert _sgn(out[i]) == _sgn(ex), (k, i)


class TestInsphere3d:
    def test_random_matches_exact(self):
        rng = np.random.default_rng(2)
        P = rng.uniform(-0.5, 0.5, size=(256, 5, 3)).astype(np.float32)
        args = [jnp.asarray(P[:, k]) for k in range(5)]
        out = np.asarray(robust.insphere_ds(*args))
        for i in range(P.shape[0]):
            ex = _insphere_exact(*P[i])
            assert _sgn(out[i]) == _sgn(ex), i

    def test_near_cospherical_signs(self):
        # e on the circumsphere of a regular-ish tet, nudged radially by
        # +-k ulps of the coordinate scale.
        rng = np.random.default_rng(3)
        n = 128
        tet = np.asarray(
            [[0.3, 0.0, 0.0], [-0.3, 0.25, 0.0],
             [0.0, -0.25, 0.25], [0.0, 0.0, -0.3]], np.float32
        )
        # circumcenter/radius in f64
        A = 2 * (tet[1:] - tet[0])
        b = np.sum(tet[1:] ** 2 - tet[0] ** 2, axis=1)
        ctr = np.linalg.solve(A.astype(np.float64), b.astype(np.float64))
        rad = np.linalg.norm(tet[0].astype(np.float64) - ctr)
        dirs = rng.normal(size=(n, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        for nudge in (2.0**-22, -(2.0**-22), 2.0**-24, -(2.0**-24)):
            e = (ctr + (rad + nudge) * dirs).astype(np.float32)
            out = np.asarray(
                robust.insphere_ds(
                    *(jnp.asarray(np.broadcast_to(tet[k], (n, 3))).astype(
                        jnp.float32
                    ) for k in range(4)),
                    jnp.asarray(e),
                )
            )
            for i in range(n):
                ex = _insphere_exact(tet[0], tet[1], tet[2], tet[3], e[i])
                assert _sgn(out[i]) == _sgn(ex), (nudge, i)

    def test_sign_convention_matches_plain_det(self):
        # orientation-corrected verdicts must agree with the plain f64
        # determinant on well-conditioned input (same convention as
        # device_cavity._insphere_det).
        from gsl_scattered_interpolation_tpu.models import device_cavity as dc

        rng = np.random.default_rng(4)
        P = rng.uniform(-0.5, 0.5, size=(512, 5, 3))
        verts = jnp.asarray(P[:, :4])
        q = jnp.asarray(P[:, 4])
        plain = np.asarray(dc._insphere_det(verts, q))
        S = robust.insphere_ds(
            *(jnp.asarray(P[:, k]) for k in range(4)), q
        )
        O = robust.orient3d_ds(*(jnp.asarray(P[:, k]) for k in range(4)))
        ours = np.asarray(S * jnp.sign(O) > 0)
        assert (ours == plain).all()

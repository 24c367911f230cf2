"""3D scattered interpolation end-to-end: device cavity build + surface.

The reference plans arbitrary-dimension support (README:19) but its
flip-based restoration is incomplete for d >= 3; this demo drives the
parallel Bowyer-Watson device engine (models/device_cavity.py) through
the public facade, then reconstructs the sample boundary with the
alpha-shape module (README:30).

Run:  python examples/demo_3d.py
"""

# Runnable as a plain script from anywhere: put the repo root on sys.path.
import pathlib as _pl
import sys as _sys

_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import numpy as np

import gsl_scattered_interpolation_tpu as gsi
from gsl_scattered_interpolation_tpu.models import surface


def main():
    rng = np.random.default_rng(0)

    # volumetric scattered samples of a smooth field inside a ball
    n = 2_000
    pts = rng.normal(size=(n, 3))
    pts *= (rng.uniform(size=n) ** (1 / 3) / np.linalg.norm(pts, axis=1))[
        :, None
    ]
    f = lambda p: np.sin(2 * p[:, 0]) * p[:, 1] + np.cos(p[:, 2])
    vals = f(pts)

    si = gsi.ScatteredInterp(pts, vals)  # auto -> device cavity engine (d=3)
    print(f"engine={si.engine}, tets={si.tri.n_tris}")

    q = pts * 0.5  # interior probes
    pred = np.asarray(si.eval(q))
    err = np.abs(pred - f(q * 1.0))
    print(f"interior eval err: max={err.max():.2e} mean={err.mean():.2e}")

    grad = np.asarray(si.eval_deriv(q[:5]))
    print("sample gradients:", np.round(grad[:2], 3))

    faces, alpha = surface.reconstruct_surface(pts)
    v = len(np.unique(faces))
    e = len(
        {
            tuple(sorted((int(t[i]), int(t[(i + 1) % 3]))))
            for t in faces
            for i in range(3)
        }
    )
    # Connected components via union-find over shared edges: an alpha
    # shape of a noisy sample can enclose small interior bubbles, each a
    # watertight surface contributing 2 to the Euler characteristic.
    parent = {}

    def find(a):
        while parent.setdefault(a, a) != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    edge_face = {}
    for fi, t in enumerate(faces):
        for i in range(3):
            key = tuple(sorted((int(t[i]), int(t[(i + 1) % 3]))))
            if key in edge_face:
                parent[find(edge_face[key])] = find(fi)
            else:
                edge_face[key] = fi
    n_comp = len({find(fi) for fi in range(len(faces))})
    print(
        f"alpha-shape boundary (alpha={alpha:.3f}): {len(faces)} faces, "
        f"{n_comp} component(s), Euler V-E+F = {v - e + len(faces)} "
        f"(2 per watertight component)"
    )


if __name__ == "__main__":
    main()

"""The reference's flagship example, TPU-native.

Reproduces ``scattered_interp_example.c``'s scattered_data() flow
(:130-249): triangulate the 50-station Chicago weather dataset, evaluate a
100x100 temperature grid, and dump gnuplot-ready files.

Run:  python examples/scattered_weather.py [outdir]

Plot with gnuplot, as the reference suggests (:219-245):
  gnuplot> set view map; unset key
  gnuplot> splot 'plot.dat' with pm3d, 'lines.dat' w lines
"""

# Runnable as a plain script from anywhere: put the repo root on sys.path.
import pathlib as _pl
import sys as _sys

_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import pathlib
import sys
import time

import numpy as np

from gsl_scattered_interpolation_tpu import ScatteredInterp
from gsl_scattered_interpolation_tpu.models import host_tree as ht
from gsl_scattered_interpolation_tpu.utils import datasets, integrity


def main(outdir="/tmp/gsi_weather"):
    out = pathlib.Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    sites, temps = datasets.weather()

    t0 = time.perf_counter()
    si = ScatteredInterp(sites, temps, key=0)
    print(
        f"triangulated {si.n_sites} stations -> {si.n_simplexes} simplexes "
        f"in {time.perf_counter()-t0:.2f}s ({si.engine} engine)"
    )

    print("T(-88, 41) =", float(si.eval(np.array([[-88.0, 41.0]]))[0]), "K")

    lo = np.array([-89.6763, 40.9479])
    hi = np.array([-86.303, 43.20])
    n_grid = 100
    gx, gy = np.meshgrid(
        lo[0] + (hi[0] - lo[0]) / n_grid * np.arange(n_grid),
        lo[1] + (hi[1] - lo[1]) / n_grid * np.arange(n_grid),
        indexing="ij",
    )
    Q = np.stack([gx.ravel(), gy.ravel()], axis=-1)
    t0 = time.perf_counter()
    grid = np.asarray(si.eval(Q)).reshape(n_grid, n_grid)
    print(
        f"evaluated {Q.shape[0]} grid points in "
        f"{1e3*(time.perf_counter()-t0):.0f} ms; "
        f"range [{grid.min():.2f}, {grid.max():.2f}] K"
    )

    with open(out / "plot.dat", "w") as f:
        for i in range(n_grid):
            for j in range(n_grid):
                f.write(f"{gx[i, j]:g} {gy[i, j]:g} {grid[i, j]:g}\n")
            f.write("\n")

    # Triangulation dumps come from the host engine's integrity module.
    tree = ht.build(sites, key=0)
    integrity.output_triangulation(
        tree,
        response=temps,
        lines_path=out / "lines.dat",
        points_path=out / "points.dat",
        circles_path=out / "circles.dat",
    )
    print("wrote", sorted(p.name for p in out.iterdir()))


if __name__ == "__main__":
    main(*sys.argv[1:])

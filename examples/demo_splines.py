"""1D spline demos — the analogs of the reference's demo.c / demo2.c.

demo.c plots a natural cubic spline through scattered 1D knots; demo2.c
the periodic variant.  Output is x/y pairs suitable for gnuplot.

Run:  python examples/demo_splines.py > /tmp/spline.dat
      gnuplot> plot '/tmp/spline.dat' w lines
"""

# Runnable as a plain script from anywhere: put the repo root on sys.path.
import pathlib as _pl
import sys as _sys

_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))

import numpy as np

from gsl_scattered_interpolation_tpu import spline


def main():
    # demo.c-style data: a bumpy profile.
    x = np.array([0.0, 0.5, 1.8, 2.5, 3.4, 4.0, 5.1, 6.0])
    y = np.array([1.0, 0.6, 1.9, 0.1, 0.8, 1.4, 0.3, 1.0])

    sp = spline(x, y, "cspline")
    spp = spline(x, y, "cspline_periodic")  # y[0] == y[-1] here

    q = np.linspace(x[0], x[-1], 200)
    v = np.asarray(sp.eval(q))
    vp = np.asarray(spp.eval(q))
    for qi, vi, vpi in zip(q, v, vp):
        print(f"{qi:g} {vi:g} {vpi:g}")


if __name__ == "__main__":
    main()

"""ScatteredInterp: the gsl_interp-style facade over the Delaunay engines.

The reference README says its scattered interface is "converging to the
standard GSL interpolation interface" (README:9-11); this type completes
that convergence: construct once from sites+values (``simplex_tree_init``
analog), then evaluate batched (``find_leaf``+``interp_point`` analog) with
the same init/eval/eval_e shape as the 1D/2D families.

Engines:
  * ``"device"`` — the TPU-native parallel 2D build (models.device_delaunay);
  * ``"host"`` — the arbitrary-dimension Bowyer-Watson oracle
    (models.host_tree);
  * ``"auto"`` — device for d==2, host otherwise.

Evaluation always runs on device through the batched query path
(models.device_tri).  ``eval_deriv`` returns the piecewise-constant
gradient of the linear interpolant per containing simplex — an extension
the reference planned but never built (README:24 "error estimates" family).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import device_delaunay, device_tri, host_tree
from ..utils import errors

DEFAULT = host_tree.DEFAULT
NOSTANDARDIZE = host_tree.NOSTANDARDIZE
ISOSCALE = host_tree.ISOSCALE


class ScatteredInterp:
    """See module docstring.

    dtype: build-geometry precision.  ``None`` picks float64 on the CPU
    backend (GSL-parity) and float32 on TPU (the fast path; all build
    decisions run on compensated predicates, see README for the measured
    max/p999 eval-error table).  Pass ``"accurate"`` for float64 geometry
    everywhere — on TPU this routes the build through the host engine,
    trading build speed for f64-exact predicates.
    """

    name = "linear_simplex"
    min_size = 1

    def __init__(
        self,
        sites,
        values,
        lo=None,
        hi=None,
        flags: int = DEFAULT,
        key=None,
        engine: str = "auto",
        dtype=None,
        grid_res: int = 256,
    ):
        if dtype == "accurate":
            # Maximum-accuracy escape hatch: float64 geometry.  On the CPU
            # backend this is native; requesting it on TPU routes the
            # build through the host/CPU f64 path (TPU f64 LinAlg is
            # unimplemented and the cavity round program OOMs HBM at
            # compile), keeping device evaluation available via .tri.
            import jax

            dtype = jnp.float64
            if jax.devices()[0].platform != "cpu" and engine == "auto":
                engine = "host"
        elif dtype is None:
            # Platform-aware build dtype: float64 is the GSL-parity regime
            # on the CPU backend; on TPU f64 is software-emulated — the
            # cavity round program OOMs HBM at *compile* — so the device
            # default is float32 (build-path decisions run on compensated
            # predicates; measured 3D eval accuracy: see README's
            # max/p999 table — pass dtype="accurate" for f64 geometry).
            import jax

            dtype = (
                jnp.float64
                if jax.devices()[0].platform == "cpu"
                else jnp.float32
            )
        sites = np.asarray(sites, np.float64)
        values = np.asarray(values, np.float64)
        if sites.ndim != 2:
            raise errors.InvalidArgumentError("sites must be [n, d]")
        n, d = sites.shape
        if values.shape != (n,):
            raise errors.InvalidArgumentError(
                f"values shape {values.shape} != ({n},)"
            )
        if engine == "auto":
            engine = "device" if d == 2 else "cavity" if d == 3 else "host"
        self.engine = engine
        self.dim = d
        self.n_sites = n
        if engine in ("device", "cavity"):
            if engine == "device":
                self.tri, shuffle = device_delaunay.triangulate(
                    sites, lo=lo, hi=hi, flags=flags, key=key, dtype=dtype,
                    grid_res=grid_res,
                )
            else:
                # parallel Bowyer-Watson device engine (any d >= 2; the
                # TPU-native path for d == 3)
                from . import device_cavity

                self.tri, shuffle = device_cavity.triangulate(
                    sites, lo=lo, hi=hi, flags=flags, key=key, dtype=dtype,
                    grid_res=grid_res,
                )
            self.response = jnp.concatenate(
                [jnp.zeros(d + 1), jnp.asarray(values)[shuffle]]
            ).astype(self.tri.points_raw.dtype)
            self.shuffle = shuffle
            self.tree = None
        elif engine == "host":
            self.tree = host_tree.build(sites, lo=lo, hi=hi, flags=flags, key=key)
            self.tri = device_tri.freeze(self.tree, grid_res=grid_res)
            self.response = device_tri.reindex_response(self.tree, values)
            self.shuffle = self.tree.shuffle
        else:
            raise errors.InvalidArgumentError(f"unknown engine {engine!r}")
        self._cells = None

    # -- evaluation ------------------------------------------------------

    def _get_cells(self):
        """Lazily build the cell-candidate index for at-scale queries.

        Past the brute-force crossover the walk runs ~3 Mq/s where the
        cell index runs 10-15 Mq/s (r5 measurements); the index builds
        once (on device at scale — build_cell_index dispatch) and is
        cached on the instance.  Small triangulations return None and
        keep the pallas/dense fast path.
        """
        if (
            self._cells is None
            and self.dim in (2, 3)
            and self.tri.n_tris > device_tri.DENSE_LOCATE_MAX_TRIS
        ):
            self._cells = device_tri.build_cell_index(self.tri)
        return self._cells

    def _locate(self, q):
        cells = self._get_cells()
        if cells is not None:
            return device_tri.locate_cells(self.tri, cells, q)
        if self.tri.n_tris <= device_tri.DENSE_LOCATE_MAX_TRIS:
            return device_tri.locate_dense(self.tri, q)
        return device_tri.locate(self.tri, q)

    def eval(self, q, strict: bool = False):
        """Barycentric interpolation at [B, d] raw query points.

        Values fade to 0 toward/outside the data hull (cage-vertex zeros,
        linear_simplex.c:697-706); out-of-cage queries return 0, the
        graceful version of the reference's assert TODO (:344-347).
        """
        q = jnp.atleast_2d(jnp.asarray(q))
        vals = device_tri.interp(
            self.tri, self.response, q, cells=self._get_cells()
        )
        if strict:
            _, _, ok = self._locate(q)
            if not bool(jnp.all(ok)):
                raise errors.DomainError("query outside the cage domain")
        return vals

    def eval_e(self, q):
        q = jnp.atleast_2d(jnp.asarray(q))
        leaf, w, ok = self._locate(q)
        vals = jnp.where(
            ok,
            jnp.sum(w * self.response[self.tri.tri_verts[leaf]], axis=-1),
            0.0,
        )
        status = jnp.where(ok, errors.SUCCESS, errors.EDOM)
        return vals, status

    def eval_deriv(self, q):
        """Gradient [B, d] of the piecewise-linear interpolant.

        Constant per simplex: grad = sum_k r_k * grad(w_k), with the weight
        gradients read straight off the simplex's affine map rows.
        """
        q = jnp.atleast_2d(jnp.asarray(q))
        d = self.dim
        leaf, w, ok = self._locate(q)
        row = self.tri.affine[leaf]
        A = row[:, : d * d].reshape(-1, d, d)  # dcoords/dq
        r = self.response[self.tri.tri_verts[leaf]]  # [B, d+1]
        # w = [coords, 1 - sum(coords)] => dw/dq rows: A then -sum of A rows.
        # (elementwise, not einsum: TPU f32 matmuls run bf16 — CLAUDE.md)
        g = jnp.sum(r[:, :d, None] * A, axis=1) - r[:, d:] * jnp.sum(
            A, axis=1
        )
        return jnp.where(ok[:, None], g, 0.0)

    # -- introspection ---------------------------------------------------

    @property
    def n_simplexes(self) -> int:
        return int(self.tri.n_tris)

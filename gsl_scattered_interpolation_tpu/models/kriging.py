"""Ordinary kriging with variogram fitting and per-query error estimates.

The reference README plans "kriging interpolation" and "error estimates
on interpolated values" (README:24-25) but implements neither.  This
module provides both, TPU-first:

* **Empirical semivariogram**: all-pairs squared differences and
  distances in one broadcast (subsampled above ``max_pairs_sites``),
  binned by distance — a couple of segment-sum scatters.
* **Model fitting**: spherical / exponential / gaussian variogram models.
  For a candidate range the model is LINEAR in (nugget, sill), so fitting
  is a dense scan over a range grid with a closed-form 2x2
  weighted-least-squares solve per candidate — no iterative optimizer to
  babysit, fully jit-able, and the whole scan is one vectorized pass.
* **Prediction**: the ordinary-kriging saddle system
  ``[[Gamma, 1], [1^T, 0]] [w; mu] = [gamma(q); 1]`` is factorized ONCE
  (LU) and applied to all query right-hand sides as one batched
  triangular solve — per-query weights, predictions, and kriging
  variances ``sigma^2 = w . gamma(q) + mu`` come out of a single MXU pass.

Coordinates are standardized like the rest of the engine
(linear_simplex.c:187-198) so ranges are resolution-independent.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import rbf
from ..utils import config, errors

HIGHEST = jax.lax.Precision.HIGHEST


def _cpu_scope():
    """Context pinning eager ops to the host CPU backend when present.

    Variogram estimation is a tiny O(max_pairs_sites^2) procedure made of
    dozens of small eager ops; dispatched op-by-op to a remote TPU each
    op pays a fresh compile through the tunnel (measured: ~536s for one
    LocalKriging fit).  On the host CPU the whole thing is milliseconds.
    """
    try:
        return jax.default_device(jax.local_devices(backend="cpu")[0])
    except RuntimeError:  # no cpu backend registered: use the default
        import contextlib

        return contextlib.nullcontext()


def _vg_spherical(h, rng_):
    t = jnp.clip(h / rng_, 0.0, 1.0)
    return 1.5 * t - 0.5 * t**3


def _vg_exponential(h, rng_):
    return 1.0 - jnp.exp(-3.0 * h / rng_)


def _vg_gaussian(h, rng_):
    return 1.0 - jnp.exp(-3.0 * (h / rng_) ** 2)


VARIOGRAM_MODELS = {
    "spherical": _vg_spherical,
    "exponential": _vg_exponential,
    "gaussian": _vg_gaussian,
}


class Variogram(NamedTuple):
    model: str
    nugget: float
    sill: float      # partial sill (model amplitude above the nugget)
    range_: float

    def __call__(self, h):
        base = VARIOGRAM_MODELS[self.model](jnp.asarray(h), self.range_)
        return self.nugget * (jnp.asarray(h) > 0) + self.sill * base


def empirical_variogram(
    sites_std, values, n_bins: int = 15, max_pairs_sites: int = 2000, key=0
):
    """(bin_centers, gamma_hat, counts) from standardized sites.

    Above ``max_pairs_sites`` sites, the all-pairs pass runs on a random
    subsample (the estimate stays unbiased; only its variance grows).
    Subsampling is never silent: it is logged and recorded on the result
    via the OrdinaryKriging.variogram_subsampled attribute.

    Runs on the host CPU backend (see ``_cpu_scope``) — estimation is
    tiny and eager, and must not pay remote per-op compiles.
    """
    sites_std = np.asarray(sites_std)
    values = np.asarray(values)
    with _cpu_scope():
        sites_std = jnp.asarray(sites_std)
        values = jnp.asarray(values)
        n = sites_std.shape[0]
        if n > max_pairs_sites:
            config.log.info(
                "empirical_variogram: subsampling %d of %d sites for the "
                "all-pairs pass (raise max_pairs_sites to use more)",
                max_pairs_sites,
                n,
            )
            idx = jax.random.choice(
                jax.random.key(key), n, (max_pairs_sites,), replace=False
            )
            sites_std = sites_std[idx]
            values = values[idx]
            n = max_pairs_sites
        D = rbf.pairwise_dist(sites_std, sites_std)
        G = 0.5 * (values[:, None] - values[None, :]) ** 2
        iu = jnp.triu_indices(n, k=1)
        d = D[iu]
        g = G[iu]
        hmax = jnp.max(d) * 0.6  # conventional cutoff: short lags carry it
        edges = jnp.linspace(0.0, hmax, n_bins + 1)
        which = jnp.clip(
            jnp.searchsorted(edges, d, side="right") - 1, 0, n_bins - 1
        )
        valid = d <= hmax
        counts = jnp.zeros(n_bins).at[which].add(valid * 1.0)
        sums = jnp.zeros(n_bins).at[which].add(valid * g)
        centers = 0.5 * (edges[:-1] + edges[1:])
        gamma = jnp.where(
            counts > 0, sums / jnp.where(counts > 0, counts, 1), 0.0
        )
        return centers, gamma, counts


def fit_variogram(
    centers, gamma, counts, model: str = "spherical", n_ranges: int = 64
) -> Variogram:
    """Weighted LSQ fit; linear solve in (nugget, sill) per candidate range."""
    if model not in VARIOGRAM_MODELS:
        raise errors.InvalidArgumentError(
            f"unknown variogram model {model!r}"
        )
    centers = np.asarray(centers)
    gamma_np = np.asarray(gamma)
    counts = np.asarray(counts)
    with _cpu_scope():
        centers = jnp.asarray(centers)
        gamma = jnp.asarray(gamma_np)
        w = jnp.asarray(counts)
        vg = VARIOGRAM_MODELS[model]
        ranges = jnp.linspace(
            float(centers[1]), float(centers[-1]) * 1.5, n_ranges
        )

        def sse_for(rng_):
            basis = vg(centers, rng_)  # sill multiplier
            ones = jnp.ones_like(basis)
            # min over (nugget a, sill b): sum w (a + b*basis - gamma)^2
            A00 = jnp.sum(w * ones)
            A01 = jnp.sum(w * basis)
            A11 = jnp.sum(w * basis * basis)
            b0 = jnp.sum(w * gamma)
            b1 = jnp.sum(w * basis * gamma)
            det = A00 * A11 - A01 * A01
            a = (A11 * b0 - A01 * b1) / det
            b = (A00 * b1 - A01 * b0) / det
            a = jnp.maximum(a, 0.0)  # nugget >= 0
            b = jnp.maximum(b, 1e-12)  # positive partial sill
            sse = jnp.sum(w * (a + b * basis - gamma) ** 2)
            return sse, a, b

        sses, nuggets, sills = jax.vmap(sse_for)(ranges)
        i = int(jnp.argmin(sses))
        return Variogram(
            model=model,
            nugget=float(nuggets[i]),
            sill=float(sills[i]),
            range_=float(ranges[i]),
        )


class OrdinaryKriging:
    """Ordinary kriging predictor with per-query variance.

    Args:
      sites: [N, d] raw coords; values: [N].
      variogram: a fitted Variogram, or None to fit one automatically
        (empirical + weighted-LSQ over `model`).
    """

    def __init__(
        self,
        sites,
        values,
        variogram: Variogram | None = None,
        model: str = "spherical",
        standardize: bool = True,
    ):
        sites = np.asarray(sites, np.float64)
        values = np.asarray(values, np.float64)
        n, d = sites.shape
        if values.shape != (n,):
            raise errors.InvalidArgumentError("values shape mismatch")
        if standardize:
            lo, hi = sites.min(0), sites.max(0)
            self.shift = (lo + hi) / 2.0
            ext = hi - lo
            self.scale = np.where(ext > 0, 1.0 / np.where(ext > 0, ext, 1), 1.0)
        else:
            self.shift = np.zeros(d)
            self.scale = np.ones(d)
        self.xs = jnp.asarray(self.scale * (sites - self.shift))
        self.values = jnp.asarray(values)
        # Records whether the auto-fitted variogram saw a subsample (see
        # empirical_variogram's default max_pairs_sites); user-supplied
        # variograms are whatever the user fitted them on.
        self.variogram_subsampled = False
        if variogram is None:
            c, g, w = empirical_variogram(self.xs, self.values)
            self.variogram_subsampled = n > 2000
            variogram = fit_variogram(c, g, w, model=model)
        self.variogram = variogram

        # Factorize the (n+1) ordinary-kriging saddle matrix once.
        Gmat = self.variogram(rbf.pairwise_dist(self.xs, self.xs))
        ones = jnp.ones((n, 1), Gmat.dtype)
        K = jnp.block(
            [[Gmat, ones], [ones.T, jnp.zeros((1, 1), Gmat.dtype)]]
        )
        self._lu = jax.scipy.linalg.lu_factor(K)

    def predict(self, q):
        """(mean [B], variance [B]) at raw query points [B, d].

        One batched LU solve: weights + Lagrange multiplier per query, then
        pred = w.y and sigma^2 = w.gamma(q) + mu.
        """
        q = jnp.atleast_2d(jnp.asarray(q))
        qs = jnp.asarray(self.scale) * (q - jnp.asarray(self.shift))
        gq = self.variogram(rbf.pairwise_dist(qs, self.xs))  # [B, N]
        rhs = jnp.concatenate(
            [gq, jnp.ones((gq.shape[0], 1), gq.dtype)], axis=1
        )  # [B, N+1]
        sol = jax.scipy.linalg.lu_solve(self._lu, rhs.T).T  # [B, N+1]
        w = sol[:, :-1]
        mu = sol[:, -1]
        mean = jnp.matmul(w, self.values, precision=HIGHEST)
        var = jnp.sum(w * gq, axis=1) + mu
        return mean, jnp.maximum(var, 0.0)

    def eval(self, q):
        return self.predict(q)[0]


class LocalKriging:
    """Local-neighborhood ordinary kriging: error estimates at scale.

    ``OrdinaryKriging`` factorizes the dense (n+1) saddle system —
    O(n^3) work / O(n^2) memory, unusable past ~10k sites.  This is the
    production-geostatistics localization on the engine's cell-grid
    machinery (the rbf_pu pattern): sites are bucketed into a uniform
    grid; each query gathers its 3x3 cell neighborhood, selects the k
    nearest sites (lax.top_k), and solves its own (k+1) ordinary-kriging
    saddle system.  Chunks of queries solve as one batched
    partial-pivot elimination (rbf_pu._plu_solve_batched — exact f32 on
    TPU where batched LAPACK LU is bf16-corrupted), so predictions and
    kriging variances stream at O(queries * k^3) with O(chunk * k^2)
    memory, independent of n.

    Any d (the cell grid buckets in d dimensions; the neighborhood is
    the 3^d adjacent-cell block).  The variogram is fitted on a
    subsample exactly as OrdinaryKriging does (never silently: see
    ``variogram_subsampled``).  The fitted variogram floats ride as
    TRACED operands of the predict program, so one compiled program per
    (d, k, cap, model) serves every fitted model — refitting never
    recompiles.
    """

    def __init__(
        self,
        sites,
        values,
        variogram: Variogram | None = None,
        model: str = "spherical",
        k_neighbors: int = 24,
        standardize: bool = True,
        target_per_cell: float = 4.0,
        dtype=None,
    ):
        from . import rbf_compact

        sites = np.asarray(sites, np.float64)
        values = np.asarray(values, np.float64)
        n, d = sites.shape
        if values.shape != (n,):
            raise errors.InvalidArgumentError("values shape mismatch")
        if dtype is None:
            dtype = (
                jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
            )
        if standardize:
            lo, hi = sites.min(0), sites.max(0)
            self.shift = (lo + hi) / 2.0
            ext = hi - lo
            self.scale = np.where(
                ext > 0, 1.0 / np.where(ext > 0, ext, 1), 1.0
            )
        else:
            self.shift = np.zeros(d)
            self.scale = np.ones(d)
        xs_std = self.scale * (sites - self.shift)
        self.k = int(k_neighbors)
        self.variogram_subsampled = n > 2000
        if variogram is None:
            c, g, w = empirical_variogram(
                jnp.asarray(xs_std), jnp.asarray(values)
            )
            variogram = fit_variogram(c, g, w, model=model)
        self.variogram = variogram
        # Cell size: ~target_per_cell sites/cell, so the 3^d neighborhood
        # holds ~3^d*target >= k candidates with margin.
        rho = float((target_per_cell / max(n, 1)) ** (1.0 / d))
        self.grid = rbf_compact.build_cell_grid(xs_std, rho)
        self.grid = self.grid._replace(
            xs_pad=self.grid.xs_pad.astype(dtype)
        )
        self.v_pad = rbf_compact.pack_values(
            self.grid, jnp.asarray(values, dtype)
        )
        self.dtype = dtype

    def predict(self, q, chunk: int = 4096):
        """(mean [B], variance [B]) at raw query points [B, d]."""
        q = jnp.atleast_2d(jnp.asarray(q, self.dtype))
        qs = (
            jnp.asarray(self.scale, self.dtype)
            * (q - jnp.asarray(self.shift, self.dtype))
        )
        B = qs.shape[0]
        *G, cap, d = self.grid.xs_pad.shape
        Gs = tuple(int(g) for g in G)
        n_cells = int(np.prod(Gs))
        vg = self.variogram
        args = (
            self.grid.xs_pad.reshape(n_cells, cap, d),
            self.v_pad.reshape(n_cells, cap),
            jnp.asarray(self.grid.cell_size, self.dtype),
            jnp.asarray(self.grid.origin, self.dtype),
        )
        vparams = (
            jnp.asarray(vg.nugget, self.dtype),
            jnp.asarray(vg.sill, self.dtype),
            jnp.asarray(vg.range_, self.dtype),
        )
        if B <= chunk:
            return _local_predict(
                *args, qs, *vparams, Gs=Gs, k=self.k, model=vg.model
            )
        means, vars_ = [], []
        pad = (-B) % chunk
        qs_p = jnp.concatenate(
            [qs, jnp.zeros((pad, qs.shape[1]), qs.dtype)]
        )
        for i in range(0, B + pad, chunk):
            m, v = _local_predict(
                *args, qs_p[i : i + chunk], *vparams,
                Gs=Gs, k=self.k, model=vg.model,
            )
            means.append(m)
            vars_.append(v)
        return (
            jnp.concatenate(means)[:B],
            jnp.concatenate(vars_)[:B],
        )

    def eval(self, q):
        return self.predict(q)[0]


@functools.partial(jax.jit, static_argnames=("Gs", "k", "model"))
def _local_predict(
    xs_flat, v_flat, cell, origin, qs, nugget, sill, range_, *, Gs, k,
    model,
):
    """One chunk of local-kriging predictions (grid arrays as jit args).

    The variogram's fitted floats are TRACED operands: one compiled
    program per (Gs, cap, k, model) serves every fitted model — under
    the axon tunnel each extra program costs seconds, so a per-fit
    recompile would dominate small workloads.  The cell grid also rides
    as arguments so remote-compile requests stay small.  Any d: the
    neighborhood is the 3^d adjacent-cell block.
    """
    import itertools

    from . import rbf_pu

    vgf = VARIOGRAM_MODELS[model]

    def vg(h):
        return nugget * (h > 0) + sill * vgf(h, range_)

    cap = xs_flat.shape[1]
    d = qs.shape[1]
    dtype = qs.dtype
    ij = jnp.floor((qs - origin) / cell).astype(jnp.int32)
    ax = [jnp.clip(ij[:, a], 0, Gs[a] - 1) for a in range(d)]
    xs_parts, v_parts, ok_parts = [], [], []
    for offs in itertools.product((-1, 0, 1), repeat=d):
        na = [ax[a] + offs[a] for a in range(d)]
        inb = jnp.ones_like(na[0], bool)
        idx = jnp.zeros_like(na[0])
        for a in range(d):
            inb = inb & (na[a] >= 0) & (na[a] < Gs[a])
            idx = idx * Gs[a] + jnp.clip(na[a], 0, Gs[a] - 1)
        idx = jnp.where(inb, idx, 0)
        xs_parts.append(xs_flat[idx])               # [B, cap, d]
        v_parts.append(v_flat[idx])
        ok_parts.append(
            jnp.broadcast_to(inb[:, None], (inb.shape[0], cap))
        )
    xc = jnp.concatenate(xs_parts, axis=1)              # [B, 3^d*cap, d]
    vc = jnp.concatenate(v_parts, axis=1)
    ok = jnp.concatenate(ok_parts, axis=1)
    ok = ok & jnp.all(jnp.abs(xc) < 1e6, axis=-1)       # poison pads

    kk = min(k, 3**d * cap)
    d2 = jnp.sum((xc - qs[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(ok, d2, jnp.inf)
    _, sel = jax.lax.top_k(-d2, kk)                     # [B, kk] nearest
    xk = jnp.take_along_axis(xc, sel[..., None], axis=1)
    vk = jnp.take_along_axis(vc, sel, axis=1)
    okk = jnp.take_along_axis(ok, sel, axis=1)
    # saddle system [[Gamma, e], [e^T, 0]]; pad slots get identity
    # rows/cols and drop out of the unbiasedness constraint.
    diff = xk[:, :, None, :] - xk[:, None, :, :]
    h = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
    G = vg(h).astype(dtype)                             # [B, kk, kk]
    pair_ok = okk[:, :, None] & okk[:, None, :]
    eye = jnp.eye(kk, dtype=dtype)
    G = jnp.where(pair_ok, G, eye[None])
    e = okk.astype(dtype)
    B = qs.shape[0]
    K = jnp.concatenate(
        [
            jnp.concatenate([G, e[:, :, None]], axis=2),
            jnp.concatenate(
                [e[:, None, :], jnp.zeros((B, 1, 1), dtype)], axis=2
            ),
        ],
        axis=1,
    )                                                   # [B, kk+1, kk+1]
    hq = jnp.sqrt(
        jnp.maximum(jnp.sum((xk - qs[:, None, :]) ** 2, -1), 0.0)
    )
    gq = jnp.where(okk, vg(hq).astype(dtype), 0.0)
    rhs = jnp.concatenate([gq, jnp.ones((B, 1), dtype)], axis=1)
    sol = rbf_pu._plu_solve_batched(K, rhs)             # [B, kk+1]
    w = sol[:, :-1]
    mu = sol[:, -1]
    mean = jnp.sum(w * jnp.where(okk, vk, 0.0), axis=1)
    var = jnp.sum(w * gq, axis=1) + mu
    return mean, jnp.maximum(var, 0.0)

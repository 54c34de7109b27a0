"""External physics-parameter generators for domain randomization.

Parity target: the reference's `actor_params_generator` hook
(isaacgymenvs/tasks/base/vec_task.py:734-744 + get_actor_params_info
:568-608): "freedom to generate samples from arbitrary distributions,
e.g. use full-covariance distributions instead of the DR's default of
treating each simulation parameter independently" (NPDR / BayesSim
posterior sampling).

TPU-native contract: a generator is a PURE callable `(key, n) -> (n, P)`
jnp array, traced into the jitted reset -- no host callback per reset.
`P = DomainRandomizer.num_extern_params()` and the slice layout is
`DomainRandomizer.param_info()`. Values are perturbation factors/offsets
under each spec's `operation` (scaling|additive), i.e. they replace the
engine's independent uniform/loguniform/gaussian draw, not the absolute
property value (documented divergence: our DR composes with base Model
leaves instead of overwriting engine property objects).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class FullCovarianceParamGenerator:
    """Gaussian with full covariance over the flat param vector -- the
    exact use-case the reference hook names (BayesSim/NPDR posteriors).

    mean: (P,) vector; cov: (P, P) PSD matrix (or chol: (P, P) lower
    Cholesky factor directly). Optional lo/hi clip vectors keep samples
    inside physical bounds (e.g. from param_info()'s YAML ranges).
    """

    def __init__(self, mean, cov=None, chol=None, lo=None, hi=None):
        self.mean = jnp.asarray(mean, jnp.float32)
        if chol is None:
            if cov is None:
                raise ValueError("need cov or chol")
            cov = np.asarray(cov, np.float64)
            try:
                chol = np.linalg.cholesky(cov)
            except np.linalg.LinAlgError:
                # positive SEMI-definite covariances (degenerate posteriors,
                # zero-variance dims) get an eigen factor F with F F^T = cov
                w, v = np.linalg.eigh(cov)
                chol = v * np.sqrt(np.clip(w, 0.0, None))
        self.chol = jnp.asarray(chol, jnp.float32)
        self.lo = None if lo is None else jnp.asarray(lo, jnp.float32)
        self.hi = None if hi is None else jnp.asarray(hi, jnp.float32)

    def __call__(self, key, n: int):
        z = jax.random.normal(key, (n, self.mean.shape[0]))
        x = self.mean[None, :] + z @ self.chol.T
        if self.lo is not None:
            x = jnp.maximum(x, self.lo[None, :])
        if self.hi is not None:
            x = jnp.minimum(x, self.hi[None, :])
        return x


class MixtureParamGenerator:
    """Mixture of full-covariance Gaussians (BayesSim's MDN posteriors
    are exactly this shape): weights (K,), means (K, P), chols (K, P, P)."""

    def __init__(self, weights, means, chols, lo=None, hi=None):
        w = jnp.asarray(weights, jnp.float32)
        self.log_w = jnp.log(w / jnp.sum(w))
        self.means = jnp.asarray(means, jnp.float32)
        self.chols = jnp.asarray(chols, jnp.float32)
        self.lo = None if lo is None else jnp.asarray(lo, jnp.float32)
        self.hi = None if hi is None else jnp.asarray(hi, jnp.float32)

    def __call__(self, key, n: int):
        kc, kz = jax.random.split(key)
        comp = jax.random.categorical(kc, self.log_w, shape=(n,))
        z = jax.random.normal(kz, (n, self.means.shape[1]))
        mean = self.means[comp]  # (n, P)
        chol = self.chols[comp]  # (n, P, P)
        x = mean + jnp.einsum("npq,nq->np", chol, z)
        if self.lo is not None:
            x = jnp.maximum(x, self.lo[None, :])
        if self.hi is not None:
            x = jnp.minimum(x, self.hi[None, :])
        return x

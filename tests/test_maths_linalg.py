"""solve_spd (trace-time-unrolled Cholesky) vs numpy reference."""
import numpy as np
import jax.numpy as jnp

from dwbc_tpu.core import maths


def test_solve_spd_matches_numpy():
    rng = np.random.default_rng(0)
    for n in (3, 6):
        A = rng.normal(size=(n, n))
        A = A @ A.T + n * np.eye(n)
        b = rng.normal(size=(n,))
        B = rng.normal(size=(n, 2))
        x = maths.solve_spd(jnp.asarray(A), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                                   rtol=1e-5, atol=1e-5)
        X = maths.solve_spd(jnp.asarray(A), jnp.asarray(B))
        np.testing.assert_allclose(np.asarray(X), np.linalg.solve(A, B),
                                   rtol=1e-5, atol=1e-5)

"""Interpret-mode parity of the Pallas contact kernel vs the XLA-fused
law — the never-skipped test the Pallas design record demands
(ops/PALLAS_DESIGN.md "what would bring Pallas back"; VERDICT r4 item 4).
Both paths call the SAME `sim/contact.fused_terrain_law`, so this test
checks the pallas_call plumbing (stacking, blocking, broadcast columns),
not a re-derived physics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dwbc_tpu.ops.contact_pallas import pallas_terrain_contact
from dwbc_tpu.sim import contact as contact_mod
from dwbc_tpu.sim.contact import ContactParams


def _random_scene(key, ng=13, nb=5, n=256):
    ks = jax.random.split(key, 12)
    # positions straddling the surface so ~half the geoms are active
    gp = tuple(jax.random.normal(ks[k], (ng, n)) * 0.3 for k in range(3))
    gv = tuple(jax.random.normal(ks[3 + k], (ng, n)) for k in range(3))
    fprev = tuple(jnp.abs(jax.random.normal(ks[6 + k], (ng, n))) * 5.0
                  for k in range(3))
    # smooth-ish random tangent planes with upward normals
    nx = 0.3 * jax.random.normal(ks[9], (ng, n))
    ny = 0.3 * jax.random.normal(ks[10], (ng, n))
    inv = jax.lax.rsqrt(nx * nx + ny * ny + 1.0)
    nrm = (nx * inv, ny * inv, inv)
    h_a = 0.1 * jax.random.normal(ks[11], (ng, n))
    cache = (h_a, nrm, gp[0] - 0.01, gp[1] + 0.02)
    friction = jnp.linspace(0.4, 2.5, n)
    rng = np.random.default_rng(0)
    body = np.sort(rng.integers(0, nb, ng))
    E = np.zeros((nb, ng), np.float32)
    E[body, np.arange(ng)] = 1.0
    m_solo = rng.uniform(0.3, 2.0, ng).astype(np.float32)
    w = np.zeros((ng, 3, 3), np.float32)
    for g in range(ng):
        a = rng.normal(size=(3, 3)).astype(np.float32) * 0.3
        w[g] = a @ a.T + np.eye(3) / m_solo[g]
    gc = dict(
        radius=jnp.asarray(rng.uniform(0.01, 0.05, ng),
                           jnp.float32)[:, None],
        m_solo=jnp.asarray(m_solo)[:, None],
        m_body=jnp.asarray(rng.uniform(1.0, 8.0, ng),
                           jnp.float32)[:, None],
        W=dict(xx=jnp.asarray(w[:, 0, 0])[:, None],
               yy=jnp.asarray(w[:, 1, 1])[:, None],
               zz=jnp.asarray(w[:, 2, 2])[:, None],
               xy=jnp.asarray(w[:, 0, 1])[:, None],
               xz=jnp.asarray(w[:, 0, 2])[:, None],
               yz=jnp.asarray(w[:, 1, 2])[:, None]),
        E=jnp.asarray(E))
    return gp, gv, cache, fprev, friction, gc


@pytest.mark.parametrize("n", [256, 2048 + 256])  # single and multi block
def test_pallas_contact_matches_xla_law(n):
    cp = ContactParams(dt=0.005)
    gp, gv, cache, fprev, friction, gc = _random_scene(
        jax.random.PRNGKey(0), n=n)
    ref = contact_mod.fused_terrain_law(gp, gv, cache, fprev, friction,
                                        gc, cp, 0.005)
    out = pallas_terrain_contact(gp, gv, cache, fprev, friction, gc,
                                 cp, 0.005, interpret=True)
    for k in range(3):
        np.testing.assert_allclose(np.asarray(out[0][k]),
                                   np.asarray(ref[0][k]),
                                   rtol=1e-5, atol=5e-5)
        np.testing.assert_allclose(np.asarray(out[1][k]),
                                   np.asarray(ref[1][k]),
                                   rtol=1e-5, atol=5e-5)
    np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(ref[2]))
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(ref[3]),
                               rtol=1e-6)
    # sanity: the scene exercises both branches
    act = np.asarray(ref[2])
    assert 0.05 < act.mean() < 0.95

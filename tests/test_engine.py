"""Physics engine integration tests: terrain queries, contact stability,
full-robot settling — the behaviors the reference gets from PhysX."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dwbc_tpu.core import urdf
from dwbc_tpu.core.model import free_body_model
from dwbc_tpu.sim import dynamics, engine
from dwbc_tpu.terrain import terrain as terr

DEFAULT_POSE = jnp.array(
    [-0.1, 0.8, -1.5, 0.1, 0.8, -1.5, -0.1, 0.8, -1.5, 0.1, 0.8, -1.5]
    + [0.0] * 6 + [0.024, -0.024]
)


@pytest.fixture(scope="module")
def widow_model():
    return urdf.load_urdf(urdf.WIDOW_GO1_URDF,
                          dof_order=urdf.WIDOW_GO1_DOF_ORDER, armature=0.01)


class TestTerrain:
    def test_flat_plane(self):
        hf = terr.flat_plane(10.0, 0.5)
        assert float(hf.sample(jnp.float32(1.3), jnp.float32(-2.7))) == 0.0
        n = hf.normal(jnp.float32(0.0), jnp.float32(0.0))
        np.testing.assert_allclose(np.asarray(n), [0, 0, 1], atol=1e-6)

    def test_perlin_stats(self):
        cfg = terr.PerlinTerrainCfg(tot_cols=400, tot_rows=400, z_scale=0.15)
        hf = terr.perlin_terrain(cfg)
        h = np.asarray(hf.height)
        interior = h[: cfg.tot_cols // 2 - 100, :]
        assert interior.std() < 0.15  # bounded roughness
        # wall fencing applied
        assert h[-1, 0] > 1000.0

    def test_grid_terrain(self):
        cfg = terr.GridTerrainCfg(num_rows=2, num_cols=7, border_size=2.0,
                                  terrain_length=4.0, terrain_width=4.0,
                                  terrain_proportions=(0.15, 0.15, 0.15, 0.15,
                                                       0.15, 0.1, 0.1))
        gt = terr.grid_terrain(cfg)
        assert gt.env_origins.shape == (2, 7, 3)
        assert np.all(np.isfinite(np.asarray(gt.hf.height)))

    def test_bilinear_interp(self):
        hf = terr.Heightfield(
            height=jnp.array([[0.0, 0.0], [1.0, 1.0]]), cell=1.0,
            origin=(0.0, 0.0))
        h = hf.sample(jnp.float32(0.5), jnp.float32(0.4))
        np.testing.assert_allclose(float(h), 0.5, atol=1e-6)


class TestContactStability:
    def test_box_drop_rests(self):
        """A dropped box must come to rest on the plane without bouncing
        (restitution 0) or sinking."""
        m = free_body_model("box", 1.0, (0.05, 0.05, 0.05))
        hf = terr.flat_plane(5.0, 0.5)
        params = engine.SimParams()
        q0 = jnp.zeros(7).at[6].set(1.0).at[2].set(0.3)
        ctx = engine.build_ctx(m, q0)
        inert = dynamics.default_inertial(m)

        def substep(state, _):
            state, con = engine.physics_substep(
                m, params, hf, inert, jnp.float32(1.0), state,
                jnp.zeros(0), ctx)
            return state, state.q[2]

        state, zs = jax.lax.scan(
            substep, engine.BodyState(q=q0, qd=jnp.zeros(6)), None, length=400)
        zs = np.asarray(zs)
        assert np.all(np.isfinite(zs))
        # rests near half-extent height, never bounces above drop height
        assert abs(zs[-1] - 0.05) < 0.02, zs[-1]
        assert zs.max() <= 0.301
        assert abs(float(state.qd[2])) < 0.05

    def test_friction_holds_on_slope(self):
        """High-friction box on a 20 deg slope must stick; frictionless
        must slide."""
        m = free_body_model("box", 1.0, (0.05, 0.05, 0.05))
        slope = 0.36  # tan ~ 0.38 > 0 => slides without friction
        n = 41
        x = np.arange(n) * 0.25 - 5.0  # world x; h=0 at spawn point x=0
        hf = terr.Heightfield(
            height=jnp.asarray(np.tile(x[:, None] * slope, (1, n)), jnp.float32),
            cell=0.25, origin=(-5.0, -5.0))
        params = engine.SimParams()
        # gentle placement at the surface: a hard drop legitimately tumbles
        # on this slope (energy gain per roll exceeds the tipping barrier)
        q0 = jnp.zeros(7).at[6].set(1.0).at[2].set(0.052)
        ctx = engine.build_ctx(m, q0)
        inert = dynamics.default_inertial(m)

        def run(mu):
            def substep(state, _):
                state, _ = engine.physics_substep(
                    m, params, hf, inert, jnp.float32(mu), state,
                    jnp.zeros(0), ctx)
                return state, None
            state, _ = jax.lax.scan(
                substep, engine.BodyState(q=q0, qd=jnp.zeros(6)), None,
                length=600)
            return float(jnp.linalg.norm(state.q[0:2]))

        assert run(1.0) < 0.1          # sticks
        assert run(0.02) > 0.3         # slides downhill


class TestRobotSettling:
    def test_widowgo1_stands(self, widow_model):
        """Drop from spawn height under PD hold: must settle standing,
        level, at a plausible height — the reference's implicit 'it works
        in the viewer' check, made quantitative."""
        m = widow_model
        hf = terr.flat_plane(10.0, 0.5)
        params = engine.SimParams()
        q0 = jnp.zeros(m.nq).at[6].set(1.0).at[2].set(0.42).at[7:].set(DEFAULT_POSE)
        ctx = engine.build_ctx(m, q0)
        inert = dynamics.default_inertial(m)
        kp = jnp.array([50.0] * 12 + [5.0] * 6 + [0.0] * 2)
        kd = jnp.array([1.0] * 12 + [0.5] * 6 + [0.0] * 2)

        def substep(state, _):
            tau = kp * (DEFAULT_POSE - state.q[7:]) - kd * state.qd[6:]
            state, con = engine.physics_substep(
                m, params, hf, inert, jnp.float32(1.0), state, tau, ctx)
            return state, jnp.sum(con.geom_force[:, 2])

        state, fz = jax.lax.scan(
            substep, engine.BodyState(q=q0, qd=jnp.zeros(m.nv)), None,
            length=600)  # 3 s
        assert np.all(np.isfinite(np.asarray(state.q)))
        z = float(state.q[2])
        assert 0.24 < z < 0.35, z
        # level orientation: quat close to identity
        assert abs(float(state.q[6])) > 0.99
        # supported: mean vertical contact force near weight
        mean_fz = float(jnp.mean(fz[-100:]))
        weight = m.total_mass() * 9.81
        assert abs(mean_fz - weight) < 0.3 * weight, (mean_fz, weight)
        # arm sags under gravity at kp=5 (~0.55 rad at the shoulder) but
        # must stay bounded
        assert float(jnp.abs(state.q[7 + 12:7 + 18]).max()) < 0.8

    def test_batched_step_shapes(self, widow_model):
        m = widow_model
        hf = terr.flat_plane(10.0, 0.5)
        q0 = jnp.zeros(m.nq).at[6].set(1.0).at[2].set(0.42).at[7:].set(DEFAULT_POSE)
        step = engine.make_batched_step(m, engine.SimParams(), hf, q0)
        N = 4
        state = engine.BodyState(
            q=jnp.tile(q0[None], (N, 1)), qd=jnp.zeros((N, m.nv)))
        inert = jax.tree.map(lambda x: jnp.tile(x[None], (N,) + (1,) * x.ndim),
                             dynamics.default_inertial(m))
        out, con = step(state, jnp.zeros((N, m.nj)), inert, jnp.ones(N))
        assert out.q.shape == (N, m.nq)
        assert con.body_wrench.shape == (N, m.nb, 6)

"""Pallas TPU kernel wrapping the production contact law.

This is the re-entry form promised by ops/PALLAS_DESIGN.md: a *small,
stable* kernel whose body CALLS the shared law
(`sim/contact.fused_terrain_law`) — not a re-derivation — so there is no
physics fork to diverge. The hypothesis it tests (VERDICT r4 item 4): the
fused XLA collect path is launch-structure-bound (~150 small fusions per
substep, ~10 us each); executing the whole per-geom impulse chain as ONE
`pallas_call` with VMEM-resident intermediates removes that block's share
of the launch overhead.

Activation: `DWBC_PALLAS_CONTACT=1` switches `sim/fused.py`'s substep to
this path. The default stays with the XLA-fused law unless bench.py
records a win (the design doc's bar); either way both measurements are
retained in the bench JSON.

Layout: the law's 3-vectors are stacked into (3, ng, N) arrays so the
kernel takes 5 tensor operands instead of 15; the env axis N is blocked
(lane axis, 128-aligned), the geom axis ng rides the sublane axis (padded
to 8 by Mosaic). Static geom constants — (ng, 1) broadcasting columns and
the (nb, ng) one-hot incidence — are passed whole to every block.

Reference class being modeled: PhysX TGS, legged_robot_config.py:190-192.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..sim import contact as contact_mod


def _cdiv(a, b):
    return -(-a // b)


def _kernel(gp_ref, gv_ref, fprev_ref, nrm_ref, haxy_ref, fric_ref,
            rmm_ref, w6_ref, e_ref, out_ref, *, cp, dt):
    """One env-block of the shared impulse law. All loads/stores are
    whole-block; every intermediate lives in VMEM/registers."""
    gp = tuple(gp_ref[k] for k in range(3))
    gv = tuple(gv_ref[k] for k in range(3))
    fprev = tuple(fprev_ref[k] for k in range(3))
    nrm = tuple(nrm_ref[k] for k in range(3))
    h_a, ax, ay = haxy_ref[0], haxy_ref[1], haxy_ref[2]
    friction = fric_ref[0]                       # (BN,)
    gc = dict(
        radius=rmm_ref[0], m_solo=rmm_ref[1], m_body=rmm_ref[2],
        W=dict(xx=w6_ref[0], yy=w6_ref[1], zz=w6_ref[2],
               xy=w6_ref[3], xz=w6_ref[4], yz=w6_ref[5]),
        E=e_ref[...])
    gF, cf_new, active, share_f = contact_mod.fused_terrain_law(
        gp, gv, (h_a, nrm, ax, ay), fprev, friction, gc, cp, dt)
    for k in range(3):
        out_ref[k] = gF[k]
        out_ref[3 + k] = cf_new[k]
    out_ref[6] = share_f
    out_ref[7] = active.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cp", "dt", "interpret"))
def _call(gp_s, gv_s, fprev_s, nrm_s, haxy_s, fric2, rmm, w6, E,
          cp, dt, interpret=False):
    _, ng, n = gp_s.shape
    bn = int(os.environ.get("DWBC_PALLAS_BN", "0")) or min(n, 2048)
    grid = (_cdiv(n, bn),)
    # The law's intermediates live on Mosaic's scoped-VMEM stack, which
    # defaults to 16 MB — the full impulse chain at bn=2048 needs ~32 MB
    # (measured: the default limit rejected the train-step compile while
    # the identical collect-only bench graph fit). v5e has 128 MB VMEM;
    # grant the kernel what it actually uses, with block double-buffering
    # headroom on top.
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def stk(i):
        return pl.BlockSpec((3, ng, bn), lambda g: (0, 0, g),
                            memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(shape,
                            index_map=lambda g: (0,) * len(shape),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, cp=cp, dt=dt),
        out_shape=jax.ShapeDtypeStruct((8, ng, n), jnp.float32),
        grid=grid,
        in_specs=[stk(0), stk(1), stk(2), stk(3), stk(4),
                  pl.BlockSpec((1, bn), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
                  const((3, ng, 1)), const((6, ng, 1)),
                  const(E.shape)],
        out_specs=pl.BlockSpec((8, ng, bn), lambda g: (0, 0, g),
                               memory_space=pltpu.VMEM),
        compiler_params=params,
        interpret=interpret,
    )(gp_s, gv_s, fprev_s, nrm_s, haxy_s, fric2, rmm, w6, E)
    return out


def pallas_terrain_contact(gp, gv, terrain_cache, fprev, friction, gc,
                           cp, dt, interpret=False):
    """Drop-in replacement for `contact.fused_terrain_law` (same
    signature + optional interpret flag for the CPU parity test)."""
    h_a, nrm, ax, ay = terrain_cache
    ng = h_a.shape[0]
    n = gp[0].shape[-1]
    b = lambda x: jnp.broadcast_to(x, (ng, n)).astype(jnp.float32)
    gp_s = jnp.stack([b(gp[k]) for k in range(3)])
    gv_s = jnp.stack([b(gv[k]) for k in range(3)])
    fprev_s = jnp.stack([b(fprev[k]) for k in range(3)])
    nrm_s = jnp.stack([b(nrm[k]) for k in range(3)])
    haxy_s = jnp.stack([b(h_a), b(ax), b(ay)])
    fric2 = jnp.broadcast_to(jnp.asarray(friction, jnp.float32),
                             (1, n))
    rmm = jnp.stack([gc["radius"], gc["m_solo"], gc["m_body"]])
    w6 = jnp.stack([gc["W"][k] for k in
                    ("xx", "yy", "zz", "xy", "xz", "yz")])
    out = _call(gp_s, gv_s, fprev_s, nrm_s, haxy_s, fric2, rmm, w6,
                gc["E"], cp, dt, interpret=interpret)
    gF = tuple(out[k] for k in range(3))
    cf_new = tuple(out[3 + k] for k in range(3))
    share_f = out[6]
    active = out[7] > 0.5
    return gF, cf_new, active, share_f

"""Native C++ terrain library vs the numpy reference implementation."""

import numpy as np
import pytest

from dwbc_tpu import native
from dwbc_tpu.terrain import terrain as terr


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native lib unavailable (no toolchain)")


def test_fractal_noise_statistics_match_numpy(lib_ok):
    """Same algorithm, different RNG stream: distributions must agree."""
    h = native.fractal_noise(240, 400, 60, 100, 0.15, seed=7)
    rng = np.random.default_rng(7)
    ref = terr.fractal_noise(rng, 6, 10, 240, 400, 0.15)
    assert h.shape == ref.shape
    # octave normalization puts octave sums in a tight band; mean/std are
    # seed-independent to ~2%
    assert abs(float(h.mean()) - float(ref.mean())) < 0.01
    assert abs(float(h.std()) - float(ref.std())) < 0.005
    assert h.min() >= 0.0 and h.max() <= 0.15 * 1.25 * 1.1


def test_fractal_noise_deterministic(lib_ok):
    a = native.fractal_noise(120, 200, 30, 50, 0.1, seed=11)
    b = native.fractal_noise(120, 200, 30, 50, 0.1, seed=11)
    c = native.fractal_noise(120, 200, 30, 50, 0.1, seed=12)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_trimesh_native_matches_numpy_fallback(lib_ok):
    h = np.arange(20, dtype=np.float32).reshape(4, 5) * 0.01
    vn, tn = native.heightfield_to_trimesh(h, 0.1, (-1.0, 2.0))
    # force the numpy path
    lib, native._lib = native._lib, None
    failed = native._load_failed
    native._load_failed = True
    try:
        vf, tf = native.heightfield_to_trimesh(h, 0.1, (-1.0, 2.0))
    finally:
        native._lib, native._load_failed = lib, failed
    np.testing.assert_allclose(vn, vf)
    np.testing.assert_array_equal(tn, tf)


def test_perlin_terrain_uses_native_and_is_fenced(lib_ok):
    cfg = terr.PerlinTerrainCfg(tot_cols=400, tot_rows=800, z_scale=0.12,
                                seed=5)
    hf = terr.perlin_terrain(cfg)
    h = np.asarray(hf.height)
    # wall fencing (+1e5 on the far half of axis 0, reference terrain.py:49)
    assert (h[cfg.tot_cols // 2 - 100:, :] > 1e4).all()
    inner = h[: cfg.tot_cols // 2 - 100, :]
    assert inner.max() < 0.25 and inner.min() >= 0.0


def test_heightfield_to_trimesh_export():
    hf = terr.flat_plane(2.0, 1.0)
    v, t = terr.heightfield_to_trimesh(hf)
    H, W = np.asarray(hf.height).shape
    assert v.shape == (H * W, 3)
    assert t.shape == (2 * (H - 1) * (W - 1), 3)
    assert (v[:, 2] == 0).all()

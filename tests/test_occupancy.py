"""Occupancy-grid ESS: grid building, ray probing, and equality of the
occupancy-culled frame renderer with the dense-capacity one."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_replication_tpu.ops.occupancy import (
    build_occupancy_grid,
    rays_active,
)


class SphereField:
    """sigma = 25 inside r<0.8, rgb from position — analytic test net."""

    def apply(self, params, pts, viewdirs, model=""):
        sigma = jnp.where(jnp.linalg.norm(pts, axis=-1) < 0.8, 25.0, 0.0)
        rgb = pts * 2.0
        return jnp.concatenate([rgb, sigma[..., None]], axis=-1)


def _density(params, pts):
    return SphereField().apply(params, pts, None)[..., 3]


def test_build_grid_marks_sphere():
    grid, bbox = build_occupancy_grid(_density, None, resolution=32,
                                      threshold=0.5, dilate=1, chunk=4096)
    assert grid.shape == (32, 32, 32)
    r = 32
    centers = (np.arange(r) + 0.5) / r * 3.0 - 1.5
    X, Y, Z = np.meshgrid(centers, centers, centers, indexing="ij")
    dist = np.sqrt(X**2 + Y**2 + Z**2)
    # every strictly-inside cell is marked (conservativeness)
    assert grid[dist < 0.7].all()
    # far-outside cells are empty (dilate=1 adds ~1 cell = 0.094)
    assert not grid[dist > 1.1].any()


def test_rays_active_hit_and_miss():
    grid, bbox = build_occupancy_grid(_density, None, resolution=32,
                                      threshold=0.5, dilate=1, chunk=4096)
    t = jnp.linspace(2.0, 6.0, 96)
    ro = jnp.array([[0.0, 0.0, 4.0], [3.0, 3.0, 4.0]])
    rd = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    act = np.asarray(rays_active(ro, rd, t, jnp.asarray(grid), bbox))
    assert act[0] and not act[1]


def test_frame_renderer_occupancy_matches_dense():
    from nerf_replication_tpu.models.nerf.renderer.volume_renderer import (
        Renderer,
        RenderSettings,
    )

    grid, bbox = build_occupancy_grid(_density, None, resolution=32,
                                      threshold=0.5, dilate=2, chunk=4096)
    s = RenderSettings(N_samples=12, N_importance=12, ray_chunk=64,
                       white_bkgd=True)
    r = Renderer(SphereField(), settings=s, mesh=None)
    H = W = 16
    focal = 0.5 * W / np.tan(0.5 * 0.6911112070083618)
    from nerf_replication_tpu.utils.synthetic_scene import look_at_pose
    pose = jnp.asarray(look_at_pose(np.array([0.0, -4.0, 0.5], np.float32)))

    f_dense = r.make_frame_renderer(H, W, focal, capacity=1.0)
    f_occ = r.make_frame_renderer(H, W, focal, capacity=1.0,
                                  occupancy=(grid, bbox),
                                  coarse_capacity=1.0, return_stats=True)
    img_dense = np.asarray(f_dense(None, pose))
    img_occ, stats = f_occ(None, pose)
    img_occ = np.asarray(img_occ)
    np.testing.assert_allclose(img_occ, img_dense, atol=1e-5)
    n_act = int(stats["active_rays"])
    assert 0 < n_act < H * W  # culling actually happened
    assert int(stats["coarse_overflow"]) == 0

    # restricted capacity still matches when it covers all active rays
    cap = min(1.0, (n_act / (H * W)) + 4 * 64 / (H * W))
    f_cap = r.make_frame_renderer(H, W, focal, capacity=cap,
                                  occupancy=(grid, bbox),
                                  coarse_capacity=cap)
    np.testing.assert_allclose(np.asarray(f_cap(None, pose)), img_dense,
                               atol=1e-5)


def test_frame_renderer_subsampled_probe_matches_dense():
    """At production-like focal lengths the occupancy probe runs on a
    q-px-subsampled ray lattice (volume_renderer make_frame_renderer);
    culled output must still match the dense render at full capacity."""
    from nerf_replication_tpu.models.nerf.renderer.volume_renderer import (
        Renderer,
        RenderSettings,
    )

    grid, bbox = build_occupancy_grid(_density, None, resolution=32,
                                      threshold=0.5, dilate=2, chunk=4096)
    s = RenderSettings(N_samples=8, N_importance=8, ray_chunk=1024,
                       white_bkgd=True)
    r = Renderer(SphereField(), settings=s, mesh=None)
    H = W = 256  # focal ~356 -> 4*far/focal < cell -> occ_sub = 4
    focal = 0.5 * W / np.tan(0.5 * 0.6911112070083618)
    cell = 3.0 / 32
    assert 4 * s.far / focal <= cell  # the subsampled branch is active
    from nerf_replication_tpu.utils.synthetic_scene import look_at_pose
    pose = jnp.asarray(look_at_pose(np.array([0.0, -4.0, 0.5], np.float32)))

    f_dense = r.make_frame_renderer(H, W, focal, capacity=1.0)
    f_occ = r.make_frame_renderer(H, W, focal, capacity=1.0,
                                  occupancy=(grid, bbox),
                                  coarse_capacity=1.0, return_stats=True)
    img_dense = np.asarray(f_dense(None, pose))
    img_occ, stats = f_occ(None, pose)
    np.testing.assert_allclose(np.asarray(img_occ), img_dense, atol=1e-5)
    assert 0 < int(stats["active_rays"]) < H * W


def test_frame_renderer_uint8_output():
    from nerf_replication_tpu.models.nerf.renderer.volume_renderer import (
        Renderer,
        RenderSettings,
    )

    s = RenderSettings(N_samples=8, N_importance=8, ray_chunk=64)
    r = Renderer(SphereField(), settings=s, mesh=None)
    H = W = 8
    focal = 8.0
    from nerf_replication_tpu.utils.synthetic_scene import look_at_pose
    pose = jnp.asarray(look_at_pose(np.array([0.0, -4.0, 0.0], np.float32)))
    f32 = np.asarray(r.make_frame_renderer(H, W, focal)(None, pose))
    u8 = np.asarray(r.make_frame_renderer(
        H, W, focal, out_dtype=jnp.uint8)(None, pose))
    assert u8.dtype == np.uint8
    np.testing.assert_allclose(
        u8.astype(np.float32) / 255.0, np.clip(f32, 0, 1), atol=1 / 255.0)

"""Reconstruction evaluation tests: Umeyama alignment + recon metrics."""

import numpy as np

import jax.numpy as jnp

from fast3r_tpu.eval.recon import (
    align_local_pts3d_to_global,
    completion_ratio,
    evaluate_reconstruction,
)
from fast3r_tpu.ops.umeyama import apply_similarity, rigid_points_registration


def _random_sim3(rng):
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32), rng.standard_normal(3).astype(np.float32), \
        float(rng.uniform(0.5, 2.0))


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    R, t, s = _random_sim3(rng)
    x = rng.standard_normal((500, 3)).astype(np.float32)
    y = s * (x @ R.T) + t
    R2, t2, s2 = rigid_points_registration(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-4)
    assert abs(float(s2) - s) < 1e-5


def test_umeyama_weighted_ignores_outliers():
    rng = np.random.default_rng(1)
    R, t, s = _random_sim3(rng)
    x = rng.standard_normal((400, 3)).astype(np.float32)
    y = s * (x @ R.T) + t
    y[:50] += 100.0  # gross outliers
    w = np.ones(400, np.float32)
    w[:50] = 0.0
    R2, t2, s2 = rigid_points_registration(jnp.asarray(x), jnp.asarray(y),
                                           jnp.asarray(w))
    aligned = np.asarray(apply_similarity(jnp.asarray(x), R2, t2, s2))
    np.testing.assert_allclose(aligned[50:], y[50:], atol=1e-3)


def test_align_local_to_global_contract():
    rng = np.random.default_rng(2)
    V, B, H, W = 3, 2, 8, 12
    preds = []
    for v in range(V):
        R, t, s = _random_sim3(rng)
        local = rng.standard_normal((B, H, W, 3)).astype(np.float32)
        glob = s * (local @ R.T) + t
        preds.append({
            "pts3d_local": local,
            "pts3d_in_other_view": glob,
            "conf": np.full((B, H, W), 2.0, np.float32),
            "conf_local": np.full((B, H, W), 2.0, np.float32),
        })
    align_local_pts3d_to_global(preds, min_conf_thr_percentile=10)
    for v in range(V):
        np.testing.assert_allclose(
            preds[v]["pts3d_local_aligned_to_global"],
            preds[v]["pts3d_in_other_view"], atol=1e-3,
        )


def test_evaluate_reconstruction_perfect_prediction():
    from fast3r_tpu.data.dummy import make_dummy_batch

    batch = make_dummy_batch(batch_size=1, num_views=3, height=24, width=32)
    views, preds = [], []
    for v in range(3):
        views.append({
            "pts3d": batch["pts3d"][:, v],
            "valid_mask": batch["valid_mask"][:, v],
        })
        preds.append({
            "pts3d_in_other_view": batch["pts3d"][:, v],
            "conf": np.full(batch["pts3d"][:, v].shape[:3], 2.0, np.float32),
            "pts3d_local": batch["pts3d"][:, v],
            "conf_local": np.full(batch["pts3d"][:, v].shape[:3], 2.0, np.float32),
        })
    res = evaluate_reconstruction(views, preds)
    m = res[0]
    assert m["accuracy"] < 1e-2, m
    assert m["completion"] < 1e-2, m
    assert m["nc1"] > 0.95 and m["nc2"] > 0.95, m


def test_completion_ratio():
    rng = np.random.default_rng(3)
    pts = rng.standard_normal((1000, 3))
    assert completion_ratio(pts, pts) == 1.0
    assert completion_ratio(pts, pts + 10.0, dist_th=0.05) == 0.0

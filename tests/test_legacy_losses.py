"""Golden parity: legacy pairwise Regr3D/ConfLoss vs the reference."""

import sys

import numpy as np
import torch

import jax.numpy as jnp

from tests.ref_loader import REF_ROOT, install_ref_stubs

from fast3r_tpu.train.losses import conf_loss_pair


def _ref_losses():
    install_ref_stubs()
    for p in (REF_ROOT, REF_ROOT + "/fast3r"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import fast3r.dust3r.losses as L

    return L


def test_pair_conf_loss_parity():
    L = _ref_losses()
    rng = np.random.default_rng(0)
    B, H, W = 2, 8, 12

    def rand_pose():
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = q
        T[:3, 3] = rng.standard_normal(3)
        return T

    def gt():
        return {
            "pts3d": rng.standard_normal((B, H, W, 3)).astype(np.float32) + 1,
            "valid_mask": rng.random((B, H, W)) < 0.8,
            "camera_pose": np.stack([rand_pose() for _ in range(B)]),
        }

    gt1, gt2 = gt(), gt()
    pred1 = {
        "pts3d": rng.standard_normal((B, H, W, 3)).astype(np.float32),
        "conf": (1 + np.exp(rng.standard_normal((B, H, W)))).astype(np.float32),
    }
    pred2 = {
        "pts3d_in_other_view": rng.standard_normal((B, H, W, 3)).astype(np.float32),
        "conf": (1 + np.exp(rng.standard_normal((B, H, W)))).astype(np.float32),
    }

    ref_fn = L.ConfLoss(L.Regr3D(L.L21Loss(), norm_mode="avg_dis"), alpha=0.2)

    def tt(d):
        return {k: torch.from_numpy(np.asarray(v).copy()) for k, v in d.items()}

    with torch.no_grad():
        ref_loss, _ = ref_fn(tt(gt1), tt(gt2), tt(pred1), tt(pred2))

    def jj(d):
        return {k: jnp.asarray(v) for k, v in d.items()}

    my_loss, _ = conf_loss_pair(jj(gt1), jj(gt2), jj(pred1), jj(pred2),
                                alpha=0.2)
    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=3e-4)

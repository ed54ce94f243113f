"""Head-output postprocessing: raw channels -> 3D pointmap + confidence.

Behavioral reference: fast3r/dust3r/heads/postprocess.py:16-64.

  * depth_mode ("exp", -inf, inf):  pts3d = xyz / max(||xyz||, 1e-8) * expm1(||xyz||)
  * conf_mode  ("exp", 1, inf):     conf  = 1 + exp(x)

Inputs here are channel-last (B, H, W, C) — the natural TPU layout — whereas the
torch reference permutes from (B, C, H, W).
"""

from __future__ import annotations

import jax.numpy as jnp


def reg_dense_depth(xyz: jnp.ndarray, mode=("exp", -float("inf"), float("inf"))):
    """Map raw xyz channels to 3D points (reference postprocess.py:28-52)."""
    name, vmin, vmax = mode
    if name == "linear":
        if vmin == -float("inf") and vmax == float("inf"):
            return xyz
        return jnp.clip(xyz, vmin, vmax)
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    xyz = xyz / jnp.clip(d, 1e-8, None)
    if name == "square":
        return xyz * jnp.square(d)
    if name == "exp":
        return xyz * jnp.expm1(d)
    raise ValueError(f"bad depth mode={name!r}")


def reg_dense_conf(x: jnp.ndarray, mode=("exp", 1.0, float("inf"))):
    """Map raw confidence channel to confidence (reference postprocess.py:55-64)."""
    name, vmin, vmax = mode
    if name == "exp":
        return vmin + jnp.clip(jnp.exp(x), None, vmax - vmin)
    if name == "sigmoid":
        import jax

        return (vmax - vmin) * jax.nn.sigmoid(x) + vmin
    raise ValueError(f"bad conf mode={name!r}")


def postprocess(out: jnp.ndarray, depth_mode, conf_mode):
    """Split head output channels into pts3d (+ conf).

    Args:
      out: (B, H, W, C) raw head output, C = 3 (+1 if conf_mode).

    Returns:
      dict with "pts3d" (B, H, W, 3) and optionally "conf" (B, H, W).
    """
    res = {"pts3d": reg_dense_depth(out[..., 0:3], depth_mode)}
    if conf_mode is not None:
        res["conf"] = reg_dense_conf(out[..., 3], conf_mode)
    return res

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


def postprocess_transposed(out: jnp.ndarray, depth_mode, conf_mode,
                           out_h: int, out_w: int):
    """postprocess() over a channel-major (B, C, H*W) head map.

    TPU companion to ops/trunk_kernel.py:fused_regression_head_t — the trunk
    kernel emits channels on sublanes / pixels on lanes, so the norm /
    expm1 / exp chain here runs lane-major over full pixel rows and only the
    final 3-channel pts3d swap pays a relayout (the conf plane needs none).
    Same math and op order as postprocess(); returns the same dict/layouts.
    """
    B = out.shape[0]
    name, vmin, vmax = depth_mode
    xyz = out[:, 0:3]  # (B, 3, HW)
    if name == "linear":
        pts = xyz if (vmin == -float("inf") and vmax == float("inf")) \
            else jnp.clip(xyz, vmin, vmax)
    else:
        d = jnp.linalg.norm(xyz, axis=1, keepdims=True)
        pts = xyz / jnp.clip(d, 1e-8, None)
        if name == "square":
            pts = pts * jnp.square(d)
        elif name == "exp":
            pts = pts * jnp.expm1(d)
        else:
            raise ValueError(f"bad depth mode={name!r}")
    res = {"pts3d": jnp.swapaxes(pts, 1, 2).reshape(B, out_h, out_w, 3)}
    if conf_mode is not None:
        cname, cvmin, cvmax = conf_mode
        c = out[:, 3]
        if cname == "exp":
            conf = cvmin + jnp.clip(jnp.exp(c), None, cvmax - cvmin)
        elif cname == "sigmoid":
            import jax

            conf = (cvmax - cvmin) * jax.nn.sigmoid(c) + cvmin
        else:
            raise ValueError(f"bad conf mode={cname!r}")
        res["conf"] = conf.reshape(B, out_h, out_w)
    return res


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

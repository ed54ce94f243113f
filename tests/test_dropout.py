"""Dropout / DropPath knobs on the ViT block (VERDICT r3 #7).

The reference Block carries drop (proj + MLP dropout), attn_drop
(softmax-weight dropout) and drop_path (per-sample stochastic depth) —
blocks.py:196-239.  Every shipped reference config sets them to 0.0, so
parity at zero rate is exactness; at non-zero rates the two
implementations draw from different RNGs, so parity is distributional
(same weights, same input => matching output mean/std across draws) plus
the exact drop_path=1.0 fixed point (the branch contributes nothing and
both implementations must return the input unchanged).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_loader import build_ref_vit_block, load_block
from fast3r_tpu.nn.layers import init_vit_block, run_vit_stack, vit_block

DIM, HEADS, B, N = 64, 4, 3, 16
SCALE = (DIM // HEADS) ** -0.5


@pytest.fixture(scope="module")
def block_setup():
    params = init_vit_block(jax.random.key(0), DIM, HEADS)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, N, DIM)) * 0.5,
        jnp.float32)
    return params, x


def test_zero_rates_with_rng_bit_identical(block_setup):
    """rng plumbing at rate 0.0 must not perturb the zero-dropout path."""
    params, x = block_setup
    base = vit_block(params, x, HEADS, SCALE)
    with_rng = vit_block(params, x, HEADS, SCALE, rng=jax.random.key(7),
                         drop=0.0, attn_drop=0.0, droppath=0.0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(with_rng))


def test_drop_path_one_is_identity_like_reference(block_setup):
    """drop_path=1.0 in train mode zeroes both residual branches: the
    reference's keep_prob > 0 guard skips the 1/keep rescale, so the output
    IS the input — an exact parity point that needs no shared RNG."""
    torch = pytest.importorskip("torch")
    params, x = block_setup

    out = vit_block(params, x, HEADS, SCALE, droppath=1.0,
                    rng=jax.random.key(1))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    tblock = build_ref_vit_block(torch, DIM, HEADS, drop_path=1.0)
    load_block(tblock, params)
    tblock.train()
    with torch.no_grad():
        tout = tblock(torch.from_numpy(np.asarray(x)), None)
    np.testing.assert_array_equal(tout.numpy(), np.asarray(x))


def test_nonzero_rates_distributional_parity(block_setup):
    """Same weights + input, drop=0.3 / attn_drop=0.2 / drop_path=0.1 in
    train mode: the per-element output MEAN over independent draws must
    agree between the torch reference block and the JAX block within
    sampling error (the networks are nonlinear, so this is the strongest
    cross-RNG statement available)."""
    torch = pytest.importorskip("torch")
    params, x = block_setup
    rates = dict(drop=0.3, attn_drop=0.2, drop_path=0.1)
    n_draws = 256

    fn = jax.jit(lambda r: vit_block(
        params, x, HEADS, SCALE, drop=rates["drop"],
        attn_drop=rates["attn_drop"], droppath=rates["drop_path"], rng=r))
    jouts = np.stack([
        np.asarray(fn(jax.random.key(i))) for i in range(n_draws)])

    tblock = build_ref_vit_block(torch, DIM, HEADS, **rates)
    load_block(tblock, params)
    tblock.train()
    torch.manual_seed(0)
    tx = torch.from_numpy(np.asarray(x))
    with torch.no_grad():
        touts = np.stack([tblock(tx, None).numpy() for _ in range(n_draws)])

    jm, tm = jouts.mean(0), touts.mean(0)
    # standard error of the mean bounds the comparison scale
    sem = touts.std(0).mean() / np.sqrt(n_draws)
    assert np.abs(jm - tm).mean() < 5 * sem, (np.abs(jm - tm).mean(), sem)
    # second moment: overall stddevs within 5%
    assert abs(jouts.std() - touts.std()) / touts.std() < 0.05


def test_stack_trains_with_dropout(block_setup):
    """run_vit_stack threads per-layer rngs and stays differentiable with
    non-zero rates (a non-zero-dropout experiment must be trainable)."""
    params, x = block_setup
    stacked = jax.tree.map(lambda a: jnp.stack([a, a]), params)

    def loss(p, r):
        y, _ = run_vit_stack(p, x, HEADS, SCALE, depth=2, drop=0.1,
                             attn_drop=0.1, droppath=0.1, rng=r)
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(stacked, jax.random.key(3))
    assert all(np.isfinite(np.asarray(leaf)).all()
               for leaf in jax.tree.leaves(g))
    # deterministic given the rng; different rng -> different output
    y1, _ = run_vit_stack(stacked, x, HEADS, SCALE, depth=2, drop=0.5,
                          rng=jax.random.key(4))
    y2, _ = run_vit_stack(stacked, x, HEADS, SCALE, depth=2, drop=0.5,
                          rng=jax.random.key(4))
    y3, _ = run_vit_stack(stacked, x, HEADS, SCALE, depth=2, drop=0.5,
                          rng=jax.random.key(5))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert np.abs(np.asarray(y1) - np.asarray(y3)).max() > 0

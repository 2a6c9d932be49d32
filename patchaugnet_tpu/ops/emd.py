"""Auction-algorithm approximate Earth Mover's Distance.

TPU-native re-design of ``libs/emd_module`` (emd_cuda.cu, emd_module.py:29-70):
the Bid / GetMax / Assign kernel loop becomes one ``lax.while_loop`` over
dense ``(b, n, n)`` value matrices — scatter-max resolves column winners
instead of CUDA atomicMax.

Semantics pinned to the CUDA kernels (emd_cuda.cu:95-215):
  - value(row, col) = 3.0 - ||xyz1_row - xyz2_col|| - price[col]
    (coordinates are expected normalised to [0, 1], hence the 3.0 offset);
  - every unassigned row bids for its best column with increment
    ``best - second_best + eps``;
  - each column accepts the highest bid, evicting any previous owner;
  - after ``iters`` rounds, still-unassigned rows are force-assigned to
    their current best column (the CUDA ``last=true`` pass), so the
    returned assignment may be non-injective if the auction did not
    converge;
  - returned ``dist`` is the per-row *squared* distance to the assigned
    column; gradients flow to ``xyz1`` only (emd.cpp backward).

The while_loop exits early once every row is assigned (the CUDA loop
becomes a no-op at that point — ``Bid`` returns when ``unass_cnt == 0``),
so the fixed 1024-iteration budget of the reference call sites
(losses/pointnetvlad_loss.py:219,254) costs only as many rounds as the
auction actually needs.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_NEG = -1e9


def _auction(xyz1: jax.Array, xyz2: jax.Array, eps: float, iters: int) -> jax.Array:
    b, n, _ = xyz1.shape
    d = jnp.sqrt(
        jnp.maximum(
            jnp.sum(xyz1 * xyz1, -1)[:, :, None]
            + jnp.sum(xyz2 * xyz2, -1)[:, None, :]
            - 2.0
            * jnp.einsum("bnd,bmd->bnm", xyz1, xyz2, preferred_element_type=jnp.float32),
            0.0,
        )
    )
    base = 3.0 - d                                         # (b, n_rows, n_cols)
    rows = jnp.arange(n, dtype=jnp.int32)
    batch = jnp.arange(b)[:, None]

    def cond(state):
        i, assignment, _, _ = state
        return jnp.logical_and(i < iters, jnp.any(assignment < 0))

    def body(state):
        i, assignment, assignment_inv, price = state
        unass = assignment < 0                             # (b, n)
        value = base - price[:, None, :]                   # (b, n, n)
        top2, top2_i = jax.lax.top_k(value, 2)
        best, better = top2[..., 0], top2[..., 1]
        best_i = top2_i[..., 0].astype(jnp.int32)          # (b, n)
        inc = jnp.where(unass, best - better + eps, _NEG)
        # Column winners via scatter-max (CUDA atomicMax in Bid).
        winner_inc = jnp.full((b, n), _NEG, value.dtype).at[batch, best_i].max(inc)
        has_winner = winner_inc > _NEG / 2
        # Winning row per column: any row whose inc equals the max (GetMax).
        is_winner_row = jnp.logical_and(unass, inc >= winner_inc[batch, best_i])
        winner_row = (
            jnp.full((b, n), -1, jnp.int32)
            .at[batch, best_i]
            .max(jnp.where(is_winner_row, rows[None, :], -1))
        )
        # Evict previous owners of claimed columns (Assign).
        evict_rows = jnp.where(
            jnp.logical_and(has_winner, assignment_inv >= 0), assignment_inv, n
        )
        assignment = (
            jnp.concatenate([assignment, jnp.full((b, 1), -1, jnp.int32)], axis=1)
            .at[batch, evict_rows]
            .set(-1)[:, :n]
        )
        # Assign winners.
        safe_winner = jnp.where(has_winner, winner_row, n)
        assignment = (
            jnp.concatenate([assignment, jnp.full((b, 1), -1, jnp.int32)], axis=1)
            .at[batch, safe_winner]
            .set(jnp.broadcast_to(rows[None, :], (b, n)))[:, :n]
        )
        assignment_inv = jnp.where(has_winner, winner_row, assignment_inv)
        price = jnp.where(has_winner, price + winner_inc, price)
        return i + 1, assignment, assignment_inv, price

    state = (
        jnp.zeros((), jnp.int32),
        jnp.full((b, n), -1, jnp.int32),
        jnp.full((b, n), -1, jnp.int32),
        jnp.zeros((b, n), jnp.float32),
    )
    _, assignment, _, price = jax.lax.while_loop(cond, body, state)
    # Force-assign stragglers to their current best column (last=true pass).
    value = base - price[:, None, :]
    fallback = jnp.argmax(value, axis=-1).astype(jnp.int32)
    return jnp.where(assignment < 0, fallback, assignment)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def auction_emd(
    xyz1: jax.Array, xyz2: jax.Array, eps: float = 0.005, iters: int = 50
) -> Tuple[jax.Array, jax.Array]:
    """Approximate EMD between same-size clouds.

    Args:
      xyz1, xyz2: ``(b, n, 3)`` clouds normalised to ~[0, 1].
      eps: auction bid increment (reference uses 0.02 in training losses).
      iters: max auction rounds (reference uses 1024).

    Returns:
      ``(dist, assignment)``: per-point squared distances ``(b, n)`` and
      int32 assignment of each xyz1 row to an xyz2 row.
    """
    return _emd_fwd_impl(xyz1, xyz2, eps, iters)


def _emd_fwd_impl(xyz1, xyz2, eps, iters):
    assignment = _auction(
        xyz1.astype(jnp.float32), xyz2.astype(jnp.float32), eps, iters
    )
    matched = jnp.take_along_axis(xyz2, assignment[..., None], axis=1)
    dist = jnp.sum((xyz1 - matched) ** 2, axis=-1)
    return dist, assignment


def _emd_fwd(xyz1, xyz2, eps, iters):
    dist, assignment = _emd_fwd_impl(xyz1, xyz2, eps, iters)
    matched = jnp.take_along_axis(xyz2, assignment[..., None], axis=1)
    return (dist, assignment), (xyz1, matched)


def _emd_bwd(eps, iters, res, grads):
    xyz1, matched = res
    g_dist, _ = grads
    # Matches emd.cpp backward: grad w.r.t. xyz1 only.
    g_xyz1 = 2.0 * g_dist[..., None] * (xyz1 - matched)
    return g_xyz1, jnp.zeros_like(matched)


auction_emd.defvjp(_emd_fwd, _emd_bwd)

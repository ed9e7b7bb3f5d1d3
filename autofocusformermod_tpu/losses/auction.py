"""On-device linear sum assignment via the auction algorithm.

The reference solves per-image LSAP with scipy on the host (matcher.py:154-156)
and our default matcher mirrors that through ``jax.pure_callback`` — but some
TPU runtimes (including the axon PJRT used here) do not support host
callbacks inside compiled programs.  This is a pure-JAX epsilon-scaling
forward auction (Bertsekas): persons = target columns bid for objects =
query rows in parallel (Jacobi bidding with scatter-max conflict
resolution), with prices carried across epsilon phases.

With eps_final = tol / n the assignment cost is within n*eps of optimal —
far below the noise floor of the stochastic matching costs.  Runs fully
vectorized over the batch inside jit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_NEG = -1e30


def _auction_phase(benefit, price, owner, assigned, eps, max_iters):
    """One epsilon phase. benefit: (T, Q); returns updated state.

    owner: (Q,) int32 target owning each query (-1 free)
    assigned: (T,) int32 query assigned to each target (-1 unassigned)
    """
    T, Q = benefit.shape

    def cond(state):
        _, _, assigned, it = state
        return jnp.logical_and(jnp.any(assigned < 0), it < max_iters)

    def body(state):
        price, owner, assigned, it = state
        unassigned = assigned < 0                                   # (T,)

        value = benefit - price[None, :]                            # (T, Q)
        top2, idx2 = jax.lax.top_k(value, 2)
        best_j = idx2[:, 0]
        bid = price[best_j] + (top2[:, 0] - top2[:, 1]) + eps       # (T,)
        bid = jnp.where(unassigned, bid, _NEG)

        # per-query highest bid wins (scatter-max), ties -> lowest target id
        qbid = jnp.full((Q,), _NEG)
        qbid = qbid.at[best_j].max(bid)
        # winner per query: the unassigned target whose (best_j, bid) hits qbid
        is_win = unassigned & (qbid[best_j] == bid)
        # break bid ties deterministically: lowest target index wins
        tmin = jnp.full((Q,), T, jnp.int32).at[best_j].min(
            jnp.where(is_win, jnp.arange(T, dtype=jnp.int32), T)
        )
        winner_t = tmin                                              # (Q,)
        has_winner = winner_t < T

        # evict previous owners of contested queries
        evict_at = jnp.where(has_winner & (owner >= 0), owner, T)    # (Q,)
        evicted = jnp.zeros((T,), bool).at[evict_at].set(True, mode="drop")
        assigned = jnp.where(evicted, -1, assigned)

        # install winners
        owner = jnp.where(has_winner, winner_t, owner)
        price = jnp.where(has_winner, qbid, price)
        assigned = assigned.at[jnp.where(has_winner, winner_t, T)].set(
            jnp.where(has_winner, jnp.arange(Q, dtype=jnp.int32), -1),
            mode="drop",
        )
        return price, owner, assigned, it + 1

    price, owner, assigned, _ = jax.lax.while_loop(
        cond, body, (price, owner, assigned, jnp.zeros((), jnp.int32))
    )
    return price, owner, assigned


@functools.partial(jax.jit, static_argnames=("phases", "max_iters"))
def auction_lsap(cost: jnp.ndarray, phases: int = 6, max_iters: int = 20000):
    """Assign each target column a distinct query row minimizing total cost.

    cost: (b, Q, T) with T <= Q.  Returns (b, T) int32: query per target.

    Epsilon-scaling optimality (cost within n*eps_final of the optimum) only
    holds for SQUARE problems — for T < Q, queries left unassigned keep stale
    high prices from earlier phases and repel bidders, so we pad with Q - T
    dummy persons whose benefit row is constant (any query suits them; they
    contribute a fixed amount, leaving the real persons' optimum unchanged).
    Benefit is shifted per person-row (assignment-invariant) so sentinel
    costs for padded-invalid targets (matcher._INVALID_COST) don't blow up
    the epsilon range.
    """
    b, Q, T = cost.shape

    def solve(c):
        benefit = -c.T                                             # (T, Q)
        benefit = benefit - jnp.max(benefit, axis=1, keepdims=True)
        benefit = jnp.concatenate(
            [benefit, jnp.zeros((Q - T, Q), benefit.dtype)], axis=0
        )                                                          # (Q, Q)
        rng = jnp.maximum(jnp.max(benefit) - jnp.min(benefit), 1e-3)
        price = jnp.zeros((Q,))
        eps = rng / 2.0
        assigned = jnp.full((Q,), -1, jnp.int32)
        for _ in range(phases):
            assigned = jnp.full((Q,), -1, jnp.int32)
            owner = jnp.full((Q,), -1, jnp.int32)
            price, owner, assigned = _auction_phase(
                benefit, price, owner, assigned, eps, max_iters
            )
            eps = eps / jnp.asarray(8.0)
        # Repair: if the final phase exited on max_iters, some persons can be
        # left unassigned (-1), which downstream gathers would clamp silently.
        # Give each such person a distinct free query (greedy fill) so the
        # result is always a valid permutation, merely suboptimal.
        used_at = jnp.where(assigned >= 0, assigned, Q)
        used = jnp.zeros((Q,), bool).at[used_at].set(True, mode="drop")
        free_first = jnp.argsort(used, stable=True)      # free queries lead
        un_rank = jnp.cumsum(assigned < 0) - 1           # j-th unassigned person
        assigned = jnp.where(assigned < 0, free_first[un_rank], assigned)
        return assigned[:T]

    return jax.vmap(solve)(cost)

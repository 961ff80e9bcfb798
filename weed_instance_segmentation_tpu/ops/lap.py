"""Device-side linear assignment (rectangular Jonker–Volgenant).

The reference's Hungarian matcher syncs to the host every training step to
call ``scipy.optimize.linear_sum_assignment``
(HF:modeling_mask2former.py:474-478) — a device→CPU round-trip per batch and
per auxiliary layer. This is the jit-compatible replacement (SURVEY.md
§7.3.1): shortest-augmenting-path LAP with dual potentials, identical
algorithm family to scipy's ``rectangular_lsap``, expressed with
``lax.fori_loop`` / ``lax.while_loop`` so it compiles once and runs
on-device. Problem sizes here are tiny (≤ num_queries × max_instances =
200×100), so the O(R·C·R) scalar loops are negligible next to the model.

Returns the same optimal assignment cost as scipy; tie-broken assignments may
permute (any optimum is equally valid for the loss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# plain float (weak-typed, stays f32 in-context): a module-level jnp
# constant would initialize the JAX backend at import time, which breaks
# jax.distributed.initialize (must run before any backend use)
INF = 1e30


def linear_sum_assignment(cost: jnp.ndarray) -> jnp.ndarray:
    """Minimal-cost assignment of R rows to C columns, R <= C.

    Dispatches between two numerically identical JV formulations:
    data-dependent ``while_loop`` early exits (default) or static
    ``fori_loop`` trip counts (``WISTPU_LAP=static``). The static form
    exists because data-dependent loops are the one construct here whose
    runtime is input-dependent — on a backend whose watchdog or loop
    lowering misbehaves, a fixed trip count is the safe fallback; it costs
    at most the worst case the dynamic form already has to bound.

    Args:
        cost: (R, C) float32.
    Returns:
        col4row: (R,) int32 — the column assigned to each row.
    """
    import os

    static = os.environ.get('WISTPU_LAP', 'jv') == 'static'
    return _linear_sum_assignment_jv(cost, static_loops=static)


def _linear_sum_assignment_jv(cost: jnp.ndarray, static_loops: bool = False) -> jnp.ndarray:
    r, c = cost.shape
    if r > c:
        raise ValueError('linear_sum_assignment requires rows <= cols; transpose first')
    cost = cost.astype(jnp.float32)

    def solve_row(cur_row, state):
        u, v, col4row, row4col = state

        # --- Dijkstra over columns for the shortest augmenting path --------
        spc = jnp.full((c,), INF)        # shortest path cost per column
        path = jnp.full((c,), -1, jnp.int32)  # predecessor row per column
        visited_cols = jnp.zeros((c,), jnp.bool_)
        # remembered: which row was scanned when each col was finalized
        def dijkstra_cond(ds):
            _, _, _, _, _, sink, _ = ds
            return sink < 0

        def dijkstra_body(ds):
            i, min_val, spc, path, visited_cols, sink, u_i = ds
            # relax edges from row i
            reduced = min_val + cost[i] - u_i - v
            better = (reduced < spc) & (~visited_cols)
            spc = jnp.where(better, reduced, spc)
            path = jnp.where(better, i, path)
            # pick the unvisited column with smallest spc
            masked = jnp.where(visited_cols, INF, spc)
            j = jnp.argmin(masked).astype(jnp.int32)
            min_val = masked[j]
            visited_cols = visited_cols.at[j].set(True)
            nxt = row4col[j]
            sink = jnp.where(nxt < 0, j, -1)
            i = jnp.where(nxt < 0, i, nxt)
            u_i = jnp.where(nxt < 0, u_i, u[nxt])
            return i, min_val, spc, path, visited_cols, sink, u_i

        init = (
            jnp.int32(cur_row), jnp.float32(0.0), spc, path, visited_cols,
            jnp.int32(-1), u[cur_row],
        )
        if static_loops:
            # sink is reached after at most cur_row+1 <= r <= c dequeues
            # (each dequeue visits a NEW column; only matched columns — at
            # most cur_row of them — can defer the exit). Iterations after
            # the sink freeze every carried value, so the result is
            # identical to the early-exit form.
            def dijkstra_static(_, ds):
                done = ds[5] >= 0
                nds = dijkstra_body(ds)
                return jax.tree_util.tree_map(
                    lambda new, old: jnp.where(done, old, new), nds, ds
                )

            _, min_val, spc, path, visited_cols, sink, _ = jax.lax.fori_loop(
                0, c, dijkstra_static, init
            )
        else:
            _, min_val, spc, path, visited_cols, sink, _ = jax.lax.while_loop(
                dijkstra_cond, dijkstra_body, init
            )

        # --- dual updates ---------------------------------------------------
        u = u.at[cur_row].add(min_val)
        # rows scanned (other than cur_row) are the rows matched to visited
        # cols that were dequeued before the sink
        scanned_rows_mask = jnp.zeros((r,), jnp.bool_)

        def mark(jc, m):
            row = row4col[jc]
            hit = visited_cols[jc] & (row >= 0) & (jc != sink)
            return jnp.where(hit, m.at[row].set(True), m)

        scanned_rows_mask = jax.lax.fori_loop(0, c, mark, scanned_rows_mask)
        row_col = col4row  # (R,) column currently matched to each row
        delta_rows = min_val - jnp.where(
            row_col >= 0, spc[jnp.clip(row_col, 0, c - 1)], 0.0
        )
        u = jnp.where(scanned_rows_mask, u + delta_rows, u)
        v = jnp.where(visited_cols, v - (min_val - spc), v)

        # --- augment along the alternating path ------------------------------
        def aug_cond(astate):
            _, _, _, done = astate
            return ~done

        def aug_body(astate):
            j, col4row, row4col, _ = astate
            i = path[j]
            row4col = row4col.at[j].set(i)
            prev_j = col4row[i]
            col4row = col4row.at[i].set(j)
            done = i == cur_row
            return prev_j, col4row, row4col, done

        aug_init = (sink, col4row, row4col, jnp.bool_(False))
        if static_loops:
            # the alternating path visits each row at most once → <= r+1
            # column assignments; frozen after done, as above
            def aug_static(_, astate):
                done = astate[3]
                nas = aug_body(astate)
                return jax.tree_util.tree_map(
                    lambda new, old: jnp.where(done, old, new), nas, astate
                )

            _, col4row, row4col, _ = jax.lax.fori_loop(
                0, r + 1, aug_static, aug_init
            )
        else:
            _, col4row, row4col, _ = jax.lax.while_loop(
                aug_cond, aug_body, aug_init
            )
        return u, v, col4row, row4col

    u = jnp.zeros((r,))
    v = jnp.zeros((c,))
    col4row = jnp.full((r,), -1, jnp.int32)
    row4col = jnp.full((c,), -1, jnp.int32)
    u, v, col4row, row4col = jax.lax.fori_loop(
        0, r, solve_row, (u, v, col4row, row4col)
    )
    return col4row

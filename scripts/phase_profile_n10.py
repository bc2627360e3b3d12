#!/usr/bin/env python
"""N=10 in-kernel phase split + blocked-elimination A/B (VERDICT r4 item 1).

The roofline (DESIGN.md §11) puts the N=10 flagship at 4% MFU,
10.56 ms/iter against a 0.43 ms compute roof, and names the serial
elimination chain as the binding constraint. This script answers, on-chip:

  1. WHERE the iteration time goes — linearize (gh_banded_fast) vs
     schur assembly vs the block-tridiag solve (the "phase split");
  2. whether the round-5 blocked pivoted Gauss–Jordan ("crgjbpr":
     GJB_PANEL-lane slab elimination + MXU trailing updates,
     kernels/thomas_pallas._gjbp_solve_aug) beats the shipped "crgjpr";
  3. whether a larger CR batch_tile (the 10 MB default budget forces
     batch_tile=1 → 8 sequential grid steps at this shape) amortizes
     per-op latency.

Emits one JSON line per row: {"row": ..., "ms": ...}.

Usage:  python scripts/phase_profile_n10.py [--iters 30] [--batch 8]
        [--json out.json] [--cpu]   (CPU = interpret-mode smoke only)
"""

import argparse
import json
import time

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--batch", type=int, default=8)
parser.add_argument("--players", type=int, default=10)
parser.add_argument("--horizon", type=int, default=30)
parser.add_argument("--iters", type=int, default=30)
parser.add_argument("--json", default=None)
parser.add_argument(
    "--facts", nargs="*", default=["gjpr", "gjbpr", "gjbpr2"],
    help="CR in-kernel factorizations to A/B for the solve phase",
)
# tile 4/8 at b=100 kill the Mosaic compiler (HTTP 500 tpu_compile_helper
# exit 1 after multi-minute attempts — the CR temporaries exceed what the
# compiler will schedule); measured on-chip round 5, hence the [1, 2] default.
parser.add_argument("--tiles", nargs="*", type=int, default=[1, 2])
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
else:
    from mcp_tpu.utils.devices import configure_tpu_cache

    configure_tpu_cache()

import jax.numpy as jnp
from jax import lax

from mcp_tpu.kernels.block_tridiag import (
    banded_newton_step_compressed,
    gh_banded_fast,
)
from mcp_tpu.kernels.thomas_pallas import pallas_block_thomas

rows = []


def emit(row, ms, extra=None):
    rec = {"row": row, "ms": round(ms, 4)}
    if extra:
        rec.update(extra)
    rows.append(rec)
    print(json.dumps(rec), flush=True)


def timed(fn, iters):
    """Compile, then wall-time `iters` in-graph repetitions (scalar-reduced
    fori_loop — one dispatch, so tunnel slack amortizes away; the
    block-until-VALUE rule from CLAUDE.md)."""
    jfn = jax.jit(lambda: lax.fori_loop(0, iters, fn, jnp.float32(0.0)))
    float(jfn())  # compile + warm
    t0 = time.perf_counter()
    float(jfn())
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from mcp_tpu.selection.games import (
        build_masked_parametric_game,
        setup_road_environment,
        setup_trajectory_game,
    )

    B = args.batch
    env = setup_road_environment(length=60.0)
    game = setup_trajectory_game(environment=env, N=args.players)
    pg = build_masked_parametric_game(
        game, N=args.players, horizon=args.horizon
    )
    mcp = pg.mcp
    st = mcp.time_structure
    p = sum(pg.dims.theta)
    thetas = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, p), jnp.float32)
    n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
    key = jax.random.PRNGKey(0)
    x0 = 0.01 * jax.random.normal(key, (B, n), jnp.float32)
    y0 = jnp.ones((B, m), jnp.float32)
    s0 = jnp.ones((B, m), jnp.float32)
    T, b = st.num_blocks, st.block_size
    print(f"# shape: B={B} T={T} b={b} n={n} m={m}", flush=True)

    with jax.default_matmul_precision("highest"):
        # ---- phase 1: linearize only --------------------------------
        def lin_body(i, acc):
            def one(x, y, th):
                outs = gh_banded_fast(mcp, st, x + acc * 0.0, y, th)
                return sum(jnp.sum(o) for o in outs)

            return acc + jnp.sum(jax.vmap(one)(x0, y0, thetas)).astype(
                jnp.float32
            ) * 1e-9

        emit("linearize", timed(lin_body, args.iters))

        # ---- phase 2: linearize + schur assembly (identity solve) ----
        def asm_body(i, acc):
            def one(x, y, s, th):
                g, h, diag_b, lower_b, upper_b, Gy_b, Hx_b = gh_banded_fast(
                    mcp, st, x + acc * 0.0, y, th
                )
                dx, dy, ds = banded_newton_step_compressed(
                    diag_b, lower_b, upper_b, Gy_b, Hx_b,
                    y, s, g, h - s, s * y - 1e-3, 1e-4, st,
                    algorithm=lambda D, L, U, r: r,  # identity "solve"
                )
                return jnp.sum(dx)

            return acc + jnp.sum(
                jax.vmap(one)(x0, y0, s0, thetas)
            ).astype(jnp.float32) * 1e-9

        emit("linearize+assembly", timed(asm_body, args.iters))

        # ---- full iteration per fact --------------------------------
        def full_body_for(fact):
            def solver(D, L, U, r):
                return pallas_block_thomas(
                    D[None], L[None], U[None], r[None], mode="cr", fact=fact
                )[0]

            import jax.custom_batching as cb

            solver_v = cb.custom_vmap(solver)

            @solver_v.def_vmap
            def _rule(axis_size, in_batched, D, L, U, r):
                return (
                    pallas_block_thomas(D, L, U, r, mode="cr", fact=fact),
                    True,
                )

            def body(i, acc):
                def one(x, y, s, th):
                    g, h, diag_b, lower_b, upper_b, Gy_b, Hx_b = (
                        gh_banded_fast(mcp, st, x + acc * 0.0, y, th)
                    )
                    dx, dy, ds = banded_newton_step_compressed(
                        diag_b, lower_b, upper_b, Gy_b, Hx_b,
                        y, s, g, h - s, s * y - 1e-3, 1e-4, st,
                        algorithm=solver_v,
                    )
                    return jnp.sum(dx)

                return acc + jnp.sum(
                    jax.vmap(one)(x0, y0, s0, thetas)
                ).astype(jnp.float32) * 1e-9

            return body

        for fact in args.facts:
            try:
                emit(f"full_iter/cr+{fact}", timed(full_body_for(fact), args.iters))
            except Exception as e:  # noqa: BLE001 — record and move on
                emit(f"full_iter/cr+{fact}", -1.0, {"error": str(e)[:200]})

        # ---- solve-only: facts × batch_tile -------------------------
        # Bands captured once at the probe point (the real compressed
        # system the solver hands the kernel).
        def capture(x, y, s, th):
            g, h, diag_b, lower_b, upper_b, Gy_b, Hx_b = gh_banded_fast(
                mcp, st, x, y, th
            )
            d = 1.0 / (y + 1e-4)
            w = 1e-4 + d * s
            rperm = jnp.asarray(st.row_permutation)
            mt = st.rows_per_block
            w_blocks = w[rperm].reshape(T, mt)
            A_diag = (
                diag_b
                + 1e-4 * jnp.eye(b, dtype=diag_b.dtype)[None]
                - jnp.einsum(
                    "tbm,tm,tmc->tbc", Gy_b, 1.0 / w_blocks, Hx_b
                )
            )
            perm = jnp.asarray(st.permutation)
            rhs = -g[perm].reshape(T, b)
            return A_diag, lower_b, upper_b, rhs

        D, L, U, r = jax.jit(jax.vmap(capture))(x0, y0, s0, thetas)
        D, L, U, r = jax.block_until_ready((D, L, U, r))

        for fact in args.facts:
            for tile in args.tiles:
                if tile > B:
                    continue

                def solve_body(i, acc, fact=fact, tile=tile):
                    return acc + jnp.sum(
                        pallas_block_thomas(
                            D, L, U, r + acc * 0.0, mode="cr", fact=fact,
                            batch_tile=tile,
                        )
                    ).astype(jnp.float32) * 1e-9

                try:
                    emit(
                        f"solve/cr+{fact}/tile{tile}",
                        timed(solve_body, args.iters),
                    )
                except Exception as e:  # noqa: BLE001
                    emit(
                        f"solve/cr+{fact}/tile{tile}", -1.0,
                        {"error": str(e)[:200]},
                    )

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


main()

"""Driver contract: compile-check entry points for the TPU-native MCP stack.

- entry(): jittable forward step on the flagship workload — the vmap-batched
  interior-point solve of the lane-change trajectory-game MCP.
- dryrun_multichip(n): full solver-in-the-loop training step (MLP mask
  predictor -> masked-game MCP batch -> IFT gradients -> SGD update), jitted
  over an n-device mesh with the batch axis sharded (dp). In this problem
  domain dp-over-instances is the primary parallelism axis (SURVEY.md §2.4);
  the horizon-sharded factorization (sp analog) is a later kernel tier.
"""

from __future__ import annotations

import functools


def entry():
    """Return (fn, example_args): jittable batched lane-change MCP solve."""
    import jax
    import jax.numpy as jnp

    from mcp_tpu.bench import lane_change as lc
    from mcp_tpu.diff import _solve
    from mcp_tpu.solver import SolverOptions

    bench = lc.generate_test_problem(horizon=10)
    mcp = bench.parametric_game.mcp
    # The flagship tier: block-size-aware block-tridiagonal Newton (fused
    # Pallas Thomas kernel at this problem's b=20; interpret-mode on CPU).
    options = SolverOptions(linear_solver="tridiag_auto")

    batch = 8
    thetas = lc.generate_parameter_batch(
        jax.random.PRNGKey(0), batch, bench, dtype=jnp.float32
    )
    n, m = mcp.unconstrained_dimension, mcp.constrained_dimension
    x0 = jnp.zeros((batch, n), jnp.float32)
    y0 = jnp.ones((batch, m), jnp.float32)
    s0 = jnp.ones((batch, m), jnp.float32)

    fn = jax.vmap(lambda t, x, y, s: _solve(mcp, options, t, x, y, s))
    return fn, (thetas, x0, y0, s0)


def _ensure_cpu_devices(n_devices: int):
    """Return ≥n CPU devices, forcing a virtual CPU topology if needed.

    On this image a sitecustomize pins JAX to the axon TPU backend in every
    process (env-level JAX_PLATFORMS=cpu does NOT stick), so the dry run
    must reconfigure jax itself: set the host-platform device count, switch
    jax_platforms to cpu, and clear any already-initialized backends.
    """
    import os

    import jax

    def _configure():
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
        jax.config.update("jax_platforms", "cpu")

    # Avoid touching (and exclusively claiming) the TPU at all if no backend
    # has been initialized yet: configure the CPU topology up front.
    try:
        from jax._src import xla_bridge as _xb

        initialized = _xb.backends_are_initialized()
    except Exception:
        initialized = True
    if not initialized:
        _configure()
    devices = jax.devices()
    if len(devices) < n_devices or devices[0].platform != "cpu":
        _configure()
        from jax.extend.backend import clear_backends

        clear_backends()
        devices = jax.devices()
    assert (
        len(devices) >= n_devices and devices[0].platform == "cpu"
    ), f"could not obtain {n_devices} CPU devices; got {devices}"
    return devices[:n_devices]


def dryrun_multichip(n_devices: int) -> None:
    """Multi-chip contract on tiny shapes, exercising every production
    parallelism axis (SURVEY.md §2.4):

      1. dp  — one batch-sharded solver-in-the-loop training step (MLP →
               masked-game solves → IFT gradients → SGD);
      2. sp  — one full IP solve with every Newton factorization
               horizon-sharded (SPIKE) over the whole mesh;
      3. dp×sp — one batch of games on a 2-D (dp, horizon) mesh: batch-
               sharded instances whose factorizations are each distributed
               over their horizon team (needs even n_devices ≥ 4);
      4. tp  — one IP solve whose condensed Newton factorization is
               block-column-sharded over the mesh (distributed pivoted LU,
               parallel/tensor.py);
      5. ep  — two heterogeneous shape buckets routed to disjoint device
               groups and solved concurrently (parallel/routing.py).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from mcp_tpu.parallel.batch import solve_batch
    from mcp_tpu.selection.games import (
        build_masked_parametric_game,
        setup_road_environment,
        setup_trajectory_game,
    )
    from mcp_tpu.selection.model import apply_mlp, init_mlp, input_size
    from mcp_tpu.solver import SolverOptions
    from mcp_tpu.trajectories import cold_start_primal

    devices = _ensure_cpu_devices(n_devices)
    mesh = Mesh(np.asarray(devices), ("dp",))

    # Tiny masked game: N=2 players, horizon=2.
    N, horizon, input_horizon, input_state_dim = 2, 2, 2, 2
    env = setup_road_environment(length=10.0)
    game = setup_trajectory_game(environment=env, N=N)
    pg = build_masked_parametric_game(game, N=N, horizon=horizon)
    mcp = pg.mcp
    options = SolverOptions(max_outer_iters=3, max_inner_iters=3, linear_solver="schur")

    in_size = input_size(N, input_horizon, input_state_dim)
    params = init_mlp(jax.random.PRNGKey(0), in_size, N)

    B = n_devices  # one instance per device, dp-sharded
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    initial_states = jax.random.uniform(k1, (B, N, 4), jnp.float32, -1.0, 1.0)
    goals = jax.random.uniform(k2, (B, N, 2), jnp.float32, -2.0, 2.0)
    histories = jax.random.uniform(k3, (B, in_size), jnp.float32, -1.0, 1.0)

    def pack_theta(x0s, gls, mask):
        # θ per player: [x0(4); goal(2); mask(N)]; learned mask in ego block.
        ones = jnp.ones((N,), mask.dtype)
        blocks = []
        for i in range(N):
            mi = jnp.concatenate([jnp.ones((1,), mask.dtype), mask]) if i == 0 else ones
            blocks.append(jnp.concatenate([x0s[i], gls[i], mi]))
        return jnp.concatenate(blocks)

    def training_step(params, histories, initial_states, goals):
        """MLP -> masks -> batched differentiable game solve -> loss -> SGD."""

        def loss_fn(params):
            masks = jax.vmap(lambda h: apply_mlp(params, h))(histories)  # (B, N-1)
            thetas = jax.vmap(pack_theta)(initial_states, goals, masks)
            # Seed primals with the zero-input rollout (the masked game's
            # 1/d² repulsion is singular at the all-zeros cold start;
            # reference examples/utils.jl:218-228 always seeds this way).
            x0 = jax.vmap(
                lambda x0s: cold_start_primal(game, pg, horizon, x0s.reshape(-1))
            )(initial_states)
            sol = solve_batch(mcp, thetas, x0=x0, options=options)
            # Composite loss shape (similarity + sparsity + binariness,
            # train_and_test_utils.jl:272-278) on tiny stand-in targets.
            similarity = jnp.mean(sol.x[:, : N * horizon * 4] ** 2)
            sparsity = jnp.mean(masks)
            binary = jnp.mean(0.5 - jnp.abs(0.5 - masks))
            return 11.0 * similarity + 1.5 * sparsity + 1.0 * binary

        loss, grads = jax.value_and_grad(loss_fn)(params)
        new_params = jax.tree_util.tree_map(lambda p, g: p - 0.005 * g, params, grads)
        return loss, new_params

    batch_sharding = NamedSharding(mesh, P("dp"))
    replicated = NamedSharding(mesh, P())
    histories = jax.device_put(histories, batch_sharding)
    initial_states = jax.device_put(initial_states, batch_sharding)
    goals = jax.device_put(goals, batch_sharding)
    params = jax.device_put(params, replicated)

    step = jax.jit(
        training_step,
        in_shardings=(replicated, batch_sharding, batch_sharding, batch_sharding),
        out_shardings=(replicated, replicated),
    )
    loss, new_params = step(params, histories, initial_states, goals)
    loss.block_until_ready()
    assert bool(jnp.isfinite(loss)), f"non-finite training loss: {loss}"
    # Parity vs the unsharded single-device step (VERDICT r3 item 7: each
    # axis must check closeness against the unsharded solve, not finiteness).
    ref_loss, ref_params = jax.jit(training_step)(
        jax.device_put(params, devices[0]),
        jax.device_put(histories, devices[0]),
        jax.device_put(initial_states, devices[0]),
        jax.device_put(goals, devices[0]),
    )
    # Host-side comparison: the sharded and single-device results live on
    # different device sets, so diffs must not be jitted together.
    dp_diff = max(
        float(np.max(np.abs(np.asarray(loss) - np.asarray(ref_loss)))),
        max(
            float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            for a, b in zip(
                jax.tree_util.tree_leaves(new_params),
                jax.tree_util.tree_leaves(ref_params),
            )
        ),
    )
    assert dp_diff <= 1e-4, f"dp parity vs single-device: max|Δ|={dp_diff}"
    print(
        f"dryrun_multichip({n_devices}): dp training step loss={float(loss):.4f} "
        f"on mesh {mesh.shape}, parity max|Δ|={dp_diff:.2e} — OK"
    )

    # ---- sp: horizon-sharded full IP solve (parallel/horizon.py) ----------
    from mcp_tpu.bench import lane_change as lc
    from mcp_tpu.parallel.horizon import (
        make_dp_horizon_mesh,
        make_horizon_mesh,
        solve_batch_horizon_sharded,
        solve_horizon_sharded,
    )

    # T = 2 blocks per device — the minimum SPIKE slab.
    sp_T = 2 * n_devices
    sp_bench = lc.generate_test_problem(horizon=sp_T)
    sp_mcp = sp_bench.parametric_game.mcp
    assert sp_mcp.time_structure.num_blocks == sp_T
    sp_theta = lc.generate_parameter_batch(
        jax.random.PRNGKey(2), 1, sp_bench, dtype=jnp.float32
    )[0]
    sp_options = SolverOptions(
        linear_solver="tridiag", max_outer_iters=2, max_inner_iters=2
    )
    sp_mesh = make_horizon_mesh(devices)
    sp_sol = solve_horizon_sharded(sp_mcp, sp_theta, mesh=sp_mesh, options=sp_options)
    sp_sol.x.block_until_ready()
    assert bool(jnp.all(jnp.isfinite(sp_sol.x))), "sp solve produced non-finite x"
    import mcp_tpu as _mcp_tpu

    sp_ref = _mcp_tpu.solve(sp_mcp, sp_theta, options=sp_options)
    sp_diff = float(np.max(np.abs(np.asarray(sp_sol.x) - np.asarray(sp_ref.x))))
    assert sp_diff <= 1e-4, f"sp parity vs single-device: max|Δx|={sp_diff}"
    print(
        f"dryrun_multichip({n_devices}): horizon-sharded (sp) IP solve "
        f"T={sp_T} on mesh {sp_mesh.shape}, parity max|Δx|={sp_diff:.2e} — OK"
    )

    # ---- dp×sp: batch of games on a 2-D (dp, horizon) mesh ----------------
    if n_devices >= 4 and n_devices % 2 == 0:
        dp_size = n_devices // 2
        mesh2d = make_dp_horizon_mesh(dp_size, 2, devices)
        b2_T = 4  # 2 blocks per 2-device horizon team
        b2_bench = lc.generate_test_problem(horizon=b2_T)
        b2_thetas = lc.generate_parameter_batch(
            jax.random.PRNGKey(3), dp_size, b2_bench, dtype=jnp.float32
        )
        b2_sol = solve_batch_horizon_sharded(
            b2_bench.parametric_game.mcp,
            b2_thetas,
            mesh=mesh2d,
            options=sp_options,
        )
        b2_sol.x.block_until_ready()
        assert bool(jnp.all(jnp.isfinite(b2_sol.x))), "dp×sp solve non-finite"
        b2_ref = solve_batch(
            b2_bench.parametric_game.mcp, b2_thetas, options=sp_options
        )
        b2_diff = float(np.max(np.abs(np.asarray(b2_sol.x) - np.asarray(b2_ref.x))))
        assert b2_diff <= 1e-4, f"dp×sp parity: max|Δx|={b2_diff}"
        print(
            f"dryrun_multichip({n_devices}): dp×horizon solve batch={dp_size} "
            f"T={b2_T} on mesh {mesh2d.shape}, parity max|Δx|={b2_diff:.2e} — OK"
        )
    else:
        print(
            f"dryrun_multichip({n_devices}): dp×horizon needs even "
            "n_devices ≥ 4 — skipped"
        )

    # ---- tp: ONE Newton factorization column-sharded over the mesh --------
    from mcp_tpu import PrimalDualMCP
    from mcp_tpu.parallel.tensor import make_tp_mesh, solve_single_tp

    rng = np.random.RandomState(0)
    tp_n, tp_m = 12, 6
    Pm = rng.randn(tp_n, tp_n)
    Mq = jnp.asarray(Pm @ Pm.T + tp_n * np.eye(tp_n), jnp.float32)
    Aq = jnp.asarray(rng.randn(tp_m, tp_n), jnp.float32)
    bq = jnp.asarray(rng.randn(tp_m), jnp.float32)
    tp_mcp = PrimalDualMCP.from_gh(
        lambda x, y, t: Mq @ x - t - Aq.T @ y,
        lambda x, y, t: Aq @ x - bq,
        unconstrained_dimension=tp_n,
        constrained_dimension=tp_m,
        parameter_dimension=tp_n,
    )
    tp_mesh = make_tp_mesh(devices)
    tp_sol = solve_single_tp(
        tp_mcp,
        jnp.zeros((tp_n,), jnp.float32),
        mesh=tp_mesh,
        panel=4,
        options=SolverOptions(max_outer_iters=2, max_inner_iters=2),
    )
    tp_sol.x.block_until_ready()
    assert bool(jnp.all(jnp.isfinite(tp_sol.x))), "tp solve non-finite"
    tp_ref = _mcp_tpu.solve(
        tp_mcp,
        jnp.zeros((tp_n,), jnp.float32),
        options=SolverOptions(
            max_outer_iters=2, max_inner_iters=2, linear_solver="condensed"
        ),
    )
    tp_diff = float(np.max(np.abs(np.asarray(tp_sol.x) - np.asarray(tp_ref.x))))
    assert tp_diff <= 1e-4, f"tp parity vs single-device: max|Δx|={tp_diff}"
    print(
        f"dryrun_multichip({n_devices}): tensor-parallel (tp) condensed "
        f"factorization on mesh {tp_mesh.shape}, parity max|Δx|={tp_diff:.2e} — OK"
    )

    # ---- ep: heterogeneous shape buckets routed to device groups ----------
    from mcp_tpu.parallel.routing import ShapeBucket, solve_routed

    ep_thetas_small = jnp.zeros((3, tp_n), jnp.float32)  # odd batch: pads
    ep_mcp_big = PrimalDualMCP.from_gh(
        lambda x, y, t: Mq @ x - t - Aq.T @ y + 0.1 * x,
        lambda x, y, t: Aq @ x - bq,
        unconstrained_dimension=tp_n,
        constrained_dimension=tp_m,
        parameter_dimension=tp_n,
    )
    ep_results = solve_routed(
        [
            ShapeBucket(
                tp_mcp,
                ep_thetas_small,
                options=SolverOptions(max_outer_iters=2, max_inner_iters=2),
            ),
            ShapeBucket(
                ep_mcp_big,
                jnp.zeros((n_devices, tp_n), jnp.float32),
                options=SolverOptions(max_outer_iters=2, max_inner_iters=2),
            ),
        ],
        devices,
    )
    assert ep_results[0].x.shape[0] == 3
    assert all(bool(jnp.all(jnp.isfinite(r.x))) for r in ep_results)
    ep_opts = SolverOptions(max_outer_iters=2, max_inner_iters=2)
    ep_refs = [
        solve_batch(tp_mcp, ep_thetas_small, options=ep_opts),
        solve_batch(ep_mcp_big, jnp.zeros((n_devices, tp_n), jnp.float32), options=ep_opts),
    ]
    ep_diff = max(
        float(np.max(np.abs(np.asarray(r.x) - np.asarray(ref.x))))
        for r, ref in zip(ep_results, ep_refs)
    )
    assert ep_diff <= 1e-4, f"ep parity vs unsharded batch: max|Δx|={ep_diff}"
    print(
        f"dryrun_multichip({n_devices}): heterogeneous routing (ep) over "
        f"2 device groups, parity max|Δx|={ep_diff:.2e} — OK"
    )

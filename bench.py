#!/usr/bin/env python
"""Benchmark entry point: batched lane-change trajectory-game MCP solves/s.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Protocol (mirrors the reference benches, re-targeted at the TPU design):
  * problem: the 2-player lane-change game, horizon 10 — the reference's
    trajectory-game benchmark workload (benchmark/trajectory_game_benchmark.jl:39)
    with randomized initial states + lane preferences (:62-87).
  * batch of B random θ solved via the vmapped fixed-shape interior-point
    solve on one TPU chip, f32, tol=1e-4 (reference src/solver.jl:42-48)
    with the tuned ϵ-annealing schedule (see --tightening-rate; pass
    --tightening-rate 0.1 for the reference schedule, --polish for
    certified true residuals); timing = best of `repeats` full-batch runs
    after a compile warm-up.
  * vs_baseline: the reference's measured N=2 receding-horizon step time of
    0.23 s/solve on CPU (scripts/time_plot.py:5-14, BASELINE.md) →
    baseline rate 1/0.23 ≈ 4.35 solves/s. vs_baseline = solves_per_sec / 4.35.

Flags: --cpu (debug on CPU), --batch B, --repeats R, --quick (tiny batch).
"""

import argparse
import json
import sys
import time

_T0 = time.monotonic()


def _phase(name: str) -> None:
    """Stderr wall-clock breadcrumbs: where the capture window goes
    (VERDICT r3: the round-3 driver record was rc=124 with no number —
    the official record must show WHICH stage ate the clock)."""
    print(f"[bench +{time.monotonic() - _T0:7.1f}s] {name}", file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument(
        "--suite",
        default="lane_change",
        choices=["lane_change", "qp", "warm"],
        help="lane_change (driver metric), the random-QP suite "
        "(benchmark/quadratic_program_benchmark.jl protocol), or warm "
        "(receding-horizon warm-started θ-sweep, examples/utils.jl:209-216)",
    )
    # IP algorithm: the reference-parity annealed loop ("ip"), the Mehrotra
    # predictor-corrector (shines on monotone problems and warm re-solves:
    # QP certified 3.8x faster than the annealed loop), or the hybrid
    # (annealed warm-up -> Mehrotra tail; the N=4 small-batch winner).
    # Default: mehrotra for the QP suite (its KKT system is monotone and
    # affine — cold-start PC is robust there), ip elsewhere.
    parser.add_argument(
        "--algorithm", default=None, choices=["ip", "mehrotra", "hybrid"]
    )
    # Mehrotra/hybrid iterative-refinement back-solves per Newton solve.
    # Default: 0 for the QP suite (polish already certifies the terminal
    # residual; refinement doubles the per-iteration factorization count
    # for nothing there), 1 elsewhere (the N=10 certification needs it).
    parser.add_argument("--refinement-steps", type=int, default=None)
    # With the fused Pallas Thomas tier, throughput keeps climbing past one
    # VMEM tile's worth of systems (measured with the lane-packed kernel:
    # 779/s at 128, 852/s at 256).
    parser.add_argument("--batch", type=int, default=256)
    # Median-of-5 with a FRESH θ batch per repeat plus an in-graph
    # cross-check (harness.benchmark_batched): hardened against the round-2
    # driver artifact where identical repeated dispatches were collapsed by
    # backend caching and min-of-3 reported an 85x-wrong number.
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument("--quick", action="store_true")
    # Streamed serving path: solve K batches inside ONE lax.scan dispatch
    # (parallel.solve_batches_streamed) — amortizes the ~14 ms tunnel
    # dispatch that separates the per-dispatch host rate from the device
    # rate. DEFAULT for the lane-change driver metric since round 5
    # (VERDICT r4 item 2: the per-dispatch certified number lost ~45% of
    # its wall time to tunnel-dispatch slack; the streamed protocol IS the
    # dispatch-lean serving path, so the certified number now contains the
    # device rate). 0 = per-dispatch protocol; default: 8 for lane_change,
    # 0 for the other suites.
    parser.add_argument("--stream", type=int, default=None, metavar="K")
    # In-graph loosened retries for failed lanes (SolverOptions.retry).
    # DEFAULT 0 since round 5 — reference-parity failure semantics: the
    # hard-draw forensics (ROUND5.md item 4) proved ~34% of fresh 256-lane
    # batches carry a hard draw whose gated retry costs ~20 ms/batch
    # amortized while rescuing only the 12/17 rescuable ones (success
    # 0.9987 -> 0.9997); the rest are f64-verified infeasible instances
    # the reference's solver (no retry) fails identically. Measured:
    # retry 0 = 7,342/s certified vs retry 1 = 4,582/s. --retry 1 is the
    # robustness option for rescue-worthy serving.
    parser.add_argument("--retry", type=int, default=None)
    # Streamed-protocol span structure: `pipeline` dispatches enqueued
    # back-to-back per timed span. Measured round 5: the tunnel's execute
    # RPC is synchronous, so pipelining >1 amortizes NOTHING (kept for
    # protocol experiments; scan depth --stream is the real amortizer).
    parser.add_argument("--pipeline", type=int, default=1)
    parser.add_argument("--spans", type=int, default=3)
    parser.add_argument("--tol", type=float, default=1e-4)
    # f64 solves (reference QP protocol runs tol 1e-6, benchmark/path.jl:8;
    # f32 floors at ~6e-6 true residual). TPUs emulate f64 — pair with
    # --cpu for the honest reference-protocol row.
    parser.add_argument("--x64", action="store_true")
    # Compensated-f32 (double-word) protocol row: f32 Mosaic solve at
    # tol 1e-5, then bench/qp_dw.py double-word refinement + doubled-
    # precision certification at --tol (the reference PATH protocol's 1e-6,
    # benchmark/path.jl:8) — f64-grade certification with no f64 on the
    # chip (VERDICT r4 item 6). QP suite only.
    parser.add_argument("--dw", action="store_true")
    parser.add_argument("--dw-iters", type=int, default=8)
    # Tier ladder, all exact (linalg.py/DESIGN.md). "tridiag_pallas"
    # (affine-bands/colored-seed banded assembly + the fused whole-batch
    # Pallas block-Thomas, kernels/thomas_pallas.py; auto-selects the
    # lane-major batch-on-lanes kernel at B>=128) is the fastest:
    # 5215 solves/s at batch 256 (1242 batch-major packed, 288 tridiag
    # XLA-scan Thomas, 193 schur_pallas, 149 schur) on the lane-change
    # bench — the XLA scan spent 60% of each iteration in 10 sequential
    # tiny batched LU dispatches that the fused kernel runs in one
    # VMEM-resident pallas_call; the lane-major layout then removes the
    # 2.5x Mosaic tile padding that bound it (DESIGN.md §7).
    parser.add_argument("--tier", default="tridiag_pallas")
    # Terminal polish: certify the TRUE residual ≤ tol (SolverOptions.polish).
    # DEFAULT ON since round 3: the driver-visible headline must be honest at
    # tolerance (frac_true_kkt_at_tol = 1.0) — the reference's benchmark
    # protocol counts solves at tolerance (benchmark/path.jl:8,101-126), and
    # the bare ϵ-exit loop can report :solved with true ‖F‖∞ above tol.
    # --no-polish gives the reference-parity uncertified exit.
    parser.add_argument(
        "--polish", action=argparse.BooleanOptionalAction, default=True
    )
    # ϵ-annealing rate. The library default stays the reference's 0.1
    # (src/solver.jl:44, conformance); the BENCH default is "auto" — the
    # shape-keyed rule (solver.auto_tightening_rate): 0.02 for small-block
    # trajectory games (headline/N=4; measured 865.5 → 1174.2 solves/s at
    # success 1.0), 0.05 for large blocks (N=10), 0.1 otherwise. One
    # config certifies every flagship shape with no per-shape flag.
    parser.add_argument("--tightening-rate", default="auto")
    # Force the fused Pallas linesearch kernel on/off (default: tier-based).
    parser.add_argument(
        "--fused-linesearch", default="default", choices=["default", "on", "off"]
    )
    # Wall-clock budget for the whole run. The certified host-timed JSON
    # line is ALWAYS emitted as soon as the repeat loop + true-KKT eval
    # finish; the in-graph cross-check (a second large compile) only runs
    # if at least ~40% of the budget remains, else the final line carries
    # "ingraph_skipped". Round-3 lesson: the driver's capture window timed
    # out (rc=124) on the full three-compile pipeline and the official
    # record had NO number.
    parser.add_argument("--budget-seconds", type=float, default=420.0)
    args = parser.parse_args()
    if args.stream is None:
        # Streamed-scan serving protocol. Scan depth K is the dispatch-slack
        # amortizer: the axon tunnel's execute round-trip is SYNCHRONOUS
        # (measured round 5: a 4-deep async pipeline amortized nothing —
        # per-dispatch slack 260-290 ms/dispatch was preserved exactly), so
        # slack/K is the only lever and K=32 puts a worst-day 290 ms tunnel
        # at ~9 ms/batch against a 33 ms device batch time. QP's batch time
        # is similar but its scan compiles ~3x slower — K=16. The warm
        # suite has its own chained protocol; --dw times its own pipeline;
        # --stream 0 recovers the per-dispatch protocol.
        if args.dw or args.suite == "warm":
            args.stream = 0
        else:
            # lax.scan compiles its body once — K does not grow compile
            # time, only the θ-stack footprint (QP: 20.2k-float θ × 256 ×
            # 32 ≈ 662 MB on a 16 GB chip).
            args.stream = 32
    if args.retry is None:
        args.retry = 0
    if args.stream > 0 and args.repeats < 1:
        parser.error("--stream requires --repeats >= 1")

    import jax

    _phase("jax imported")
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        # Persistent compile cache + CPU probe backend (the problem
        # builder's validation probes compile locally, not through the
        # tunnel — round-4: 360 s of the 387 s bench wall-clock was probe
        # compiles). Shared setup: utils/devices.configure_tpu_cache.
        import os

        from mcp_tpu.utils.devices import configure_tpu_cache

        ok = configure_tpu_cache()
        _phase(f"cpu probe backend available: {ok}")
        os.environ.setdefault("MCPTPU_BUILD_TRACE", "1")
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from mcp_tpu.bench import harness
    from mcp_tpu.bench import lane_change as lc

    batch = 16 if args.quick else args.batch
    key = jax.random.PRNGKey(1)  # seeded like path.jl:14 (MersenneTwister(1))
    dtype = jnp.float64 if args.x64 else jnp.float32

    # θ generation runs on the CPU backend (when available) and is
    # device_put to the bench device: the sampler is a one-shot program
    # whose tunnel compile (~25 s, round-4 build trace) is pure capture-
    # window overhead. Timing is unaffected — generation is outside the
    # clock and the (B, p) transfer is microseconds.
    from mcp_tpu.utils.devices import probes_on_cpu

    bench_device = jax.devices()[0]

    def _on_bench_device(make):
        def sampler(i):
            with probes_on_cpu():
                th = make(i)
            return jax.device_put(th, bench_device)

        return sampler

    if args.suite == "qp":
        # Reference protocol: 100 random sparse convex QPs, 100 primals +
        # 100 inequalities, sparsity 0.9 (benchmark/path.jl:5-17).
        from mcp_tpu.bench import qp

        problem = qp.generate_test_problem()
        mcp = problem.mcp
        theta_sampler = _on_bench_device(
            lambda i: qp.generate_parameter_batch(
                jax.random.fold_in(key, 1 + i), batch, dtype=dtype
            )
        )
        thetas = _on_bench_device(
            lambda i: qp.generate_parameter_batch(key, batch, dtype=dtype)
        )(0)
        # jit-traceable per-batch generator (the streamed protocol
        # generates θ ON-CHIP inside the timed program — see below).
        traced_batch_sampler = lambda k: qp.generate_parameter_batch(
            k, batch, dtype=dtype
        )
        metric_name = "qp_mcp_solves_per_sec"
        if args.tier.startswith("tridiag"):
            # Round-5 QP default: the static-slice no-pivot Gauss-Jordan
            # kernel (zero cross-sublane reductions per elimination step vs
            # QR's ~28 µs/reflector op overhead, logs/tpu_queue_r4k) with
            # the in-graph retry falling back to the stable QR tier for
            # the rare ill-conditioned lanes GJ cannot certify
            # (VERDICT r4 item 3).
            print(
                f"note: --tier {args.tier} has no QP time structure; "
                "running the exact 'schur_pallas_gj' tier instead",
                file=sys.stderr,
            )
            args.tier = "schur_pallas_gj"
            # Round-5 measured: the gated annealed retry was a ~14x drag on
            # the streamed QP suite — nearly every fresh 256-draw batch
            # contains ~1 infeasible-by-construction draw (qp.py:10) that
            # the retry can never rescue but whose gated annealed re-solve
            # the whole batch waits on (321.8 -> 22.9 ms/batch without it,
            # IDENTICAL success 0.9961; the doubled-precision certifier
            # measured dw_frac_solved = 1.0 for the GJ tier without any
            # retry containment). Opt back in with --retry 1.
        if (
            args.x64
            and args.tier.startswith("schur_pallas")
            and not args.cpu
        ):
            # Mosaic has no f64 path; the f64 reference-protocol row runs
            # the exact XLA "schur" tier instead (kernel parity is an f32
            # concern — the f64 row exists for the tol-1e-6 protocol,
            # benchmark/path.jl:8).
            print(
                "note: --x64 on TPU uses the 'schur' tier "
                "(Mosaic kernels are f32-only)",
                file=sys.stderr,
            )
            args.tier = "schur"
    else:
        bench = lc.generate_test_problem(horizon=10)
        mcp = bench.parametric_game.mcp
        theta_sampler = _on_bench_device(
            lambda i: lc.generate_parameter_batch(
                jax.random.fold_in(key, 1 + i), batch, bench, dtype=dtype
            )
        )
        thetas = _on_bench_device(
            lambda i: lc.generate_parameter_batch(key, batch, bench, dtype=dtype)
        )(0)
        traced_batch_sampler = lambda k: lc.generate_parameter_batch(
            k, batch, bench, dtype=dtype
        )
        metric_name = "lane_change_mcp_solves_per_sec"

    from mcp_tpu.solver import SolverOptions

    if args.algorithm is None:
        args.algorithm = "mehrotra" if args.suite == "qp" else "ip"
    if args.refinement_steps is None:
        args.refinement_steps = 0 if args.suite == "qp" else 1
    option_kwargs = dict(
        tol=args.tol,
        linear_solver=args.tier,
        algorithm=args.algorithm,
        polish=args.polish,
        refinement_steps=args.refinement_steps,
        retry=args.retry,
    )
    if args.suite == "lane_change" and args.retry:
        # Retry budget: rescued lane-change draws need <= ~16 annealed outer
        # iterations (round-5 hard-draw forensics, 12/17 rescued); the
        # f64-verified-infeasible rest would otherwise drag their batch to
        # the monolithic cap inside the gated retry.
        option_kwargs["retry_max_outer_iters"] = 20
    if args.suite == "qp":
        # Iteration caps sized to the solving population (median 12 PC
        # iters, p99 well under 25): infeasible draws fail FAST instead of
        # running the monolithic 50-iteration cap the whole batch waits on
        # (round-5 hard-draw forensics; same lever as the lane-change
        # retry_max_outer_iters).
        option_kwargs["max_outer_iters"] = 25
        option_kwargs["retry_max_outer_iters"] = 8
    if args.suite == "qp" and args.tier.startswith("schur_pallas_gj"):
        # The no-pivot GJ tiers retry on the unconditionally-stable QR tier
        # (when --retry is enabled).
        option_kwargs["retry_linear_solver"] = "schur_pallas"
    # NOTE (round-5 measured): polishing the QP suite to 0.5*tol was a
    # NEGATIVE result — tol 1e-5 sits AT the f32 evaluation-noise floor
    # (~6e-6 at QP data scales), so the polish loop chases a target its own
    # f32 residual measurement cannot resolve (most lanes burn all 20
    # polish iterations: ~3x throughput loss) and the doubled-precision
    # certifier still found solved lanes truly up to 1.85e-5. f32-only
    # certification at this tol is noise-floor-limited by construction;
    # the dw certifier below reports the TRUE per-lane residuals honestly,
    # and guaranteed sub-tol certification is the --dw pipeline's job
    # (42.5/s at tol 1e-6 with frac 1.0).
    if args.fused_linesearch != "default":
        option_kwargs["fused_linesearch"] = args.fused_linesearch == "on"
    if args.tightening_rate == "auto":
        from mcp_tpu.solver import auto_tightening_rate

        option_kwargs["tightening_rate"] = auto_tightening_rate(mcp)
    else:
        option_kwargs["tightening_rate"] = float(args.tightening_rate)
    options = SolverOptions(**option_kwargs)

    _phase(f"problem built (suite={args.suite}); compiling the batched solve")

    baseline_solves_per_sec = 1.0 / 0.23  # reference CPU per-step rate

    def make_out(stats: dict, name: str) -> dict:
        out = {
            "metric": name,
            "value": round(stats["solves_per_sec"], 3),
            "unit": "solves/s",
            "vs_baseline": round(
                stats["solves_per_sec"] / baseline_solves_per_sec, 2
            ),
            "batch_size": stats["batch_size"],
            "success_rate": round(stats["success_rate"], 4),
            "median_outer_iters": stats["median_outer_iters"],
            "best_batch_time_s": round(stats["best_batch_time_s"], 4),
            "max_kkt_error_solved": float(f"{stats['max_kkt_error_solved']:.3g}"),
            # Recomputed ‖F‖∞ at the final iterates — the honest convergence
            # numbers (the solver's status can report :solved on the
            # reference's ϵ ≤ tol exit with kkt above tol; see
            # harness.true_kkt_errors).
            "true_kkt_max": float(f"{stats['true_kkt_max']:.3g}"),
            "true_kkt_median": float(f"{stats['true_kkt_median']:.3g}"),
            "frac_true_kkt_at_tol": round(stats["frac_true_kkt_at_tol"], 4),
            "tol": args.tol,
            "certified": bool(args.polish),
            "device": str(jax.devices()[0]),
        }
        for k in (
            "median_batch_time_s",
            "ingraph_batch_time_s",
            "timing_consistent",
            "ingraph_skipped",
            "stream_depth",
            "pipeline_depth",
            "spans",
            "instances_timed",
            "full_result_dispatch_s",
            "retry",
            "stream_failures_reproduce_standalone",
        ):
            if k in stats:
                out[k] = (
                    round(stats[k], 4) if isinstance(stats[k], float) else stats[k]
                )
        return out

    if args.dw:
        # Double-word tol-1e-6 QP protocol (see --dw). One pipeline =
        # f32 certified solve (tol 1e-5) + dw refinement; timed end to end.
        if args.suite != "qp":
            raise SystemExit("--dw is a QP-suite protocol row")
        import time as _time

        import numpy as _np

        from mcp_tpu.bench import qp_dw
        from mcp_tpu.parallel.batch import solve_batch

        dw_tol = args.tol if args.tol < 1e-5 else 1e-6
        f32_options = SolverOptions(
            **{**option_kwargs, "tol": 1e-5, "polish": True}
        )
        n_p, m_p = problem.num_primals, problem.num_inequalities

        def run(th):
            res = solve_batch(mcp, th, options=f32_options)
            st, tk = qp_dw.polish_batch_dw(
                th, res.x, res.y, res.s, n=n_p, m=m_p, tol=dw_tol,
                iters=args.dw_iters,
            )
            return res, st, tk

        res, st, tk = run(thetas)
        float(jnp.sum(tk))  # compile + force
        _phase("dw pipeline compiled; timing repeats")
        times = []
        for r in range(1, args.repeats + 1):
            th = theta_sampler(r)
            float(jnp.sum(th))  # upload outside the clock (VALUE-forced)
            t0 = _time.perf_counter()
            res, st, tk = run(th)
            float(jnp.sum(tk))  # force the VALUE (CLAUDE.md timing rule)
            times.append(_time.perf_counter() - t0)
        tk = _np.asarray(tk)
        status = _np.asarray(res.status)
        median_t = float(_np.median(times))
        # Certification judges the MEASURED doubled-precision residual, not
        # the f32 stage's status flag: the dw polish routinely pushes lanes
        # the f32 stage gave up on under tol (round-5 capture: a
        # status-failed lane landed at 8.9e-7 ≤ 1e-6 — a residual that
        # small IS a valid KKT point; the flag was stale).
        certified_ok = tk <= dw_tol
        out = {
            "metric": "qp_mcp_solves_per_sec_dw",
            "value": round(batch / median_t, 3),
            "unit": "solves/s",
            "batch_size": batch,
            "f32_stage_success_rate": round(float(_np.mean(status == 0)), 4),
            "median_batch_time_s": round(median_t, 4),
            "best_batch_time_s": round(float(min(times)), 4),
            "tol": dw_tol,
            "true_kkt_dw_max": float(f"{float(_np.max(tk)):.3g}"),
            "true_kkt_dw_median": float(f"{float(_np.median(tk)):.3g}"),
            "frac_true_kkt_at_tol": round(float(_np.mean(certified_ok)), 4),
            "certified": bool(_np.all(certified_ok)),
            "dw_iters": args.dw_iters,
            "device": str(jax.devices()[0]),
        }
        _phase("dw protocol row")
        print(json.dumps(out), flush=True)
        return

    if args.suite == "warm":
        # K sweep steps with a small θ drift per step (the receding-horizon
        # pattern); warm slacks so Mehrotra runs in its superlinear regime.
        K = 4 if args.quick else 10
        sweep = jnp.stack([thetas + 0.005 * k for k in range(K)])
        out_sweep = harness.benchmark_warm_sweep(
            mcp,
            sweep,
            options=options,
            cold_options=SolverOptions(tol=args.tol, linear_solver=args.tier),
            warm_slacks=True,
        )
        stats = {
            "solves_per_sec": out_sweep["warm_solves_per_sec"],
            "batch_size": out_sweep["batch_size"],
            "success_rate": out_sweep["final_success_rate"],
            "median_outer_iters": out_sweep["median_outer_iters_per_step"][-1],
            "best_batch_time_s": out_sweep["median_step_time_s"],
            "median_batch_time_s": out_sweep["median_step_time_s"],
            "ingraph_batch_time_s": out_sweep["ingraph_step_time_s"],
            "timing_consistent": out_sweep["timing_consistent"],
            "max_kkt_error_solved": out_sweep["true_kkt_max"],
            "true_kkt_max": out_sweep["true_kkt_max"],
            "true_kkt_median": out_sweep["true_kkt_median"],
            "frac_true_kkt_at_tol": out_sweep["frac_true_kkt_at_tol"],
        }
        metric_name = "warm_lane_change_mcp_solves_per_sec"
    elif args.stream > 0:
        # K different batches solved back-to-back in one compiled dispatch;
        # timed over `repeats` dispatches of fresh K-stacks, median reported.
        import time as _time

        import numpy as _np

        # TIMED program: θ-generation + the K-deep solve scan + an on-chip
        # two-scalar reduction (Σx + Σouter_iters — every solve feeds them,
        # so nothing can be dead-code-eliminated), all inside ONE jit whose
        # argument is a PRNG KEY (8 bytes up, 4 bytes down).
        #
        # Why, measured round 5 on the axon tunnel: the execute RPC moves
        # argument and result LITERALS through the tunnel per call — the
        # K=32 lane-change stack+iterates (~40 MB round trip) cost
        # ~1.4 s/dispatch and the QP stack (662 MB) ~9 s/dispatch, of pure
        # dev-tunnel bandwidth that no chip-adjacent deployment pays
        # (PCIe moves 40 MB in ~4 ms); pre-forcing uploads did not stick
        # because the literals ride the execute itself. On-chip generation
        # from a key is the honest protocol: the device does ALL the work
        # (gen + solve), the wire carries nothing, and the SAME key
        # deterministically reproduces every θ for the untimed
        # certification dispatches below (`full_result_dispatch_s` reports
        # what a full-result dispatch costs through this tunnel).
        from mcp_tpu.parallel.batch import _streamed_solver

        K = args.stream

        def gen_stack_traced(k):
            keys = jax.random.split(k, K)
            return jnp.stack(
                [traced_batch_sampler(keys[i]) for i in range(K)]
            )

        _run = _streamed_solver(mcp, options, False, False)
        n_dim, m_dim = mcp.unconstrained_dimension, mcp.constrained_dimension
        x0s = jnp.zeros((batch, n_dim), jnp.float32)
        y0s = jnp.ones((batch, m_dim), jnp.float32)
        s0s = jnp.ones((batch, m_dim), jnp.float32)

        def _solve_from_key(k):
            return _run(gen_stack_traced(k), x0s, y0s, s0s)

        timed_fn = jax.jit(
            lambda k: (
                lambda res: jnp.sum(res.x).astype(jnp.float32)
                + jnp.sum(res.outer_iters).astype(jnp.float32)
            )(_solve_from_key(k))
        )
        full_fn = jax.jit(_solve_from_key)
        stack_fn = jax.jit(gen_stack_traced)

        # rbg keys: the QP θ batch draws ~15M threefry values (uniform P/A
        # + bernoulli masks over 20.2k dims × 256) — measured ~350 ms/batch
        # of pure PRNG inside the timed program. The hardware-RNG rbg impl
        # is deterministic-per-key and an order of magnitude faster.
        _rbg_base = jax.random.key(1, impl="rbg")
        span_key = lambda sp: jax.random.fold_in(_rbg_base, 7000 + sp)
        float(timed_fn(span_key(-1)))  # compile + warm
        spans = max(1, args.spans)
        pipeline = max(1, args.pipeline)
        times = []  # per-span wall seconds
        all_results = []
        full_result_times = []
        for sp in range(spans):
            ks = [span_key(sp * pipeline + r) for r in range(pipeline)]
            t0 = _time.perf_counter()
            for k in ks:
                float(timed_fn(k))
            times.append(_time.perf_counter() - t0)
            # Untimed full-result dispatches of the SAME keys (identical
            # θ draws by PRNG determinism) for statistics + certification.
            for k in ks:
                t1 = _time.perf_counter()
                res = full_fn(k)
                float(jnp.sum(res.x))
                full_result_times.append(_time.perf_counter() - t1)
                all_results.append(res)
            last_stack = stack_fn(ks[-1])
        result = all_results[-1]
        # Per-batch time: span wall-clock over its pipeline*K batches.
        times = [t / pipeline for t in times]
        median_t = float(_np.median(times))
        flat = jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), result)
        stats = harness.batch_statistics(flat)
        # Success over EVERY dispatched instance (spans × pipeline × K × B),
        # not just the last dispatch — the larger sample is the honest
        # failure-rate estimate.
        all_status = _np.concatenate(
            [_np.asarray(r.status).reshape(-1) for r in all_results]
        )
        stats["success_rate"] = float(_np.mean(all_status == 0))
        stats["instances_timed"] = int(all_status.size)
        # Round-3's streamed row showed success 0.999 vs per-dispatch 1.0.
        # Explanation: the streamed protocol solves repeats·K·B DISTINCT
        # instances (theta_sampler indices r·K+k) vs the per-dispatch
        # protocol's repeats·B — a ~99.95% per-instance success rate shows
        # ~1 failure per 2048 draws only in the larger sample. Verify that
        # any failed lane is instance-hard, not a scan-path artifact: the
        # exact failing batch re-solves standalone and must agree.
        fail_k = _np.flatnonzero(
            _np.asarray((result.status != 0).any(axis=1))
        )
        if fail_k.size:
            from mcp_tpu.parallel.batch import solve_batch as _sb

            k0 = int(fail_k[0])
            standalone = _sb(mcp, last_stack[k0], options=options)
            # "Reproduces" = the standalone solve of the same batch also
            # fails on the same lanes. Compared as a superset rather than
            # bit-equality: the scan-wrapped and standalone programs are
            # different XLA programs and a borderline lane within ULPs of
            # tol may legally flip — only a lane that fails in the scan
            # but SOLVES standalone would indicate a scan-path artifact.
            scan_fail = set(
                _np.flatnonzero(_np.asarray(result.status[k0]) != 0).tolist()
            )
            alone_fail = set(
                _np.flatnonzero(_np.asarray(standalone.status) != 0).tolist()
            )
            stats["stream_failures_reproduce_standalone"] = bool(
                scan_fail <= alone_fail
            )
        flat_thetas = last_stack.reshape(-1, last_stack.shape[-1])
        true_kkt = _np.asarray(
            harness.true_kkt_errors(mcp, flat, flat_thetas)
        )
        if args.suite == "qp":
            # The QP certification metric is DOUBLED-precision (the f32
            # recompute carries ~6e-6 of evaluation noise at tol 1e-5 —
            # solver-vs-harness measurements of the same iterate differed
            # 19% at the boundary in the round-5 capture). mv2-based
            # residuals have a ~1e-12 floor: this is the true residual.
            import functools as _ft

            from mcp_tpu.bench import qp_dw as _qp_dw

            n_p, m_p = problem.num_primals, problem.num_inequalities

            def _dw_kkt(th, x, y, s):
                st_dw = _qp_dw.DWState(
                    x, jnp.zeros_like(x), y, jnp.zeros_like(y),
                    s, jnp.zeros_like(s),
                )
                return _qp_dw.true_kkt_dw(th, st_dw, n=n_p, m=m_p)

            # Chunked: the compensated matvecs materialize several
            # (chunk, n, n) f32 temporaries — the full 24,576-instance
            # flat batch would need ~39 GB. 512/chunk stays ~2 GB.
            dw_fn = jax.jit(jax.vmap(_dw_kkt))
            chunks = []
            with jax.default_matmul_precision("highest"):
                for c0 in range(0, flat_thetas.shape[0], 512):
                    c1 = c0 + 512
                    chunks.append(
                        _np.asarray(
                            dw_fn(
                                flat_thetas[c0:c1], flat.x[c0:c1],
                                flat.y[c0:c1], flat.s[c0:c1],
                            )
                        )
                    )
            true_kkt = _np.concatenate(chunks)
        solved = _np.asarray(flat.status) == 0
        solved_kkt = true_kkt[solved] if solved.any() else _np.asarray([_np.nan])
        stats.update(
            {
                "batch_size": batch,
                "stream_depth": args.stream,
                "pipeline_depth": pipeline,
                "spans": spans,
                "retry": args.retry,
                "best_batch_time_s": float(min(times)) / args.stream,
                "median_batch_time_s": median_t / args.stream,
                "full_result_dispatch_s": round(
                    float(_np.median(full_result_times)), 4
                ),
                "solves_per_sec": args.stream * batch / median_t,
                "true_kkt_max": float(_np.max(solved_kkt)),
                "true_kkt_median": float(_np.median(solved_kkt)),
                "frac_true_kkt_at_tol": float(_np.mean(true_kkt <= options.tol)),
            }
        )
        metric_name += "_streamed"
        # Two-stage emission (same contract as the per-dispatch branch): the
        # certified host-timed line prints now; the independent in-graph
        # fori-loop cross-check (a second large compile) follows if budget
        # remains and the final line carries the verdict. The streamed scan
        # is itself dispatch-amortized, so host-vs-in-graph agreement here
        # checks the VALUE-forcing against an independently-structured
        # program rather than dispatch slack.
        _phase("streamed repeats + true-KKT done; emitting certified line")
        print(json.dumps(make_out(stats, metric_name)), flush=True)
        elapsed = time.monotonic() - _T0
        if elapsed <= 0.6 * args.budget_seconds:
            _phase("in-graph cross-check (second large compile)")
            xstats = {
                "batch_size": batch,
                "median_batch_time_s": median_t / args.stream,
            }
            harness.apply_ingraph_crosscheck(
                mcp, xstats, theta_sampler, options=options, repeats=3
            )
            stats["ingraph_batch_time_s"] = xstats["ingraph_batch_time_s"]
            stats["timing_consistent"] = xstats["timing_consistent"]
            per_batch = max(
                median_t / args.stream, xstats["ingraph_batch_time_s"]
            )
            if median_t / args.stream < xstats["ingraph_batch_time_s"] or (
                not xstats["timing_consistent"]
            ):
                # Conservative headline (harness policy): a streamed time
                # below the independent in-graph per-batch time has no
                # legitimate cause — ship the larger.
                stats["solves_per_sec"] = batch / per_batch
        else:
            stats["ingraph_skipped"] = (
                f"budget: {elapsed:.0f}s of {args.budget_seconds:.0f}s elapsed"
            )
    else:
        # Two-stage emission (VERDICT r3 item 1): the certified host-timed
        # JSON line prints as soon as the repeat loop + true-KKT eval
        # finish; the in-graph cross-check — a second large compile —
        # runs after, budget permitting, and reprints the line with the
        # extra fields. A capture-window timeout mid-cross-check still
        # leaves a parseable certified number in the output tail.
        stats = harness.benchmark_batched(
            mcp,
            thetas,
            repeats=args.repeats,
            options=options,
            theta_sampler=theta_sampler,
            ingraph_check=False,
        )
        _phase("host repeats + true-KKT done; emitting certified line")
        print(json.dumps(make_out(stats, metric_name)), flush=True)
        elapsed = time.monotonic() - _T0
        if elapsed <= 0.6 * args.budget_seconds:
            _phase("in-graph cross-check (second large compile)")
            harness.apply_ingraph_crosscheck(
                mcp,
                stats,
                theta_sampler,
                options=options,
                repeats=min(args.repeats, 3),
            )
        else:
            stats["ingraph_skipped"] = (
                f"budget: {elapsed:.0f}s of {args.budget_seconds:.0f}s elapsed"
            )
        _phase("final line")
        print(json.dumps(make_out(stats, metric_name)), flush=True)
        return

    _phase("final line")
    print(json.dumps(make_out(stats, metric_name)), flush=True)


if __name__ == "__main__":
    sys.exit(main())

"""Heterogeneous-shape routing (EP analog): device-group partitioning and
concurrent multi-bucket dispatch on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcp_tpu import PrimalDualMCP
from mcp_tpu.parallel.batch import solve_batch
from mcp_tpu.parallel.routing import (
    ShapeBucket,
    partition_devices,
    solve_routed,
)
from mcp_tpu.solver import SolverOptions


def _qp_mcp(n, m, seed):
    rng = np.random.RandomState(seed)
    P = rng.randn(n, n)
    M = jnp.asarray(P @ P.T + n * np.eye(n))
    A = jnp.asarray(rng.randn(m, n))
    b = jnp.asarray(rng.randn(m))
    return PrimalDualMCP.from_gh(
        lambda x, y, t: M @ x - t - A.T @ y,
        lambda x, y, t: A @ x - b,
        unconstrained_dimension=n,
        constrained_dimension=m,
        parameter_dimension=n,
    )


class TestPartition:
    def test_proportional_sizes(self):
        groups = partition_devices([3.0, 1.0], jax.devices())
        assert len(groups) == 2
        assert sum(len(g) for g in groups) == 8
        assert len(groups[0]) > len(groups[1]) >= 1
        # Disjoint cover.
        ids = [d.id for g in groups for d in g]
        assert sorted(ids) == sorted(d.id for d in jax.devices())

    def test_every_bucket_gets_a_device(self):
        groups = partition_devices([1e9, 1.0, 1.0], jax.devices())
        assert all(len(g) >= 1 for g in groups)
        assert sum(len(g) for g in groups) == 8

    def test_too_many_buckets(self):
        with pytest.raises(ValueError, match="devices"):
            partition_devices([1.0] * 9, jax.devices())


class TestSolveRouted:
    def test_two_shapes_match_unrouted(self):
        mcp_a = _qp_mcp(6, 4, seed=0)
        mcp_b = _qp_mcp(10, 3, seed=1)
        key = jax.random.PRNGKey(0)
        th_a = jax.random.normal(key, (5, 6), jnp.float64)  # odd batch: pads
        th_b = jax.random.normal(key, (12, 10), jnp.float64)
        buckets = [
            ShapeBucket(mcp_a, th_a),
            ShapeBucket(mcp_b, th_b, options=SolverOptions(tol=1e-6)),
        ]
        res = solve_routed(buckets)
        assert res[0].x.shape[0] == 5  # padding stripped
        assert res[1].x.shape[0] == 12
        ref_a = solve_batch(mcp_a, th_a)
        ref_b = solve_batch(mcp_b, th_b, options=SolverOptions(tol=1e-6))
        np.testing.assert_allclose(
            np.asarray(res[0].x), np.asarray(ref_a.x), atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(res[1].x), np.asarray(ref_b.x), atol=1e-10
        )
        assert np.all(np.asarray(res[0].status) == np.asarray(ref_a.status))
        assert np.all(np.asarray(res[1].status) == np.asarray(ref_b.status))

    def test_weight_override(self):
        mcp = _qp_mcp(4, 2, seed=2)
        th = jnp.zeros((2, 4), jnp.float64)
        buckets = [
            ShapeBucket(mcp, th, weight=1.0),
            ShapeBucket(mcp, th, weight=1.0),
        ]
        res = solve_routed(buckets)
        assert len(res) == 2
        np.testing.assert_allclose(
            np.asarray(res[0].x), np.asarray(res[1].x), atol=1e-12
        )

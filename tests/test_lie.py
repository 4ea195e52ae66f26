"""Unit tests for vipe_tpu.ops.lie against closed-form identities and autodiff.

Mirrors the oracle strategy from SURVEY.md §4 item 1 (the reference ships no
tests; lietorch semantics at /root/reference/vipe/ext/lietorch/groups.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipe_tpu.ops import lie

jax.config.update("jax_enable_x64", False)


def random_se3(rng, n=16, scale=1.0):
    xi = jnp.asarray(rng.normal(size=(n, 6)) * scale, jnp.float32)
    return lie.se3_exp(xi)


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        phi = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
        back = lie.so3_log(lie.so3_exp(phi))
        np.testing.assert_allclose(back, phi, atol=1e-5)

    def test_exp_small_angle(self, rng):
        phi = jnp.asarray(rng.normal(size=(16, 3)) * 1e-6, jnp.float32)
        q = lie.so3_exp(phi)
        np.testing.assert_allclose(np.asarray(q[..., 3]), 1.0, atol=1e-6)
        np.testing.assert_allclose(lie.so3_log(q), phi, atol=1e-8)

    def test_rotate_matches_matrix(self, rng):
        phi = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        q = lie.so3_exp(phi)
        p = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        R = lie.quat_to_matrix(q)
        np.testing.assert_allclose(
            lie.quat_rotate(q, p), jnp.einsum("nij,nj->ni", R, p), atol=1e-5
        )

    def test_matrix_roundtrip(self, rng):
        phi = jnp.asarray(rng.normal(size=(64, 3)) * 2, jnp.float32)
        q = lie.so3_exp(phi)
        q2 = lie.matrix_to_quat(lie.quat_to_matrix(q))
        # quaternion sign ambiguity
        dot = jnp.abs(jnp.sum(q * q2, -1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_grad_finite_at_zero(self):
        g = jax.grad(lambda p: jnp.sum(lie.so3_exp(p) ** 2))(jnp.zeros(3))
        assert np.all(np.isfinite(g))


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        # keep |phi| < pi: log returns the short rotation, so larger tangents
        # round-trip only as group elements, not as tangent vectors
        xi = jnp.asarray(rng.normal(size=(64, 6)), jnp.float32)
        xi = xi.at[:, 3:].multiply(0.5)
        np.testing.assert_allclose(lie.se3_log(lie.se3_exp(xi)), xi, atol=1e-4)

    def test_mul_inv_identity(self, rng):
        X = random_se3(rng)
        I = lie.se3_mul(X, lie.se3_inv(X))
        np.testing.assert_allclose(I[..., :3], 0.0, atol=1e-5)
        np.testing.assert_allclose(np.abs(I[..., 6]), 1.0, atol=1e-5)

    def test_act_matches_matrix(self, rng):
        X = random_se3(rng)
        p = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        M = lie.se3_matrix(X)
        ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], -1)
        np.testing.assert_allclose(
            lie.se3_act(X, p), jnp.einsum("nij,nj->ni", M, ph)[..., :3], atol=1e-5
        )

    def test_matrix_roundtrip(self, rng):
        X = random_se3(rng)
        X2 = lie.se3_from_matrix(lie.se3_matrix(X))
        np.testing.assert_allclose(X2[..., :3], X[..., :3], atol=1e-5)
        dot = jnp.abs(jnp.sum(X[..., 3:] * X2[..., 3:], -1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_associativity(self, rng):
        A, B, C = (random_se3(rng) for _ in range(3))
        lhs = lie.se3_mul(lie.se3_mul(A, B), C)
        rhs = lie.se3_mul(A, lie.se3_mul(B, C))
        np.testing.assert_allclose(
            lie.se3_act(lhs, jnp.zeros(3)), lie.se3_act(rhs, jnp.zeros(3)), atol=1e-5
        )

    def test_adjoint_identity(self, rng):
        """exp(Adj_X xi) X == X exp(xi)."""
        X = random_se3(rng, n=8, scale=0.5)
        xi = jnp.asarray(rng.normal(size=(8, 6)) * 0.1, jnp.float32)
        lhs = lie.se3_mul(lie.se3_exp(lie.se3_adj(X, xi)), X)
        rhs = lie.se3_mul(X, lie.se3_exp(xi))
        p = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        np.testing.assert_allclose(lie.se3_act(lhs, p), lie.se3_act(rhs, p), atol=1e-4)

    def test_adjT_is_transpose(self, rng):
        X = random_se3(rng, n=4)
        a = jnp.asarray(rng.normal(size=(4, 6)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(4, 6)), jnp.float32)
        lhs = jnp.sum(lie.se3_adj(X, a) * b, -1)
        rhs = jnp.sum(a * lie.se3_adjT(X, b), -1)
        np.testing.assert_allclose(lhs, rhs, atol=1e-4)

    def test_retr_derivative_at_zero(self, rng):
        """d/dxi act(retr(X, xi), p) at xi=0 is finite and matches FD."""
        X = random_se3(rng, n=1)[0]
        p = jnp.asarray([0.3, -0.2, 1.5])
        f = lambda xi: lie.se3_act(lie.se3_retr(X, xi), p)
        J = jax.jacfwd(f)(jnp.zeros(6))
        eps = 1e-3
        for k in range(6):
            d = jnp.zeros(6).at[k].set(eps)
            fd = (f(d) - f(-d)) / (2 * eps)
            np.testing.assert_allclose(J[:, k], fd, atol=1e-2)

    def test_interp_endpoints(self, rng):
        X0, X1 = random_se3(rng, 4), random_se3(rng, 4)
        p = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        np.testing.assert_allclose(
            lie.se3_act(lie.se3_interp(X0, X1, jnp.zeros(4)), p),
            lie.se3_act(X0, p), atol=1e-4)
        np.testing.assert_allclose(
            lie.se3_act(lie.se3_interp(X0, X1, jnp.ones(4)), p),
            lie.se3_act(X1, p), atol=1e-4)


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(64, 7)) * 0.5, jnp.float32)
        np.testing.assert_allclose(lie.sim3_log(lie.sim3_exp(xi)), xi, atol=1e-3)

    def test_small_angle_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(16, 7)) * 1e-5, jnp.float32)
        np.testing.assert_allclose(lie.sim3_log(lie.sim3_exp(xi)), xi, atol=1e-7)

    def test_mul_inv(self, rng):
        xi = jnp.asarray(rng.normal(size=(16, 7)) * 0.5, jnp.float32)
        X = lie.sim3_exp(xi)
        I = lie.sim3_mul(X, lie.sim3_inv(X))
        np.testing.assert_allclose(I[..., :3], 0.0, atol=1e-5)
        np.testing.assert_allclose(I[..., 7], 1.0, atol=1e-5)

    def test_act_matches_matrix(self, rng):
        xi = jnp.asarray(rng.normal(size=(8, 7)) * 0.5, jnp.float32)
        X = lie.sim3_exp(xi)
        p = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        M = lie.sim3_matrix(X)
        ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], -1)
        np.testing.assert_allclose(
            lie.sim3_act(X, p), jnp.einsum("nij,nj->ni", M, ph)[..., :3], atol=1e-5
        )

    def test_se3_embedding(self, rng):
        X = random_se3(rng, 4)
        S = lie.se3_to_sim3(X)
        p = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        np.testing.assert_allclose(lie.sim3_act(S, p), lie.se3_act(X, p), atol=1e-6)


class TestRxSO3:
    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(32, 4)) * 0.5, jnp.float32)
        np.testing.assert_allclose(lie.rxso3_log(lie.rxso3_exp(xi)), xi, atol=1e-4)

    def test_act(self, rng):
        xi = jnp.asarray(rng.normal(size=(8, 4)) * 0.5, jnp.float32)
        X = lie.rxso3_exp(xi)
        p = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        expected = jnp.exp(xi[..., 3:4]) * lie.quat_rotate(lie.so3_exp(xi[..., :3]), p)
        np.testing.assert_allclose(lie.rxso3_act(X, p), expected, atol=1e-5)

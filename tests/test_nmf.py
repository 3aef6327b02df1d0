"""Unit tests for the factorization engine: NMF, solvers, inits, SVD.

Mirrors the reference contracts (reference: tests/test_nmf.py) and extends
them with registry coverage and gradient-truncation semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import factorizer_tpu as ftx

SIZE = (2, 4, 8, 16)
RANK = 3


def make_nmf(**kwargs):
    defaults = dict(size=SIZE[-2:], rank=RANK, init_method="uniform", solver="hals")
    defaults.update(kwargs)
    return ftx.NMF(**defaults)


class TestNMF:
    def setup_method(self):
        self.nmf = make_nmf()
        self.x = jax.random.uniform(jax.random.key(0), SIZE)
        self.vars = jax.jit(self.nmf.init)(jax.random.key(1), self.x)

    def test_decompose(self):
        u, v = jax.jit(lambda v, x: self.nmf.apply(v, x, method="decompose"))(self.vars, self.x)
        assert u.shape == (*SIZE[:-2], SIZE[-2], RANK)
        assert v.shape == (*SIZE[:-2], SIZE[-1], RANK)
        assert bool((u >= 0).all()) and bool((v >= 0).all())

    def test_forward(self):
        y = jax.jit(self.nmf.apply)(self.vars, self.x)
        assert y.shape == self.x.shape
        assert bool(jnp.isfinite(y).all())

    def test_reconstruct(self):
        u = jax.random.uniform(jax.random.key(2), (*SIZE[:-2], SIZE[-2], RANK))
        v = jax.random.uniform(jax.random.key(3), (*SIZE[:-2], SIZE[-1], RANK))
        y = jax.jit(lambda vr, u, v: self.nmf.apply(vr, u, v, method="reconstruct"))(self.vars, u, v)
        assert y.shape == SIZE

    def test_loss(self):
        u = jax.random.uniform(jax.random.key(2), (*SIZE[:-2], SIZE[-2], RANK))
        v = jax.random.uniform(jax.random.key(3), (*SIZE[:-2], SIZE[-1], RANK))
        loss = jax.jit(lambda vr, x, u, v: self.nmf.apply(vr, x, u, v, method="loss"))(self.vars, self.x, u, v)
        assert loss.shape == SIZE[:1]
        assert bool((loss >= 0).all())

    def test_loss_decreases_over_iters(self):
        losses = []
        for iters in [1, 3, 6]:
            nmf = make_nmf(num_iters=iters)
            losses.append(float(jax.jit(lambda vr, x: nmf.apply(
                vr, x, *nmf.apply(vr, x, method="decompose"), method="loss").mean())(self.vars, self.x)))
        assert losses[2] <= losses[1] <= losses[0] + 1e-6

    def test_rank_from_compression(self):
        nmf = ftx.NMF(size=(64, 64), compression=8.0)
        x = jax.random.uniform(jax.random.key(0), (2, 64, 64))
        v = jax.jit(nmf.init)(jax.random.key(1), x)
        u_shape = v["buffers"]["initializer"]["u0"].shape
        # rank = ceil(64*64 / (8 * 128)) = 4
        assert u_shape == (64, 4)


@pytest.mark.parametrize(
    "solver",
    ["mu", "fmu", "smu", "cd", "nncd", "hals", "ls", "nnls", "mu-0", "hals-1", ["mu", "hals"]],
)
def test_solver_registry(solver):
    nmf = make_nmf(solver=solver, num_iters=2)
    x = jax.random.uniform(jax.random.key(0), (2, 8, 16))
    vars_ = jax.jit(nmf.init)(jax.random.key(1), x)
    y = jax.jit(nmf.apply)(vars_, x)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())


@pytest.mark.parametrize("init_method", ["uniform", "normal", "normal-uniform", "svd", "nndsvd"])
def test_init_registry(init_method):
    nmf = ftx.MatrixFactorization(
        size=(8, 16), rank=2, init_method=init_method, solver="mu", num_iters=2
    )
    x = jax.random.uniform(jax.random.key(0), (2, 8, 16)) + 0.1
    vars_ = jax.jit(nmf.init)(jax.random.key(1), x)
    y = jax.jit(nmf.apply)(vars_, x)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())


class TestGradientTruncation:
    def test_full_truncation_blocks_grad(self):
        """num_grad_steps=0 -> output is constant w.r.t. x."""
        nmf = make_nmf(num_grad_steps=0)
        x = jax.random.uniform(jax.random.key(0), (2, 8, 16))
        vars_ = jax.jit(nmf.init)(jax.random.key(1), x)
        g = jax.jit(jax.grad(lambda x: nmf.apply(vars_, x).sum()))(x)
        assert float(jnp.abs(g).max()) == 0.0

    def test_partial_truncation(self):
        """num_grad_steps < num_iters gives nonzero but different grads."""
        x = jax.random.uniform(jax.random.key(0), (2, 8, 16))
        grads = []
        for steps in [1, None]:
            nmf = make_nmf(num_iters=4, num_grad_steps=steps)
            vars_ = jax.jit(nmf.init)(jax.random.key(1), x)
            grads.append(jax.jit(jax.grad(lambda x: nmf.apply(vars_, x).sum()))(x))
        assert float(jnp.abs(grads[0]).max()) > 0
        assert not np.allclose(np.asarray(grads[0]), np.asarray(grads[1]))


class TestSVD:
    def test_shapes_and_quality(self):
        x = jax.random.normal(jax.random.key(0), (3, 16, 32))
        svd = ftx.SVD(size=(16, 32), rank=8)
        u, s, v = jax.jit(svd.decompose)(x)
        assert u.shape == (3, 16, 8) and s.shape == (3, 8) and v.shape == (3, 32, 8)
        # Rank-8 randomized approx of a random 16x32 should capture most energy.
        err = float(svd.loss(x, u, s, v).mean())
        assert err < 0.7

    def test_exact_on_lowrank(self):
        a = jax.random.normal(jax.random.key(0), (2, 16, 3))
        b = jax.random.normal(jax.random.key(1), (2, 32, 3))
        x = a @ jnp.swapaxes(b, -1, -2)
        svd = ftx.SVD(size=(16, 32), rank=3)
        err = float(jax.jit(lambda x: ftx.relative_error(x, svd(x)))(x).max())
        assert err < 1e-2  # fp32 randomized subspace iteration

    def test_auto_rank_rule(self):
        svd = ftx.SVD(size=(128, 128), compression=16)
        # ceil(128*128/(16*256)) = 4
        assert svd.rank == 4


class TestKMeans:
    def _blobs(self, key, n=64, d=8, k=3):
        # well-separated deterministic centers; tiny jitter
        centers = 10.0 * jnp.eye(k, d)
        labels = jnp.arange(n) % k
        pts = centers[labels] + 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (n, d))
        return pts[None], labels

    def test_kmeans_clusters_blobs(self):
        x, labels = self._blobs(jax.random.key(0))
        km = ftx.KMeans(num_centers=3, num_iters=10)
        u, v = jax.jit(km)(x)
        assert u.shape == (1, 64, 3) and v.shape == (1, 3, 8)
        pred = jnp.argmax(u[0], axis=-1)
        # Cluster assignment must be consistent within ground-truth groups.
        for g in range(3):
            members = pred[labels == g]
            assert bool((members == members[0]).all())

    def test_fuzzy_and_entropy_variants(self):
        x, _ = self._blobs(jax.random.key(1))
        for cls in [ftx.FuzzyCMeans, ftx.EntropyKMeans]:
            u, v = jax.jit(cls(num_centers=3, num_iters=5))(x)
            assert bool(jnp.isfinite(u).all()) and bool(jnp.isfinite(v).all())
        # Entropy variant produces softmax memberships (rows sum to 1).
        u, _ = jax.jit(ftx.EntropyKMeans(num_centers=3, num_iters=5))(x)
        np.testing.assert_allclose(np.asarray(u.sum(-1)), 1.0, atol=1e-3)

"""Multi-device sharding tests on the virtual CPU mesh.

The TPU-native analogue of distributed-correctness tests the reference lacks
(SURVEY.md §4 "Distributed testing: none"): SPMD execution over a mesh must
be numerically consistent with single-device execution, for both
data-parallel batches and spatially sharded volumes (GSPMD halo exchange).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import factorizer_tpu as ftx
from factorizer_tpu.parallel.mesh import make_mesh
from factorizer_tpu.parallel.sharding import input_sharding, param_sharding_rules

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")


@pytest.fixture(scope="module")
def block_and_vars():
    blk = ftx.FactorizerBlock(
        channels=8,
        spatial_size=(16, 16, 16),
        reshape=(ftx.SWMatricize, {"head_dim": 4, "patch_size": 4}),
        rank=1,
        num_iters=2,
        init_method="uniform",
        solver="hals",
        mlp_ratio=2,
    )
    x = jax.random.uniform(jax.random.key(0), (4, 16, 16, 16, 8))
    variables = jax.jit(blk.init)(jax.random.key(1), x)
    y_single = jax.jit(blk.apply)(variables, x)
    return blk, variables, x, np.asarray(y_single)


def test_data_parallel_forward_matches_single_device(block_and_vars):
    blk, variables, x, y_single = block_and_vars
    mesh = make_mesh({"data": 4})
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    with mesh:
        y = jax.jit(blk.apply)(variables, xs)
    np.testing.assert_allclose(np.asarray(y), y_single, atol=1e-5)


def test_spatially_sharded_forward_matches_single_device(block_and_vars):
    """Window/sequence parallelism: first spatial axis sharded over the mesh;
    GSPMD inserts the necessary collectives around rolls and windows."""
    blk, variables, x, y_single = block_and_vars
    mesh = make_mesh({"model": 4})
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "model")))
    with mesh:
        y = jax.jit(blk.apply)(variables, xs)
    np.testing.assert_allclose(np.asarray(y), y_single, atol=1e-5)


def test_tensor_parallel_param_sharding_matches(block_and_vars):
    blk, variables, x, y_single = block_and_vars
    mesh = make_mesh({"data": 2, "model": 2})
    shardings = param_sharding_rules(variables, mesh, min_weight_size=32)
    vs = jax.tree.map(jax.device_put, variables, shardings)
    xs = jax.device_put(x, input_sharding(mesh, ndim=5, data_format="channels_last"))
    with mesh:
        y = jax.jit(blk.apply)(vs, xs)
    np.testing.assert_allclose(np.asarray(y), y_single, atol=1e-5)


def test_gradients_match_across_shardings(block_and_vars):
    blk, variables, x, y_single = block_and_vars

    def loss(v, x):
        return jnp.mean(blk.apply(v, x) ** 2)

    g_single = jax.jit(jax.grad(loss))(variables, x)

    mesh = make_mesh({"data": 4})
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    with mesh:
        g_dp = jax.jit(jax.grad(loss))(variables, xs)

    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestFusedKernelSharding:
    """The fused Pallas kernels stay active under a mesh via their
    custom_partitioning rules (round-1 gap: they silently dropped to the
    unfused path on >1 device).  Sharded output must equal single-device."""

    @pytest.fixture(scope="class")
    def fused_block_and_vars(self):
        def build(**opts):
            return ftx.FactorizerBlock(
                channels=8,
                spatial_size=(16, 16, 16),
                reshape=(ftx.SWMatricize, {"head_dim": 4, "patch_size": 4}),
                rank=1,
                num_iters=2,
                init_method="uniform",
                solver="hals",
                mlp_ratio=2,
                factorize_options=opts,
            )

        blk_flat = build(use_pallas=True)
        blk_win = build(use_pallas=True, use_windowed=True)
        x = jax.random.uniform(jax.random.key(0), (4, 16, 16, 16, 8))
        variables = jax.jit(blk_flat.init)(jax.random.key(1), x)
        return blk_flat, blk_win, variables, x

    @pytest.mark.parametrize("which", ["flat", "windowed"])
    def test_dp_forward_matches_single_device(self, fused_block_and_vars, which):
        blk_flat, blk_win, variables, x = fused_block_and_vars
        blk = blk_flat if which == "flat" else blk_win
        y_single = np.asarray(jax.jit(blk.apply)(variables, x))
        mesh = make_mesh({"data": 4})
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        with mesh:
            y = jax.jit(blk.apply)(variables, xs)
        np.testing.assert_allclose(np.asarray(y), y_single, atol=1e-5)

    def test_flat_kernel_spatial_sharding_matches(self, fused_block_and_vars):
        """Spatial (window) sharding: after the fold the window axis is a
        batch dim of the flat kernel, so it shards without communication."""
        blk_flat, _, variables, x = fused_block_and_vars
        y_single = np.asarray(jax.jit(blk_flat.apply)(variables, x))
        mesh = make_mesh({"model": 4})
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "model")))
        with mesh:
            y = jax.jit(blk_flat.apply)(variables, xs)
        np.testing.assert_allclose(np.asarray(y), y_single, atol=1e-5)

    @pytest.mark.parametrize("which", ["flat", "windowed"])
    def test_dp_gradient_matches_single_device(self, fused_block_and_vars, which):
        blk_flat, blk_win, variables, x = fused_block_and_vars
        blk = blk_flat if which == "flat" else blk_win

        def loss(v, x):
            return jnp.mean(blk.apply(v, x) ** 2)

        g_single = jax.jit(jax.grad(loss))(variables, x)
        mesh = make_mesh({"data": 4})
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        with mesh:
            g_dp = jax.jit(jax.grad(loss))(variables, xs)
        for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_dp)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestSpatialShardedWindowed:
    """shard_map windowed mixing with ppermute halo exchange must equal the
    single-device fused path (sequence/window parallelism for volumes too
    large for one chip)."""

    @pytest.fixture(scope="class")
    def data(self):
        import numpy as np

        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.random((1, 32, 16, 16, 8), dtype=np.float32))
        u0 = jnp.asarray(rng.random((4, 1), dtype=np.float32))
        v0 = jnp.asarray(rng.random((64, 1), dtype=np.float32))
        return x, u0, v0

    def test_forward_matches_single_device(self, data):
        from factorizer_tpu.ops.pallas.windowed_nmf_kernel import windowed_nmf_multi
        from factorizer_tpu.ops.pallas.windowed_sharded import (
            windowed_nmf_multi_spatial,
        )

        x, u0, v0 = data
        shifts = (None, 1, (2, 3, 1))
        y_ref = jax.jit(
            lambda x: windowed_nmf_multi(x, u0, v0, 4, 4, shifts, "hals", 2)
        )(x)

        mesh = make_mesh({"model": 4})
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "model")))
        y = jax.jit(
            lambda x: windowed_nmf_multi_spatial(
                x, u0, v0, 4, 4, shifts, "hals", 2, mesh=mesh, axis_name="model"
            )
        )(xs)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)

    def test_gradient_matches_single_device(self, data):
        from factorizer_tpu.ops.pallas.windowed_nmf_kernel import windowed_nmf_multi
        from factorizer_tpu.ops.pallas.windowed_sharded import (
            windowed_nmf_multi_spatial,
        )

        x, u0, v0 = data
        shifts = (None, 2)
        g_ref = jax.jit(
            jax.grad(lambda x: (windowed_nmf_multi(x, u0, v0, 4, 4, shifts, "hals", 2) ** 2).sum())
        )(x)

        mesh = make_mesh({"model": 4})
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "model")))
        g = jax.jit(
            jax.grad(
                lambda x: (
                    windowed_nmf_multi_spatial(
                        x, u0, v0, 4, 4, shifts, "hals", 2, mesh=mesh,
                        axis_name="model",
                    )
                    ** 2
                ).sum()
            )
        )(xs)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=2e-4)

    def test_factmixer_spatial_mesh_option(self, data):
        """The mixer option routes through the shard_map halo path and still
        matches the unsharded fused mixer."""
        import factorizer_tpu as ftx

        mesh = make_mesh({"model": 4})
        kw = dict(
            channels=8, spatial_size=(32, 16, 16),
            reshape=(ftx.SWMatricize, {"head_dim": 4, "patch_size": 4}),
            rank=1, num_iters=2, init_method="uniform", solver="hals",
            mlp_ratio=2,
        )
        blk_sp = ftx.FactorizerBlock(
            **kw,
            factorize_options={
                "use_pallas": True, "use_windowed": True,
                "spatial_mesh": mesh, "spatial_axis": "model",
            },
        )
        blk_plain = ftx.FactorizerBlock(
            **kw, factorize_options={"use_pallas": True, "use_windowed": True}
        )
        x = jax.random.uniform(jax.random.key(0), (1, 32, 16, 16, 8))
        variables = jax.jit(blk_plain.init)(jax.random.key(1), x)
        y_ref = jax.jit(blk_plain.apply)(variables, x)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "model")))
        with mesh:
            y = jax.jit(blk_sp.apply)(variables, xs)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)


def test_depthwise_packed_kernel_data_parallel(monkeypatch):
    """The lane-packed depthwise kernel (Deconver's update_s chain) carries a
    GSPMD batch-sharding rule: sharded forward == single-device (the kernel
    runs locally per shard instead of forcing replication)."""
    from factorizer_tpu.factorization import deconv as dc
    from factorizer_tpu.ops.pallas import depthwise_packed as dpk

    d = ftx.Deconv(channels=16, kernel_size=(3, 3, 3), groups=-1, ratio=1, num_iters=1)
    x = jax.random.uniform(jax.random.key(0), (4, 8, 8, 8, 16), jnp.float32) + 0.1
    v = d.init(jax.random.key(1), x)

    monkeypatch.setattr(
        dc.Deconv, "_packed_chain_eligible",
        lambda self, x, s, h: dpk.supports_packed(x.shape, self.kernel_size_),
    )
    y_single = d.apply(v, x)

    mesh = make_mesh({"data": 4})
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    with mesh:
        y = jax.jit(d.apply)(v, xs)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_single), atol=1e-5)

    # gradient path (dw kernel) under the mesh too
    def loss(v, x):
        return jnp.sum(d.apply(v, x) ** 2)

    g_single = jax.grad(loss)(v, x)
    with mesh:
        g = jax.jit(jax.grad(loss))(v, xs)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_single)):
        b = np.asarray(b)
        # f32 summation-order noise scales with the gradient magnitude
        tol = 1e-5 * max(float(np.abs(b).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a), b, atol=tol, rtol=1e-3)

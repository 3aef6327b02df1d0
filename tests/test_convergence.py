"""End-to-end training convergence on a synthetic structure task.

The quality-evidence gate the reference lacks in-repo: a Factorizer must
learn a simple geometric segmentation (bright spheres in noise) end-to-end
through the real train step (DiceCE + AdamW + warmup-cosine) and exceed a
Dice threshold on held-out cases.  Catches silent learning regressions that
shape/finiteness tests cannot (mis-wired gradients, broken truncation,
dead mixing paths)."""

import numpy as np
import jax
import jax.numpy as jnp

import factorizer_tpu as ftx
from factorizer_tpu.train.metrics import dice_metric
from factorizer_tpu.train.schedules import make_adamw
from factorizer_tpu.train.trainer import create_train_state, make_train_step

SP = (16, 16, 16)


def _make_case(r: np.random.Generator):
    img = r.normal(0, 0.3, (1, *SP)).astype(np.float32)
    c = r.integers(5, 11, 3)
    rad = r.integers(3, 6)
    zz, yy, xx = np.ogrid[: SP[0], : SP[1], : SP[2]]
    mask = ((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2) <= rad**2
    img[0][mask] += 1.0
    return img, mask[None].astype(np.float32)


def test_factorizer_learns_synthetic_spheres():
    rng = np.random.default_rng(0)
    model = ftx.Factorizer(
        in_channels=1, out_channels=1, spatial_size=SP,
        encoder_depth=(1, 1), encoder_width=(8, 16), strides=(1, 2),
        decoder_depth=(1,),
        reshape=(ftx.SWMatricize, {"head_dim": 4, "patch_size": 4}),
        rank=1, num_iters=2, init_method="uniform", solver="hals", mlp_ratio=2,
    )
    tx = make_adamw(lr=3e-3, weight_decay=1e-2, warmup_steps=10, total_steps=100)
    x0, _ = _make_case(rng)
    state = create_train_state(
        model, tx, jnp.asarray(x0[None]), jax.random.key(0), train_kwargs={"train": False}
    )
    step = make_train_step(model)

    key = jax.random.key(1)
    first_loss = None
    for i in range(100):
        xs, ys = zip(*[_make_case(rng) for _ in range(4)])
        batch = {"image": jnp.asarray(np.stack(xs)), "label": jnp.asarray(np.stack(ys))}
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    assert float(metrics["loss"]) < 0.25 * first_loss  # actually trained

    dices = []
    for _ in range(8):
        xi, yi = _make_case(rng)
        logits = model.apply(state.variables(), jnp.asarray(xi[None]))
        pred = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
        dices.append(float(dice_metric(pred, jnp.asarray(yi[None]))[0, 0]))
    mean_dice = float(np.mean(dices))
    assert mean_dice > 0.85, mean_dice  # measured ~0.97 at 100 steps


def test_amp_training_quality_parity():
    """bf16 network compute (the `amp: true` bundle knob) must track f32
    training: loss trajectories stay within tolerance step-for-step and the
    bf16 run converges to the same regime.  Guards the amp operating point
    every headline benchmark number uses."""

    def run(dtype, n_steps=60):
        rng = np.random.default_rng(7)
        model = ftx.Factorizer(
            in_channels=1, out_channels=1, spatial_size=SP,
            encoder_depth=(1, 1), encoder_width=(8, 16), strides=(1, 2),
            decoder_depth=(1,),
            reshape=(ftx.SWMatricize, {"head_dim": 4, "patch_size": 4}),
            rank=1, num_iters=2, init_method="uniform", solver="hals",
            mlp_ratio=2, dtype=dtype,
        )
        tx = make_adamw(lr=3e-3, weight_decay=1e-2, warmup_steps=10, total_steps=n_steps)
        x0, _ = _make_case(rng)
        state = create_train_state(
            model, tx, jnp.asarray(x0[None]), jax.random.key(0),
            train_kwargs={"train": False},
        )
        step = make_train_step(model)
        key = jax.random.key(1)
        losses = []
        for _ in range(n_steps):
            xs, ys = zip(*[_make_case(rng) for _ in range(4)])
            batch = {"image": jnp.asarray(np.stack(xs)), "label": jnp.asarray(np.stack(ys))}
            key, k = jax.random.split(key)
            state, metrics = step(state, batch, k)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses)), "non-finite loss under amp"
        return np.asarray(losses)

    f32 = run(None)
    bf16 = run(jnp.bfloat16)
    # identical data/seeds: trajectories must track closely (loss is f32
    # both ways; only the network compute dtype differs)
    assert np.max(np.abs(f32 - bf16)) < 0.08, np.max(np.abs(f32 - bf16))
    # both end in the same converged regime
    assert bf16[-5:].mean() < 0.35 * bf16[0]
    assert abs(bf16[-5:].mean() - f32[-5:].mean()) < 0.05


def test_deconver_learns_synthetic_spheres():
    """Deconver end-to-end learning through the merged-layout grouped-conv
    solve (groups=2 exercises the block-diagonal dense route in both the
    forward and the backward of training)."""
    rng = np.random.default_rng(1)
    model = ftx.Deconver(
        in_channels=1, out_channels=1, spatial_dims=3,
        encoder_depth=(1, 1), encoder_width=(8, 16), strides=(1, 2),
        decoder_depth=(1,),
        kernel_size=(3, 3, 3), groups=2, ratio=2, num_iters=1, mlp_ratio=2,
    )
    tx = make_adamw(lr=3e-3, weight_decay=1e-2, warmup_steps=10, total_steps=80)
    x0, _ = _make_case(rng)
    state = create_train_state(
        model, tx, jnp.asarray(x0[None]), jax.random.key(0), train_kwargs={"train": False}
    )
    step = make_train_step(model)

    key = jax.random.key(2)
    first_loss = None
    for i in range(80):
        xs, ys = zip(*[_make_case(rng) for _ in range(4)])
        batch = {"image": jnp.asarray(np.stack(xs)), "label": jnp.asarray(np.stack(ys))}
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    assert float(metrics["loss"]) < 0.3 * first_loss  # actually trained

    dices = []
    for _ in range(8):
        xi, yi = _make_case(rng)
        logits = model.apply(state.variables(), jnp.asarray(xi[None]))
        pred = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
        dices.append(float(dice_metric(pred, jnp.asarray(yi[None]))[0, 0]))
    mean_dice = float(np.mean(dices))
    assert mean_dice > 0.80, mean_dice

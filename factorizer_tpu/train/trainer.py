"""Training loop core: TrainState + jit/pjit-compiled step functions.

The TPU-native replacement for the bundles' ignite ``SupervisedTrainer``
(reference: model_zoo/factorizer_brats23/configs/train.yaml:340-352): a pure
functional train step (forward, loss, grad, AdamW update) compiled once over
a device mesh; batch sharded over the ``data`` axis; gradients all-reduced by
XLA over ICI.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.flatten_util import ravel_pytree
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.sharding import param_sharding_rules
from .losses import deep_supervision_loss, dice_ce_loss

__all__ = [
    "TrainState",
    "create_train_state",
    "init_opt_state",
    "make_train_step",
    "make_eval_step",
]


class TrainState(struct.PyTreeNode):
    """Functional train state: params + non-trainable buffers + optimizer.

    ``flat_opt=True`` runs the optimizer over one raveled parameter vector
    instead of per-leaf: AdamW is elementwise, so the math is bitwise
    identical, but the ~100 tiny per-leaf update fusions (LayerNorm scales,
    biases, small projections) collapse into a handful of large vector ops —
    each tiny op costs a fixed ~7 us on the TPU's serial pipeline, ~10 ms/step
    on the flagship (see PERFORMANCE.md round 4).  ``opt_state`` is then keyed
    to the flat vector, so checkpoints are mode-specific.  Keep ``False`` when
    params are sharded over a model axis (the ravel would all-gather them)."""

    step: jnp.ndarray
    params: Any
    buffers: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    flat_opt: bool = struct.field(pytree_node=False, default=False)

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.buffers:
            v["buffers"] = self.buffers
        return v

    def apply_gradients(self, grads: Any) -> "TrainState":
        if self.flat_opt:
            g_flat, _ = ravel_pytree(grads)
            p_flat, unravel = ravel_pytree(self.params)
            updates, new_opt_state = self.tx.update(g_flat, self.opt_state, p_flat)
            new_params = unravel(p_flat + updates)
        else:
            updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
            new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state)


def init_opt_state(tx: optax.GradientTransformation, params: Any, flat: bool = False):
    """Optimizer-state init matching ``TrainState.flat_opt`` (see above)."""
    if flat:
        return tx.init(ravel_pytree(params)[0])
    return tx.init(params)


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    sample_input: jnp.ndarray,
    rng: jax.Array,
    train_kwargs: Optional[dict] = None,
    flat_optimizer: bool = True,
) -> TrainState:
    kwargs = dict(train_kwargs or {})
    variables = jax.jit(lambda rng, x: model.init(rng, x, **kwargs))(rng, sample_input)
    params = variables["params"]
    buffers = variables.get("buffers", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        buffers=buffers,
        opt_state=init_opt_state(tx, params, flat_optimizer),
        tx=tx,
        flat_opt=flat_optimizer,
    )


def make_train_step(
    model,
    loss_fn: Optional[Callable] = None,
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
    donate: bool = True,
    accum_steps: int = 1,
    spatial_axis: Optional[str] = None,
):
    """Build the jitted ``(state, batch, rng) -> (state, metrics)`` step.

    With a mesh, inputs are constrained batch-sharded over ``data_axis`` and
    params follow :func:`param_sharding_rules`; without one, plain jit.
    ``spatial_axis`` additionally constrains the batch's first spatial axis
    over that mesh axis (spatial parallelism: GSPMD inserts the halo
    exchanges; without the constraint the data-axis spec would force an
    all-gather of the spatially-sharded input).

    ``accum_steps > 1`` splits the batch into that many microbatches and
    accumulates gradients with ``lax.scan`` before the single optimizer
    update — an effective batch ``accum_steps`` times larger at one
    microbatch's activation memory (vs. remat's ~35% step-time cost, see
    PERFORMANCE.md "Batch scaling").  The batch dim must divide evenly, and
    mean-reduced losses make the accumulated gradient exactly the full-batch
    gradient (asserted in tests).
    """
    if loss_fn is None:

        def loss_fn(logits, labels):
            if isinstance(logits, (list, tuple)):
                return deep_supervision_loss(logits, labels)
            return dice_ce_loss(logits, labels)

    def grad_one(params, buffers, images, labels, rng):
        def compute_loss(p):
            variables = {"params": p}
            if buffers:
                variables["buffers"] = buffers
            logits = model.apply(variables, images, train=True, rngs={"dropout": rng})
            return loss_fn(logits, labels)

        return jax.value_and_grad(compute_loss)(params)

    def _micro(x):
        """(B, ...) -> (accum_steps, B/accum_steps, ...); under a mesh the
        MICROBATCH dim stays sharded over ``data_axis`` (without the
        constraint GSPMD may shard the scan dim instead, serializing each
        microbatch onto a device subset)."""
        m = x.reshape(accum_steps, x.shape[0] // accum_steps, *x.shape[1:])
        if mesh is not None:
            m = jax.lax.with_sharding_constraint(
                m, NamedSharding(mesh, P(None, data_axis, *([None] * (x.ndim - 1))))
            )
        return m

    def step(state: TrainState, batch: dict, rng: jax.Array):
        images, labels = batch["image"], batch["label"]

        if accum_steps > 1:
            b = images.shape[0]
            assert b % accum_steps == 0, (
                f"batch {b} not divisible by accum_steps {accum_steps}"
            )
            images_m = _micro(images)
            labels_m = _micro(labels)
            rngs = jax.random.split(rng, accum_steps)

            def body(carry, xs):
                loss_sum, grad_sum = carry
                im, lb, r = xs
                loss, grads = grad_one(state.params, state.buffers, im, lb, r)
                return (
                    loss_sum + loss,
                    jax.tree.map(jnp.add, grad_sum, grads),
                ), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (loss_sum, grad_sum), _ = jax.lax.scan(
                body, (jnp.zeros(()), zeros), (images_m, labels_m, rngs)
            )
            scale = 1.0 / accum_steps
            loss = loss_sum * scale
            grads = jax.tree.map(lambda g: g * scale, grad_sum)
        else:
            loss, grads = grad_one(state.params, state.buffers, images, labels, rng)

        new_state = state.apply_gradients(grads)
        if state.flat_opt:
            # Same ravel as apply_gradients (CSE'd by XLA): one big reduce
            # instead of ~100 per-leaf square-sums.
            grad_norm = jnp.linalg.norm(ravel_pytree(grads)[0])
        else:
            grad_norm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": grad_norm}
        return new_state, metrics

    if mesh is not None:

        def _batch_spec(ndim: int) -> P:
            spec: list = [None] * ndim
            spec[0] = data_axis
            if spatial_axis is not None and ndim >= 3:
                spec[2] = spatial_axis  # first spatial axis, channels-first
            return P(*spec)

        def sharded_step(state, batch, rng):
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, _batch_spec(x.ndim))
                ),
                batch,
            )
            return step(state, batch, rng)

        return jax.jit(sharded_step, donate_argnums=(0,) if donate else ())

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, mesh: Optional[Mesh] = None, data_axis: str = "data"):
    """Jitted forward (inference mode) returning logits."""

    def step(variables, images):
        return model.apply(variables, images)

    return jax.jit(step)

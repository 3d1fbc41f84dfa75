"""Train state pytree + jitted step factories.

One compiled function per workload: forward + loss + grad + psum (implicit via
sharded jit) + optimizer update with donated state (SURVEY.md §2.2 TPU-native
equivalent of the DDP/optimizer step)."""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from si_mamba_tpu.models.point_mamba import cross_entropy_loss_acc


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt,
                            batch_stats=(new_batch_stats if new_batch_stats is not None
                                         else self.batch_stats))


def make_classifier_train_step(model) -> Callable:
    """Returns train_step(state, points, labels, rng) -> (state, metrics)."""

    def train_step(state: TrainState, points, labels, rng):
        drop_rng, order_rng = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            logits, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                points, train=True, mutable=["batch_stats"],
                rngs={"dropout": drop_rng, "order": order_rng},
            )
            per, acc = cross_entropy_loss_acc(logits, labels)
            return jnp.mean(per), (updates["batch_stats"], acc)

        (loss, (bs, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, new_batch_stats=bs)
        return state, {"loss": loss, "acc": acc}

    return train_step


def make_classifier_eval_step(model) -> Callable:
    def eval_step(state: TrainState, points):
        return model.apply({"params": state.params, "batch_stats": state.batch_stats},
                           points, train=False)

    return eval_step

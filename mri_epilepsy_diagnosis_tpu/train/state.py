"""Train state: params + batch_stats + optimizer state as one pytree."""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: int
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt_state,
            batch_stats=(self.batch_stats if new_batch_stats is None
                         else new_batch_stats),
        )

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def create_train_state(model, tx, sample_input, rng=None,
                       variables: Optional[dict] = None) -> TrainState:
    import jax.numpy as jnp

    if variables is None:
        rng = jax.random.key(0) if rng is None else rng
        variables = model.init(rng, sample_input)
    params = variables["params"]

    # Canonicalize every leaf to a strongly-typed array: python scalars (the
    # step counter, injected hyperparameters) otherwise enter the first jit
    # call with weak-typed avals, come back strong, and force a retrace —
    # i.e. a full recompile — on the next step.
    def _strong(a):
        arr = jnp.asarray(a)
        return jnp.asarray(a, dtype=arr.dtype)

    params = jax.tree.map(_strong, params)
    batch_stats = variables.get("batch_stats")
    if batch_stats is not None:
        batch_stats = jax.tree.map(_strong, batch_stats)
    opt_state = jax.tree.map(_strong, tx.init(params))
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        tx=tx,
        apply_fn=model.apply,
    )

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
    if variables is None:
        rng = jax.random.key(0) if rng is None else rng
        variables = model.init(rng, sample_input)
    params = variables["params"]
    return TrainState(
        step=0,
        params=params,
        batch_stats=variables.get("batch_stats"),
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )

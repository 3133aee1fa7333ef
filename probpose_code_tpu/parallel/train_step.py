"""The sharded training step — one fused XLA program per step.

Replaces the reference's mmengine ``train_step`` + DDP wrapper
(``MMDistributedDataParallel``, implicit NCCL grad all-reduce): under
``jax.jit`` over a Mesh with batch inputs sharded on the ``data`` axis and
replicated parameters, XLA emits the gradient reduce automatically (riding
ICI on real hardware). BatchNorm statistics are computed over the *global*
batch (jit's global-view semantics), which subsumes the reference's opt-in
SyncBN (``pose_estimators/base.py:80-82``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(variables: Dict[str, Any], tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
) -> Callable:
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    ``model`` is a PoseModel (models.builder); its ``loss_fn`` must return
    ``(total, (loss_dict, new_mutable_state))``.
    """

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng) -> tuple:
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_of(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            total, (losses, new_state) = model.loss_fn(variables, batch, rngs={"dropout": dropout_rng})
            return total, (losses, new_state)

        (total, (losses, new_state)), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)

        new_train_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_state.get("batch_stats", state.batch_stats),
            opt_state=new_opt_state,
        )
        return new_train_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )

"""Per-group optimizer manager on optax.

Functional JAX counterpart of the reference's ``Optimizers`` multi-group
manager (reference: slam/engine/optimizers.py:63-191): each named parameter
group gets its own Adam with per-group lr/eps/betas/weight_decay, optional
gradient-norm clipping (``max_norm``), gradient accumulation over
``accum_step`` inner iterations (grads summed, applied+reset every Nth step
— reference: optimizers.py:149-162), and an optional per-step learning-rate
schedule.

Params are organized as ``{group_name: subtree}`` dicts; ``GroupOptimizers``
applies each group's transformation to its subtree. Everything is jit-safe
and usable inside ``lax.scan`` (the accumulation "every Nth step" decision is
a traced ``jnp.where`` select, not Python control flow).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..configs.base import PrintableConfig

ScheduleFn = Callable[[jnp.ndarray], jnp.ndarray]  # step -> absolute lr


@dataclass
class OptimizerConfig(PrintableConfig):
    """Adam optimizer config (reference: slam/engine/optimizers.py:18-51)."""

    lr: float = 5e-4
    eps: float = 1e-8
    betas: Tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 0.0
    max_norm: Optional[float] = None
    accum_step: Optional[int] = None

    def _scaler(self) -> optax.GradientTransformation:
        return optax.scale_by_adam(b1=self.betas[0], b2=self.betas[1], eps=self.eps)

    def build(self, schedule: Optional[ScheduleFn] = None) -> optax.GradientTransformation:
        chain = []
        if self.max_norm is not None:
            chain.append(optax.clip_by_global_norm(self.max_norm))
        chain.append(self._scaler())
        if self.weight_decay:
            chain.append(optax.add_decayed_weights(self.weight_decay))
        if schedule is not None:
            chain.append(optax.scale_by_schedule(lambda step: -schedule(step)))
        else:
            chain.append(optax.scale(-self.lr))
        tx = optax.chain(*chain)
        if self.accum_step is not None and self.accum_step > 1:
            tx = _with_accumulation(tx, self.accum_step)
        return tx


@dataclass
class AdamOptimizerConfig(OptimizerConfig):
    """Alias kept for config-surface parity with the reference."""


@dataclass
class RAdamOptimizerConfig(OptimizerConfig):
    """RAdam (reference: slam/engine/optimizers.py:55-60) via optax."""

    def _scaler(self) -> optax.GradientTransformation:
        from optax._src.transform import scale_by_radam

        return scale_by_radam(b1=self.betas[0], b2=self.betas[1], eps=self.eps)


def _tree_zeros_like(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def _tree_select(pred, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def _with_accumulation(inner: optax.GradientTransformation, every: int) -> optax.GradientTransformation:
    """Sum grads across steps; apply ``inner`` and reset every ``every`` steps.

    Reproduces the reference's accum_step semantics where zero_grad skips
    accumulating groups and the optimizer steps + zeroes on every Nth call
    (reference: slam/engine/optimizers.py:125-162).
    """

    def init(params):
        return {"inner": inner.init(params), "acc": _tree_zeros_like(params), "count": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None):
        acc = jax.tree_util.tree_map(jnp.add, state["acc"], grads)
        count = state["count"] + 1
        apply = (count % every) == 0
        upd, new_inner = inner.update(acc, state["inner"], params)
        zeros = _tree_zeros_like(upd)
        upd = _tree_select(apply, upd, zeros)
        new_inner = _tree_select(apply, new_inner, state["inner"])
        acc = _tree_select(apply, _tree_zeros_like(acc), acc)
        return upd, {"inner": new_inner, "acc": acc, "count": count}

    return optax.GradientTransformation(init, update)


class GroupOptimizers:
    """A set of per-group optimizers over ``{group: subtree}`` param dicts."""

    def __init__(
        self,
        configs: Dict[str, OptimizerConfig],
        schedules: Optional[Dict[str, ScheduleFn]] = None,
    ) -> None:
        schedules = schedules or {}
        self.configs = configs
        self.tx: Dict[str, optax.GradientTransformation] = {
            name: cfg.build(schedules.get(name)) for name, cfg in configs.items()
        }

    def init(self, params: Dict[str, Any]) -> Dict[str, Any]:
        return {name: self.tx[name].init(params[name]) for name in params}

    def update(self, grads: Dict[str, Any], state: Dict[str, Any], params: Dict[str, Any]):
        """Returns (new_params, new_state)."""
        new_params = {}
        new_state = {}
        for name in params:
            upd, st = self.tx[name].update(grads[name], state[name], params[name])
            new_params[name] = optax.apply_updates(params[name], upd)
            new_state[name] = st
        return new_params, new_state

"""Stage-wise LR schedule configs (reference: slam/engine/schedulers.py:49-112).

These are pure config dataclasses; the algorithms interpret them by
building per-stage optimizer scale factors (the reference attaches
LambdaLR schedulers to torch optimizers — here the per-stage learning rate
is folded into the per-phase optax chain, which is equivalent because
Adam's moment state is learning-rate independent).
"""
from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class LRconfig:
    coarse: float = 0.0
    middle: float = 0.0
    fine: float = 0.0
    color: float = 0.005


@dataclass
class NiceSLAMSchedulerConfig:
    """lr(stage) = stage_lr[stage]; stage from step/max_steps ratios."""

    coarse: bool = False
    middle_iter_ratio: float = 0.4
    fine_iter_ratio: float = 0.6
    stage_lr: LRconfig = field(default_factory=LRconfig)
    max_steps: int = 1000

    def lr_for_stage(self, stage: str) -> float:
        return getattr(self.stage_lr, stage)


@dataclass
class PointSLAMSchedulerConfig:
    """Two-phase lr: start_lr for the geometry phase, end_lr after."""

    geo_iter_ratio: float = 0.4
    start_lr: float = 0.001
    end_lr: float = 0.005
    max_steps: int = 1000

    def lr_for_stage(self, stage: str) -> float:
        return self.start_lr if stage == "geometry" else self.end_lr

"""Model base: scene representation + renderer as pure functions over params.

Counterpart of the reference's ``Model(nn.Module)`` ABC (reference:
slam/models/base_model.py:23-70), redesigned functionally: a Model instance
holds only *static* structure (camera, bounds, specs); all trainable state
lives in an explicit params pytree created by ``init_params`` and threaded
through the jitted tracking/mapping loops. ``param_groups`` is implicit —
the params dict is already keyed by optimizer group name.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Type

import jax
import numpy as np

from ..common.camera import Camera
from ..configs.base import InstantiateConfig


@dataclass
class ModelConfig(InstantiateConfig):
    _target: Type = field(default_factory=lambda: Model)


class Model:
    def __init__(self, config: ModelConfig, camera: Camera, bounding_box: np.ndarray, **kwargs) -> None:
        self.config = config
        self.camera = camera
        self.bounding_box = np.asarray(bounding_box, np.float32)

    def init_params(self, key: jax.Array) -> Dict[str, Any]:
        raise NotImplementedError

    def get_outputs(self, params, key, inputs) -> Dict[str, Any]:
        raise NotImplementedError

    def get_loss(self, params, key, inputs, is_mapping: bool, first: bool):
        raise NotImplementedError

"""Top-level runner: output dir, config dump, pipeline launch.

Counterpart of ``XRDSLAMer`` (reference: slam/engine/xrdslamer.py:20-58).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Type

from ..common.datasets import get_dataset
from ..configs.base import InstantiateConfig
from ..pipeline.slam import SLAMPipelineConfig


@dataclass
class RunnerConfig(InstantiateConfig):
    """reference: slam/engine/xrdslamer.py:20-42."""

    _target: Type = field(default_factory=lambda: Runner)
    algorithm_name: str = ""
    xrdslam: SLAMPipelineConfig = field(default_factory=SLAMPipelineConfig)
    data: Optional[str] = None
    data_type: str = "replica"
    out_dir: str = "outputs"

    def save_config(self) -> None:
        path = Path(self.out_dir) / "config.yml"
        os.makedirs(self.out_dir, exist_ok=True)
        path.write_text(str(self))


class Runner:
    def __init__(self, config: RunnerConfig) -> None:
        self.config = config

    def setup(self):
        cfg = self.config
        cfg.save_config()
        dataset = get_dataset(cfg.data or "", cfg.data_type)
        self.pipeline = cfg.xrdslam.setup(dataset=dataset, out_dir=cfg.out_dir)
        return self.pipeline

    def run(self) -> None:
        self.setup()
        self.pipeline.run()

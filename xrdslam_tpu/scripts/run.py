"""``ds-run`` entry point (reference: scripts/run.py:10-36).

Usage: python -m xrdslam_tpu.scripts.run <algorithm> --data DIR --data-type TYPE [--dotted.overrides ...]
"""
from __future__ import annotations

import sys

from ..configs.cli import parse_config
from ..configs.registry import algorithm_configs, descriptions


def main(argv=None) -> None:
    config, args = parse_config(algorithm_configs, argv, descriptions)
    print(config)
    runner = config.setup()
    runner.run()


def entrypoint() -> None:
    main(sys.argv[1:])


if __name__ == "__main__":
    entrypoint()

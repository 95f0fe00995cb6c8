"""Process-aware logger + moving-average loss smoothing.

Reference: RDFC-GAN/helper.py:79-170 (Logger with per-rank level gating, file
handler and TensorBoard writer; MovingAverage window smoothing). Here "rank"
is ``jax.process_index()``.
"""

from __future__ import annotations

import logging
import os
from collections import deque
from typing import Dict, Optional

import jax


class MovingAverage:
    """Windowed moving average over dict-of-scalars loss stats."""

    def __init__(self, window: int = 100):
        self.window = window
        self._buffers: Dict[str, deque] = {}

    def update(self, stats: Dict[str, float]):
        for k, v in stats.items():
            self._buffers.setdefault(k, deque(maxlen=self.window)).append(float(v))

    def mean(self) -> Dict[str, float]:
        return {k: sum(b) / max(len(b), 1) for k, b in self._buffers.items()}


class Logger:
    """Rank-0 logs INFO to stdout + file + (optional) TensorBoard; other
    processes log ERROR only."""

    def __init__(self, work_dir: Optional[str] = None, name: str = "rdfc_gan_tpu",
                 use_tensorboard: bool = True):
        self.rank = jax.process_index()
        self.logger = logging.getLogger(name)
        self.logger.handlers.clear()
        level = logging.INFO if self.rank == 0 else logging.ERROR
        self.logger.setLevel(level)
        fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")

        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        self.logger.addHandler(sh)

        self.tb = None
        if work_dir and self.rank == 0:
            os.makedirs(work_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(work_dir, "train.log"))
            fh.setFormatter(fmt)
            self.logger.addHandler(fh)
            if use_tensorboard:
                try:
                    from tensorboardX import SummaryWriter

                    self.tb = SummaryWriter(os.path.join(work_dir, "tf_logs"))
                except Exception:  # pragma: no cover - tensorboardX optional
                    self.tb = None

    def log(self, msg: str):
        self.logger.info(msg)

    def error(self, msg: str):
        self.logger.error(msg)

    def add_scalars(self, stats: Dict[str, float], step: int, prefix: str = "train"):
        if self.tb is not None:
            for k, v in stats.items():
                self.tb.add_scalar(f"{prefix}/{k}", v, step)

    def close(self):
        if self.tb is not None:
            self.tb.close()

"""ImagePool — CycleGAN history buffer (reference helper.py:19-77; shipped
but unused by the v2 engine). Host-side: stores device arrays and swaps each
incoming fake with a stored one with probability 0.5 once full."""

from __future__ import annotations

import numpy as np


class ImagePool:
    def __init__(self, pool_size: int = 50, seed: int = 0):
        self.pool_size = pool_size
        self.images = []
        self._rng = np.random.default_rng(seed)

    def query(self, images):
        """images: (B, ...) array. Returns same-shape batch where each item
        may be replaced by a historical fake."""
        if self.pool_size == 0:
            return images
        images = np.asarray(images)
        out = []
        for img in images:
            if len(self.images) < self.pool_size:
                self.images.append(img.copy())
                out.append(img)
            elif self._rng.uniform() > 0.5:
                idx = int(self._rng.integers(0, self.pool_size))
                out.append(self.images[idx].copy())
                self.images[idx] = img.copy()
            else:
                out.append(img)
        return np.stack(out, axis=0)

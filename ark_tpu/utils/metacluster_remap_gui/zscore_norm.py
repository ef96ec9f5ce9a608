"""Two-segment z-score colormap normalizer (reference
`src/ark/utils/metacluster_remap_gui/zscore_norm.py:5`)."""

from __future__ import annotations

import numpy as np
from matplotlib.colors import Normalize


class ZScoreNormalize(Normalize):
    """Piecewise-linear normalizer: [vmin,vcenter]→[0,.5], [vcenter,vmax]→[.5,1]."""

    def __init__(self, vmin=-3, vcenter=0, vmax=3):
        self.vcenter = vcenter
        super().__init__(vmin, vmax)

    def inverse(self, value):
        return np.interp(value, [0, 0.5, 1],
                         [self.vmin, self.vcenter, self.vmax])

    def calibrate(self, values):
        self.vmin = min([-np.max(values), 0])
        self.vcenter = 0.0
        self.vmax = np.max(values)

    def __call__(self, value, clip=None):
        result, is_scalar = self.process_value(value)
        normalized = np.interp(result, [self.vmin, self.vcenter, self.vmax],
                               [0, 0.5, 1.0])
        return np.ma.masked_array(normalized, mask=np.ma.getmask(result))

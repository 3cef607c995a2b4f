"""Anchor generation (static, precomputed on host, consumed on device).

Equivalent of the reference `mmdet/core/anchor/anchor_generator.py:13`
(`AnchorGenerator.gen_base_anchors` / `grid_priors` / `valid_flags`) with the
same anchor math and ordering (location-major, anchor-minor), so decoded
proposals match. Anchors for a static feature-map shape are a compile-time
constant folded into the jitted step.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ...utils.registry import ANCHOR_GENERATORS


@ANCHOR_GENERATORS.register_module()
class AnchorGenerator:
    """Multi-level anchor generator.

    Args:
        strides: per-level feature strides, e.g. [16] for the DC5 trunk
            (reference `da_configs/_base_/models/faster_rcnn_r50_torch_daf.py`:
            scales=[2,4,8,16,32], ratios=[0.5,1,2], strides=[16]).
        ratios: h/w aspect ratios.
        scales: anchor scales (multiples of base size = stride).
        base_sizes: override per-level base sizes (defaults to strides).
        center_offset: relative center offset inside the stride cell.
    """

    def __init__(self,
                 strides: Sequence[int],
                 ratios: Sequence[float],
                 scales: Sequence[float] = None,
                 base_sizes: Sequence[int] = None,
                 scale_major: bool = True,
                 octave_base_scale: int = None,
                 scales_per_octave: int = None,
                 center_offset: float = 0.0):
        self.strides = [(s, s) if isinstance(s, int) else tuple(s) for s in strides]
        self.base_sizes = list(base_sizes) if base_sizes is not None else \
            [min(s) for s in self.strides]
        if scales is None:
            assert octave_base_scale is not None and scales_per_octave is not None
            octave_scales = np.array(
                [2**(i / scales_per_octave) for i in range(scales_per_octave)])
            scales = octave_scales * octave_base_scale
        self.scales = np.asarray(scales, np.float32)
        self.ratios = np.asarray(ratios, np.float32)
        self.scale_major = scale_major
        self.center_offset = center_offset
        self.base_anchors = self.gen_base_anchors()

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    @property
    def num_base_anchors(self) -> List[int]:
        return [a.shape[0] for a in self.base_anchors]

    def gen_base_anchors(self) -> List[np.ndarray]:
        return [
            self._single_level_base_anchors(bs) for bs in self.base_sizes
        ]

    def _single_level_base_anchors(self, base_size: int) -> np.ndarray:
        w = h = float(base_size)
        x_center = self.center_offset * w
        y_center = self.center_offset * h
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        if self.scale_major:
            ws = (w * w_ratios[:, None] * self.scales[None, :]).reshape(-1)
            hs = (h * h_ratios[:, None] * self.scales[None, :]).reshape(-1)
        else:
            ws = (w * self.scales[:, None] * w_ratios[None, :]).reshape(-1)
            hs = (h * self.scales[:, None] * h_ratios[None, :]).reshape(-1)
        return np.stack([
            x_center - 0.5 * ws, y_center - 0.5 * hs,
            x_center + 0.5 * ws, y_center + 0.5 * hs
        ], axis=-1).astype(np.float32)

    def grid_priors(self, featmap_sizes: Sequence[Tuple[int, int]]) -> List[np.ndarray]:
        """Anchors for each level: [(H*W*A, 4)], location-major, anchor-minor."""
        assert len(featmap_sizes) == self.num_levels
        return [
            self._single_level_grid(featmap_sizes[i], self.strides[i],
                                    self.base_anchors[i])
            for i in range(self.num_levels)
        ]

    @staticmethod
    def _single_level_grid(featmap_size, stride, base_anchors) -> np.ndarray:
        feat_h, feat_w = featmap_size
        shift_x = np.arange(feat_w, dtype=np.float32) * stride[0]
        shift_y = np.arange(feat_h, dtype=np.float32) * stride[1]
        sx, sy = np.meshgrid(shift_x, shift_y)
        shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=-1)
        all_anchors = base_anchors[None, :, :] + shifts[:, None, :]
        return all_anchors.reshape(-1, 4)

    def valid_flags(self, featmap_sizes, pad_shape) -> List[np.ndarray]:
        """Per-level bool flags for anchors whose cell lies in the valid area.

        `pad_shape` is the un-padded (h, w) of the image inside the canvas —
        mirrors `AnchorGenerator.valid_flags` (reference
        `core/anchor/anchor_generator.py:471`).
        """
        out = []
        for i in range(self.num_levels):
            feat_h, feat_w = featmap_sizes[i]
            h, w = pad_shape
            valid_h = min(int(np.ceil(h / self.strides[i][1])), feat_h)
            valid_w = min(int(np.ceil(w / self.strides[i][0])), feat_w)
            vx = np.zeros(feat_w, bool)
            vy = np.zeros(feat_h, bool)
            vx[:valid_w] = True
            vy[:valid_h] = True
            vxx, vyy = np.meshgrid(vx, vy)
            valid = (vxx & vyy).ravel()
            out.append(np.repeat(valid[:, None],
                                 self.num_base_anchors[i], axis=1).reshape(-1))
        return out


def anchor_inside_flags(anchors: np.ndarray, img_shape, allowed_border: int = 0):
    """Flags for anchors fully inside (h, w) within `allowed_border`.

    jnp-compatible (works on traced arrays); mirrors
    `mmdet/core/anchor/utils.py:anchor_inside_flags`. With allowed_border<0
    everything is valid.
    """
    import jax.numpy as jnp
    h, w = img_shape[0], img_shape[1]
    if allowed_border < 0:
        return jnp.ones(anchors.shape[:-1], bool)
    return ((anchors[..., 0] >= -allowed_border) &
            (anchors[..., 1] >= -allowed_border) &
            (anchors[..., 2] < w + allowed_border) &
            (anchors[..., 3] < h + allowed_border))

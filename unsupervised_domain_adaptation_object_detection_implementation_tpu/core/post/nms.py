"""Static-shape greedy NMS for TPU.

Replaces the reference's mmcv CUDA `nms` / `batched_nms`
(`mmdet/core/post_processing/bbox_nms.py:8`, used by
`mmdet/models/dense_heads/rpn_head_da.py:301` and every test-time head) with an
exact greedy NMS expressed as XLA control flow:

- boxes are sorted by score once,
- processed in fixed-size tiles: each tile is first suppressed by all earlier
  (already-final) tiles with one (T, T) IoU matrix per pair, then resolved
  internally with a fixpoint loop over the upper-triangular IoU matrix.

This reproduces the sequential greedy semantics exactly (same keep set as
torchvision/mmcv NMS up to score ties) while keeping every inner op a dense
(T, T) matrix — MXU/VPU friendly, no dynamic shapes. All outputs are padded to
static sizes with validity masks.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..bbox.iou import bbox_overlaps

NEG_INF = -1e10


def _pad_to_multiple(x: jnp.ndarray, multiple: int, axis: int, value):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def nms(boxes: jnp.ndarray,
        scores: jnp.ndarray,
        iou_threshold: float,
        tile_size: int = 256,
        offset: float = 0.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact greedy NMS.

    Args:
        boxes: (N, 4) xyxy.
        scores: (N,) — entries at NEG_INF (or -inf) are treated as invalid.
        iou_threshold: suppression threshold (strictly greater suppresses,
            matching torchvision `iou > thr` semantics used by mmcv).
        tile_size: processing tile (multiple of 128 recommended).

    Returns:
        keep: (N,) bool — kept boxes, in the ORIGINAL input order.
        order: (N,) int32 — indices sorting scores descending (for callers
            that want sorted outputs).
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    scores_s = scores[order]
    valid_s = scores_s > NEG_INF / 2

    boxes_p = _pad_to_multiple(boxes_s, tile_size, 0, 0.0)
    valid_p = _pad_to_multiple(valid_s, tile_size, 0, False)
    n_pad = boxes_p.shape[0]
    num_tiles = n_pad // tile_size

    def process_tile(i, alive):
        tile_boxes = jax.lax.dynamic_slice_in_dim(boxes_p, i * tile_size, tile_size)
        tile_alive = jax.lax.dynamic_slice_in_dim(alive, i * tile_size, tile_size)

        def prev_body(j, t_alive):
            prev_boxes = jax.lax.dynamic_slice_in_dim(boxes_p, j * tile_size,
                                                      tile_size)
            prev_alive = jax.lax.dynamic_slice_in_dim(alive, j * tile_size,
                                                      tile_size)
            iou = bbox_overlaps(tile_boxes, prev_boxes)
            sup = jnp.any((iou > iou_threshold) & prev_alive[None, :], axis=1)
            return t_alive & ~sup

        tile_alive = jax.lax.fori_loop(0, i, prev_body, tile_alive)

        # Self-suppression fixpoint within the tile: row r can suppress
        # col c only if r < c (higher score) and r itself survives.
        iou_self = bbox_overlaps(tile_boxes, tile_boxes)
        row_lt_col = (jnp.arange(tile_size)[:, None] < jnp.arange(tile_size)[None, :])
        sup_matrix = (iou_self > iou_threshold) & row_lt_col

        def fix_cond(state):
            a, changed = state
            return changed

        def fix_body(state):
            a, _ = state
            new_a = tile_alive & ~jnp.any(sup_matrix & a[:, None], axis=0)
            return new_a, jnp.any(new_a != a)

        # Start from "nothing self-suppressed" and iterate to fixpoint.
        tile_alive_final, _ = jax.lax.while_loop(
            fix_cond, fix_body, (tile_alive, jnp.asarray(True)))

        return jax.lax.dynamic_update_slice_in_dim(
            alive, tile_alive_final, i * tile_size, axis=0)

    alive = jax.lax.fori_loop(0, num_tiles, process_tile, valid_p)
    keep_sorted = alive[:n] & valid_s
    # scatter back to original order
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep, order


def nms_select(boxes: jnp.ndarray,
               scores: jnp.ndarray,
               iou_threshold: float,
               max_out: int,
               tile_size: int = 256) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS + top-`max_out` selection.

    Returns (boxes (max_out, 4), scores (max_out,), valid (max_out,)) —
    kept boxes in descending-score order, zero-padded.
    """
    keep, _ = nms(boxes, scores, iou_threshold, tile_size)
    sel_scores = jnp.where(keep, scores, NEG_INF)
    k = min(max_out, sel_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(sel_scores, k)
    if k < max_out:
        pad = max_out - k
        top_scores = jnp.concatenate([top_scores, jnp.full((pad,), NEG_INF)])
        top_idx = jnp.concatenate([top_idx, jnp.zeros((pad,), top_idx.dtype)])
    valid = top_scores > NEG_INF / 2
    out_boxes = boxes[top_idx] * valid[:, None].astype(boxes.dtype)
    out_scores = jnp.where(valid, top_scores, 0.0)
    return out_boxes, out_scores, valid


def batched_nms(boxes: jnp.ndarray,
                scores: jnp.ndarray,
                idxs: jnp.ndarray,
                iou_threshold: float,
                tile_size: int = 256,
                class_agnostic: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Category-aware NMS via the coordinate-offset trick (mmcv `batched_nms`).

    Boxes of different `idxs` never overlap after offsetting, so one NMS call
    handles all categories.
    """
    if class_agnostic:
        return nms(boxes, scores, iou_threshold, tile_size)
    lo = jnp.min(boxes)
    unit = jnp.max(boxes) - lo + 1.0
    offsets = idxs.astype(boxes.dtype) * (unit + 1.0)
    shifted = (boxes - lo) + offsets[:, None]
    return nms(shifted, scores, iou_threshold, tile_size)


def multiclass_nms(multi_bboxes: jnp.ndarray,
                   multi_scores: jnp.ndarray,
                   score_thr: float,
                   iou_threshold: float,
                   max_per_img: int,
                   tile_size: int = 256,
                   pre_nms_top_n: int = 0,
                   nms_type: str = 'nms',
                   soft_sigma: float = 0.5,
                   soft_min_score: float = 1e-3,
                   soft_method: str = 'linear'):
    """Per-class NMS over RCNN outputs — reference `multiclass_nms`
    (`mmdet/core/post_processing/bbox_nms.py:8`).

    Args:
        multi_bboxes: (N, C*4) class-specific or (N, 4) shared boxes.
        multi_scores: (N, C+1) — last column is background, dropped.
        pre_nms_top_n: cap on candidates entering NMS (0 = N*C). Keeping
            this bounded keeps the IoU tiles small on TPU.
        nms_type: 'nms' (hard greedy) or 'soft_nms' (score decay) —
            the reference's ``nms_cfg type`` dispatch in mmcv batched_nms.
        soft_*: soft-NMS parameters (ignored for hard NMS).

    Returns:
        dets (max_per_img, 5) [x1 y1 x2 y2 score], labels (max_per_img,),
        valid (max_per_img,) — descending score, zero-padded.
    """
    num_classes = multi_scores.shape[-1] - 1
    n = multi_scores.shape[0]
    scores = multi_scores[:, :num_classes]  # (N, C)
    if multi_bboxes.shape[-1] == 4:
        boxes = jnp.broadcast_to(multi_bboxes[:, None, :], (n, num_classes, 4))
    else:
        boxes = multi_bboxes.reshape(n, num_classes, 4)

    flat_boxes = boxes.reshape(-1, 4)
    flat_scores = scores.reshape(-1)
    flat_labels = jnp.tile(jnp.arange(num_classes, dtype=jnp.int32), (n,))

    flat_scores = jnp.where(flat_scores > score_thr, flat_scores, NEG_INF)

    if pre_nms_top_n and pre_nms_top_n < flat_scores.shape[0]:
        flat_scores, sel = jax.lax.top_k(flat_scores, pre_nms_top_n)
        flat_boxes = flat_boxes[sel]
        flat_labels = flat_labels[sel]

    if nms_type == 'soft_nms':
        dets, out_idx, valid = batched_soft_nms(
            flat_boxes, flat_scores, flat_labels, iou_threshold,
            soft_sigma, soft_min_score, soft_method, max_per_img)
        out_labels = jnp.where(valid, flat_labels[out_idx], 0)
        return dets, out_labels, valid

    keep, _ = batched_nms(flat_boxes, flat_scores, flat_labels, iou_threshold,
                          tile_size)
    kept_scores = jnp.where(keep, flat_scores, NEG_INF)
    k = min(max_per_img, kept_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(kept_scores, k)
    if k < max_per_img:
        pad = max_per_img - k
        top_scores = jnp.concatenate([top_scores, jnp.full((pad,), NEG_INF)])
        top_idx = jnp.concatenate([top_idx, jnp.zeros((pad,), top_idx.dtype)])
    valid = top_scores > NEG_INF / 2
    out_boxes = flat_boxes[top_idx] * valid[:, None].astype(flat_boxes.dtype)
    out_scores = jnp.where(valid, top_scores, 0.0)
    out_labels = jnp.where(valid, flat_labels[top_idx], 0)
    dets = jnp.concatenate([out_boxes, out_scores[:, None]], axis=-1)
    return dets, out_labels, valid


def soft_nms(boxes: jnp.ndarray,
             scores: jnp.ndarray,
             iou_threshold: float = 0.3,
             sigma: float = 0.5,
             min_score: float = 1e-3,
             method: str = 'linear',
             max_out: int = 100) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Soft-NMS (Bodla et al., ICCV'17) — score-decay NMS.

    Reference capability: mmcv `soft_nms`, selected via
    ``nms_cfg=dict(type='soft_nms')`` in
    `/root/reference/configs/faster_rcnn/faster_rcnn_r50_fpn_soft_nms_1x_coco.py:2-6`
    and dispatched by `mmdet/core/post_processing/bbox_nms.py:8`.

    Greedy semantics: repeatedly pick the highest-scoring *current* box,
    then multiplicatively decay every remaining box's score by

    - ``linear``:   ``1 - iou``            when ``iou > iou_threshold``
    - ``gaussian``: ``exp(-iou**2/sigma)`` for every overlap
    - ``naive``:    ``0``                  when ``iou > iou_threshold``
      (degenerates to hard NMS)

    A box whose decayed score drops below ``min_score`` is pruned.  The
    sequential pick loop is bounded at ``max_out`` iterations — callers
    always cap output at ``max_per_img`` anyway, and picks are emitted in
    descending decayed-score order, so the first ``max_out`` picks ARE the
    top-``max_out`` of the full algorithm.

    Args:
        boxes: (N, 4) xyxy.  scores: (N,) — NEG_INF marks invalid slots.

    Returns:
        dets (max_out, 5) [x1 y1 x2 y2 decayed_score], idx (max_out,) int32
        index into the input (0 where invalid), valid (max_out,) bool.
    """
    if method not in ('linear', 'gaussian', 'naive'):
        raise ValueError(f'unknown soft-NMS method {method!r}')
    n = boxes.shape[0]

    def body(i, state):
        sc, out_idx, out_sc = state
        pick = jnp.argmax(sc)
        s = sc[pick]
        ok = s >= min_score
        out_idx = out_idx.at[i].set(jnp.where(ok, pick, 0).astype(jnp.int32))
        out_sc = out_sc.at[i].set(jnp.where(ok, s, NEG_INF))
        iou = bbox_overlaps(boxes[pick][None, :], boxes)[0]
        if method == 'linear':
            weight = jnp.where(iou > iou_threshold, 1.0 - iou, 1.0)
        elif method == 'gaussian':
            weight = jnp.exp(-(iou * iou) / sigma)
        else:
            weight = (iou <= iou_threshold).astype(sc.dtype)
        new_sc = sc * jnp.where(sc > NEG_INF / 2, weight, 1.0)
        new_sc = new_sc.at[pick].set(NEG_INF)
        new_sc = jnp.where(new_sc < min_score, NEG_INF, new_sc)
        sc = jnp.where(ok, new_sc, sc)
        return sc, out_idx, out_sc

    sc0 = jnp.where(scores >= min_score, scores, NEG_INF).astype(jnp.float32)
    out_idx0 = jnp.zeros((max_out,), jnp.int32)
    out_sc0 = jnp.full((max_out,), NEG_INF, jnp.float32)
    _, out_idx, out_sc = jax.lax.fori_loop(
        0, min(max_out, n), body, (sc0, out_idx0, out_sc0))
    valid = out_sc > NEG_INF / 2
    out_boxes = boxes[out_idx] * valid[:, None].astype(boxes.dtype)
    dets = jnp.concatenate(
        [out_boxes, jnp.where(valid, out_sc, 0.0)[:, None]], axis=-1)
    return dets, out_idx, valid


def batched_soft_nms(boxes: jnp.ndarray,
                     scores: jnp.ndarray,
                     idxs: jnp.ndarray,
                     iou_threshold: float = 0.3,
                     sigma: float = 0.5,
                     min_score: float = 1e-3,
                     method: str = 'linear',
                     max_out: int = 100):
    """Category-aware soft-NMS via the coordinate-offset trick (mmcv
    `batched_nms` with ``nms_cfg type='soft_nms'``).  Cross-class IoU is 0
    after offsetting, so decay weights are exactly 1 across classes for all
    three methods (``exp(0)=1``)."""
    lo = jnp.min(boxes)
    unit = jnp.max(boxes) - lo + 1.0
    shifted = (boxes - lo) + (idxs.astype(boxes.dtype) * (unit + 1.0))[:, None]
    dets, out_idx, valid = soft_nms(shifted, scores, iou_threshold, sigma,
                                    min_score, method, max_out)
    # restore original (un-shifted) coordinates
    out_boxes = boxes[out_idx] * valid[:, None].astype(boxes.dtype)
    dets = jnp.concatenate([out_boxes, dets[:, 4:5]], axis=-1)
    return dets, out_idx, valid


def fast_nms_keep(boxes: jnp.ndarray,
                  scores: jnp.ndarray,
                  labels: jnp.ndarray,
                  iou_threshold: float) -> jnp.ndarray:
    """Keep mask (original order) of YOLACT's fast NMS: a box is suppressed
    if ANY higher-scored same-class box overlaps it above the threshold —
    no re-admission of boxes whose suppressor was itself suppressed. One
    dense (N, N) IoU matrix, zero sequential dependencies — the most
    TPU-idiomatic NMS form."""
    # class-offset trick: shift into per-class bands that cannot overlap
    # (normalize to min so negative coordinates stay inside their band)
    lo = jnp.min(boxes)
    unit = jnp.max(boxes) - lo + 1.0
    shifted = (boxes - lo) + (labels.astype(boxes.dtype) * (unit + 1.0))[:, None]
    from ..bbox.iou import bbox_overlaps
    iou = bbox_overlaps(shifted, shifted)                     # (N, N)
    # i beats j on score, index as the tie-break (reference fast_nms sorts
    # then triu's, which always suppresses one of an exactly-tied pair)
    idx = jnp.arange(scores.shape[0])
    higher = (scores[:, None] > scores[None, :]) | \
        ((scores[:, None] == scores[None, :]) & (idx[:, None] < idx[None, :]))
    suppressed = jnp.any((iou > iou_threshold) & higher, axis=0)
    return ~suppressed


def fast_nms(boxes: jnp.ndarray,
             scores: jnp.ndarray,
             labels: jnp.ndarray,
             iou_threshold: float = 0.5,
             score_thr: float = 0.05,
             max_out: int = 100):
    """YOLACT's fast NMS (reference `core/post_processing/bbox_nms.py:98`).

    Args:
        boxes: (N, 4); scores: (N,); labels: (N,) int class ids.
    Returns:
        dets (max_out, 5), labels (max_out,), valid (max_out,) —
        descending score, zero-padded.
    """
    n = scores.shape[0]
    b, s, l = boxes, scores, labels
    keep = fast_nms_keep(b, s, l, iou_threshold) & (s > score_thr)
    sel = jnp.where(keep, s, NEG_INF)
    k = min(max_out, n)
    top, idx = jax.lax.top_k(sel, k)
    if k < max_out:
        pad = max_out - k
        top = jnp.concatenate([top, jnp.full((pad,), NEG_INF)])
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    valid = top > NEG_INF / 2
    dets = jnp.concatenate(
        [b[idx] * valid[:, None].astype(b.dtype),
         jnp.where(valid, top, 0.0)[:, None]], -1)
    return dets, jnp.where(valid, l[idx], 0), valid

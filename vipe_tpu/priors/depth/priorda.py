"""PriorDA: prompted depth completion (reference
/root/reference/vipe/priors/depth/priorda/).

Pipeline role (reference pipeline/processors.py:252-269): the projected SLAM
map provides a sparse metric prompt; a DAv2-style network predicts relative
disparities; a coarse alignment stage fits them to the prompt — a global
scale/shift plus per-pixel K=5 inverse-distance-weighted KNN scale/shift
(depth_completion.py:292-427) — and a FINE conditioned DAv2 refines the
result: the coarse outputs become a 3-channel condition map
[uncertainty, global-aligned disp, knn-completed disp] injected into the
encoder through a zero-initialized patch projection (reference
priorda.py:100-161, patch_embed.py:71-94).

TPU design: the KNN runs as chunked distance matmuls + top_k
(vipe_tpu.ops.knn) instead of the reference's CUDA kd-tree, and the per-pixel
weighted 2×2 LSQ solves are a closed form evaluated in one vmap.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.knn import knn
from ...ops.resize import resize_align_corners
from .base import DepthEstimationInput, DepthEstimationModel, DepthEstimationResult, DepthType
from .dav2 import DepthAnythingV2Net, preprocess


def global_scale_shift(pred, sparse, mask):
    """LSQ (scale, shift) with scale·pred + shift ≈ sparse on masked points
    (reference ss_completer / global_aligns, depth_completion.py:381-427)."""
    m = np.asarray(mask, bool)
    x = np.asarray(pred, np.float64)[m]
    y = np.asarray(sparse, np.float64)[m]
    if len(x) < 2:
        return 1.0, 0.0
    A = np.stack([x, np.ones_like(x)], -1)
    sol, *_ = np.linalg.lstsq(A, y, rcond=None)
    return float(sol[0]), float(sol[1])


def knn_scale_shift_completion(pred_disp, sparse_disp, sparse_mask, K: int = 5):
    """Per-pixel KNN-weighted scale/shift (reference kss_completer,
    depth_completion.py:341-379).

    For every pixel, find the K nearest valid sparse pixels (image-plane
    L2), solve the inverse-distance-weighted 2-point LSQ
    ``scale·pred(neighbor) + shift ≈ sparse(neighbor)`` in closed form, and
    apply it to that pixel's prediction.  Sparse pixels keep their prompt
    value exactly.
    """
    pred = jnp.asarray(pred_disp, jnp.float32)
    sparse = jnp.asarray(sparse_disp, jnp.float32)
    mask = np.asarray(sparse_mask, bool)
    H, W = pred.shape

    vy, vx = np.nonzero(mask)
    if len(vy) < K:
        s, b = global_scale_shift(pred_disp, sparse_disp, sparse_mask)
        out = pred * s + b
        return jnp.where(jnp.asarray(mask), sparse, out)

    pts = jnp.asarray(np.stack([vx, vy], -1), jnp.float32)
    qy, qx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    queries = jnp.asarray(
        np.stack([qx.reshape(-1), qy.reshape(-1)], -1), jnp.float32
    )
    d2, idx = knn(queries, pts, K)  # (HW, K)

    sp_vals = jnp.asarray(sparse[vy, vx])[idx]   # (HW, K)
    pr_vals = jnp.asarray(pred[vy, vx])[idx]     # (HW, K)
    # tiny jitter avoids a singular system when neighbors share one value
    pr_vals = pr_vals + 1e-5 * jnp.arange(1, K + 1)[None, :]

    w = 1.0 / jnp.sqrt(jnp.maximum(d2, 1e-8))
    w = w / jnp.sum(w, axis=1, keepdims=True)

    # weighted 2×2 normal equations per pixel
    a00 = jnp.sum(w * pr_vals * pr_vals, 1)
    a01 = jnp.sum(w * pr_vals, 1)
    a11 = jnp.sum(w, 1)
    b0 = jnp.sum(w * pr_vals * sp_vals, 1)
    b1 = jnp.sum(w * sp_vals, 1)
    det = a00 * a11 - a01 * a01
    safe = jnp.abs(det) > 1e-10
    scale = jnp.where(safe, (a11 * b0 - a01 * b1) / jnp.where(safe, det, 1.0), 1.0)
    shift = jnp.where(safe, (-a01 * b0 + a00 * b1) / jnp.where(safe, det, 1.0), 0.0)

    out = (pred.reshape(-1) * scale + shift).reshape(H, W)
    return jnp.where(jnp.asarray(mask), sparse, out)


def _depth2disp(depth):
    """Guarded reciprocal (reference utils.depth2disparity)."""
    return np.where(depth > 0, 1.0 / np.maximum(depth, 1e-8), 0.0)


class PriorDAModel(DepthEstimationModel):
    """Prompted completion adapter (reference priorda/__init__.py:31-50).

    ``coarse_only=False`` (reference default) runs the conditioned
    refinement net; the conditioned encoder size follows the reference's
    ``conditioned_model_size`` default (vitb)."""

    depth_type = DepthType.METRIC_DEPTH

    def __init__(self, variant: str = "vitb", input_size: int = 518,
                 K: int = 5, params=None, coarse_only: bool = False,
                 fine_params=None, fine_variant: str = "vitb"):
        from ...models import zoo

        def _infer_variant(p, default):
            """Encoder size from the checkpoint itself (the reference reads
            conditioned_model_size from its config; registry weights carry
            it in the embed dim)."""
            if p is None:
                return default
            dim = int(np.asarray(p["vit"]["params"]["cls_token"]).shape[-1])
            return {384: "vits", 768: "vitb", 1024: "vitl"}.get(dim, default)

        if params is None:
            params = zoo.load_params("priorda")
            variant = _infer_variant(params, variant)
        if fine_params is None and not coarse_only:
            fine_params = zoo.load_params("priorda_fine")
            fine_variant = _infer_variant(fine_params, fine_variant)
        self.net = DepthAnythingV2Net(variant or "vitb", max_depth=None,
                                      params=params)
        self.coarse_only = coarse_only
        if not coarse_only:
            # conditioned MDE: 3-channel condition through alpha_proj
            # (reference priorda.py:62-78, err_condition=True)
            self.fine_net = DepthAnythingV2Net(
                fine_variant, max_depth=None, params=fine_params, cond_dim=3
            )
        self.input_size = input_size
        self.K = K

    def _fine_inputs(self, rgb, global_disp, comp_disp, sparse_depth,
                     sparse_mask):
        """Per-frame conditioned-net inputs (reference priorda.py:127-161):
        normalize depths to the prompt's [min, max], stack
        [uncertainty | global disp | completed disp].  Returns
        (img (nh,nw,3), condition (nh,nw,3), masked_min, denom)."""
        # uncertainty = |comp - global| / global where global > 0, min-max
        # normalized (depth_completion.py:223-233)
        cal = global_disp > 0.0
        uctn = np.where(
            cal, np.abs(comp_disp - global_disp) / np.maximum(global_disp, 1e-8), 0.0
        )
        rng_u = uctn.max() - uctn.min()
        if rng_u > 0:
            uctn = (uctn - uctn.min()) / rng_u

        # normalize_depth: affine params from the sparse PROMPT depths
        # (priorda.py:133-140 zero_one_normalize(affine_only))
        vals = sparse_depth[sparse_mask]
        masked_min = float(vals.min())
        denom = float(vals.max() - vals.min()) or 1.0

        def norm_cond(disp):
            depth_n = (_depth2disp(disp) - masked_min) / denom
            return _depth2disp(depth_n)

        condition = np.stack(
            [uctn, norm_cond(global_disp), norm_cond(comp_disp)], axis=-1
        ).astype(np.float32)

        img, _ = preprocess(np.asarray(rgb, np.float32), self.input_size)
        nh, nw = img.shape[:2]
        cond = np.asarray(resize_align_corners(jnp.asarray(condition), (nh, nw)))
        return img, cond, masked_min, denom

    def _fine_forward_batch(self, imgs, conds, norms, out_hw):
        """ONE stacked conditioned forward for the chunk, then per-frame
        un-normalization (the affine params are per-frame)."""
        h, w = out_hw
        disp = self.fine_net(
            jnp.asarray(np.stack(imgs)), jnp.asarray(np.stack(conds))
        )
        disp = np.asarray(resize_align_corners(disp[..., None], (h, w))[..., 0])
        out = []
        for d, (masked_min, denom) in zip(disp, norms):
            depth_n = _depth2disp(d)
            out.append((depth_n * denom + masked_min).astype(np.float32))
        return out

    def _fine_refine(self, rgb, global_disp, comp_disp, sparse_depth,
                     sparse_mask, out_hw):
        """Conditioned refinement for a single frame."""
        img, cond, mmin, den = self._fine_inputs(
            rgb, global_disp, comp_disp, sparse_depth, sparse_mask
        )
        return self._fine_forward_batch([img], [cond], [(mmin, den)], out_hw)[0]

    def _coarse_align(self, pred_disp, prompt_depth, out_hw):
        """Global + KNN scale/shift alignment of one frame's predicted
        disparity to its prompt.  Returns (coarse_depth_or_nan_map,
        fine_args_or_None) — fine_args feed the conditioned refinement."""
        h, w = out_hw
        prompt = np.asarray(prompt_depth, np.float32)
        sparse_mask = prompt > 0
        sparse_disp = np.where(sparse_mask, 1.0 / np.maximum(prompt, 1e-6), 0.0)
        if sparse_mask.sum() < 2:
            return np.full((h, w), np.nan, np.float32), None
        s, b = global_scale_shift(pred_disp, sparse_disp, sparse_mask)
        global_disp = pred_disp * s + b
        completed = np.asarray(
            knn_scale_shift_completion(
                global_disp, sparse_disp, sparse_mask, self.K
            )
        )
        completed = np.maximum(completed, 1e-4)
        return (
            (1.0 / completed).astype(np.float32),
            (global_disp, completed, prompt, sparse_mask),
        )

    def complete(self, rgb: np.ndarray, prompt_depth: np.ndarray) -> np.ndarray:
        """rgb (H, W, 3) in [0,1]; prompt_depth (H, W) metric with 0 = empty.
        Returns completed metric depth (H, W)."""
        return self.complete_batch([rgb], [prompt_depth])[0]

    def complete_batch(self, rgbs, prompt_depths):
        """Batched prompted completion: ONE stacked DAv2 forward for the
        chunk (and one stacked conditioned forward in fine mode) instead of
        a full ViT dispatch per frame — the per-frame reference semantics
        (depth_completion.py:292-427) are per-frame only because torch runs
        eagerly; the alignment math is independent across frames.  Mixed
        frame shapes fall back to per-frame chunks of one."""
        shapes = {np.asarray(r).shape for r in rgbs}
        if len(shapes) != 1:
            return [
                d for r, p in zip(rgbs, prompt_depths)
                for d in self.complete_batch([r], [p])
            ]
        imgs, hw = [], None
        for rgb in rgbs:
            img, hw = preprocess(rgb, self.input_size)
            imgs.append(img)
        h, w = hw
        # reference resizes disparity with align_corners=True (dpt.py:223)
        pred = self.net(jnp.asarray(np.stack(imgs)))
        pred_disps = np.asarray(
            resize_align_corners(pred[..., None], (h, w))[..., 0]
        )
        out = [None] * len(rgbs)
        fine_idx, fine_imgs, fine_conds, fine_norms = [], [], [], []
        for i, (rgb, prompt_depth) in enumerate(zip(rgbs, prompt_depths)):
            coarse, fine_args = self._coarse_align(
                pred_disps[i], prompt_depth, (h, w)
            )
            out[i] = coarse
            if fine_args is not None and not self.coarse_only:
                img_f, cond, mmin, den = self._fine_inputs(rgb, *fine_args)
                fine_idx.append(i)
                fine_imgs.append(img_f)
                fine_conds.append(cond)
                fine_norms.append((mmin, den))
        if fine_idx:
            refined = self._fine_forward_batch(
                fine_imgs, fine_conds, fine_norms, (h, w)
            )
            for i, d in zip(fine_idx, refined):
                out[i] = d
        return out

    def estimate(self, inp: DepthEstimationInput) -> DepthEstimationResult:
        raise RuntimeError(
            "PriorDA is a prompted completion model; call .complete(rgb, "
            "prompt_depth) with a projected SLAM-map prompt"
        )

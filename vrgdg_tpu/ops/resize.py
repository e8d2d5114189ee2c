"""Resampling: resize / letterbox / crop-to-fill and their exact inverses.

Functional parity targets:
- ``_resize_batch`` / ``_restore_batch`` (``VRGDG_VideoEnhanceNodes.py:54-106``):
  torch ``F.interpolate`` semantics for nearest / bilinear / bicubic / area
  with align_corners=False, plus the three fit modes (stretch, crop-to-fill
  with center crop, letterbox with zero pad) and the letterbox inverse that
  recomputes the content box and stretches it back,
- ``_resize_frames`` (``VRGDG_StandaloneVideoEnhancerNodes.py:213-230``):
  cv2 ``INTER_LANCZOS4`` full-frame resize used by the enhancer.

TPU-first formulation: every 2D resample here is separable, so it is
expressed as two dense matmuls with precomputed (host-cached) weight
matrices — ``out = W_h @ frame @ W_w^T`` per channel, batched over frames.
That turns interpolation into MXU work instead of per-pixel gather loops,
and it is exactly reproducible: each row of a weight matrix holds the tap
weights (bicubic A=-0.75, Lanczos a=4, box means for area) with
border-clamped taps accumulated, matching torch/cv2 edge handling.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# Canonical fit-mode names (the reference's UI strings) plus short aliases.
FIT_STRETCH = "Stretch to dimensions"
FIT_CROP = "Crop to fill"
FIT_LETTERBOX = "Fit with letterbox (preserve all)"
_FIT_ALIASES = {
    "stretch": FIT_STRETCH, FIT_STRETCH: FIT_STRETCH,
    "crop": FIT_CROP, FIT_CROP: FIT_CROP,
    "letterbox": FIT_LETTERBOX, FIT_LETTERBOX: FIT_LETTERBOX,
}

_METHOD_ALIASES = {
    "nearest": "nearest", "Nearest": "nearest",
    "nearest-exact": "nearest-exact", "nearest_exact": "nearest-exact",
    "bilinear": "bilinear", "Bilinear": "bilinear",
    "bicubic": "bicubic", "Bicubic (recommended)": "bicubic",
    "area": "area", "Area": "area",
    "lanczos4": "lanczos4", "lanczos": "lanczos4",
}


def canonical_fit_mode(mode: str) -> str:
    try:
        return _FIT_ALIASES[str(mode)]
    except KeyError:
        raise ValueError(f"Unknown fit mode: {mode!r}") from None


def canonical_method(method: str) -> str:
    try:
        return _METHOD_ALIASES[str(method)]
    except KeyError:
        raise ValueError(f"Unknown resize method: {method!r}") from None


def _cubic_weight(d: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel with torch's A=-0.75."""
    d = np.abs(d)
    w = np.where(d <= 1.0,
                 ((a + 2.0) * d - (a + 3.0)) * d * d + 1.0,
                 np.where(d < 2.0,
                          ((a * d - 5.0 * a) * d + 8.0 * a) * d - 4.0 * a,
                          0.0))
    return w


def _lanczos_weight(d: np.ndarray, a: int = 4) -> np.ndarray:
    w = np.sinc(d) * np.sinc(d / a)
    return np.where(np.abs(d) < a, w, 0.0)


@functools.lru_cache(maxsize=256)
def resample_matrix(src: int, dst: int, method: str) -> np.ndarray:
    """Dense ``(dst, src)`` resampling matrix for one axis.

    Border taps are clamped into range and accumulated, reproducing
    torch's bounded access / cv2's replicate border.
    """
    method = canonical_method(method)
    src, dst = int(src), int(dst)
    out = np.zeros((dst, src), np.float64)
    if src == dst and method != "area":
        np.fill_diagonal(out, 1.0)
        return out.astype(np.float32)
    scale = src / dst

    if method == "nearest":
        idx = np.minimum((np.arange(dst) * scale).astype(np.int64), src - 1)
        out[np.arange(dst), idx] = 1.0
        return out.astype(np.float32)

    if method == "nearest-exact":
        # torch mode="nearest-exact" / PIL: source index floor((i+0.5)*s)
        idx = np.minimum(((np.arange(dst) + 0.5) * scale).astype(np.int64),
                         src - 1)
        out[np.arange(dst), idx] = 1.0
        return out.astype(np.float32)

    if method == "area":
        # torch adaptive_avg_pool boundaries: floor/ceil integer ranges.
        for i in range(dst):
            start = int(np.floor(i * src / dst))
            end = int(np.ceil((i + 1) * src / dst))
            out[i, start:end] = 1.0 / (end - start)
        return out.astype(np.float32)

    centers = (np.arange(dst) + 0.5) * scale - 0.5
    if method == "bilinear":
        centers = np.maximum(centers, 0.0)  # torch clamps the source index
        base = np.floor(centers).astype(np.int64)
        taps, radius = 2, 0
        weight_fn = None  # handled explicitly
    elif method == "bicubic":
        base = np.floor(centers).astype(np.int64)
        taps, radius = 4, 1
        weight_fn = _cubic_weight
    else:  # lanczos4
        base = np.floor(centers).astype(np.int64)
        taps, radius = 8, 3
        weight_fn = _lanczos_weight

    for i in range(dst):
        x = centers[i]
        b = base[i]
        if method == "bilinear":
            lam = x - b
            pairs = ((min(max(b, 0), src - 1), 1.0 - lam),
                     (min(b + 1, src - 1), lam))
            for j, w in pairs:
                out[i, j] += w
            continue
        offsets = np.arange(taps) - radius
        positions = b + offsets
        weights = weight_fn(x - positions)
        total = weights.sum()
        if method == "lanczos4" and total != 0.0:
            weights = weights / total  # cv2 normalizes the windowed sinc
        for j, w in zip(np.clip(positions, 0, src - 1), weights):
            out[i, j] += w
    return out.astype(np.float32)


@functools.lru_cache(maxsize=256)
def _tap_plan(src: int, dst: int, method: str) -> tuple[np.ndarray, np.ndarray]:
    """Sparse form of :func:`resample_matrix`: per output row, the (at most
    ``taps``) nonzero source indices and weights, zero-padded to a fixed
    width.  Numerically identical to the dense matrix (border-clamped taps
    are pre-accumulated there)."""
    dense = resample_matrix(src, dst, method)
    counts = (dense != 0.0).sum(axis=1)
    taps = max(1, int(counts.max()))
    idx = np.zeros((dst, taps), np.int32)
    weights = np.zeros((dst, taps), np.float32)
    for i in range(dst):
        nz = np.nonzero(dense[i])[0]
        idx[i, :len(nz)] = nz
        weights[i, :len(nz)] = dense[i, nz]
    return idx, weights


def _resample_axis(x: jnp.ndarray, axis: int, src: int, dst: int,
                   method: str) -> jnp.ndarray:
    idx_np, w_np = _tap_plan(src, dst, method)
    taps = idx_np.shape[1]
    idx = jnp.asarray(idx_np)
    weights = jnp.asarray(w_np)
    w_shape = [1] * x.ndim
    w_shape[axis] = dst
    out = None
    for t in range(taps):
        term = jnp.take(x, idx[:, t], axis=axis) \
            * weights[:, t].reshape(w_shape)
        out = term if out is None else out + term
    return out


def _dense_mxu_resample(x: jnp.ndarray, target_height: int,
                        target_width: int, method: str) -> jnp.ndarray:
    """Separable resample as two dense MXU matmuls at 3-pass (``high``)
    precision.

    Measured on the v5e at 1080p->4K lanczos4 (BASELINE.md round-4):
    tap-gather 5.72 ms/frame, dense HIGHEST 4.77, dense HIGH
    **2.52 ms** width-first — the MXU eats the ``src/taps``x zero FLOPs
    and still wins 2.3x.  3-pass bf16 splitting bounds the error at
    ~7e-5 on [0, 1] inputs (measured 6.7e-5 max vs the exact tap path;
    the cv2-parity budget for lanczos4 is 1e-3, and uint8 outputs sit
    ~30x further away).  Axis order is chosen by MAC count — contract
    the larger source axis first (width-first measured 2.52 vs
    height-first 2.96 ms at 1080p->4K).  On CPU backends ``precision``
    is ignored and the matmul is exact f32.
    """
    from jax import lax

    src_h, src_w = int(x.shape[1]), int(x.shape[2])
    dst_h, dst_w = int(target_height), int(target_width)

    def by_height(t):
        wh = jnp.asarray(resample_matrix(src_h, dst_h, method))
        return jnp.einsum("oh,hwc->owc", wh, t, precision="high")

    def by_width(t):
        ww = jnp.asarray(resample_matrix(src_w, dst_w, method))
        return jnp.einsum("vw,hwc->hvc", ww, t, precision="high")

    # MACs: height-first = dh*sh*sw + dw*sw*dh ; width-first symmetric
    height_first = dst_h * src_h * src_w + dst_w * src_w * dst_h
    width_first = dst_w * src_w * src_h + dst_h * src_h * dst_w

    def per_frame(frame):
        if src_h == dst_h:
            return by_width(frame)
        if src_w == dst_w:
            return by_height(frame)
        if height_first <= width_first:
            return by_width(by_height(frame))
        return by_height(by_width(frame))

    # lax.map (not a batched einsum): the per-frame trace is the same
    # program at every batch size, so reduction order — and therefore
    # the bits — cannot depend on how frames are batched or sharded
    # across a mesh (the enhancer's single-vs-sharded bit-identity
    # contract; a batched einsum measurably violated it on CPU).
    return lax.map(per_frame, x)


def resample(frames: jnp.ndarray, target_height: int, target_width: int,
             method: str = "bicubic") -> jnp.ndarray:
    """Resample a BHWC batch to ``(target_height, target_width)``.

    TPU formulation, per method:

    - ``lanczos4`` (the enhancer's cv2-parity path, budget 1e-3) runs as
      two dense **MXU matmuls** (:func:`_dense_mxu_resample`) — measured
      2.3x faster than the tap-gather at 1080p->4K with a ~7e-5 error
      bound, 15x inside the budget;
    - every torch-parity method (bilinear/bicubic/area/nearest, budget
      2e-5) keeps the exact separable **tap-gather** — per axis, at most
      ``taps`` row gathers and fused multiply-adds from the same weight
      tables as :func:`resample_matrix`, bit-stable in f32.
    """
    method = canonical_method(method)
    src_h, src_w = int(frames.shape[1]), int(frames.shape[2])
    if (src_h, src_w) == (int(target_height), int(target_width)):
        return frames  # all methods are exact identity at equal size
    x = frames.astype(jnp.float32)
    if method == "lanczos4":
        return _dense_mxu_resample(
            x, target_height, target_width, method).astype(frames.dtype)
    if src_h != int(target_height):
        x = _resample_axis(x, 1, src_h, int(target_height), method)
    if src_w != int(target_width):
        x = _resample_axis(x, 2, src_w, int(target_width), method)
    return x.astype(frames.dtype)


def resize_batch(frames: jnp.ndarray, target_width: int, target_height: int,
                 fit_mode: str = FIT_STRETCH,
                 method: str = "bicubic") -> jnp.ndarray:
    """Resize an RGB batch with the reference's three fit modes
    (``VRGDG_VideoEnhanceNodes.py:54-86``); output is clamped to [0,1] and
    carries only the first three channels, as in the reference."""
    if frames.ndim != 4 or frames.shape[0] < 1:
        raise ValueError("resize_batch requires a non-empty BHWC batch.")
    fit_mode = canonical_fit_mode(fit_mode)
    src_h, src_w = int(frames.shape[1]), int(frames.shape[2])
    target_width, target_height = int(target_width), int(target_height)
    rgb = frames[..., :3]

    if fit_mode == FIT_STRETCH:
        out = resample(rgb, target_height, target_width, method)
    else:
        if fit_mode == FIT_CROP:
            scale = max(target_width / src_w, target_height / src_h)
        else:
            scale = min(target_width / src_w, target_height / src_h)
        scaled_w = max(1, int(round(src_w * scale)))
        scaled_h = max(1, int(round(src_h * scale)))
        resized = resample(rgb, scaled_h, scaled_w, method)
        if fit_mode == FIT_CROP:
            left = max(0, (scaled_w - target_width) // 2)
            top = max(0, (scaled_h - target_height) // 2)
            out = resized[:, top:top + target_height, left:left + target_width, :]
        else:
            pad_l = max(0, (target_width - scaled_w) // 2)
            pad_r = max(0, target_width - scaled_w - pad_l)
            pad_t = max(0, (target_height - scaled_h) // 2)
            pad_b = max(0, target_height - scaled_h - pad_t)
            out = jnp.pad(resized, ((0, 0), (pad_t, pad_b), (pad_l, pad_r), (0, 0)))
    return jnp.clip(out, 0.0, 1.0)


def restore_batch(frames: jnp.ndarray, source_width: int, source_height: int,
                  fit_mode: str = FIT_STRETCH,
                  method: str = "bicubic") -> jnp.ndarray:
    """Exact inverse of :func:`resize_batch` back to source dimensions: a
    letterboxed batch has its content box recomputed, cropped and
    stretched; other modes stretch directly
    (``VRGDG_VideoEnhanceNodes.py:89-106``)."""
    if canonical_fit_mode(fit_mode) != FIT_LETTERBOX:
        return resize_batch(frames, source_width, source_height,
                            FIT_STRETCH, method)
    work_h, work_w = int(frames.shape[1]), int(frames.shape[2])
    scale = min(work_w / source_width, work_h / source_height)
    content_w = min(work_w, max(1, int(round(source_width * scale))))
    content_h = min(work_h, max(1, int(round(source_height * scale))))
    left = max(0, (work_w - content_w) // 2)
    top = max(0, (work_h - content_h) // 2)
    content = frames[:, top:top + content_h, left:left + content_w, :]
    return resize_batch(content, source_width, source_height,
                        FIT_STRETCH, method)

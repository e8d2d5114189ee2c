"""Torch/numpy oracle implementations of the reference math, used only by
the golden-parity tests.

These are independent re-derivations of the behaviour documented in
SURVEY.md §2.1 (with file:line citations there), written against torch/numpy
so the jnp production ops can be checked to <=1e-3 per-pixel (BASELINE.json
tolerance; most ops match to ~1e-6 in float32).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


# --- trilinear .cube LUT (oracle for vrgdg_tpu.ops.lut.apply_lut) ---------

def lut_apply_oracle(image: np.ndarray, table: np.ndarray,
                     domain_min=(0, 0, 0), domain_max=(1, 1, 1),
                     strength: float = 10.0) -> np.ndarray:
    """BHWC trilinear LUT apply per VRGDG_IV_Adjustments.py:288-361."""
    img = torch.from_numpy(np.asarray(image, np.float32))
    lut = torch.from_numpy(np.asarray(table, np.float32))
    dmin = torch.tensor(domain_min, dtype=torch.float32)
    dmax = torch.tensor(domain_max, dtype=torch.float32)

    src = img[..., :3]
    span = torch.clamp(dmax - dmin, min=1e-6)
    norm = torch.clamp((src - dmin) / span, 0.0, 1.0)
    n = lut.shape[0] - 1
    coords = norm * n
    r, g, b = coords[..., 0], coords[..., 1], coords[..., 2]
    r0, g0, b0 = (torch.floor(v).long() for v in (r, g, b))
    r1 = torch.clamp(r0 + 1, max=n)
    g1 = torch.clamp(g0 + 1, max=n)
    b1 = torch.clamp(b0 + 1, max=n)
    fr = (r - r0.float()).unsqueeze(-1)
    fg = (g - g0.float()).unsqueeze(-1)
    fb = (b - b0.float()).unsqueeze(-1)

    c00 = lut[b0, g0, r0] * (1 - fb) + lut[b1, g0, r0] * fb
    c01 = lut[b0, g1, r0] * (1 - fb) + lut[b1, g1, r0] * fb
    c10 = lut[b0, g0, r1] * (1 - fb) + lut[b1, g0, r1] * fb
    c11 = lut[b0, g1, r1] * (1 - fb) + lut[b1, g1, r1] * fb
    c0 = c00 * (1 - fg) + c01 * fg
    c1 = c10 * (1 - fg) + c11 * fg
    graded = torch.clamp(c0 * (1 - fr) + c1 * fr, 0.0, 1.0)

    blend = max(0.0, min(10.0, float(strength))) / 10.0
    out = src * (1.0 - blend) + graded * blend
    if img.shape[-1] > 3:
        full = img.clone()
        full[..., :3] = out
        return full.numpy()
    return out.numpy()


# --- sharpening (oracles for vrgdg_tpu.ops.sharpen) ------------------------

def unsharp_oracle(image: np.ndarray, strength: float,
                   border: str) -> np.ndarray:
    """nodes.py:156-209: GPU avg_pool2d(zero pad) vs CPU 9-tap edge pad."""
    if border == "zero":
        x = torch.from_numpy(image).permute(0, 3, 1, 2)
        blur = F.avg_pool2d(x, kernel_size=3, stride=1, padding=1)
        out = (x + strength * (x - blur)).clamp(0, 1)
        return out.permute(0, 2, 3, 1).numpy()
    p = np.pad(image, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    blur = sum(p[:, 1 + dy:1 + dy + image.shape[1],
                 1 + dx:1 + dx + image.shape[2]]
               for dy in (-1, 0, 1) for dx in (-1, 0, 1)) / 9.0
    return np.clip(image + strength * (image - blur), 0.0, 1.0)


def laplacian_oracle(image: np.ndarray, strength: float,
                     border: str) -> np.ndarray:
    """nodes.py:234-289."""
    if border == "zero":
        x = torch.from_numpy(image).permute(0, 3, 1, 2)
        k = torch.tensor([[0., -1., 0.], [-1., 4., -1.], [0., -1., 0.]])
        k = k.expand(3, 1, 3, 3)
        edges = F.conv2d(x, k, padding=1, groups=3)
        return (x + strength * edges).clamp(0, 1).permute(0, 2, 3, 1).numpy()
    p = np.pad(image, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    h, w = image.shape[1], image.shape[2]
    lap = (p[:, 1:1 + h, 0:w] + p[:, 0:h, 1:1 + w]
           + p[:, 2:2 + h, 1:1 + w] + p[:, 1:1 + h, 2:2 + w]
           - 4.0 * image)
    return np.clip(image + strength * lap, 0.0, 1.0)


def sobel_oracle(image: np.ndarray, strength: float,
                 border: str) -> np.ndarray:
    """nodes.py:314-384 (epsilon only on the zero/GPU path)."""
    if border == "zero":
        x = torch.from_numpy(image).permute(0, 3, 1, 2)
        kx = torch.tensor([[-1., 0., 1.], [-2., 0., 2.], [-1., 0., 1.]])
        ky = torch.tensor([[-1., -2., -1.], [0., 0., 0.], [1., 2., 1.]])
        gx = F.conv2d(x, kx.expand(3, 1, 3, 3), padding=1, groups=3)
        gy = F.conv2d(x, ky.expand(3, 1, 3, 3), padding=1, groups=3)
        edges = torch.sqrt(gx * gx + gy * gy + 1e-6)
        return (x + strength * edges).clamp(0, 1).permute(0, 2, 3, 1).numpy()
    p = np.pad(image, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    h, w = image.shape[1], image.shape[2]

    def sh(dy, dx):
        return p[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]

    gx = (-sh(-1, -1) - 2 * sh(0, -1) - sh(1, -1)
          + sh(-1, 1) + 2 * sh(0, 1) + sh(1, 1))
    gy = (-sh(-1, -1) - 2 * sh(-1, 0) - sh(-1, 1)
          + sh(1, -1) + 2 * sh(1, 0) + sh(1, 1))
    edges = np.sqrt(gx * gx + gy * gy)
    return np.clip(image + strength * edges, 0.0, 1.0)


# --- 13-slider adjust stack (oracle for vrgdg_tpu.ops.adjust) --------------

def adjust_oracle(image: np.ndarray, settings: dict) -> np.ndarray:
    """VRGDG_LUTVideoTools.py:307-391 in torch."""
    from vrgdg_tpu.core.params import AdjustSettings
    adj = AdjustSettings.normalize(settings).to_dict()
    out = torch.from_numpy(np.asarray(image, np.float32)).clamp(0, 1)
    if not adj["enabled"]:
        return out.numpy()

    out = out + torch.tensor([
        adj["temperature"] / 400.0 - adj["tint"] / 900.0,
        adj["tint"] / 450.0,
        -adj["temperature"] / 400.0 - adj["tint"] / 900.0,
    ]).view(1, 1, 1, 3)
    out = out * (2.0 ** (adj["exposure"] / 100.0))
    out = (out - 0.5) * (1.0 + adj["contrast"] / 100.0) + 0.5

    luma = (out[..., 0:1] * 0.2126 + out[..., 1:2] * 0.7152
            + out[..., 2:3] * 0.0722)
    gray = luma.repeat(1, 1, 1, 3)
    out = gray + (out - gray) * (1.0 + adj["saturation"] / 100.0)

    luma = (out[..., 0:1] * 0.2126 + out[..., 1:2] * 0.7152
            + out[..., 2:3] * 0.0722)
    out = out + torch.clamp((luma - 0.55) / 0.45, 0, 1) * (adj["highlights"] / 220.0)
    out = out + torch.clamp((0.45 - luma) / 0.45, 0, 1) * (adj["shadows"] / 220.0)
    out = out + torch.clamp((luma - 0.75) / 0.25, 0, 1) * (adj["whites"] / 240.0)
    out = out + torch.clamp((0.25 - luma) / 0.25, 0, 1) * (adj["blacks"] / 240.0)

    clarity = adj["clarity"] / 100.0
    sharpen = adj["sharpen"] / 100.0
    if abs(clarity) > 0.001 or sharpen > 0.001:
        nchw = out.permute(0, 3, 1, 2)
        height, width = int(nchw.shape[2]), int(nchw.shape[3])

        def blur(src, target_k):
            k = min(int(target_k), height if height % 2 else height - 1,
                    width if width % 2 else width - 1)
            if k < 3:
                return src
            pad = k // 2
            return F.avg_pool2d(F.pad(src, (pad,) * 4, mode="reflect"),
                                kernel_size=k, stride=1)

        if abs(clarity) > 0.001:
            detail = nchw - blur(nchw, 9)
            luma_n = (nchw[:, 0:1] * 0.2126 + nchw[:, 1:2] * 0.7152
                      + nchw[:, 2:3] * 0.0722)
            midtone = 1.0 - torch.clamp(torch.abs(luma_n - 0.5) / 0.5, 0, 1)
            nchw = nchw + detail * clarity * 1.55 * (0.35 + midtone * 0.65)
        if sharpen > 0.001:
            fine = nchw - F.avg_pool2d(
                F.pad(nchw, (1,) * 4, mode="replicate"), kernel_size=3, stride=1)
            nchw = nchw + fine * sharpen * 5.0
        out = nchw.permute(0, 2, 3, 1)

    fade = adj["fade"] / 100.0
    if fade > 0.0:
        out = out * (1.0 - fade * 0.35) + fade * 0.18

    vignette = adj["vignette"] / 100.0
    if vignette > 0.0:
        h, w = out.shape[1], out.shape[2]
        yy = torch.linspace(-1, 1, h).view(1, h, 1, 1)
        xx = torch.linspace(-1, 1, w).view(1, 1, w, 1)
        d = torch.sqrt(xx * xx + yy * yy)
        out = out * (1.0 - torch.clamp((d - 0.35) / 1.05, 0, 1) * vignette * 0.75)
    return out.clamp(0, 1).numpy()


# --- CIELAB (float64 oracle for vrgdg_tpu.core.colorspace) -----------------

def rgb_to_lab_oracle(rgb: np.ndarray) -> np.ndarray:
    rgb = np.asarray(rgb, np.float64)
    lin = np.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
    m = np.array([[0.412453, 0.357580, 0.180423],
                  [0.212671, 0.715160, 0.072169],
                  [0.019334, 0.119193, 0.950227]])
    xyz = lin @ m.T
    t = xyz / np.array([0.95047, 1.0, 1.08883])
    ft = np.where(t > 0.008856, np.cbrt(t), 7.787 * t + 4.0 / 29.0)
    lab_l = 116.0 * ft[..., 1] - 16.0
    lab_a = 500.0 * (ft[..., 0] - ft[..., 1])
    lab_b = 200.0 * (ft[..., 1] - ft[..., 2])
    return np.stack([lab_l, lab_a, lab_b], axis=-1)


def lab_to_rgb_oracle(lab: np.ndarray, clip: bool = True) -> np.ndarray:
    lab = np.asarray(lab, np.float64)
    fy = (lab[..., 0] + 16.0) / 116.0
    fx = lab[..., 1] / 500.0 + fy
    fz = np.maximum(fy - lab[..., 2] / 200.0, 0.0)
    ft = np.stack([fx, fy, fz], axis=-1)
    t = np.where(ft > 0.2068966, ft ** 3, (ft - 4.0 / 29.0) / 7.787)
    xyz = t * np.array([0.95047, 1.0, 1.08883])
    m = np.array([[3.2404813432005266, -1.5371515162713185, -0.4985363261688878],
                  [-0.9692549499965682, 1.8759900014898907, 0.0415559265582928],
                  [0.0556466391351772, -0.2040413383665112, 1.0573110696453443]])
    lin = np.maximum(xyz @ m.T, 0.0)
    srgb = np.where(lin > 0.0031308,
                    1.055 * np.maximum(lin, 0.0) ** (1 / 2.4) - 0.055,
                    12.92 * lin)
    return np.clip(srgb, 0.0, 1.0) if clip else srgb


def color_match_oracle(images: np.ndarray, reference: np.ndarray,
                       strength: float) -> np.ndarray:
    """nodes.py:91-124 with unbiased std + 1e-5 offset, in float64."""
    img_lab = rgb_to_lab_oracle(images)
    ref_lab = rgb_to_lab_oracle(reference)
    ref_mean = ref_lab.mean(axis=(1, 2), keepdims=True)
    ref_std = ref_lab.std(axis=(1, 2), keepdims=True, ddof=1) + 1e-5
    img_mean = img_lab.mean(axis=(1, 2), keepdims=True)
    img_std = img_lab.std(axis=(1, 2), keepdims=True, ddof=1) + 1e-5
    matched = (img_lab - img_mean) / img_std * ref_std + ref_mean
    blended = strength * matched + (1.0 - strength) * img_lab
    return np.clip(lab_to_rgb_oracle(blended), 0.0, 1.0)


# --- resize (oracle wrappers around torch.F.interpolate / cv2) -------------

def torch_interpolate_oracle(image: np.ndarray, out_h: int, out_w: int,
                             mode: str) -> np.ndarray:
    x = torch.from_numpy(np.asarray(image, np.float32)).permute(0, 3, 1, 2)
    kwargs = {"mode": mode}
    if mode in ("bilinear", "bicubic"):
        kwargs["align_corners"] = False
    y = F.interpolate(x, size=(out_h, out_w), **kwargs)
    return y.permute(0, 2, 3, 1).numpy()

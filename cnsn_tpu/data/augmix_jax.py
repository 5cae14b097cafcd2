"""On-device AugMix: the full augmentation chain as pure JAX, vmapped.

A TPU-native alternative to the host PIL pipeline (data/augmix.py):
all 9 default ops implemented on (H, W, 3) uint8-valued float tensors,
per-image op choice via ``lax.switch``, depth via masked 3-op chains,
Dirichlet branch weights and the Beta(1,1) skip coefficient on device.
One ``jit(vmap(...))`` produces the whole (clean, aug1, aug2) tuple with
zero host work — useful when host CPUs are the bottleneck (the usual
case on TPU VMs).

Semantics follow the reference ops (augmentations.py:52-149):
severity ~ U(0.1, level) per application, sign flips on the geometric
ops, bilinear resampling with zero fill (PIL AFFINE/rotate on RGB).

Measured fidelity vs the PIL chain (tests/test_augmix_jax.py):
  * exact up to uint8 rounding (max err <= 1/255): autocontrast,
    equalize, posterize, solarize, shear_x/y, translate_x/y — the PIL
    pixel-center (+0.5), edge-tap clamp, and center-bounds zero-fill
    conventions are reproduced exactly;
  * rotate is approximate (three-shear = three bilinear passes vs
    PIL's one): interior median err <= 1.5/255 on natural-like images,
    <= 12/255 on uniform noise (worst case); borders differ where the
    per-pass zero-fill regions overlap;
  * distribution-level: channel moments and 16-bin intensity
    histograms of mixed views match the host pipeline within the
    host-vs-host seed-resampling noise (TestDistributionFidelity).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["augmix_batch", "augmix_single", "NUM_OPS"]

NUM_OPS = 9


def _affine_sample(img: jax.Array, mat: jax.Array) -> jax.Array:
    """PIL Image.transform(AFFINE, (a,b,c,d,e,f)) with bilinear + zero
    fill: out[y, x] = in[d·x + e·y + f, a·x + b·y + c]."""
    h, w = img.shape[:2]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    a, b, c, d, e, f = mat
    sx = a * gx + b * gy + c
    sy = d * gx + e * gy + f

    # PIL bounds-checks the pixel-center coordinate (zero fill outside)
    # and CLAMPS the out-of-frame tap to the edge sample inside
    inside = (sx >= -0.5) & (sx < w - 0.5) & (sy >= -0.5) & (sy < h - 0.5)
    sx = jnp.clip(sx, 0.0, w - 1.0)
    sy = jnp.clip(sy, 0.0, h - 1.0)

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def gather(yy, xx):
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        return img[yc, xc]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - fx[..., None]) + v01 * fx[..., None]
    bot = v10 * (1 - fx[..., None]) + v11 * fx[..., None]
    out = top * (1 - fy[..., None]) + bot * fy[..., None]
    return jnp.where(inside[..., None], out, 0.0)


def _row_shear_matrix(h: int, w: int, offsets: jax.Array) -> jax.Array:
    """(H, W, W) bilinear interpolation matrices: out[y, x] =
    Σ_s M[y, x, s]·in[y, s] with s ≈ x + offsets[y] and zero fill.

    Expressing per-row resampling as a batched matmul keeps the whole
    AugMix geometric chain on the MXU — TPU gathers (fancy indexing /
    map_coordinates) measured ~7x slower end-to-end."""
    x = jax.lax.broadcasted_iota(jnp.float32, (h, w, w), 1)
    s = jax.lax.broadcasted_iota(jnp.float32, (h, w, w), 2)
    src = x + offsets[:, None, None]
    # triangle weights vanish beyond |s - src| >= 1 (bilinear).  PIL's
    # affine bounds-checks the pixel-CENTER coordinate (src + 0.5 in
    # [0, w)): outside that the whole output pixel is zero-filled;
    # inside it the out-of-frame tap is CLAMPED to the edge sample —
    # both verified against Image.transform boundary columns
    valid = (src >= -0.5) & (src < w - 0.5)
    src = jnp.clip(src, 0.0, w - 1.0)
    return jnp.where(valid, jnp.maximum(0.0, 1.0 - jnp.abs(s - src)), 0.0)


def _shear_rows_gather(img: jax.Array, offsets: jax.Array) -> jax.Array:
    """Same semantics as the matmul shear, via two 1-D gathers.

    At 224² the (H, W, W) interpolation matrix is 45 MB of HBM traffic
    per shear (vs 12 KB at 32²), so large images flip to gathers: the
    two taps read 2×HWC elements total.  Bit-identical to
    ``_row_shear_matrix`` (same PIL center-bounds zero fill + edge-tap
    clamp), equivalence-tested."""
    h, w = img.shape[:2]
    x = jnp.arange(w, dtype=jnp.float32)
    src = x[None, :] + offsets[:, None]                   # (h, w)
    valid = (src >= -0.5) & (src < w - 0.5)
    srcc = jnp.clip(src, 0.0, w - 1.0)
    x0 = jnp.floor(srcc)
    f = (srcc - x0)[..., None]
    x0i = x0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    v0 = jnp.take_along_axis(img, x0i[..., None], axis=1)
    v1 = jnp.take_along_axis(img, x1i[..., None], axis=1)
    return jnp.where(valid[..., None], v0 * (1.0 - f) + v1 * f, 0.0)


# Default 'matmul' at EVERY size: the gather form was measured 30x
# slower end-to-end at 224² on v5e (181 → 5.9 img/s on the IBN-b
# AugMix recipe, perf/r3_zoo.jsonl) — TPU per-row gathers lose to even
# a 45 MB interpolation-matrix matmul.  Kept selectable for future
# hardware ('gather') and as the measured negative.  'bf16' keeps the
# matmul but builds the interpolation matrix in bfloat16 — halves the
# dominant HBM traffic; max pixel error ~1/255 (the uint8 rounding
# scale), acceptable for a stochastic augmentation.
def _shear_impl() -> str:
    # read at trace time (augmix_batch threads the value through its
    # jit cache key, so switching the env var between calls retraces)
    return os.environ.get("CNSN_AUGMIX_SHEAR", "matmul")


def _shear_rows(img: jax.Array, offsets: jax.Array) -> jax.Array:
    """Resample each row y at x + offsets[y] (bilinear, zero fill)."""
    h, w = img.shape[:2]
    impl = _shear_impl()
    if impl == "gather":
        return _shear_rows_gather(img, offsets)
    m = _row_shear_matrix(h, w, offsets)
    if impl == "bf16":
        return jnp.einsum("yxs,ysc->yxc", m.astype(jnp.bfloat16),
                          img.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.einsum("yxs,ysc->yxc", m, img,
                      preferred_element_type=jnp.float32)


def _shear_cols(img: jax.Array, offsets: jax.Array) -> jax.Array:
    """Resample each column x at y + offsets[x]."""
    out = _shear_rows(jnp.swapaxes(img, 0, 1), offsets)
    return jnp.swapaxes(out, 0, 1)


def _sample_level(key, n):
    return jax.random.uniform(key, (), minval=0.1, maxval=n)


def _signed(key, v):
    return jnp.where(jax.random.uniform(key) > 0.5, -v, v)


# each op: (key, img[H,W,3] float 0..255, severity) -> img
def _autocontrast(key, img, severity):
    lo = jnp.min(img, axis=(0, 1))
    hi = jnp.max(img, axis=(0, 1))
    scale = 255.0 / jnp.maximum(hi - lo, 1e-6)
    out = (img - lo) * scale
    return jnp.where(hi > lo, out, img)


def _equalize(key, img, severity):
    # The scatter-add histogram + LUT gather looked cheaper on paper
    # (the (H, W, 256) one-hot is 51 MB/channel at 224²) but measured
    # 7x SLOWER end-to-end on v5e (181 → 24 img/s, perf/r3_zoo.jsonl):
    # TPU scatter/gather lose to one-hot matmuls at every size tried.
    # Default stays 'onehot'; 'scatter' kept as the measured negative.
    big = os.environ.get("CNSN_AUGMIX_EQ", "onehot") == "scatter"

    def lut_of(hist):
        # PIL equalize: step = (pixels - last_nonzero_count) // 255
        nonzero = hist > 0
        last_idx = 255 - jnp.argmax(nonzero[::-1])
        step = (jnp.sum(hist) - hist[last_idx]) // 255
        cum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(hist)[:-1]])
        lut = (cum + step // 2) // jnp.maximum(step, 1)
        return jnp.clip(lut, 0, 255), step

    def chan(c):
        ci = jnp.clip(c, 0, 255).astype(jnp.int32)
        if big:
            hist = jnp.zeros((256,), jnp.float32).at[ci.reshape(-1)].add(1.0)
            lut, step = lut_of(hist)
            mapped = lut[ci]
        else:
            # histogram and LUT application as one-hot matmuls (MXU) —
            # measured faster than scatter/gather on small planes
            onehot = jax.nn.one_hot(ci, 256, dtype=jnp.float32)
            hist = jnp.sum(onehot, axis=(0, 1))
            lut, step = lut_of(hist)
            mapped = onehot @ lut
        return jnp.where(step > 0, mapped, c)

    return jnp.stack([chan(img[..., i]) for i in range(3)], axis=-1)


def _posterize(key, img, severity):
    level = (_sample_level(key, severity) * 4 / 10).astype(jnp.int32)
    bits = 4 - level
    shift = (8 - bits).astype(jnp.int32)
    vals = jnp.clip(img, 0, 255).astype(jnp.int32)
    return ((vals >> shift) << shift).astype(jnp.float32)


def _rotate(key, img, severity):
    # three-shear rotation (exact decomposition) — each shear is a
    # batched matmul, avoiding the 2D gather of direct resampling
    k1, k2 = jax.random.split(key)
    deg = (_sample_level(k1, severity) * 30 / 10).astype(jnp.int32)
    deg = _signed(k2, deg.astype(jnp.float32))
    rad = deg * jnp.pi / 180.0
    h, w = img.shape[:2]
    cy = (h - 1) / 2.0
    cx = (w - 1) / 2.0
    alpha = -jnp.tan(rad / 2.0)
    beta = jnp.sin(rad)
    ys = (jnp.arange(h, dtype=jnp.float32) - cy)
    xs = (jnp.arange(w, dtype=jnp.float32) - cx)
    out = _shear_rows(img, alpha * ys)
    out = _shear_cols(out, beta * xs)
    return _shear_rows(out, alpha * ys)


def _solarize(key, img, severity):
    level = (_sample_level(key, severity) * 256 / 10).astype(jnp.int32)
    thresh = (256 - level).astype(jnp.float32)
    return jnp.where(img >= thresh, 255.0 - img, img)


def _shear_x(key, img, severity):
    # PIL AFFINE (1, v, 0, 0, 1, 0): out[y, x] = in[y, x + v·y]
    k1, k2 = jax.random.split(key)
    v = _signed(k2, _sample_level(k1, severity) * 0.3 / 10)
    # PIL transform samples at pixel centers: src = x + v*(y + 0.5)
    ys = jnp.arange(img.shape[0], dtype=jnp.float32) + 0.5
    return _shear_rows(img, v * ys)


def _shear_y(key, img, severity):
    k1, k2 = jax.random.split(key)
    v = _signed(k2, _sample_level(k1, severity) * 0.3 / 10)
    xs = jnp.arange(img.shape[1], dtype=jnp.float32) + 0.5
    return _shear_cols(img, v * xs)


def _translate_x(key, img, severity):
    k1, k2 = jax.random.split(key)
    size = img.shape[0]
    v = (_sample_level(k1, severity) * (size / 3) / 10).astype(jnp.int32)
    v = _signed(k2, v.astype(jnp.float32))
    return _shear_rows(img, jnp.full((img.shape[0],), v))


def _translate_y(key, img, severity):
    k1, k2 = jax.random.split(key)
    size = img.shape[0]
    v = (_sample_level(k1, severity) * (size / 3) / 10).astype(jnp.int32)
    v = _signed(k2, v.astype(jnp.float32))
    return _shear_cols(img, jnp.full((img.shape[1],), v))


_OPS = (_autocontrast, _equalize, _posterize, _rotate, _solarize,
        _shear_x, _shear_y, _translate_x, _translate_y)


def _apply_random_op(key, img, severity):
    k_pick, k_op = jax.random.split(key)
    idx = jax.random.randint(k_pick, (), 0, NUM_OPS)
    return jax.lax.switch(idx, [functools.partial(op) for op in _OPS],
                          k_op, img, severity)


def augmix_single(key: jax.Array, image_u8: jax.Array,
                  severity: float = 3.0, mixture_width: int = 3,
                  mixture_depth: int = -1,
                  mean: Tuple[float, ...] = (0.5, 0.5, 0.5),
                  std: Tuple[float, ...] = (0.5, 0.5, 0.5)) -> jax.Array:
    """One AugMix view of an (H, W, 3) uint8 image → normalized float32."""
    img = image_u8.astype(jnp.float32)
    mean_a = jnp.asarray(mean, jnp.float32) * 255.0
    std_a = jnp.asarray(std, jnp.float32) * 255.0

    def preprocess(z):
        return (z - mean_a) / std_a

    k_w, k_m, key = jax.random.split(key, 3)
    ws = jax.random.dirichlet(k_w, jnp.ones(mixture_width))
    m = jax.random.uniform(k_m)  # Beta(1,1)

    mix = jnp.zeros_like(img)
    for i in range(mixture_width):
        key, k_depth, k_chain = jax.random.split(key, 3)
        depth = (mixture_depth if mixture_depth > 0
                 else jax.random.randint(k_depth, (), 1, 4))
        branch = img
        for d in range(3):
            key, k_op = jax.random.split(key)
            new = _apply_random_op(k_op, branch, severity)
            branch = jnp.where(d < depth, new, branch)
        mix = mix + ws[i] * preprocess(branch)

    return ((1 - m) * preprocess(img) + m * mix).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("severity", "mixture_width",
                                             "mixture_depth", "mean", "std",
                                             "_impls"))
def _augmix_batch(key: jax.Array, images_u8: jax.Array, severity: float = 3.0,
                  mixture_width: int = 3, mixture_depth: int = -1,
                  mean: Tuple[float, ...] = (0.5, 0.5, 0.5),
                  std: Tuple[float, ...] = (0.5, 0.5, 0.5),
                  _impls: Tuple[str, str] = ("matmul", "onehot")) -> jax.Array:
    """(B, H, W, 3) uint8 → (3, B, H, W, 3) float32: clean + 2 AugMix
    views, entirely on device.  ``_impls`` carries the
    CNSN_AUGMIX_{SHEAR,EQ} knobs into the jit cache key so env changes
    between calls retrace instead of silently reusing the old program."""
    n = images_u8.shape[0]
    keys = jax.random.split(key, 2 * n).reshape(2, n)
    fn = functools.partial(augmix_single, severity=severity,
                           mixture_width=mixture_width,
                           mixture_depth=mixture_depth, mean=mean, std=std)
    aug1 = jax.vmap(fn)(keys[0], images_u8)
    aug2 = jax.vmap(fn)(keys[1], images_u8)
    mean_a = jnp.asarray(mean, jnp.float32) * 255.0
    std_a = jnp.asarray(std, jnp.float32) * 255.0
    clean = (images_u8.astype(jnp.float32) - mean_a) / std_a
    return jnp.stack([clean, aug1, aug2])


def augmix_batch(key: jax.Array, images_u8: jax.Array, severity: float = 3.0,
                 mixture_width: int = 3, mixture_depth: int = -1,
                 mean: Tuple[float, ...] = (0.5, 0.5, 0.5),
                 std: Tuple[float, ...] = (0.5, 0.5, 0.5)) -> jax.Array:
    """Call-time wrapper: reads CNSN_AUGMIX_{SHEAR,EQ} and passes them
    as a static arg, so flipping the knobs between calls takes effect
    (A/B harnesses, tests) instead of hitting the stale jit cache."""
    impls = (os.environ.get("CNSN_AUGMIX_SHEAR", "matmul"),
             os.environ.get("CNSN_AUGMIX_EQ", "onehot"))
    return _augmix_batch(key, images_u8, severity=severity,
                         mixture_width=mixture_width,
                         mixture_depth=mixture_depth, mean=mean, std=std,
                         _impls=impls)

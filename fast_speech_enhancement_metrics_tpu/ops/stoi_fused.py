"""Fused STOI/ESTOI segment correlations as a single Pallas TPU kernel.

The XLA formulation (metrics/stoi.py) materializes the sliding 30-frame
segment tensor (B, n_seg, 15, 30) — a 30x data blowup (~280 MB at batch 64)
— and runs ~6 normalize/clip/correlate passes over it. This kernel keeps
each utterance pair's third-octave envelopes — (16, F) per signal, ~160 KB
— resident in VMEM and computes every per-segment statistic with lane-shift
accumulation loops: segments live on the LANE axis (one lane per segment
start m), bands on sublanes, and the 30-frame window becomes 30 circular
lane shifts. HBM sees the (B, 16, F) envelopes once and (B,) sums once.

The segment axis is SPLIT OVER GRID STEPS (lane blocks of ``lane_block``
segments with an n-1-lane halo carried via the adjacent block, the same
two-view pattern as ops/lsd_fused.py's framed kernel). Round 3's whole-lane
formulation kept three unrolled 30-step shift loops live over the full
(16, 2048) lane space and sat ~12% under Mosaic's 16 MB scoped-VMEM limit
at 16 s clips — one probe wrapper with a different fusion context measured
18.2 MB and failed to compile (tools/prof_stoi_stages.py). Blocking the
lanes bounds the live set at (16, lane_block + 32) per value regardless of
clip length, with a measured-neutral cost (the halo recompute is
32/lane_block of the VPU work).

Semantics match metrics/stoi.py exactly (reference anchor:
fast_se_metrics/STOI.py:113-198):

* consts  = ||X_m|| / (||Y_m|| + 1e-9)          (uncentered segment norms)
* Y'      = min(consts * Y, (1 + 10^(15/20)) * X)   (equalize + clip)
* STOI_m  = sum_j <x_hat, y'_hat>, with the centered cross term
  sum_n (X - mu_x) * Y' — the mu_y' term vanishes since sum(X - mu_x) = 0
* ESTOI_m = sum_n <x2, y2>_n where x2 column-normalizes x1 over the 15
  bands; expanded via band sums (P - Mx*My/15) / (sx2 * sy2) so the
  sublane padding band (all zeros) drops out exactly.

Variances are computed CENTERED (second pass after the mean) — the expanded
sum-of-squares form loses precision on near-constant segments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: equalize-clip factor: 1 + 10^(-beta/20), beta = -15 dB
_CLIPF = 1.0 + 10.0 ** (15.0 / 20.0)

#: halo lanes appended from the adjacent block (>= n - 1, vreg-aligned-ish)
_HALO = 32


def _shift1(a):
    """Circular left-shift by one lane: out[..., m] = a[..., m+1]."""
    return jnp.concatenate([a[:, 1:], a[:, :1]], axis=1)


def _stoi_kernel(
    nseg_ref, c1_ref, c2_ref, d1_ref, d2_ref, out_ref,
    *, n: int, num_bands: int, lane_block: int,
):
    # this block's segment lanes + a halo from the adjacent block: segment
    # m reads frames m .. m+n-1, so lanes [j*LB, (j+1)*LB) need envelope
    # lanes up to (j+1)*LB + n - 2 < (j+1)*LB + _HALO
    x = jnp.concatenate([c1_ref[0], c2_ref[0][:, :_HALO]], axis=1)
    y = jnp.concatenate([d1_ref[0], d2_ref[0][:, :_HALO]], axis=1)

    f32 = jnp.float32
    zero = jnp.zeros_like(x)

    # -- loop A: uncentered window sums ------------------------------------
    sc = zero
    sc2 = zero
    sd = zero
    sd2 = zero
    xs, ys = x, y
    for _ in range(n):
        sc = sc + xs
        sc2 = sc2 + xs * xs
        sd = sd + ys
        sd2 = sd2 + ys * ys
        xs, ys = _shift1(xs), _shift1(ys)

    mu_x = sc * (1.0 / n)
    mu_y = sd * (1.0 / n)
    consts = jnp.sqrt(sc2) / (jnp.sqrt(sd2) + 1e-9)

    # -- loop B: centered variances + clipped cross/sum --------------------
    vx = zero
    vy = zero
    syp = zero
    num_s = zero  # sum_n (X - mu_x) * Y'  (the STOI correlation numerator)
    xs, ys = x, y
    for _ in range(n):
        xc = xs - mu_x
        vx = vx + xc * xc
        yc = ys - mu_y
        vy = vy + yc * yc
        yp = jnp.minimum(consts * ys, _CLIPF * xs)
        syp = syp + yp
        num_s = num_s + xc * yp
        xs, ys = _shift1(xs), _shift1(ys)

    mu_yp = syp * (1.0 / n)
    rsx = jax.lax.rsqrt(jnp.maximum(vx, 1e-30))
    rsy = jax.lax.rsqrt(jnp.maximum(vy, 1e-30))

    # -- loop C: Y' variance (centered) + ESTOI band correlations ----------
    vyp = zero
    estoi_m = jnp.zeros((1, x.shape[1]), f32)
    xs, ys = x, y
    for _ in range(n):
        yp = jnp.minimum(consts * ys, _CLIPF * xs)
        ypc = yp - mu_yp
        vyp = vyp + ypc * ypc
        x1 = (xs - mu_x) * rsx
        y1 = (ys - mu_y) * rsy
        p = jnp.sum(x1 * y1, axis=0, keepdims=True)
        mx = jnp.sum(x1, axis=0, keepdims=True)
        my = jnp.sum(y1, axis=0, keepdims=True)
        qx = jnp.sum(x1 * x1, axis=0, keepdims=True)
        qy = jnp.sum(y1 * y1, axis=0, keepdims=True)
        numer = p - mx * my * (1.0 / num_bands)
        s2x = jax.lax.rsqrt(jnp.maximum(qx - mx * mx * (1.0 / num_bands), 1e-30))
        s2y = jax.lax.rsqrt(jnp.maximum(qy - my * my * (1.0 / num_bands), 1e-30))
        estoi_m = estoi_m + numer * s2x * s2y
        xs, ys = _shift1(xs), _shift1(ys)

    rsyp = jax.lax.rsqrt(jnp.maximum(vyp, 1e-30))
    stoi_m = jnp.sum(num_s * rsx * rsyp, axis=0, keepdims=True)  # (1, LB+H)

    # -- mask to this block's real segments, reduce, emit -------------------
    b = pl.program_id(0)
    j = pl.program_id(1)
    nseg = nseg_ref[b, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, stoi_m.shape, 1)
    m_idx = j * lane_block + lane
    valid = ((lane < lane_block) & (m_idx < nseg)).astype(f32)
    stoi = jnp.sum(stoi_m * valid)
    estoi = jnp.sum(estoi_m * valid)

    # whole (B, 128) output block with a constant index map stays resident
    # in VMEM across grid steps (per-row sub-blocks fail Mosaic's (8, 128)
    # tiling check) — accumulate this step's two scalars through a
    # coordinate mask
    @pl.when((b == 0) & (j == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    out_ref[:] = out_ref[:] + jnp.where(
        rows == b, jnp.where(cols == 0, stoi, jnp.where(cols == 1, estoi, 0.0)), 0.0
    )


def stoi_segment_sums(
    tob_clean: jnp.ndarray,
    tob_denoised: jnp.ndarray,
    num_segments: jnp.ndarray,
    n: int = 30,
    num_bands: int = 15,
    lane_block: int = 640,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Masked segment-correlation sums from band envelopes.

    tob_*: (B, F, num_bands) third-octave envelopes (padded frames zero);
    num_segments: (B,) int32. Returns (stoi_sum, estoi_sum), each (B,):
    sum over valid segments of the per-segment band-correlation sums —
    the caller divides by num_bands/N and num_segments (metrics/stoi.py).

    ``lane_block``: segments per grid step (multiple of 128); bounds the
    kernel's scoped-VMEM live set independently of the clip length.
    """
    batch, f, nb = tob_clean.shape
    assert nb == num_bands and tob_denoised.shape == tob_clean.shape
    assert lane_block % 128 == 0 and _HALO >= n - 1

    pad_j = (-num_bands) % 8
    fp = -(-f // 128) * 128
    # balanced split: n_lb blocks of equal width (128-lane aligned) — the
    # naive round-up-to-lane_block split wastes up to a whole block of VPU
    # work on the last step (measured 1.5x at fp=1280/lb=1024)
    n_lb = -(-fp // lane_block)
    lb = -(-(-(-fp // n_lb)) // 128) * 128
    # block j's halo reads block j+1: one extra all-zero lane block
    fp_total = (n_lb + 1) * lb

    # (B, F, nb) -> (B, nb->16, fp_total): bands on sublanes, segment lanes
    def prep(tob):
        t = jnp.swapaxes(tob.astype(jnp.float32), 1, 2)
        return jnp.pad(t, ((0, 0), (0, pad_j), (0, fp_total - f)))

    c = prep(tob_clean)
    d = prep(tob_denoised)
    nseg = num_segments.astype(jnp.int32).reshape(batch, 1)

    spec1 = pl.BlockSpec(
        (1, num_bands + pad_j, lb), lambda b, j: (b, 0, j),
        memory_space=pltpu.VMEM,
    )
    spec2 = pl.BlockSpec(
        (1, num_bands + pad_j, lb), lambda b, j: (b, 0, j + 1),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(
            _stoi_kernel, n=n, num_bands=num_bands, lane_block=lb
        ),
        grid=(batch, n_lb),
        in_specs=[
            # whole (B, 1) array in SMEM (Mosaic rejects (1, 1) sub-blocks);
            # the kernel indexes it by program id
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec1,
            spec2,
            spec1,
            spec2,
        ],
        out_specs=pl.BlockSpec(
            (batch, 128), lambda b, j: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, 128), jnp.float32),
        interpret=interpret,
    )(nseg, c, c, d, d)
    return out[:, 0], out[:, 1]

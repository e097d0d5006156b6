"""DNSMOS P.835 network as a pure JAX function, TPU-native.

Architecture contract (Microsoft DNS-Challenge ``sig_bak_ovr.onnx``; the
reference re-expresses it as an nn.Module at fast_se_metrics/DNSMOS.py:10-83):
a learned 320-point STFT (two 1x1 convolutions producing real/imag at 161
bins), log power spectrum, a 7-layer 3x3 CNN with three 2x2 max-pools, global
max over all (time, freq) positions, and a 3-layer MLP emitting raw
SIG/BAK/OVR.

TPU design: NHWC activations + HWIO kernels (XLA's native TPU conv layout,
vs. the reference's NCHW/cuDNN), the learned STFT as one framing plus two
(frames, 320) x (320, 161) MXU matmuls, and max-pool via
``lax.reduce_window``. Parameters are a flat dict pytree loaded from the
converted ``.npz`` (see utils/convert_dnsmos.py).
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from jax import lax

DEFAULT_CHECKPOINT = (
    Path(__file__).parent.parent / "checkpoints" / "dnsmos_sig_bak_ovr.npz"
)

#: channel widths of the 7 conv layers
CONV_CHANNELS = (128, 64, 64, 32, 32, 32, 64)
#: conv layer indices followed by a 2x2 max-pool
POOL_AFTER = frozenset({3, 4, 5})


@functools.lru_cache(maxsize=None)
def _load_arrays(path: str) -> dict[str, np.ndarray]:
    with np.load(path) as data:
        return dict(data)


def load_params(path: str | Path = DEFAULT_CHECKPOINT, dtype=jnp.float32):
    """Load converted DNSMOS weights as a jnp pytree."""
    return {k: jnp.asarray(v, dtype=dtype) for k, v in _load_arrays(str(path)).items()}


def _max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pool over the (H, W) axes of NHWC, floor (VALID) semantics.

    Stays ``lax.reduce_window`` deliberately: a reshape+max lowering wins
    3.4x in a STANDALONE probe (tools/prof_pool_ab.py) but loses 10% on the
    full shared_exact graph (tools/prof_dnsmos_ab.py, 9.4k vs 10.5k
    audio-s/s) — XLA fuses reduce_window into the producing conv, and the
    reshape form breaks that fusion with a materialized relayout. Fusion
    context decides; only full-graph A/Bs are trusted for this choice.
    """
    h, w = x.shape[1] // 2 * 2, x.shape[2] // 2 * 2
    return lax.reduce_window(
        x[:, :h, :w, :],
        -jnp.inf,
        lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def _log_power_features(params, audio, precision):
    """(N, T) -> (N, frames, 161) log power via the learned STFT.

    The 320-sample frames overlap 50% (hop 160), so frame f is
    [chunk_f | chunk_{f+1}] of the zero-copy (T/160, 160) chunk reshape and
    the learned transform splits into top/bottom halves applied to adjacent
    chunks — one packed MXU matmul on the chunks, never materializing the
    (N, frames, 320) gather (~205 MB at batch 64 x 16 s).
    """
    n_chunks = audio.shape[1] // 160
    f = n_chunks - 1
    chunks = audio[:, : n_chunks * 160].reshape(audio.shape[0], n_chunks, 160)
    # packed (160, 644): [real_top | imag_top | real_bot | imag_bot]
    w = jnp.concatenate(
        [
            params["stft_real"][:160],
            params["stft_imag"][:160],
            params["stft_real"][160:],
            params["stft_imag"][160:],
        ],
        axis=1,
    )
    a = jnp.einsum("nck,kr->ncr", chunks, w, precision=precision)
    nb = params["stft_real"].shape[1]
    real = a[:, :f, 0 * nb : 1 * nb] + a[:, 1:, 2 * nb : 3 * nb]
    imag = a[:, :f, 1 * nb : 2 * nb] + a[:, 1:, 3 * nb : 4 * nb]
    power = jnp.square(real) + jnp.square(imag)
    return jnp.log10(jnp.maximum(power, 1e-12))


#: MXU width-packing factors per conv layer. The trunk's channel counts
#: (128, 64, 64, 32, 32, 32, 64) starve the MXU's 128-lane output axis
#: (N = C_out caps utilization at 50%/25%), and conv0's K = 3*3*1 = 9
#: starves the contraction axis. Packing p adjacent FREQUENCY positions
#: into the output-channel axis — kernel (3,3) -> (3, 3+p-1), stride
#: (1, p), C_out -> p*C_out with zero-stuffed weights — trades <=2x
#: padded FLOPs for 2-4x lane utilization: identical math (the stuffed
#: zeros multiply real inputs, the real taps see the same SAME-padded
#: window), bit-class-identical outputs (2.6e-5 score dev). MEASURED
#: NEGATIVE end-to-end: 202 vs 96.5 ms/eval at batch 64
#: (tools/prof_dnsmos_pack.py) — XLA's conv emitter already schedules the
#: starved layers better than the padded-FLOP trade, so this is NOT the
#: default; kept as the recorded A/B.
MXU_CONV_PACK = (8, 2, 2, 4, 4, 4, 2)


def _packed_weights(w, p):
    """(kh, 3, ci, co) SAME-conv weights -> (kh, 3+p-1, ci, p*co) weights
    computing p adjacent width outputs per stride-p step:
    W'[kh, kw, ci, a*co + c] = W[kh, kw - a, ci, c] for 0 <= kw - a < 3."""
    kh, kw, ci, co = w.shape
    wp = jnp.zeros((kh, kw + p - 1, ci, p * co), w.dtype)
    for a in range(p):
        wp = wp.at[:, a : a + kw, :, a * co : (a + 1) * co].set(w)
    return wp


@functools.lru_cache(maxsize=None)
def _winograd_g():
    """F(2x2, 3x3) kernel-transform matrix G (float64)."""
    return np.array(
        [[1.0, 0.0, 0.0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0.0, 0.0, 1.0]]
    )


def _winograd_conv(x, w, bias, precision):
    """3x3 SAME correlation via Winograd F(2x2, 3x3): y = relu(conv(x) + b).

    2.25x fewer matmul MACs than direct convolution (16 element-products
    per 2x2 output tile vs 9 per output): input tiles transform with the
    4-tap B^T combos (VPU adds), the 16 per-position (tiles, Ci)@(Ci, Co)
    matmuls carry all the MACs, and the 2x2 outputs come back through the
    A^T combos. Kernels transform host-side in float64. Round-5 A/B
    candidate for the DNSMOS trunk (round-4 verdict item #3): the trunk's
    conv1 measures at 72% of its FLOP peak, so a FLOP cut is the one lever
    packing reformulations couldn't reach. Exactness pinned vs the direct
    conv in tests/test_dnsmos.py.
    """
    n, h, wdt, ci = x.shape
    co = w.shape[3]
    ht, wt = -(-h // 2), -(-wdt // 2)
    # SAME halo: 1 left/top + enough right/bottom to cover the tile grid
    xp = jnp.pad(x, ((0, 0), (1, 2 * ht - h + 1), (1, 2 * wt - wdt + 1), (0, 0)))

    def combo(e):
        # B^T along one axis: [e0-e2, e1+e2, e2-e1, e1-e3]
        return [e[0] - e[2], e[1] + e[2], e[2] - e[1], e[1] - e[3]]

    d = [
        [xp[:, a : a + 2 * ht : 2, b : b + 2 * wt : 2, :] for b in range(4)]
        for a in range(4)
    ]
    rows = [combo([d[a][b] for a in range(4)]) for b in range(4)]  # [b][u]
    v = [combo([rows[b][u] for b in range(4)]) for u in range(4)]  # [u][v]

    g = _winograd_g()
    u_np = np.einsum("ua,vb,abio->uvio", g, g, np.asarray(w, dtype=np.float64))
    m = [
        [
            jnp.einsum(
                "nhwi,io->nhwo",
                v[uu][vv],
                jnp.asarray(u_np[uu, vv], dtype=jnp.float32).astype(x.dtype),
                precision=precision,
                preferred_element_type=jnp.float32,
            )
            for vv in range(4)
        ]
        for uu in range(4)
    ]

    def out_combo(e):
        # A^T along one axis: [e0+e1+e2, e1-e2-e3]
        return [e[0] + e[1] + e[2], e[1] - e[2] - e[3]]

    orows = [out_combo([m[uu][vv] for uu in range(4)]) for vv in range(4)]
    y = [out_combo([orows[vv][p] for vv in range(4)]) for p in range(2)]  # [p][q]
    # interleave the 2x2 tile outputs back to (N, 2ht, 2wt, Co)
    yy = jnp.stack(
        [jnp.stack([y[0][0], y[0][1]], axis=3),
         jnp.stack([y[1][0], y[1][1]], axis=3)],
        axis=2,
    )  # (N, ht, 2, wt, 2, Co)
    full = yy.reshape(n, 2 * ht, 2 * wt, co)[:, :h, :wdt]
    return jnp.maximum(full + bias, 0.0).astype(x.dtype)


def _conv_layer(params, x, n, precision, pack=None):
    in_dtype = x.dtype  # conv output is fp32 (preferred_element_type); keep
    # the activation stream in the caller's dtype so bf16 mode stays bf16
    w = params[f"conv{n}_w"]
    p = 1 if pack is None else pack[n]
    if p == "w":
        return _winograd_conv(x, w, params[f"conv{n}_b"], precision)
    if p > 1:
        batch, height, width, _ = x.shape
        co = w.shape[3]
        wo = -(-width // p)
        x = lax.conv_general_dilated(
            x,
            _packed_weights(w, p).astype(x.dtype),
            window_strides=(1, p),
            # height stays SAME (3 -> (1,1)); width pad reproduces SAME for
            # every original position covered by the wo stride-p steps
            padding=[(1, 1), (1, wo * p + 1 - width)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
        # bias/relu/cast BEFORE the unpack reshape so they fuse into the
        # conv epilogue — reshaping the raw fp32 conv output materializes
        # a full-size fp32 relayout copy (8.5 GB at batch 64)
        x = jnp.maximum(x + jnp.tile(params[f"conv{n}_b"], p), 0.0).astype(in_dtype)
        return x.reshape(batch, height, wo * p, co)[:, :, :width]
    x = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        # TPU MXU default truncates conv inputs to bf16 (~1e-2 activation
        # error after 7 layers); HIGHEST keeps fp32-equivalent accuracy
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(x + params[f"conv{n}_b"], 0.0).astype(in_dtype)


def _output_mlp(params, pooled):
    # the MLP's error lands directly on the scores and its FLOPs are
    # negligible — always run it at fp32-equivalent precision
    def dense(h, n):
        return (
            jnp.matmul(h, params[f"dense{n}_w"], precision=lax.Precision.HIGHEST)
            + params[f"dense{n}_b"]
        )

    h = jnp.maximum(dense(pooled, 0), 0.0)
    h = jnp.maximum(dense(h, 1), 0.0)
    return dense(h, 2)


def _trunk_conv0_5(params, z, precision, conv_dtype, pack=None):
    if conv_dtype is not None:
        z = z.astype(conv_dtype)
    for n in range(4):
        z = _conv_layer(params, z, n, precision, pack)
    z = _max_pool_2x2(z)
    z = _conv_layer(params, z, 4, precision, pack)
    z = _max_pool_2x2(z)
    return _conv_layer(params, z, 5, precision, pack)  # (N, T/4, 40, 32)


def dnsmos_net_shared(
    params: dict,
    audio: jnp.ndarray,
    num_windows: int,
    frames_per_hop: int = 100,
    precision=lax.Precision.HIGHEST,
    conv_dtype=None,
    conv_pack=None,
) -> jnp.ndarray:
    """Shared-conv evaluation of all 9.01 s windows of (B, T) audio at once.

    Exact windowed DNSMOS recomputes the conv stack on every window although
    consecutive windows overlap 8.01 s of 9.01 s (the 1 s hop is exactly 100
    STFT frames, so window k's frames are the full signal's frames
    [100k, 100k+900) — identical content). This mode runs convs 1–6 and the
    first two max-pools ONCE over the full signal; only the third time-pool
    needs two phases, because the window offset in its input grid is
    100/4 = 25 (odd). Window k then reads 112 pooled cells starting at
    (100k - (100k mod 8)) / 8 from the matching phase, global-maxes, and
    goes through the MLP — ~(900·S)/(100·S+800) ≈ 4–9× fewer conv FLOPs.

    Deviation vs the exact mode comes only from window-boundary context: the
    exact mode zero-pads each window's conv inputs, this mode sees the real
    neighboring audio (receptive field ≈ ±18 of 900 frames per edge),
    entering the scores only when the global max sits near a boundary.
    """
    if frames_per_hop % 4 != 0:
        raise ValueError(
            "shared-conv mode needs the hop to be a multiple of 4 STFT frames "
            "(two pool-grid phases); got frames_per_hop="
            f"{frames_per_hop}"
        )
    feats = _log_power_features(params, audio, "highest")
    x = _trunk_conv0_5(params, feats[..., None], precision, conv_dtype, conv_pack)  # (B, T6, 40, 32)

    phases = []
    for phase in (0, 1):
        xp = x if phase == 0 else x[:, 1:, :, :]
        xp = _max_pool_2x2(xp)
        phases.append(_conv_layer(params, xp, 6, precision, conv_pack))  # (B, Tp, 20, 64)

    window_cells = 900 // 8  # 112 pooled cells per 9.01 s window
    pooled = []
    for k in range(num_windows):
        start_frame = k * frames_per_hop
        phase = (start_frame % 8) // 4
        j0 = (start_frame - start_frame % 8) // 8
        cells = phases[phase][:, j0 : j0 + window_cells]
        pooled.append(jnp.max(cells, axis=(1, 2)))
    pooled = jnp.stack(pooled, axis=1).astype(jnp.float32)  # (B, S, 64)

    return _output_mlp(params, pooled)


#: geometry of the exact windowed evaluation. A 9.01 s window is exactly 900
#: STFT frames -> 112 pool3 cells. The receptive field of one final cell
#: reaches ±18 input frames (convs 0-3 at /1: ±4; conv4 at /2: ±2; conv5 at
#: /4: ±4; conv6 at /8: ±8), so only the final cells within 18 frames of a
#: window boundary see the exact mode's zero padding: cells {0,1,2}
#: (8t-18 < 0) and {110,111} (8t+8+18 > 900). Everything in between is
#: bit-identical math on identical inputs whether the convs run per-window
#: or once over the full signal.
_WINDOW_FRAMES = 900
_CELLS_PER_WINDOW = 112
_EDGE_LEFT_CELLS = 3
_EDGE_RIGHT_CELLS = 2
#: strip extents giving uncontaminated edge cells. Left: cells 0..2 plus
#: conv6's neighbor cell 3 need conv5-level context up to frame 8*3+8+10=42,
#: and the strip must keep the window's pool grids (multiple of 8) -> 48.
#: Right: cells 109..111 need context from frame 8*109-10=862 on; the strip
#: must start on the window's pool3 grid (multiple of 8) -> start 856,
#: length 44. Its own pool truncation (11 -> 10 quarter-cells) then discards
#: exactly the window's discarded quarter-cell 224 (frames 896..900).
_LEFT_STRIP = 48
_RIGHT_STRIP = 44


def dnsmos_net_windowed_exact(
    params: dict,
    audio: jnp.ndarray,
    num_windows: int,
    frames_per_hop: int = 100,
    precision=lax.Precision.HIGHEST,
    conv_dtype=None,
    conv_pack=None,
) -> jnp.ndarray:
    """Exact windowed DNSMOS of (B, T) audio with the conv trunk shared.

    Produces the same (B, S, 3) raw scores as running ``dnsmos_net`` on every
    9.01 s window (reference semantics: fast_se_metrics/DNSMOS.py:113-121),
    up to float reassociation — unlike ``dnsmos_net_shared``, which trades a
    window-boundary deviation for speed. Three pieces:

    * convs 0-5 (+ pools 1-2) run ONCE over the full signal; pool 3 + conv6
      run twice (the 100-frame hop is 4 mod 8, so window pool3 grids
      alternate between two phases — see ``dnsmos_net_shared``),
    * per-window edge strips (48 and 44 frames vs 900) re-run the stack with
      the exact mode's zero-padding to reproduce the 5 boundary cells,
    * per-window global max = max(interior cells from the shared trunk,
      edge cells from the strips) -> MLP.

    ~2.9x fewer conv FLOPs than per-window evaluation at batch-64 x 16 s.
    """
    if frames_per_hop % 4 != 0:
        raise ValueError(
            "exact shared-conv mode needs the hop to be a multiple of 4 STFT "
            f"frames (pool-grid alignment); got frames_per_hop={frames_per_hop}"
        )
    feats = _log_power_features(params, audio, "highest")  # (B, Tf, 161)
    batch = feats.shape[0]

    # shared trunk over the full signal. A time->batch split (more batch
    # rows, shorter time) measured 1.65x faster on the ISOLATED trunk but
    # exactly neutral inside this full graph (tools/prof_dnsmos_split.py,
    # prof_dnsmos_split_e2e.py) — XLA schedules the fused graph differently
    # than the standalone stack, so the simple form stays.
    x = _trunk_conv0_5(params, feats[..., None], precision, conv_dtype, conv_pack)
    phases = []
    for phase in (0, 1):
        xp = x if phase == 0 else x[:, 1:, :, :]
        xp = _max_pool_2x2(xp)
        phases.append(_conv_layer(params, xp, 6, precision, conv_pack))  # (B, P, 20, 64)

    def edge_cells(start: int, length: int):
        """Stack per-window feature strips, run the conv stack with the
        window's own zero padding: (B*S, cells, 20, 64)."""
        strip = jnp.stack(
            [
                feats[:, k * frames_per_hop + start : k * frames_per_hop + start + length]
                for k in range(num_windows)
            ],
            axis=1,
        ).reshape(batch * num_windows, length, feats.shape[2])
        z = _trunk_conv0_5(params, strip[..., None], precision, conv_dtype, conv_pack)
        z = _max_pool_2x2(z)
        return _conv_layer(params, z, 6, precision, conv_pack)

    left = edge_cells(0, _LEFT_STRIP)[:, :_EDGE_LEFT_CELLS]
    right = edge_cells(_WINDOW_FRAMES - _RIGHT_STRIP, _RIGHT_STRIP)[
        :, -_EDGE_RIGHT_CELLS:
    ]
    left_max = jnp.max(left, axis=(1, 2)).reshape(batch, num_windows, -1)
    right_max = jnp.max(right, axis=(1, 2)).reshape(batch, num_windows, -1)

    interior = []
    for k in range(num_windows):
        start = k * frames_per_hop
        cells = phases[(start % 8) // 4][
            :,
            start // 8 + _EDGE_LEFT_CELLS : start // 8
            + _CELLS_PER_WINDOW
            - _EDGE_RIGHT_CELLS,
        ]
        interior.append(jnp.max(cells, axis=(1, 2)))
    interior = jnp.stack(interior, axis=1)  # (B, S, 64)

    pooled = jnp.maximum(jnp.maximum(interior, left_max), right_max).astype(
        jnp.float32
    )
    return _output_mlp(params, pooled)


def dnsmos_net(
    params: dict,
    audio: jnp.ndarray,
    precision=lax.Precision.HIGHEST,
    conv_dtype=None,
    conv_pack=None,
) -> jnp.ndarray:
    """(N, 144160) audio windows at 16 kHz -> (N, 3) raw SIG/BAK/OVR.

    ``conv_dtype=jnp.bfloat16`` stores conv activations in bf16 (halving the
    HBM traffic of the stack, the throughput bottleneck) while accumulating
    in fp32; the learned STFT, global pooling and output MLP stay fp32.
    """
    x = _log_power_features(params, audio, "highest")[..., None]  # NHWC
    if conv_dtype is not None:
        x = x.astype(conv_dtype)
    for n in range(len(CONV_CHANNELS)):
        x = _conv_layer(params, x, n, precision, conv_pack)
        if n in POOL_AFTER:
            x = _max_pool_2x2(x)

    pooled = jnp.max(x, axis=(1, 2)).astype(jnp.float32)  # global max -> (N, 64)
    return _output_mlp(params, pooled)

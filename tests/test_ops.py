"""Unit tests for the ops substrate: framing, STFT, resampling, FFT-IIR."""

import numpy as np
import pytest
from scipy.signal import butter, lfilter

from fast_speech_enhancement_metrics_tpu.ops import iir, resample, stft
from tests.oracles import dsp


def test_frame_matches_strided():
    x = np.random.RandomState(0).randn(3, 1000).astype(np.float32)
    for frame_length, hop in [(256, 128), (512, 256), (320, 160), (100, 33)]:
        ours = np.asarray(stft.frame(x, frame_length, hop))
        expected = dsp.frame(x, frame_length, hop)
        np.testing.assert_allclose(ours, expected, rtol=0, atol=0)


def test_frame_gapped():
    x = np.random.RandomState(1).randn(2, 500).astype(np.float32)
    ours = np.asarray(stft.frame(x, 10, 30))
    expected = dsp.frame(x, 10, 30)
    np.testing.assert_allclose(ours, expected, rtol=0, atol=0)


def test_hann_window_torch_semantics():
    import torch

    for n in (256, 512, 320):
        np.testing.assert_allclose(
            stft.hann_window(n), torch.hann_window(n).numpy(), atol=3e-7
        )
        np.testing.assert_allclose(
            stft.hann_window(n, periodic=False),
            torch.hann_window(n, periodic=False).numpy(),
            atol=3e-7,
        )


def test_stft_matches_torch():
    import torch

    x = np.random.RandomState(2).randn(2, 4096).astype(np.float32)
    for center in (False, True):
        ours = np.asarray(stft.stft(x, 512, 128, center=center))
        expected = torch.stft(
            torch.tensor(x),
            n_fft=512,
            hop_length=128,
            window=torch.hann_window(512),
            center=center,
            pad_mode="constant",
            return_complex=True,
        ).numpy()
        # torch layout (B, freq, frames) -> ours (B, frames, freq)
        np.testing.assert_allclose(
            ours, expected.transpose(0, 2, 1), atol=1e-3
        )


def test_resample_matches_torchaudio_algorithm():
    x = np.random.RandomState(3).randn(2, 16000).astype(np.float32)
    ours = np.asarray(resample.resample(x, 16000, 10000))
    expected = dsp.sinc_resample(x.astype(np.float64), 16000, 10000)
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_resample_identity():
    x = np.random.RandomState(4).randn(2, 1000).astype(np.float32)
    assert resample.resample(x, 16000, 16000) is x


@pytest.mark.parametrize(
    "b,a",
    [
        ((2.740826, -5.4816519, 2.740826), (1.0, -1.9444777, 0.94597794)),
        butter(5, [325, 3250], fs=16000, btype="band"),
    ],
)
def test_lfilter_fft_matches_scipy(b, a):
    x = np.random.RandomState(5).randn(2, 32000).astype(np.float32)
    ours = np.asarray(iir.lfilter_fft(x, tuple(np.atleast_1d(b)), tuple(np.atleast_1d(a))))
    expected = lfilter(np.asarray(b, dtype=np.float64), np.asarray(a, dtype=np.float64), x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(ours, expected, atol=2e-4)


def test_toeplitz_solve():
    from fast_speech_enhancement_metrics_tpu.ops.toeplitz import symmetric_toeplitz_solve

    rng = np.random.RandomState(6)
    n = 64
    # well-conditioned symmetric positive-definite Toeplitz first rows
    r0 = np.zeros((4, n), dtype=np.float32)
    r0[:, 0] = 10.0
    r0[:, 1:] = rng.randn(4, n - 1) * 0.1
    b = rng.randn(4, n).astype(np.float32)
    sol = np.asarray(symmetric_toeplitz_solve(r0, b))
    idx = np.abs(np.arange(n)[None, :] - np.arange(n)[:, None])
    for i in range(4):
        expected = np.linalg.solve(r0[i][idx].astype(np.float64), b[i].astype(np.float64))
        np.testing.assert_allclose(sol[i], expected, atol=1e-3)


def test_framed_rdft_matches_fft():
    """MXU DFT path (ops/dft.py) agrees with the FFT path bin-for-bin."""
    from fast_speech_enhancement_metrics_tpu.ops import dft

    x = np.random.RandomState(7).randn(3, 4000).astype(np.float32)
    for n_fft, hop, center in [(512, 256, True), (512, 128, False), (256, 128, False)]:
        z = np.asarray(stft.stft(x, n_fft, hop, center=center))
        re, im = dft.framed_rdft(x, n_fft, hop, center=center, precision="highest")
        np.testing.assert_allclose(np.asarray(re), z.real, atol=2e-4)
        np.testing.assert_allclose(np.asarray(im), z.imag, atol=2e-4)


def test_framed_rdft_custom_window_and_magnitude():
    from fast_speech_enhancement_metrics_tpu.ops import dft

    x = np.random.RandomState(8).randn(2, 3000).astype(np.float32)
    win = np.pad(stft.hann_window(257)[1:], (128, 128))  # STOI's padded window
    want = np.abs(np.asarray(stft.stft(x, 512, 128, window=win)))
    got = np.asarray(
        dft.framed_spectrogram(x, 512, 128, window=win, power=1.0, precision="highest")
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_framed_rdft_short_input():
    from fast_speech_enhancement_metrics_tpu.ops import dft

    x = np.zeros((2, 100), np.float32)  # shorter than one frame
    re, im = dft.framed_rdft(x, 512, 256)
    assert re.shape == (2, 0, 257) and im.shape == (2, 0, 257)


def test_correlation_lags_matches_fft():
    """Block-DFT overlap-save correlation equals the zero-padded FFT one."""
    from fast_speech_enhancement_metrics_tpu.ops import dft

    rs = np.random.RandomState(9)
    for t, n_lags in [(4000, 512), (4096, 512), (1000, 128), (300, 512)]:
        c = rs.randn(3, t).astype(np.float32)
        d = rs.randn(3, t).astype(np.float32)
        n_fft = 1 << int(np.ceil(np.log2(2 * t - 1)))
        cf = np.fft.rfft(c, n_fft)
        df = np.fft.rfft(d, n_fft)
        want_r0 = np.fft.irfft(np.abs(cf) ** 2, n_fft)[:, :n_lags]
        want_b = np.fft.irfft(np.conj(cf) * df, n_fft)[:, :n_lags]
        r0, b = dft.correlation_lags(c, (c, d), n_lags, precision="highest")
        scale = np.abs(want_r0).max()
        np.testing.assert_allclose(np.asarray(r0), want_r0, atol=2e-4 * scale)
        np.testing.assert_allclose(np.asarray(b), want_b, atol=2e-4 * scale)


def test_levinson_matches_direct_solve():
    from scipy.linalg import solve_toeplitz

    from fast_speech_enhancement_metrics_tpu.ops.toeplitz import levinson_solve

    rs = np.random.RandomState(11)
    n = 64
    # SPD Toeplitz rows: decaying autocorrelation with varied scales
    lags = np.arange(n)
    r = (0.9 ** lags)[None] * rs.uniform(0.5, 20.0, (5, 1))
    r = r + 0.01 * rs.randn(5, n) * r[:, :1]
    r[:, 0] = np.abs(r[:, 0]) + 1.0
    b = rs.randn(5, n).astype(np.float32)
    got = np.asarray(levinson_solve(r.astype(np.float32), b))
    for i in range(5):
        want = solve_toeplitz(r[i], b[i].astype(np.float64))
        np.testing.assert_allclose(got[i], want, rtol=2e-3, atol=2e-3 * np.abs(want).max())


@pytest.mark.parametrize("variant", ["vpu", "double", "flat", "dotreduce"])
def test_levinson_pallas_matches_xla_scan(variant):
    """Every fused-kernel recursion variant (ops/levinson_pallas.py — whole
    recursion in VMEM; "double" runs two taps per loop iteration with all
    reductions hoisted) solves the same systems as the float64 direct
    solve; interpret mode on CPU, compiled in the FSEM_TEST_TPU=1 suite."""
    import jax

    from scipy.linalg import solve_toeplitz

    from fast_speech_enhancement_metrics_tpu.ops.levinson_pallas import (
        levinson_solve_fused,
    )

    rs = np.random.RandomState(11)
    n = 128  # one lane tile; SDR's production order (512) runs on-chip
    lags = np.arange(n)
    r = (0.9 ** lags)[None] * rs.uniform(0.5, 20.0, (5, 1))
    r = r + 0.01 * rs.randn(5, n) * r[:, :1]
    r[:, 0] = np.abs(r[:, 0]) + 1.0
    b = rs.randn(5, n).astype(np.float32)
    import jax.numpy as jnp

    got = np.asarray(
        levinson_solve_fused(
            jnp.asarray(r, jnp.float32),
            jnp.asarray(b),
            interpret=jax.default_backend() != "tpu",
            variant=variant,
        )
    )
    assert got.shape == (5, n)
    # the fused-pair variants reassociate the recursion's reductions; on the
    # worst-conditioned fixture here (cond ~2e4) their fp32 rounding noise is
    # ~3x the step-by-step kernels' — still far inside the metric-level
    # 1e-2 dB SDR contract asserted in tests/test_sdr.py
    tol = 2e-3 if variant in ("vpu", "flat") else 1e-2
    for i in range(5):
        want = solve_toeplitz(r[i], b[i].astype(np.float64))
        np.testing.assert_allclose(
            got[i], want, rtol=tol, atol=tol * np.abs(want).max()
        )


def test_sdr_levinson_vs_cholesky_consistency():
    from fast_speech_enhancement_metrics_tpu import SDR

    rs = np.random.RandomState(12)
    clean = rs.randn(4, 16000).astype(np.float32)
    noisy = clean + 0.3 * rs.randn(4, 16000).astype(np.float32)
    lev = np.array([d["SDR"] for d in SDR()(clean, noisy)])
    cho = np.array([d["SDR"] for d in SDR(solver="cholesky")(clean, noisy)])
    np.testing.assert_allclose(lev, cho, atol=5e-3)


def test_lfilter_fir_matches_scipy():
    from fast_speech_enhancement_metrics_tpu.ops.iir import lfilter_fir

    rs = np.random.RandomState(13)
    x = rs.randn(3, 5000).astype(np.float32)
    b, a = butter(5, [325, 3250], fs=16000, btype="band")
    want = lfilter(b, a, x.astype(np.float64), axis=-1)
    got = np.asarray(lfilter_fir(x, tuple(b), tuple(a)))
    np.testing.assert_allclose(got, want, atol=5e-6 * np.abs(want).max())
    # pre-emphasis biquad
    pb = (2.740826, -5.4816519, 2.740826)
    pa = (1.0, -1.9444777, 0.94597794)
    want = lfilter(pb, pa, x.astype(np.float64), axis=-1)
    got = np.asarray(lfilter_fir(x, pb, pa))
    np.testing.assert_allclose(got, want, atol=5e-6 * np.abs(want).max())
    # length not a multiple of the block
    x2 = rs.randn(2, 4999).astype(np.float32)
    want = lfilter(pb, pa, x2.astype(np.float64), axis=-1)
    got = np.asarray(lfilter_fir(x2, pb, pa))
    np.testing.assert_allclose(got, want, atol=5e-6 * np.abs(want).max())


def test_sdr_fused_correlations_match_xla():
    """The fused correlation kernel (ops/sdr_corr_fused.py — chunk-DFT
    matmuls + window combine + spectral products all in VMEM) matches the
    XLA overlap-save path; interpret mode on CPU, compiled in the
    FSEM_TEST_TPU=1 device-consistency matrix."""
    import jax
    import jax.numpy as jnp

    from fast_speech_enhancement_metrics_tpu.ops.dft import correlation_lags
    from fast_speech_enhancement_metrics_tpu.ops.sdr_corr_fused import (
        correlation_lags_fused,
    )

    rs = np.random.RandomState(21)
    interpret = jax.default_backend() != "tpu"
    # 16000/7000: padded path (t % 512 != 0). 16384: zero-copy path, single
    # chunk group (boundary index clamp). 66560: zero-copy path, 130 chunks
    # -> ragged tail group (in-kernel row masking past k_total).
    for t in (16000, 7000, 16384, 66560):
        c = jnp.asarray(rs.randn(3, t), jnp.float32)
        d = jnp.asarray(0.8 * np.asarray(c) + 0.3 * rs.randn(3, t), jnp.float32)
        r0, b = correlation_lags(c, (c, d), 512, precision="highest")
        fa, fb = correlation_lags_fused(c, d, 512, interpret=interpret)
        scale = float(jnp.max(jnp.abs(r0)))
        np.testing.assert_allclose(
            np.asarray(fa), np.asarray(r0), atol=2e-3 * scale
        )
        np.testing.assert_allclose(
            np.asarray(fb), np.asarray(b), atol=2e-3 * scale
        )


def test_sdr_fused_corr_metric_consistency():
    from fast_speech_enhancement_metrics_tpu import SDR

    rs = np.random.RandomState(22)
    clean = rs.randn(4, 16000).astype(np.float32)
    noisy = clean + 0.3 * rs.randn(4, 16000).astype(np.float32)
    xla = np.array([d["SDR"] for d in SDR(corr_impl="xla")(clean, noisy)])
    fused = np.array([d["SDR"] for d in SDR(corr_impl="fused")(clean, noisy)])
    np.testing.assert_allclose(fused, xla, atol=5e-3)


def test_sdr_gram_correlations_match_xla():
    """The time-domain Gram-matmul kernel (ops/sdr_corr_gram.py — shifted
    frame Grams on the MXU, roll/column-sum epilogue) matches the XLA
    overlap-save path; interpret mode on CPU, compiled in the
    FSEM_TEST_TPU=1 device-consistency matrix. Lengths cover: frame
    multiple, ragged tail (zero-pad path), sub-block, and a tiny
    frame_block forcing many cross-block shift boundaries."""
    import jax
    import jax.numpy as jnp

    from fast_speech_enhancement_metrics_tpu.ops.dft import correlation_lags
    from fast_speech_enhancement_metrics_tpu.ops.sdr_corr_gram import (
        correlation_lags_gram,
    )

    rs = np.random.RandomState(23)
    interpret = jax.default_backend() != "tpu"
    for t, fb in ((16384, 512), (7000, 512), (66560, 512), (16000, 16), (150, 512)):
        c = jnp.asarray(rs.randn(3, t), jnp.float32)
        d = jnp.asarray(0.8 * np.asarray(c) + 0.3 * rs.randn(3, t), jnp.float32)
        r0, b = correlation_lags(c, (c, d), 512, precision="highest")
        scale = float(jnp.max(jnp.abs(r0)))
        ga, gb = correlation_lags_gram(
            c, d, 512, frame_block=fb, interpret=interpret
        )
        np.testing.assert_allclose(np.asarray(ga), np.asarray(r0), atol=2e-4 * scale)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(b), atol=2e-4 * scale)
        # x1 speed mode: one bf16 pass, ~1e-4-relative correlations
        ga1, gb1 = correlation_lags_gram(
            c, d, 512, frame_block=fb, split="x1", interpret=interpret
        )
        np.testing.assert_allclose(np.asarray(ga1), np.asarray(r0), atol=5e-3 * scale)
        np.testing.assert_allclose(np.asarray(gb1), np.asarray(b), atol=5e-3 * scale)


def test_sdr_gram_metric_consistency():
    """gram/gram_x1 full-metric scores vs the XLA path, including the
    raw-signal normalization fold (scale-invariance of the coherence)."""
    from fast_speech_enhancement_metrics_tpu import SDR

    rs = np.random.RandomState(24)
    clean = (5.0 * rs.randn(4, 16000)).astype(np.float32)  # non-unit scale
    noisy = clean + 1.5 * rs.randn(4, 16000).astype(np.float32)
    xla = np.array([d["SDR"] for d in SDR(corr_impl="xla")(clean, noisy)])
    gram = np.array([d["SDR"] for d in SDR(corr_impl="gram")(clean, noisy)])
    gram1 = np.array([d["SDR"] for d in SDR(corr_impl="gram_x1")(clean, noisy)])
    np.testing.assert_allclose(gram, xla, atol=5e-3)
    np.testing.assert_allclose(gram1, xla, atol=2e-2)

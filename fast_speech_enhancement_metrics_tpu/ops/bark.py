"""ITU-T P.862 Bark-domain tables and filterbank construction (host-side).

The numeric tables below are *data* from the ITU P.862 reference
implementation's 16 kHz mode (the same tables appear in
reference: fast_se_metrics/utils/bark.py:9-76 and utils/loudness.py:9-23,
which in turn copied them from the ITU C sources). Everything else —
filterbank assembly, loudness law, weighted norms — is re-derived here as
plain float64 NumPy for host-side precomputation; the device side consumes
only the resulting dense matrices/vectors.
"""

from __future__ import annotations

import functools

import numpy as np

# fmt: off
#: Number of contiguous 31.25 Hz FFT bins pooled into each of the 49 Bark bands.
NR_OF_HZ_BANDS_PER_BARK_BAND_16K = np.array([
    1, 1, 1, 1, 1, 1, 1, 1, 2, 1, 1, 1, 1, 1, 2,
    1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 3, 3, 3, 3, 4,
    3, 4, 5, 4, 5, 6, 6, 7, 8, 9, 9, 12, 12, 15, 16,
    18, 21, 25, 20])

CENTRE_OF_BAND_BARK_16K = np.array([
    0.078672, 0.316341, 0.636559, 0.961246, 1.290450,
    1.624217, 1.962597, 2.305636, 2.653383, 3.005889,
    3.363201, 3.725371, 4.092449, 4.464486, 4.841533,
    5.223642, 5.610866, 6.003256, 6.400869, 6.803755,
    7.211971, 7.625571, 8.044611, 8.469146, 8.899232,
    9.334927, 9.776288, 10.223374, 10.676242, 11.134952,
    11.599563, 12.070135, 12.546731, 13.029408, 13.518232,
    14.013264, 14.514566, 15.022202, 15.536238, 16.056736,
    16.583761, 17.117382, 17.657663, 18.204674, 18.758478,
    19.319147, 19.886751, 20.461355, 21.043034])

WIDTH_OF_BAND_BARK_16K = np.array([
    0.157344, 0.317994, 0.322441, 0.326934, 0.331474,
    0.336061, 0.340697, 0.345381, 0.350114, 0.354897,
    0.359729, 0.364611, 0.369544, 0.374529, 0.379565,
    0.384653, 0.389794, 0.394989, 0.400236, 0.405538,
    0.410894, 0.416306, 0.421773, 0.427297, 0.432877,
    0.438514, 0.444209, 0.449962, 0.455774, 0.461645,
    0.467577, 0.473569, 0.479621, 0.485736, 0.491912,
    0.498151, 0.504454, 0.510819, 0.517250, 0.523745,
    0.530308, 0.536934, 0.543629, 0.550390, 0.557220,
    0.564119, 0.571085, 0.578125, 0.585232])

POW_DENS_CORRECTION_FACTOR_16K = np.array([
    100.000000, 99.999992, 100.000000, 100.000008, 100.000008,
    100.000015, 99.999992, 99.999969, 50.000027, 100.000000,
    99.999969, 100.000015, 99.999947, 100.000061, 53.047077,
    110.000046, 117.991989, 65.000000, 68.760147, 69.999931,
    71.428818, 75.000038, 76.843384, 80.968781, 88.646126,
    63.864388, 68.155350, 72.547775, 75.584831, 58.379192,
    80.950836, 64.135651, 54.384785, 73.821884, 64.437073,
    59.176456, 65.521278, 61.399822, 58.144047, 57.004543,
    64.126297, 54.311001, 61.114979, 55.077751, 56.849335,
    55.628868, 53.137054, 54.985844, 79.546974])

ABS_THRESH_POWER_16K = np.array([
    51286152.000000, 2454709.500000, 70794.593750, 4897.788574, 1174.897705,
    389.045166, 104.712860, 45.708820, 17.782795, 9.772372,
    4.897789, 3.090296, 1.905461, 1.258925, 0.977237,
    0.724436, 0.562341, 0.457088, 0.389045, 0.331131,
    0.295121, 0.269153, 0.257040, 0.251189, 0.251189,
    0.251189, 0.251189, 0.263027, 0.288403, 0.309030,
    0.338844, 0.371535, 0.398107, 0.436516, 0.467735,
    0.489779, 0.501187, 0.501187, 0.512861, 0.524807,
    0.524807, 0.524807, 0.512861, 0.478630, 0.426580,
    0.371535, 0.363078, 0.416869, 0.537032])
# fmt: on

SP_16K = 6.910853e-06  #: power-density normalization (ITU Sp, 16 kHz mode)
SL_16K = 1.866055e-01  #: loudness-scale normalization (ITU Sl, 16 kHz mode)
ZWICKER_POWER = 0.23


@functools.lru_cache(maxsize=None)
def bark_constants(nbarks: int = 49, nfreqs: int = 256):
    """Precompute every dense constant the Bark/loudness path needs.

    Returns a dict of float32 NumPy arrays:

    * ``fbank``        (nbarks, nfreqs) 0/1 pooling matrix,
    * ``pow_dens``     (nbarks,) ``pow_dens_correction * Sp``,
    * ``width_bark``   (nbarks,),
    * ``total_width``  scalar ``sum(width_bark[1:])``,
    * ``thresholds``   (nbarks,) absolute hearing threshold power,
    * ``zwicker_exp``  (nbarks,) per-band Zwicker exponent.

    Only the canonical 49-band / 256-bin configuration is supported (the
    reference's interpolated variant for other sizes is unused by PESQ).
    """
    if nbarks != 49 or nfreqs != 256:
        raise NotImplementedError("PESQ uses the canonical 49-band/256-bin mode")

    edges = np.concatenate([[0], np.cumsum(NR_OF_HZ_BANDS_PER_BARK_BAND_16K)])
    fbank = np.zeros((nbarks, nfreqs), dtype=np.float64)
    for i in range(nbarks):
        fbank[i, edges[i] : edges[i + 1]] = 1.0

    exp = 6.0 / (CENTRE_OF_BAND_BARK_16K + 2.0)
    zwicker_exp = np.clip(exp, 1.0, 2.0) ** 0.15 * ZWICKER_POWER

    return {
        "fbank": fbank.astype(np.float32),
        "pow_dens": (POW_DENS_CORRECTION_FACTOR_16K * SP_16K).astype(np.float32),
        "width_bark": WIDTH_OF_BAND_BARK_16K.astype(np.float32),
        "total_width": float(WIDTH_OF_BAND_BARK_16K[1:].sum()),
        "thresholds": ABS_THRESH_POWER_16K.astype(np.float32),
        "zwicker_exp": zwicker_exp.astype(np.float32),
    }

"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (set FSEM_TEST_TPU=1 to run on real devices).

The platform override must happen *in-process* (``jax.config.update``) before
the first backend initialization: the environment may pre-register an
accelerator plugin at interpreter startup (sitecustomize) that force-selects
itself via ``jax_platforms``, which a plain env var cannot undo.
"""

import os

if not os.environ.get("FSEM_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from fast_speech_enhancement_metrics_tpu.utils.audio import load_audio_data  # noqa: E402

SAMPLE_DURATION = 4  # shorter than the reference's 16 s to keep CPU tests fast
NUM_SAMPLES = 4
SAMPLE_RATE = 16000


@pytest.fixture(scope="session")
def speech_data():
    speech, noisy, snr = load_audio_data(SAMPLE_DURATION, NUM_SAMPLES, SAMPLE_RATE)
    return {"speech": speech, "noisy_speech": noisy, "snr": snr}


@pytest.fixture(scope="session")
def high_snr_speech_data():
    speech, noisy, snr = load_audio_data(
        SAMPLE_DURATION, NUM_SAMPLES, SAMPLE_RATE, snr_high=10, snr_low=10
    )
    return {"speech": speech, "noisy_speech": noisy, "snr": snr}


@pytest.fixture(scope="session")
def low_snr_speech_data():
    speech, noisy, snr = load_audio_data(
        SAMPLE_DURATION, NUM_SAMPLES, SAMPLE_RATE, snr_high=-5, snr_low=-5
    )
    return {"speech": speech, "noisy_speech": noisy, "snr": snr}

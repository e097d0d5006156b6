"""DSP substrate: STFT, windows, resampling, IIR filtering, filterbanks."""

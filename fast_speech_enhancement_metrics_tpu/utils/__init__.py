"""Utilities: synthetic audio, checkpoint conversion, benchmarking helpers."""

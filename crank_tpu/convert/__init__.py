"""Conversion-time APIs (offline conversion lives in train/trainer.py;
this package adds the low-latency streaming mode)."""

from crank_tpu.convert.streaming import StreamingConverter  # noqa: F401

"""Adaptive-batch sink: cap-halving retry semantics (reference
DedupeRAM.java:66-76,200-206 restated over DataFrame splits)."""

from __future__ import annotations

import pytest

from dedupe_spark.sources.adaptive import adaptive_batch_write


class CapSink:
    """Fake flaky sink: rejects any batch larger than ``cap`` rows."""

    def __init__(self, cap: int):
        self.cap = cap
        self.batches: list[int] = []

    def __call__(self, df) -> None:
        n = df.count()
        if n > self.cap:
            raise IOError(f"broken pipe at {n} rows (cap {self.cap})")
        self.batches.append(n)


def test_whole_frame_when_sink_accepts(spark):
    sink = CapSink(cap=1000)
    calls = adaptive_batch_write(spark.range(100), sink, key="id")
    assert calls == 1 and sink.batches == [100]


def test_halves_until_accepted(spark):
    sink = CapSink(cap=30)
    df = spark.range(100)
    calls = adaptive_batch_write(df, sink, key="id")
    # every successful batch obeyed the cap and all rows were delivered
    assert all(b <= 30 for b in sink.batches)
    assert sum(sink.batches) == 100
    assert calls == len(sink.batches) >= 4


def test_deterministic_resend(spark):
    """A retried job must produce the identical batch decomposition
    (deterministic hash split — idempotent sinks stay idempotent)."""
    a, b = CapSink(cap=25), CapSink(cap=25)
    df = spark.range(200)
    adaptive_batch_write(df, a, key="id")
    adaptive_batch_write(df, b, key="id")
    assert a.batches == b.batches


def test_poison_batch_raises(spark):
    """A sink that rejects even single rows must surface its error."""
    sink = CapSink(cap=0)
    with pytest.raises(IOError):
        adaptive_batch_write(spark.range(8), sink, key="id")

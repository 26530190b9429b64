"""Tracing / metrics utilities.

The reference's only observability is criterion bench output (SURVEY §5);
here phase timing is first-class: `Phase` spans nest, aggregate, and dump as
JSON for the bench driver and regression tracking.  Device work is fenced
with block_until_ready when a span is marked `device=True`.
"""

from __future__ import annotations

import json
import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class Metrics:
    spans: dict = field(default_factory=dict)
    counters: dict = field(default_factory=dict)

    @contextmanager
    def span(self, name: str, device_result=None):
        t0 = time.time()
        try:
            yield
        finally:
            if device_result is not None:
                import jax

                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
                    device_result,
                )
            self.spans[name] = self.spans.get(name, 0.0) + (time.time() - t0)

    def count(self, name: str, delta: int = 1) -> None:
        self.counters[name] = self.counters.get(name, 0) + delta

    def dump(self) -> str:
        return json.dumps({"spans_s": self.spans, "counters": self.counters}, indent=2)


GLOBAL_METRICS = Metrics()

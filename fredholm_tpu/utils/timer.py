"""Per-stage wall-clock timing (Timer, /root/reference/app/rtcamp8.cpp:19-45)."""

from __future__ import annotations

import logging
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict

log = logging.getLogger("fredholm_tpu")


class StageTimer:
    """Accumulates wall-clock per named stage, like the reference's
    render/denoise/post-process/transfer/convert/save timers
    (rtcamp8.cpp:148-153)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items()):
            n = self.counts[name]
            lines.append(
                f"{name}: {total * 1000:.1f} ms total, "
                f"{total / max(n, 1) * 1000:.1f} ms avg over {n}"
            )
        return "\n".join(lines)

    def log_report(self):
        for line in self.report().splitlines():
            log.info(line)

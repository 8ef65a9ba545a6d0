"""Structured logging + phase tracing.

The reference's observability is printf with [INF]/[DBG]/[Err]/[WARN] tags
and ANSI progress tickers (/root/reference/main.c:55, radiosityNative.c:
157-163; SURVEY.md §5). This module keeps the tag vocabulary but adds what a
production renderer needs: phase-scoped wall-clock tracing that can stream
JSON lines (FLATMATCH_TRACE=<path>) for offline analysis.
"""
from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from typing import Optional


def log(tag: str, msg: str) -> None:
    print(f"[{tag}] {msg}", file=sys.stderr, flush=True)


def info(msg: str) -> None:
    log("INF", msg)


def warn(msg: str) -> None:
    log("WARN", msg)


class Tracer:
    """Phase-scoped wall-clock tracer; JSON-lines sink is optional."""

    def __init__(self, sink_path: Optional[str] = None):
        self.sink_path = sink_path or os.environ.get("FLATMATCH_TRACE")
        self._events = []

    @contextlib.contextmanager
    def phase(self, name: str, **attrs):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            ev = {
                "phase": name,
                "seconds": round(time.perf_counter() - t0, 6),
                **attrs,
            }
            self._events.append(ev)
            if self.sink_path:
                with open(self.sink_path, "a") as f:
                    f.write(json.dumps(ev) + "\n")

    @property
    def events(self):
        return list(self._events)

    def summary(self) -> str:
        return "; ".join(
            f"{e['phase']}={e['seconds']:.2f}s" for e in self._events
        )


TRACER = Tracer()

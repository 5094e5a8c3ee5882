"""Structured logging (SURVEY.md §5 metrics/observability).

The reference's only observability is println! progress lines
(src/beam.rs:30, src/transcribe.rs:68, src/model/load.rs:35). Here: standard
`logging` with a package-wide verbosity switch; the user-visible
`Chunk {i}: ...` contract stays on stdout in the pipeline regardless.
"""

from __future__ import annotations

import logging
import sys

_CONFIGURED = False


def configure(verbosity: int = 0) -> None:
    """0 = warnings, 1 = info (timings, chunk stats), 2 = debug."""
    global _CONFIGURED
    level = [logging.WARNING, logging.INFO, logging.DEBUG][min(verbosity, 2)]
    root = logging.getLogger("whisper_tpu")
    root.setLevel(level)
    if not _CONFIGURED:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter("[%(asctime)s %(name)s %(levelname)s] %(message)s",
                              datefmt="%H:%M:%S")
        )
        root.addHandler(handler)
        root.propagate = False
        _CONFIGURED = True


def get_logger(name: str) -> logging.Logger:
    if not name.startswith("whisper_tpu"):
        name = f"whisper_tpu.{name}"
    return logging.getLogger(name)

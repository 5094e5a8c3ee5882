"""Timestamped segment extraction from decoded token sequences.

New capability: the reference always decodes with <|notimestamps|> and never
interprets timestamp tokens at runtime (the prompt construction at
src/transcribe.rs:203; the 1501-token timestamp vocabulary is documented at
src/token.rs:317-321 but unused). With `DecodeOptions(timestamps=True)` the
prompt omits <|notimestamps|>, the model is free to emit <|x.xx|> tokens,
and this module turns them into [{start, end, text}] segments.

Parsing follows the vocabulary's semantics: a timestamp token opens a
segment (its time = window offset + x.xx), the next timestamp token closes
it; consecutive timestamps (close immediately followed by the next open) are
the standard Whisper emission pattern. Text before the first timestamp or
after an unclosed one becomes a segment bounded by the window edges.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

from ..text.tokenizer import WhisperTokenizer


@dataclasses.dataclass
class Segment:
    start: float  # seconds, absolute (window offset included)
    end: float
    text: str
    tokens: List[int]
    # per-word timings (align.WordTiming), populated by
    # transcribe_with_timestamps(word_timestamps=True); None otherwise
    words: list = None


def segments_from_tokens(
    tokens: Sequence[int],
    tok: WhisperTokenizer,
    offset_s: float = 0.0,
    window_s: float = 30.0,
) -> List[Segment]:
    """Split a decoded (single-window) token sequence at timestamp tokens.

    Non-timestamp special tokens (prompt, EOT) are skipped. Returns [] when
    the sequence carries no text.
    """
    return [s for s, _ in segments_with_positions(tokens, tok, offset_s, window_s)]


def segments_with_positions(
    tokens: Sequence[int],
    tok: WhisperTokenizer,
    offset_s: float = 0.0,
    window_s: float = 30.0,
) -> List:
    """Like segments_from_tokens, but each segment carries the POSITIONS of
    its text tokens within `tokens`: returns [(Segment, [pos, ...])].

    The positions drive token-overlap stitching across windows
    (pipeline/transcribe.transcribe_with_timestamps): when the stitcher
    splices two windows' raw token lists at an index, segments are trimmed
    at exactly that index instead of being dropped wholesale.
    """
    out: List = []
    cur_tokens: List[int] = []
    cur_pos: List[int] = []
    cur_start = offset_s

    def flush(end_s: float) -> None:
        nonlocal cur_tokens, cur_pos, cur_start
        if cur_tokens:
            text = tok.decode(cur_tokens, skip_special=True)
            if text.strip():
                out.append(
                    (Segment(cur_start, end_s, text, list(cur_tokens)),
                     list(cur_pos))
                )
        cur_tokens = []
        cur_pos = []

    open_segment = False
    for i, t in enumerate(tokens):
        t = int(t)
        if tok.is_timestamp(t):
            ts = offset_s + tok.timestamp_seconds(t)
            if open_segment:
                flush(ts)  # closing timestamp
                open_segment = False
            else:
                flush(ts)  # text without a closing stamp ends here
                cur_start = ts
                open_segment = True
        elif tok.is_special(t):
            continue
        else:
            cur_tokens.append(t)
            cur_pos.append(i)
    flush(offset_s + window_s)
    return out

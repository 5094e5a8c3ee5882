"""Word-error-rate evaluation harness (BASELINE.md accuracy metric:
"<=0.1 absolute WER delta on LibriSpeech test-clean").

The reference ships no evaluation at all; this module supplies the metric and
a dataset runner over local (audio, transcript) pairs -- LibriSpeech-style
directory trees or a simple manifest file. Network-free: datasets must be on
local disk.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
import string
from typing import Iterable, List, Optional, Sequence, Tuple


_english_normalizer = None


def normalize_text(text: str, english: bool = True) -> str:
    """Normalize text for WER.

    english=True (default) applies the OpenAI-style English pipeline
    (eval/normalizer.py: contractions, titles, spelled-out numbers ->
    digits, British -> American spellings) -- the preprocessing behind every
    published Whisper WER number. english=False keeps the language-agnostic
    basic rules (lowercase + strip punctuation)."""
    global _english_normalizer
    if english:
        if _english_normalizer is None:
            from .normalizer import EnglishTextNormalizer

            _english_normalizer = EnglishTextNormalizer()
        return _english_normalizer(text)
    text = text.lower()
    text = re.sub(r"[^\w\s']", " ", text)
    text = text.replace("'", "")
    return " ".join(text.split())


def edit_distance(ref: Sequence[str], hyp: Sequence[str]) -> int:
    """Levenshtein distance over token sequences (O(|ref|*|hyp|) DP)."""
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        curr = [i] + [0] * m
        for j in range(1, m + 1):
            cost = 0 if ref[i - 1] == hyp[j - 1] else 1
            curr[j] = min(prev[j] + 1, curr[j - 1] + 1, prev[j - 1] + cost)
        prev = curr
    return prev[m]


@dataclasses.dataclass
class WerResult:
    errors: int = 0
    words: int = 0
    utterances: int = 0
    english: bool = True  # OpenAI-style English normalization

    @property
    def wer(self) -> float:
        return self.errors / self.words if self.words else 0.0

    def add(self, ref_text: str, hyp_text: str) -> "WerResult":
        ref = normalize_text(ref_text, english=self.english).split()
        hyp = normalize_text(hyp_text, english=self.english).split()
        self.errors += edit_distance(ref, hyp)
        self.words += len(ref)
        self.utterances += 1
        return self


def wer(ref_text: str, hyp_text: str) -> float:
    return WerResult().add(ref_text, hyp_text).wer


# ----------------------------------------------------------------------------
# Dataset discovery
# ----------------------------------------------------------------------------


def iter_manifest(path: str) -> Iterable[Tuple[str, str]]:
    """Yield (audio_path, reference_text) from a manifest.

    Supported: JSONL with {"audio": ..., "text": ...}, or TSV
    `audio_path<TAB>text`. Relative audio paths resolve against the manifest
    directory.
    """
    base = os.path.dirname(os.path.abspath(path))
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("{"):
                d = json.loads(line)
                audio, text = d["audio"], d["text"]
            else:
                audio, text = line.split("\t", 1)
            if not os.path.isabs(audio):
                audio = os.path.join(base, audio)
            yield audio, text


def iter_librispeech(root: str) -> Iterable[Tuple[str, str]]:
    """Yield (flac/wav path, text) from a LibriSpeech-layout directory:
    <root>/<spk>/<chap>/<spk>-<chap>.trans.txt + <utt-id>.{flac,wav}."""
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            if fn.endswith(".trans.txt"):
                with open(os.path.join(dirpath, fn)) as f:
                    for line in f:
                        utt, _, text = line.strip().partition(" ")
                        for ext in (".wav", ".flac"):
                            audio = os.path.join(dirpath, utt + ext)
                            if os.path.exists(audio):
                                yield audio, text
                                break


def evaluate(
    transcribe_fn,  # (audio_path) -> hypothesis text
    items: Iterable[Tuple[str, str]],
    limit: Optional[int] = None,
    on_item=None,
    english: bool = True,
) -> WerResult:
    """Run WER over (audio, reference) pairs with any transcription callable."""
    result = WerResult(english=english)
    for i, (audio, ref_text) in enumerate(items):
        if limit is not None and i >= limit:
            break
        hyp = transcribe_fn(audio)
        result.add(ref_text, hyp)
        if on_item is not None:
            on_item(i, audio, ref_text, hyp, result)
    return result

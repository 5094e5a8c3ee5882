"""Unit tests for the SRT/VTT/TSV subtitle writers (pipeline/formats.py).

Pure string-level tests over hand-built Segment/WordTiming values — no
model, no JAX. New capability beyond the reference CLI (which writes only
plain text, src/bin/transcribe/main.rs:150-158).
"""

from whisper_tpu.align import WordTiming
from whisper_tpu.pipeline import formats
from whisper_tpu.pipeline.segments import Segment


def seg(start, end, text, words=None):
    return Segment(start=start, end=end, text=text, tokens=[], words=words)


class TestTimestamps:
    def test_srt_timestamp(self):
        assert formats.srt_timestamp(0.0) == "00:00:00,000"
        assert formats.srt_timestamp(1.5) == "00:00:01,500"
        assert formats.srt_timestamp(3661.007) == "01:01:01,007"
        # sub-ms rounds to nearest ms; negatives clamp to zero
        assert formats.srt_timestamp(0.0004) == "00:00:00,000"
        assert formats.srt_timestamp(-0.2) == "00:00:00,000"

    def test_vtt_timestamp_uses_dot(self):
        assert formats.vtt_timestamp(62.25) == "00:01:02.250"


class TestSrt:
    def test_numbered_cues(self):
        doc = formats.to_srt([
            seg(0.0, 1.2, " Hello world."),
            seg(1.2, 3.0, " Second cue."),
        ])
        blocks = doc.split("\n\n")
        assert blocks[0] == "1\n00:00:00,000 --> 00:00:01,200\nHello world."
        assert blocks[1].startswith("2\n00:00:01,200 --> 00:00:03,000\n")

    def test_empty(self):
        assert formats.to_srt([]) == ""


class TestVtt:
    def test_header_and_cues(self):
        doc = formats.to_vtt([seg(0.0, 1.0, " Hi.")])
        assert doc.startswith("WEBVTT\n")
        assert "00:00:00.000 --> 00:00:01.000\nHi.\n" in doc

    def test_word_highlight_cues(self):
        words = [
            WordTiming(word=" Hello", start=0.0, end=0.4, tokens=[]),
            WordTiming(word=" world", start=0.4, end=0.9, tokens=[]),
        ]
        doc = formats.to_vtt([seg(0.0, 1.0, " Hello world", words=words)],
                             highlight_words=True)
        # one cue per word; active word underlined; cue j ends at word j+1's
        # start (continuous karaoke), the last at its own end
        assert "00:00:00.000 --> 00:00:00.400\n<u> Hello</u> world" in doc
        # the cue line is stripped of leading/trailing whitespace
        assert "00:00:00.400 --> 00:00:00.900\nHello<u> world</u>" in doc

    def test_highlight_falls_back_without_words(self):
        doc = formats.to_vtt([seg(0.0, 1.0, "Hi.")], highlight_words=True)
        assert "<u>" not in doc and "Hi." in doc


class TestTsv:
    def test_rows_in_ms(self):
        doc = formats.to_tsv([seg(0.0, 1.234, " A"), seg(1.234, 2.0, "B ")])
        lines = doc.splitlines()
        assert lines[0] == "start\tend\ttext"
        assert lines[1] == "0\t1234\tA"
        assert lines[2] == "1234\t2000\tB"

"""ConsoleStreamer behavior (reference ConsoleSteamer, bloom_interactive.py:17-48)."""

import io

import numpy as np

from cleantransformer_tpu.generation.streamer import ConsoleStreamer, ConsoleSteamer


class FakeTokenizer:
    def decode(self, ids, **kw):
        return "".join(chr(ord("a") + (i % 26)) for i in ids)


def test_streams_incrementally_and_stops_on_stop_string():
    out = io.StringIO()
    s = ConsoleStreamer(FakeTokenizer(), input_text_len=2, stops=["de"], out=out)
    assert s(np.array([[[0, 1, 2]]])) is False          # "abc": prints "c"
    assert out.getvalue() == "c"
    finished = s(np.array([[[0, 1, 2, 3, 4]]]))          # "abcde": stop hit
    assert finished is True
    assert "<|endoftext|>" in out.getvalue()
    assert s.final_generation == "abcde"


def test_no_reprint_when_text_unchanged():
    out = io.StringIO()
    s = ConsoleStreamer(FakeTokenizer(), input_text_len=0, out=out)
    s(np.array([[[0, 1]]]))
    first = out.getvalue()
    s(np.array([[[0, 1]]]))  # same length: nothing new printed
    assert out.getvalue() == first


def test_reference_spelling_alias():
    assert ConsoleSteamer is ConsoleStreamer

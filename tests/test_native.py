"""Native C++ BPE encoder: exact parity with the Python matching loop."""

import time

import pytest

from cleantransformer_tpu.native import load_library, NativeBPEEncoder
from cleantransformer_tpu.tokenizers import BPETokenizer

CORPUS = [
    "Object raspberrypi functools dict kwargs. Gevent raspberrypi functools.",
    "Kwargs raspberrypi diversity unit object gevent. Import fall integration.",
    "Reduce integration coroutine bdfl he python, cython didn't integration!",
]

needs_native = pytest.mark.skipif(load_library() is None,
                                  reason="g++ unavailable")


@needs_native
def test_native_matches_python_exactly():
    bpe = BPETokenizer(vocab_size=80)
    bpe.fit(CORPUS)
    texts = CORPUS + [
        "unseen wordswithweird subtokens xyzzy",
        "中文字符 mixed with ascii!",
        "don't stop-me now... 123",
    ]
    for t in texts:
        py = bpe.encode(t, use_native=False)
        nat = bpe.encode(t, use_native=True)
        assert py == nat, f"mismatch on {t!r}"


@needs_native
def test_native_reload_invalidates():
    bpe = BPETokenizer(vocab_size=60)
    bpe.fit(CORPUS)
    first = bpe.encode("object raspberrypi")
    bpe.load(vocab=list(reversed(bpe.vocab)))  # new vocab order -> new ids
    second = bpe.encode("object raspberrypi")
    assert first != second
    assert second == bpe.encode("object raspberrypi", use_native=False)


@needs_native
def test_native_is_faster_on_repeated_text():
    bpe = BPETokenizer(vocab_size=80)
    bpe.fit(CORPUS)
    text = " ".join(CORPUS) * 50
    bpe.encode(text)  # warm native memo + build
    t0 = time.perf_counter()
    for _ in range(5):
        nat = bpe.encode(text)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        py = bpe.encode(text, use_native=False)
    t_py = time.perf_counter() - t0
    assert nat == py
    # not asserted hard, but record: native should win comfortably
    print(f"native {t_nat:.4f}s vs python {t_py:.4f}s ({t_py/t_nat:.1f}x)")
    assert t_nat < t_py

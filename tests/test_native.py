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


@needs_native
def test_native_batch_encode_parity():
    """The one-call multi-threaded batch packer (bpe_encode_batch) produces
    byte-identical padded matrices to the per-text Python path, across
    max_length / pad_to_max combinations, empty rows, and UNK chars."""
    import numpy as np
    bpe = BPETokenizer(vocab_size=80)
    bpe.fit(CORPUS)
    texts = [" ".join(CORPUS), "object raspberrypi!", "", "你好 unknown",
             CORPUS[0]]
    for ml, ptm in [(None, False), (6, False), (6, True), (64, True)]:
        a = bpe.encode_batch(texts, max_length=ml, pad_to_max=ptm,
                             use_native=True)
        b = bpe.encode_batch(texts, max_length=ml, pad_to_max=ptm,
                             use_native=False)
        assert a["input_ids"].shape == b["input_ids"].shape, (ml, ptm)
        np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
        np.testing.assert_array_equal(a["attention_mask"],
                                      b["attention_mask"])


@needs_native
def test_native_batch_thread_count_invariance():
    """Row results must not depend on the thread count (per-thread memos,
    atomic row dispatch)."""
    import numpy as np
    bpe = BPETokenizer(vocab_size=80)
    bpe.fit(CORPUS)
    words = [bpe.basic_tokenizer(t.lower()) for t in CORPUS * 20]
    nat = bpe._get_native()
    one = nat.encode_batch(words, n_threads=1)
    four = nat.encode_batch(words, n_threads=4)
    np.testing.assert_array_equal(one["input_ids"], four["input_ids"])
    np.testing.assert_array_equal(one["attention_mask"],
                                  four["attention_mask"])

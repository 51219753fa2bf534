"""Tokenizer tests: BPE/WordPiece training + BertTokenizer HF parity."""

import numpy as np
import pytest

from cleantransformer_tpu.tokenizers import (
    BPETokenizer, WordPieceTokenizer, BertTokenizer, BasicTokenizer,
    wordpunct_tokenize,
)

CORPUS = [
    "Object raspberrypi functools dict kwargs. Gevent raspberrypi functools.",
    "Kwargs raspberrypi diversity unit object gevent. Import fall integration "
    "decorator unit django yield functools twisted.",
    "Reduce integration coroutine bdfl he python. Cython didn't integration "
    "while beautiful list python didn't nit!",
    "Object fall diversity 2to3 dunder script. Python fall for: integration "
    "exception dict kwargs dunder pycon.",
    "Django raspberrypi mercurial unit import yield raspberrypi visual "
    "rocksdahouse.",
]

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "say", "that", "thou", "did", "##st", "for", "##sake", "me", "some",
         "fault", ",", "and", "i", "will", "comment", "upon", "offence", ";",
         "speak", "of", "my", "lame", "##ness", "straight", "halt",
         "中", "国", "hello", "world", "##s", "a", ".", "'", "s"]


def test_wordpunct():
    assert wordpunct_tokenize("don't stop-me now!") == \
        ["don", "'", "t", "stop", "-", "me", "now", "!"]


class TestBPETrain:
    def test_fit_vocab_close_to_reference(self, tmp_path):
        """The incremental trainer must match the reference trainer up to
        max-frequency ties (the reference's tie order is a dict-mutation
        artifact, not a spec): same vocab size, high overlap."""
        from CleanTransformer.tokenizers import BPETokenizer as RefBPE
        ref = RefBPE(vocab_size=60)
        ref.fit([s.lower() for s in CORPUS], out_fn=str(tmp_path / "v.txt"))
        mine = BPETokenizer(vocab_size=60)
        mine.fit(CORPUS)
        rset, mset = set(ref.vocab), set(mine.vocab)
        assert len(ref.vocab) == len(mine.vocab)
        assert len(rset & mset) / len(rset | mset) > 0.7

    def test_tokenize_roundtrip(self):
        bpe = BPETokenizer(vocab_size=80)
        bpe.fit(CORPUS)
        text = "object raspberrypi functools dict kwargs"
        ids = bpe.encode(text)
        assert all(isinstance(i, int) for i in ids)
        decoded = bpe.decode([ids])[0].strip()
        assert decoded == text

    def test_load_from_file(self, tmp_path):
        bpe = BPETokenizer(vocab_size=60)
        bpe.fit(CORPUS, out_fn=str(tmp_path / "vocab.txt"))
        bpe2 = BPETokenizer()
        bpe2.load(vocab_fn=str(tmp_path / "vocab.txt"))
        assert bpe2.vocab == bpe.vocab
        text = "object raspberrypi"
        assert bpe2.tokenize(text) == bpe.tokenize(text)

    def test_encode_batch_padded(self):
        bpe = BPETokenizer(vocab_size=60)
        bpe.fit(CORPUS)
        out = bpe.encode_batch(["object dict", "raspberrypi"])
        assert out["input_ids"].shape == out["attention_mask"].shape
        assert out["input_ids"].dtype == np.int32
        assert (out["attention_mask"].sum(-1) > 0).all()

    def test_wordpiece_tokenize_matches_reference(self):
        from CleanTransformer.tokenizers import WordPieceTokenizer as RefWP
        ref = RefWP(vocab_size=60)
        ref.fit([s.lower() for s in CORPUS])
        mine = WordPieceTokenizer(vocab_size=60)
        mine.fit(CORPUS)
        s = "object raspberrypi functools dict kwargs"
        assert len(ref.vocab) == len(mine.vocab)
        # WordPiece's likelihood criterion rarely ties; tokenization matches
        assert ref.tokenize(s) == mine.tokenize(s)


class TestBertTokenizer:
    TEXT = ("Say that thou didst forsake me for some fault, And I will comment "
            "upon that offence; 中国 helloo worlds.")
    TEXT2 = "Speak of my lameness, and I straight will halt."

    @pytest.fixture(scope="class")
    def vocab_file(self, tmp_path_factory):
        p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
        p.write_text("\n".join(VOCAB))
        return str(p)

    def test_tokens_and_ids_match_hf(self, vocab_file):
        from transformers import BertTokenizer as HFTok
        hf = HFTok(vocab_file=vocab_file)
        mine = BertTokenizer(vocab_file=vocab_file)
        t_hf, t_my = hf.tokenize(self.TEXT), mine.tokenize(self.TEXT)
        assert t_hf == t_my
        assert hf.convert_tokens_to_ids(t_hf) == mine.convert_tokens_to_ids(t_my)

    def test_encode_plus_matches_hf(self, vocab_file):
        from transformers import BertTokenizer as HFTok
        hf = HFTok(vocab_file=vocab_file)
        mine = BertTokenizer(vocab_file=vocab_file)
        p_hf = hf.encode_plus(self.TEXT, text_pair=self.TEXT2, max_length=40,
                              padding="max_length", truncation="longest_first")
        p_my = mine.encode_plus(self.TEXT, text_pair=self.TEXT2, max_len=40)
        assert p_hf["input_ids"] == p_my["input_ids"]
        assert p_hf["token_type_ids"] == p_my["segment_ids"]
        assert p_hf["attention_mask"] == p_my["attention_mask"]

    def test_special_tokens_roundtrip(self, vocab_file):
        mine = BertTokenizer(vocab_file=vocab_file)
        ids = mine.convert_tokens_to_ids(mine.special_tokens)
        assert ids == [1, 3, 0, 2, 4]

    def test_basic_tokenizer_cjk_and_punct(self):
        bt = BasicTokenizer(do_lower_case=True)
        assert bt.tokenize("Hello, 中国!") == ["hello", ",", "中", "国", "!"]

    def test_encode_plus_batch(self, vocab_file):
        mine = BertTokenizer(vocab_file=vocab_file)
        out = mine.encode_plus_batch(["hello world", "say that"], max_len=10)
        assert out["input_ids"].shape == (2, 10)
        assert out["segment_ids"].shape == (2, 10)


def test_bpe_adjacent_merge_pair_counts():
    """Regression: after merging (a,a) in 'aaaa aaaa aaaa', the ('aa','aa')
    pair must count once per word (3), not twice (the in-site neighbor
    update double-counted adjacent merged symbols)."""
    corpus = ["aaaa aaaa aaaa"]
    bpe = BPETokenizer(vocab_size=8, lowercase=True)
    bpe.fit(corpus)
    # cross-check the full merge cascade against the reference trainer
    from CleanTransformer.tokenizers import BPETokenizer as RefBPE
    ref = RefBPE(vocab_size=8)
    ref.fit(corpus, out_fn="/tmp/_ref_aaaa.txt")
    assert set(ref.vocab) == set(bpe.vocab)
    assert bpe.tokenize("aaaa") == ref.tokenize("aaaa")

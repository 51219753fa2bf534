"""BERT tokenization: BasicTokenizer + BertTokenizer.

Behavioral spec: HF BertTokenizer, which the reference reimplements and
asserts exact parity against (modeling_bert.py:50-226, asserts L359-363).
Pipeline: unicode cleanup -> CJK-char spacing -> whitespace split ->
(lowercase, strip accents) -> punctuation split -> WordPiece with '##'
continuation prefix; ``encode_plus`` builds ``[CLS] a [SEP] (b [SEP])`` with
segment ids, attention mask, longest-first truncation, and pad-to-max.
"""

import unicodedata
from collections import OrderedDict

import numpy as np

from cleantransformer_tpu.tokenizers.bpe import WordPieceTokenizer


def _is_whitespace(ch):
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_control(ch):
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_punctuation(ch):
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp):
    return ((0x4E00 <= cp <= 0x9FFF) or (0x3400 <= cp <= 0x4DBF)
            or (0x20000 <= cp <= 0x2A6DF) or (0x2A700 <= cp <= 0x2B73F)
            or (0x2B740 <= cp <= 0x2B81F) or (0x2B820 <= cp <= 0x2CEAF)
            or (0xF900 <= cp <= 0xFAFF) or (0x2F800 <= cp <= 0x2FA1F))


class BasicTokenizer:
    """Pre-tokenizer: cleanup, CJK spacing, lowercasing, accent stripping,
    punctuation splitting (spec: modeling_bert.py:50-151 / HF)."""

    def __init__(self, do_lower_case=False, never_split=None,
                 tokenize_chinese_chars=True, strip_accents=True):
        self.do_lower_case = do_lower_case
        self.never_split = set(never_split) if never_split else set()
        self.tokenize_chinese_chars = tokenize_chinese_chars
        self.strip_accents = strip_accents

    def tokenize(self, text, never_split=None):
        never = self.never_split | set(never_split or ())
        text = self._clean(text)
        if self.tokenize_chinese_chars:
            text = "".join(f" {c} " if _is_cjk(ord(c)) else c for c in text)
        out = []
        for token in text.strip().split():
            if token not in never:
                if self.do_lower_case:
                    token = token.lower()
                if self.strip_accents:
                    token = "".join(c for c in unicodedata.normalize("NFD", token)
                                    if unicodedata.category(c) != "Mn")
            out.extend(self._split_punct(token, never))
        return " ".join(out).strip().split()

    @staticmethod
    def _clean(text):
        out = []
        for ch in text:
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD or _is_control(ch):
                continue
            out.append(" " if _is_whitespace(ch) else ch)
        return "".join(out)

    @staticmethod
    def _split_punct(token, never):
        if token in never:
            return [token]
        pieces, cur = [], []
        for ch in token:
            if _is_punctuation(ch):
                if cur:
                    pieces.append("".join(cur))
                    cur = []
                pieces.append(ch)
            else:
                cur.append(ch)
        if cur:
            pieces.append("".join(cur))
        return pieces


class BertTokenizer:
    """Vocab-file BERT tokenizer with HF-parity outputs
    (spec: modeling_bert.py:154-226)."""

    def __init__(self, vocab_file=None, vocab=None, do_lower_case=True,
                 do_basic_tokenize=True, tokenizer_chinese_chars=True):
        self.special_tokens = ["[UNK]", "[SEP]", "[PAD]", "[CLS]", "[MASK]"]
        self.unk, self.sep, self.pad, self.cls, self.mask = self.special_tokens
        self.do_basic_tokenize = do_basic_tokenize
        self.vocab = self._load_vocab(vocab_file) if vocab_file else OrderedDict(
            (t, i) for i, t in enumerate(vocab))
        if do_basic_tokenize:
            self.basic_tokenizer = BasicTokenizer(do_lower_case, self.special_tokens,
                                                  tokenizer_chinese_chars)
        self.wordpiece_tokenizer = WordPieceTokenizer(
            vocab_size=len(self.vocab), lowercase=do_lower_case,
            basic_tokenizer=lambda x: x.strip().split(),
            unk=self.unk, sep=self.sep, pad=self.pad, cls=self.cls, mask=self.mask)
        self.wordpiece_tokenizer.load(vocab=list(self.vocab))

    @staticmethod
    def _load_vocab(vocab_file):
        vocab = OrderedDict()
        for idx, line in enumerate(open(vocab_file, "r")):
            vocab[line.rstrip("\n")] = idx
        return vocab

    MAX_INPUT_CHARS_PER_WORD = 100

    def _wordpiece(self, token):
        """WordPiece a single word with HF's whole-word-UNK rule: if any
        piece fails to match (or the word is over-long), the WHOLE word
        becomes [UNK]. (The reference instead emits [UNK] per unmatched
        piece, modeling_bert.py:180 via tokenizers.py:123-125 — a deviation
        from the HF oracle it asserts parity with; we follow HF.)"""
        if len(token) > self.MAX_INPUT_CHARS_PER_WORD:
            return [self.unk]
        pieces = self.wordpiece_tokenizer.tokenize(token, add_pre=None,
                                                   add_mid="##", add_post=None)
        if self.unk in pieces:
            return [self.unk]
        return pieces

    def tokenize(self, text):
        if not self.do_basic_tokenize:
            return self._wordpiece(text)
        tokens = []
        for token in self.basic_tokenizer.tokenize(text, never_split=self.special_tokens):
            if token in self.special_tokens:
                tokens.append(token)
            else:
                tokens.extend(self._wordpiece(token))
        return tokens

    def convert_tokens_to_ids(self, tokens):
        if isinstance(tokens, str):
            tokens = [tokens]
        unk_id = self.vocab.get(self.unk)
        return [self.vocab.get(t, unk_id) for t in tokens]

    def encode_plus(self, text, text_pair=None, max_len=1024, padding=True,
                    truncation=True, truncation_side="right"):
        """[CLS] a [SEP] (b [SEP]) with longest-first truncation and
        pad-to-max (spec: modeling_bert.py:190-226)."""
        a = self.convert_tokens_to_ids(self.tokenize(text))
        b = self.convert_tokens_to_ids(self.tokenize(text_pair)) if text_pair else []

        total = len(a) + len(b) + (3 if b else 2)
        if truncation and total > max_len:
            for _ in range(total - max_len):
                if len(a) > len(b):
                    a = a[:-1] if truncation_side == "right" else a[1:]
                else:
                    b = b[:-1] if truncation_side == "right" else b[1:]

        cls_id = self.convert_tokens_to_ids([self.cls])
        sep_id = self.convert_tokens_to_ids([self.sep])
        input_ids = cls_id + a + sep_id
        segment_ids = [0] * len(input_ids)
        attention_mask = [1] * len(input_ids)
        if b:
            input_ids += b + sep_id
            segment_ids += [1] * (len(b) + 1)
            attention_mask += [1] * (len(b) + 1)
        pad_id = self.convert_tokens_to_ids(self.pad)
        while padding and len(input_ids) < max_len:
            input_ids += pad_id
            segment_ids += [0]
            attention_mask += [0]
        return {"input_ids": input_ids, "segment_ids": segment_ids,
                "attention_mask": attention_mask}

    def encode_plus_batch(self, texts, text_pairs=None, max_len=128):
        """Batched padded arrays for jit consumption."""
        pairs = text_pairs or [None] * len(texts)
        encoded = [self.encode_plus(t, p, max_len=max_len, padding=True)
                   for t, p in zip(texts, pairs)]
        return {k: np.asarray([e[k] for e in encoded], dtype=np.int32)
                for k in ("input_ids", "segment_ids", "attention_mask")}

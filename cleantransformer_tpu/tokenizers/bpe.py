"""Trainable BPE / WordPiece tokenizers.

Same public surface as the reference (CleanTransformer/tokenizers.py:19-182):
``fit`` / ``load`` / ``tokenize`` / ``encode`` / ``decode`` with the same
``</w>`` end-of-word convention, specials, and greedy longest-match-first
tokenization — but the trainer is a redesign: instead of re-counting every
bigram and string-replacing across the whole corpus per merge
(tokenizers.py:71-95, O(corpus) per merge), it keeps incremental pair/symbol
counts and touches only the words containing the merged pair. On real corpora
this is orders of magnitude faster (see BASELINE.md).

Differences from the reference (deliberate):
 - ``encode`` returns a flat id list for a text (the reference's encode is
   inoperative — it subscripts a bound method, tokenizers.py:144);
 - ``encode_batch`` produces padded (input_ids, attention_mask) numpy arrays
   ready for jit consumption — the batched frontend the TPU build needs.
"""

import re
from collections import Counter

import numpy as np

_WORDPUNCT = re.compile(r"\w+|[^\w\s]+", flags=re.UNICODE | re.MULTILINE | re.DOTALL)


def wordpunct_tokenize(text):
    """Split into word / punctuation runs (reference tokenizers.py:13-16)."""
    return _WORDPUNCT.findall(text)


class BPETokenizer:
    def __init__(self, vocab_size=1000, lowercase=True, basic_tokenizer=wordpunct_tokenize,
                 unk="<UNK>", sep="<SEP>", pad="<PAD>", cls="<CLS>", mask="<MASK>",
                 user_specials=None):
        self.lowercase = lowercase
        self.vocab_size = vocab_size
        self.basic_tokenizer = basic_tokenizer
        self.unk, self.sep, self.pad, self.cls, self.mask = unk, sep, pad, cls, mask
        self.special = [unk, sep, pad, cls, mask]
        self.special.extend(user_specials or [])
        self.vocab = []
        self._vocab_set = set()
        self.token2id = {}
        self.id2token = {}
        self._native = None

    # -- vocab management ---------------------------------------------------

    def load(self, vocab_fn=None, vocab=None):
        if vocab is not None:
            self.vocab = list(vocab)
        else:
            self.vocab = [l.rstrip("\n") for l in open(vocab_fn, "r")]
        self.vocab_size = len(self.vocab)
        self._index()

    def _index(self):
        self._vocab_set = set(self.vocab)
        self.id2token = dict(enumerate(self.vocab))
        self.token2id = {v: i for i, v in self.id2token.items()}
        self._native = None  # rebuilt lazily on next encode

    # -- training -----------------------------------------------------------

    def _word_symbols(self, word):
        """A word as its initial symbol sequence (chars + end marker)."""
        return tuple(word) + ("</w>",)

    def fit(self, corpus, max_steps=10000, out_fn=None):
        """Train merges until ``vocab_size`` distinct symbols exist (or no
        pair repeats). Incremental pair-count trainer; same merge criterion
        as the reference (max pair frequency)."""
        if self.lowercase:
            corpus = [s.lower() for s in corpus]
        word_counts = Counter()
        for sent in corpus:
            word_counts.update(self.basic_tokenizer(sent))

        words = [list(self._word_symbols(w)) for w in word_counts]
        counts = list(word_counts.values())

        pair_counts = {}
        pair_words = {}
        symbol_counts = Counter()
        for wi, (toks, c) in enumerate(zip(words, counts)):
            for s in toks:
                symbol_counts[s] += c
            for a, b in zip(toks, toks[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
                pair_words.setdefault((a, b), set()).add(wi)

        for _ in range(max_steps):
            if len(symbol_counts) >= self.vocab_size:
                break
            if not pair_counts:
                break
            best = max(pair_counts,
                       key=lambda p: self._merge_score(p, pair_counts, symbol_counts))
            if pair_counts[best] < 1:
                break
            self._apply_merge(best, words, counts, pair_counts, pair_words, symbol_counts)

        vocab = [s for s, c in sorted(symbol_counts.items(), key=lambda x: -x[1]) if c > 0]
        for s in self.special:
            if s not in vocab:
                vocab.insert(0, s)
        self.vocab = vocab
        self._index()
        if out_fn:
            with open(out_fn, "w") as f:
                f.write("\n".join(self.vocab))
        return [(t, symbol_counts.get(t, 99999)) for t in self.vocab]

    def _merge_score(self, pair, pair_counts, symbol_counts):
        # plain BPE: raw pair frequency (reference tokenizers.py:82-86)
        return pair_counts[pair]

    def _apply_merge(self, pair, words, counts, pair_counts, pair_words, symbol_counts):
        """Merge ``pair`` -> joined symbol in every word containing it.

        Pair counts are maintained by removing each touched word's old pair
        contributions and re-adding its new ones — immune to the
        adjacent-merge double-count an in-site neighbor update suffers
        (e.g. 'aaaa' after merging (a,a) has ONE ('aa','aa') pair)."""
        a, b = pair
        joined = a + b
        touched = pair_words.pop(pair, set())
        pair_counts.pop(pair, None)
        for wi in touched:
            toks, c = words[wi], counts[wi]
            # remove old pair contributions of this word
            for p in zip(toks, toks[1:]):
                if p in pair_counts:
                    pair_counts[p] -= c
                    if pair_counts[p] <= 0:
                        pair_counts.pop(p, None)
                        pair_words.pop(p, None)
            # leftmost-greedy merge (same as the reference's string replace)
            out = []
            i, n = 0, len(toks)
            while i < n:
                if i < n - 1 and toks[i] == a and toks[i + 1] == b:
                    symbol_counts[a] -= c
                    symbol_counts[b] -= c
                    symbol_counts[joined] += c
                    out.append(joined)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            # add new pair contributions
            for p in zip(out, out[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_words.setdefault(p, set()).add(wi)
            words[wi] = out
        for s in (a, b):
            if symbol_counts.get(s, 0) <= 0:
                symbol_counts.pop(s, None)

    # -- inference ----------------------------------------------------------

    def tokenize(self, text, add_pre=None, add_mid=None, add_post="</w>"):
        """Greedy longest-match-first over each basic token (same output as
        reference tokenizers.py:97-129, but with O(1) set membership)."""
        all_tokens = []
        if self.lowercase:
            text = text.lower()
        vocab = self._vocab_set
        for token in self.basic_tokenizer(text):
            chars = list(token)
            if add_pre:
                chars = [add_pre] + chars
            if add_post:
                chars = chars + [add_post]
            start, end = 0, len(chars)
            while start < end:
                sub = "".join(chars[start:end])
                if start > 0 and add_mid:
                    sub = add_mid + sub
                if sub in vocab:
                    all_tokens.append(sub)
                    start, end = end, len(chars)
                elif end - start == 1:
                    all_tokens.append(self.unk)
                    start, end = end, len(chars)
                else:
                    end -= 1
        return all_tokens

    def _token2id(self, token):
        return self.token2id.get(token, self.token2id.get(self.unk))

    def _id2token(self, i):
        return self.id2token[i]

    def encode(self, text, use_native=True):
        """text -> flat id list. Uses the C++ matching core
        (cleantransformer_tpu/native) when a compiler is available; the
        Python path is the fallback and the parity oracle."""
        if use_native:
            native = self._get_native()
            if native is not None:
                if self.lowercase:
                    text = text.lower()
                return native.encode_words(self.basic_tokenizer(text))
        return [self._token2id(t) for t in self.tokenize(text)]

    def _get_native(self):
        if self._native is None and self.vocab:
            try:
                from cleantransformer_tpu.native import NativeBPEEncoder
                self._native = NativeBPEEncoder(self.vocab, self.unk,
                                                add_post="</w>")
            except Exception:
                self._native = False
        return self._native or None

    def decode(self, token_ids):
        """list of id-lists -> list of texts (reference decode contract,
        tokenizers.py:147-156)."""
        sentences = []
        for ids in token_ids:
            toks = [self._id2token(int(i)) for i in ids]
            sentences.append("".join(toks).replace("</w>", " "))
        return sentences

    def encode_batch(self, texts, max_length=None, pad_to_max=False,
                     use_native=True):
        """Batched, padded frontend: returns {'input_ids','attention_mask'}
        numpy int32 arrays ready for jit. With the C++ core available the
        whole batch runs through one multi-threaded native call (per-row
        encode + truncate + pad packed directly into the output matrices);
        the Python path below is the fallback and parity oracle."""
        if use_native:
            native = self._get_native()
            if native is not None:
                words = [self.basic_tokenizer(
                    t.lower() if self.lowercase else t) for t in texts]
                return native.encode_batch(
                    words, max_length=max_length, pad_to_max=pad_to_max,
                    pad_id=self._token2id(self.pad))
        seqs = [self.encode(t) for t in texts]
        if max_length is not None:
            seqs = [s[:max_length] for s in seqs]
        width = max_length if (pad_to_max and max_length) else max((len(s) for s in seqs), default=0)
        pad_id = self._token2id(self.pad)
        ids = np.full((len(seqs), width), pad_id, dtype=np.int32)
        mask = np.zeros((len(seqs), width), dtype=np.int32)
        for i, s in enumerate(seqs):
            ids[i, :len(s)] = s
            mask[i, :len(s)] = 1
        return {"input_ids": ids, "attention_mask": mask}


class WordPieceTokenizer(BPETokenizer):
    """WordPiece: merge criterion freq(ab) / (freq(a) * freq(b))
    (reference tokenizers.py:159-182)."""

    def _merge_score(self, pair, pair_counts, symbol_counts):
        a, b = pair
        return pair_counts[pair] / (symbol_counts[a] * symbol_counts[b])

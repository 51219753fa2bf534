// Native BPE/WordPiece encoder core.
//
// The greedy longest-match-first tokenize loop (spec:
// CleanTransformer/tokenizers.py:97-129) is O(word_len^2) hash probes per
// word in Python; this C++ core does the same matching over UTF-8 codepoint
// boundaries with an unordered_map vocab and a word->ids memo cache. The
// Python side keeps the basic (regex) pre-split and passes space-joined
// words — words never contain spaces, so the contract is exact.
//
// C ABI (ctypes): create / encode_words / destroy. Thread-compatible
// (one encoder per thread or external locking; the memo is per-encoder).

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Encoder {
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_map<std::string, std::vector<int32_t>> memo;
  std::string unk, add_pre, add_mid, add_post;
  int32_t unk_id = 0;
};

// split a UTF-8 string into codepoint-boundary offsets
void utf8_offsets(const std::string& s, std::vector<size_t>* offs) {
  offs->clear();
  size_t i = 0;
  while (i < s.size()) {
    offs->push_back(i);
    unsigned char c = s[i];
    size_t n = (c < 0x80) ? 1 : (c < 0xE0) ? 2 : (c < 0xF0) ? 3 : 4;
    i += n;
  }
  offs->push_back(s.size());
}

void encode_word(Encoder* e, const std::string& word,
                 std::vector<int32_t>* out) {
  auto it = e->memo.find(word);
  if (it != e->memo.end()) {
    out->insert(out->end(), it->second.begin(), it->second.end());
    return;
  }
  // element list: [add_pre?] + codepoints + [add_post?]
  std::vector<std::string> elems;
  if (!e->add_pre.empty()) elems.push_back(e->add_pre);
  std::vector<size_t> offs;
  utf8_offsets(word, &offs);
  for (size_t i = 0; i + 1 < offs.size(); ++i)
    elems.push_back(word.substr(offs[i], offs[i + 1] - offs[i]));
  if (!e->add_post.empty()) elems.push_back(e->add_post);

  std::vector<int32_t> ids;
  size_t start = 0, end = elems.size();
  while (start < end) {
    std::string sub;
    if (start > 0 && !e->add_mid.empty()) sub = e->add_mid;
    for (size_t i = start; i < end; ++i) sub += elems[i];
    auto v = e->vocab.find(sub);
    if (v != e->vocab.end()) {
      ids.push_back(v->second);
      start = end;
      end = elems.size();
    } else if (end - start == 1) {
      ids.push_back(e->unk_id);
      start = end;
      end = elems.size();
    } else {
      --end;
    }
  }
  e->memo.emplace(word, ids);
  out->insert(out->end(), ids.begin(), ids.end());
}

}  // namespace

extern "C" {

void* bpe_create(const char** vocab, int32_t n, const char* unk,
                 const char* add_pre, const char* add_mid,
                 const char* add_post) {
  Encoder* e = new Encoder();
  for (int32_t i = 0; i < n; ++i) e->vocab.emplace(vocab[i], i);
  e->unk = unk ? unk : "";
  auto u = e->vocab.find(e->unk);
  e->unk_id = (u != e->vocab.end()) ? u->second : 0;
  e->add_pre = add_pre ? add_pre : "";
  e->add_mid = add_mid ? add_mid : "";
  e->add_post = add_post ? add_post : "";
  return e;
}

// words: space-joined pre-split words. Returns number of ids written
// (<= max_out; truncates beyond).
int32_t bpe_encode_words(void* enc, const char* words, int32_t* out_ids,
                         int32_t max_out) {
  Encoder* e = static_cast<Encoder*>(enc);
  std::vector<int32_t> ids;
  const char* p = words;
  while (*p) {
    const char* q = p;
    while (*q && *q != ' ') ++q;
    if (q > p) encode_word(e, std::string(p, q - p), &ids);
    p = (*q) ? q + 1 : q;
  }
  int32_t n = static_cast<int32_t>(ids.size());
  if (n > max_out) n = max_out;
  std::memcpy(out_ids, ids.data(), n * sizeof(int32_t));
  return n;
}

void bpe_clear_cache(void* enc) {
  static_cast<Encoder*>(enc)->memo.clear();
}

void bpe_destroy(void* enc) { delete static_cast<Encoder*>(enc); }

}  // extern "C"

// Native BPE/WordPiece encoder core + multi-threaded batch packer.
//
// The greedy longest-match-first tokenize loop (spec:
// CleanTransformer/tokenizers.py:97-129) is O(word_len^2) hash probes per
// word in Python; this C++ core does the same matching over UTF-8 codepoint
// boundaries with an unordered_map vocab and a word->ids memo cache. The
// Python side keeps the basic (regex) pre-split and passes space-joined
// words — words never contain spaces, so the contract is exact.
//
// bpe_encode_batch is the data-pipeline entry point: N texts fan out over a
// thread pool, each row is encoded (per-thread memo — the shared handle
// stays untouched, so concurrent batch calls are safe), truncated to the
// caller's cap, and written directly into the caller's preallocated
// (N, cap) ids/mask matrices — the padded, jit-ready layout with no
// intermediate Python lists.
//
// C ABI (ctypes): create / encode_words / encode_batch / destroy.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
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

using Memo = std::unordered_map<std::string, std::vector<int32_t>>;

void encode_word_with_memo(const Encoder* e, Memo* memo,
                           const std::string& word,
                           std::vector<int32_t>* out) {
  auto it = memo->find(word);
  if (it != memo->end()) {
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
  memo->emplace(word, ids);
  out->insert(out->end(), ids.begin(), ids.end());
}

void encode_word(Encoder* e, const std::string& word,
                 std::vector<int32_t>* out) {
  encode_word_with_memo(e, &e->memo, word, out);
}

// encode one space-joined text into ids (thread-local memo)
void encode_text(const Encoder* e, Memo* memo, const char* text,
                 std::vector<int32_t>* ids) {
  const char* p = text;
  while (*p) {
    const char* q = p;
    while (*q && *q != ' ') ++q;
    if (q > p) encode_word_with_memo(e, memo, std::string(p, q - p), ids);
    p = (*q) ? q + 1 : q;
  }
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

// Multi-threaded batch encode + pack. texts: n space-joined pre-split
// texts. Writes row i's ids (truncated to cap) into out_ids[i*cap ...],
// pad_id beyond, and 1/0 into out_mask likewise; out_lens[i] gets the
// UNTRUNCATED length. Returns the max untruncated length over all rows
// (callers with no fixed max_length re-call with a larger cap if it
// exceeds cap). The shared handle is read-only here (per-thread memos), so
// concurrent batch calls on one encoder are safe.
int32_t bpe_encode_batch(void* enc, const char** texts, int32_t n,
                         int32_t cap, int32_t pad_id, int32_t n_threads,
                         int32_t* out_ids, int32_t* out_mask,
                         int32_t* out_lens) {
  const Encoder* e = static_cast<const Encoder*>(enc);
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n > 0 ? n : 1;
  std::atomic<int32_t> next(0);
  std::vector<int32_t> maxes(n_threads, 0);

  auto worker = [&](int32_t tid) {
    Memo memo;
    std::vector<int32_t> ids;
    int32_t i;
    while ((i = next.fetch_add(1)) < n) {
      ids.clear();
      encode_text(e, &memo, texts[i], &ids);
      int32_t len = static_cast<int32_t>(ids.size());
      if (len > maxes[tid]) maxes[tid] = len;
      out_lens[i] = len;
      int32_t keep = len < cap ? len : cap;
      int32_t* row = out_ids + static_cast<int64_t>(i) * cap;
      int32_t* mrow = out_mask + static_cast<int64_t>(i) * cap;
      if (keep > 0) std::memcpy(row, ids.data(), keep * sizeof(int32_t));
      for (int32_t j = keep; j < cap; ++j) row[j] = pad_id;
      for (int32_t j = 0; j < keep; ++j) mrow[j] = 1;
      for (int32_t j = keep; j < cap; ++j) mrow[j] = 0;
    }
  };

  std::vector<std::thread> threads;
  for (int32_t t = 1; t < n_threads; ++t) threads.emplace_back(worker, t);
  worker(0);
  for (auto& th : threads) th.join();
  int32_t mx = 0;
  for (int32_t m : maxes)
    if (m > mx) mx = m;
  return mx;
}

void bpe_clear_cache(void* enc) {
  static_cast<Encoder*>(enc)->memo.clear();
}

void bpe_destroy(void* enc) { delete static_cast<Encoder*>(enc); }

}  // extern "C"

// Native BPE merge engine for the text frontend.
//
// The TPU analog of the reference's native-code layer is the Pallas kernel
// (ops/pallas/antialias.py); this module covers the host side: the O(n^2)
// best-scoring-pair merge loop of SentencePiece BPE encoding
// (utils/spm.py:_encode_bpe) implemented in C++ and exposed through a C ABI
// for ctypes. Long-text synthesis tokenizes thousands of symbols per request
// before any TPU work starts, so this sits on the serving latency path.
//
// Semantics are identical to the Python implementation: repeatedly merge the
// adjacent symbol pair whose concatenation exists in the vocab with the
// highest score (ties -> leftmost), until no pair merges.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
  std::unordered_map<std::string, int32_t> piece_to_id;
  std::vector<float> scores;
  std::vector<uint8_t> types;  // sentencepiece piece types
  int32_t unk_id = 0;
};

constexpr uint8_t kNormal = 1;  // only NORMAL pieces merge / match raw text

// split a UTF-8 string into codepoint-wise symbols
std::vector<std::string> utf8_split(const char* text) {
  std::vector<std::string> out;
  const unsigned char* p = reinterpret_cast<const unsigned char*>(text);
  while (*p) {
    int len = 1;
    if ((*p & 0x80) == 0x00) len = 1;
    else if ((*p & 0xE0) == 0xC0) len = 2;
    else if ((*p & 0xF0) == 0xE0) len = 3;
    else if ((*p & 0xF8) == 0xF0) len = 4;
    out.emplace_back(reinterpret_cast<const char*>(p), len);
    p += len;
  }
  return out;
}

}  // namespace

extern "C" {

// pieces: n utf-8 strings; scores: n floats; types: n piece-type bytes.
void* bpe_create(const char** pieces, const float* scores, const uint8_t* types,
                 int32_t n, int32_t unk_id) {
  auto* v = new Vocab();
  v->piece_to_id.reserve(n * 2);
  v->scores.assign(scores, scores + n);
  v->types.assign(types, types + n);
  v->unk_id = unk_id;
  for (int32_t i = 0; i < n; ++i) v->piece_to_id.emplace(pieces[i], i);
  return v;
}

void bpe_free(void* handle) { delete static_cast<Vocab*>(handle); }

// Encode pre-normalized text (whitespace already escaped to U+2581 by the
// Python caller). Writes up to max_out ids but returns the TOTAL token
// count, so the caller can detect truncation (snprintf convention) and
// retry with a bigger buffer instead of silently dropping the tail.
// Only NORMAL pieces participate in merges or match raw text — real
// sentencepiece never matches CONTROL/UNKNOWN/UNUSED pieces against input,
// so literal "<s>" in user text must NOT encode to the bos id.
int32_t bpe_encode(void* handle, const char* text, int32_t* out_ids, int32_t max_out) {
  const Vocab& v = *static_cast<Vocab*>(handle);
  std::vector<std::string> symbols = utf8_split(text);
  if (symbols.empty()) return 0;

  while (true) {
    float best_score = 0.0f;
    bool found = false;
    size_t best_i = 0;
    for (size_t i = 0; i + 1 < symbols.size(); ++i) {
      std::string cand = symbols[i] + symbols[i + 1];
      auto it = v.piece_to_id.find(cand);
      if (it == v.piece_to_id.end()) continue;
      if (v.types[it->second] != kNormal) continue;
      float s = v.scores[it->second];
      if (!found || s > best_score) {
        best_score = s;
        best_i = i;
        found = true;
      }
    }
    if (!found) break;
    symbols[best_i] += symbols[best_i + 1];
    symbols.erase(symbols.begin() + best_i + 1);
  }

  int32_t count = 0;
  for (const auto& s : symbols) {
    auto it = v.piece_to_id.find(s);
    int32_t id = (it != v.piece_to_id.end() && v.types[it->second] == kNormal)
                     ? it->second
                     : v.unk_id;
    if (count < max_out) out_ids[count] = id;
    ++count;
  }
  return count;
}

}  // extern "C"

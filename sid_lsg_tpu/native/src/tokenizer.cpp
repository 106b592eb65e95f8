// Native CLIP BPE tokenizer: the prompt-side hot path of 30k-caption eval.
//
// Role of the HF tokenizer calls the reference re-issues inside every denoise
// (training/sid_sd_util.py:170,221-240).  Implements the CLIP tokenization
// pipeline for ASCII text (whitespace-clean + lowercase, the CLIP word regex,
// byte-pair merges, bos/eos framing, max-length pad/truncate); the Python
// wrapper routes any non-ASCII prompt to the pure-Python tokenizer, so
// results are identical by construction on the fast path and correct on all
// paths.  COCO captions / Aesthetics prompts are ASCII-dominated, which is
// what makes this the profitable subset.
//
// Vocab input: a TSV exported by the Python side (token<TAB>id per line,
// tokens in CLIP's byte-unicode alphabet — ASCII tokens pass through
// verbatim) and the standard merges.txt.

#include <cctype>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Tokenizer {
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_map<std::string, int32_t> merge_rank;  // "first second"
  std::unordered_map<std::string, std::vector<int32_t>> cache;
};

bool is_letter(unsigned char c) { return std::isalpha(c) != 0; }
bool is_digit(unsigned char c) { return std::isdigit(c) != 0; }
bool is_space(unsigned char c) { return std::isspace(c) != 0; }

// CLIP word regex, ASCII subset, applied to lowercased text:
//   's|'t|'re|'ve|'m|'ll|'d | [letters]+ | [digit] | [^space,letter,digit]+
std::vector<std::string> split_words(const std::string& text) {
  std::vector<std::string> words;
  size_t i = 0;
  const size_t n = text.size();
  while (i < n) {
    if (is_space(static_cast<unsigned char>(text[i]))) {
      ++i;
      continue;
    }
    if (text[i] == '\'' && i + 1 < n) {
      // contraction suffixes
      static const char* two[] = {"'s", "'t", "'m", "'d"};
      static const char* three[] = {"'re", "'ve", "'ll"};
      bool matched = false;
      for (const char* t : three) {
        if (i + 2 < n && text.compare(i, 3, t) == 0) {
          words.emplace_back(t);
          i += 3;
          matched = true;
          break;
        }
      }
      if (matched) continue;
      for (const char* t : two) {
        if (text.compare(i, 2, t) == 0) {
          words.emplace_back(t);
          i += 2;
          matched = true;
          break;
        }
      }
      if (matched) continue;
    }
    unsigned char c = static_cast<unsigned char>(text[i]);
    size_t start = i;
    if (is_letter(c)) {
      while (i < n && is_letter(static_cast<unsigned char>(text[i]))) ++i;
    } else if (is_digit(c)) {
      ++i;  // single digit per token
    } else {
      while (i < n) {
        unsigned char d = static_cast<unsigned char>(text[i]);
        if (is_space(d) || is_letter(d) || is_digit(d)) break;
        // Stop before a contraction that a following letter would claim.
        if (text[i] == '\'' && i + 1 < n &&
            is_letter(static_cast<unsigned char>(text[i + 1])) && i != start)
          break;
        ++i;
      }
    }
    words.emplace_back(text.substr(start, i - start));
  }
  return words;
}

std::vector<int32_t> bpe_encode_word(Tokenizer* tok, const std::string& word) {
  auto it = tok->cache.find(word);
  if (it != tok->cache.end()) return it->second;
  // Initial symbol sequence: each char, last char gets </w>.
  std::vector<std::string> parts;
  for (size_t i = 0; i < word.size(); ++i) {
    std::string s(1, word[i]);
    if (i + 1 == word.size()) s += "</w>";
    parts.push_back(s);
  }
  while (parts.size() > 1) {
    int best_rank = INT32_MAX;
    size_t best_i = 0;
    for (size_t i = 0; i + 1 < parts.size(); ++i) {
      auto r = tok->merge_rank.find(parts[i] + " " + parts[i + 1]);
      if (r != tok->merge_rank.end() && r->second < best_rank) {
        best_rank = r->second;
        best_i = i;
      }
    }
    if (best_rank == INT32_MAX) break;
    // Merge ALL (first,second) occurrences for this pair, like the python BPE.
    const std::string first = parts[best_i], second = parts[best_i + 1];
    std::vector<std::string> merged;
    for (size_t i = 0; i < parts.size();) {
      if (i + 1 < parts.size() && parts[i] == first && parts[i + 1] == second) {
        merged.push_back(first + second);
        i += 2;
      } else {
        merged.push_back(parts[i]);
        ++i;
      }
    }
    parts.swap(merged);
  }
  std::vector<int32_t> ids;
  for (const auto& p : parts) {
    auto v = tok->vocab.find(p);
    if (v == tok->vocab.end()) return {};  // signals fallback to python
    ids.push_back(v->second);
  }
  tok->cache.emplace(word, ids);
  return ids;
}

}  // namespace

extern "C" {

void* sid_tok_create(const char* vocab_tsv, const char* merges_txt) {
  auto* tok = new Tokenizer();
  {
    std::ifstream f(vocab_tsv);
    if (!f) {
      delete tok;
      return nullptr;
    }
    std::string line;
    while (std::getline(f, line)) {
      size_t tab = line.rfind('\t');
      if (tab == std::string::npos) continue;
      tok->vocab.emplace(line.substr(0, tab),
                         static_cast<int32_t>(std::stol(line.substr(tab + 1))));
    }
  }
  {
    std::ifstream f(merges_txt);
    if (!f) {
      delete tok;
      return nullptr;
    }
    std::string line;
    int32_t rank = 0;
    while (std::getline(f, line)) {
      if (line.empty() || line[0] == '#') continue;
      tok->merge_rank.emplace(line, rank++);
    }
  }
  return tok;
}

void sid_tok_destroy(void* handle) { delete static_cast<Tokenizer*>(handle); }

// Encode one text into out[max_len] with bos/eos/pad framing.
// Returns 1 on success, 0 if the text needs the python fallback (non-ASCII
// or out-of-vocab symbol).
int sid_tok_encode(void* handle, const char* text, int32_t* out, int max_len,
                   int32_t bos, int32_t eos, int32_t pad) {
  auto* tok = static_cast<Tokenizer*>(handle);
  std::string s(text);
  for (char ch : s) {
    if (static_cast<unsigned char>(ch) > 126) return 0;  // non-ASCII fallback
  }
  for (auto& ch : s) ch = static_cast<char>(std::tolower(ch));
  std::vector<int32_t> ids;
  for (const auto& w : split_words(s)) {
    std::vector<int32_t> wi = bpe_encode_word(tok, w);
    if (wi.empty()) return 0;
    ids.insert(ids.end(), wi.begin(), wi.end());
  }
  if (static_cast<int>(ids.size()) > max_len - 2)
    ids.resize(max_len - 2);
  int k = 0;
  out[k++] = bos;
  for (int32_t id : ids) out[k++] = id;
  out[k++] = eos;
  while (k < max_len) out[k++] = pad;
  return 1;
}

// Batch encode; ok[i] = 1 if row i encoded natively, 0 = caller must redo in
// python.  texts: n C strings.  out: n*max_len int32.
int sid_tok_encode_batch(void* handle, const char** texts, int n, int32_t* out,
                         int max_len, int32_t bos, int32_t eos, int32_t pad,
                         uint8_t* ok) {
  int good = 0;
  for (int i = 0; i < n; ++i) {
    ok[i] = static_cast<uint8_t>(
        sid_tok_encode(handle, texts[i], out + static_cast<size_t>(i) * max_len,
                       max_len, bos, eos, pad));
    good += ok[i];
  }
  return good;
}

}  // extern "C"

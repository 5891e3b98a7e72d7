// Native byte-level BPE merge engine.
//
// Role: the hot inner loop of the tokenizer (the reference relies on the
// Rust `tokenizers` crate for this, essentials.py:256-295; Rust is not
// available in this image, so the native engine is C++).  Python keeps
// the cold path (NFKC normalization + GPT-2 regex pre-tokenization,
// where correct Unicode handling matters); this engine performs the
// byte->unicode-symbol split and the rank-greedy merge loop, which
// dominates encode time on long transcripts.
//
// C API (ctypes-friendly):
//   void* bpe_new();
//   void  bpe_free(void*);
//   void  bpe_add_token(void*, const char* utf8, int id);
//   void  bpe_add_merge(void*, const char* a, const char* b, int rank);
//   int   bpe_encode_word(void*, const char* utf8_word,
//                         int* out_ids, int max_out);  // returns count
//
// The word is the byte-level-mapped text (each original byte already
// mapped to its visible unicode char by the Python side), so symbols
// here are single UTF-8 code points merged into longer strings.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
    size_t operator()(const std::pair<std::string, std::string>& p) const {
        std::hash<std::string> h;
        return h(p.first) * 1000003u ^ h(p.second);
    }
};

struct Engine {
    std::unordered_map<std::string, int> vocab;
    std::unordered_map<std::pair<std::string, std::string>, int, PairHash>
        ranks;
    // encode cache: word -> ids
    std::unordered_map<std::string, std::vector<int>> cache;
};

// split a UTF-8 string into code-point substrings
static void utf8_split(const char* s, std::vector<std::string>& out) {
    const unsigned char* p = reinterpret_cast<const unsigned char*>(s);
    while (*p) {
        int len = 1;
        if ((*p & 0x80u) == 0x00u) len = 1;
        else if ((*p & 0xE0u) == 0xC0u) len = 2;
        else if ((*p & 0xF0u) == 0xE0u) len = 3;
        else if ((*p & 0xF8u) == 0xF0u) len = 4;
        // a truncated multi-byte sequence at end of input must not read
        // past the NUL: clamp len to the bytes actually present
        int avail = 1;
        while (avail < len && p[avail] != 0) ++avail;
        len = avail;
        out.emplace_back(reinterpret_cast<const char*>(p),
                         static_cast<size_t>(len));
        p += len;
    }
}

}  // namespace

extern "C" {

void* bpe_new() { return new Engine(); }

void bpe_free(void* h) { delete static_cast<Engine*>(h); }

void bpe_add_token(void* h, const char* utf8, int id) {
    static_cast<Engine*>(h)->vocab.emplace(utf8, id);
}

void bpe_add_merge(void* h, const char* a, const char* b, int rank) {
    static_cast<Engine*>(h)->ranks.emplace(std::make_pair(a, b), rank);
}

int bpe_encode_word(void* h, const char* utf8_word, int* out_ids,
                    int max_out) {
    Engine* e = static_cast<Engine*>(h);

    auto cached = e->cache.find(utf8_word);
    if (cached != e->cache.end()) {
        int n = static_cast<int>(cached->second.size());
        if (n > max_out) n = max_out;
        std::memcpy(out_ids, cached->second.data(), n * sizeof(int));
        return n;
    }

    std::vector<std::string> word;
    utf8_split(utf8_word, word);
    if (word.empty()) return 0;

    // rank-greedy merging: find the lowest-rank adjacent pair, merge all
    // its occurrences, repeat (identical to the HF BPE word algorithm)
    while (word.size() > 1) {
        int best_rank = INT32_MAX;
        size_t best_i = 0;
        for (size_t i = 0; i + 1 < word.size(); ++i) {
            auto it = e->ranks.find({word[i], word[i + 1]});
            if (it != e->ranks.end() && it->second < best_rank) {
                best_rank = it->second;
                best_i = i;
            }
        }
        if (best_rank == INT32_MAX) break;

        const std::string first = word[best_i];
        const std::string second = word[best_i + 1];
        std::vector<std::string> merged;
        merged.reserve(word.size());
        for (size_t i = 0; i < word.size();) {
            if (i + 1 < word.size() && word[i] == first
                && word[i + 1] == second) {
                merged.emplace_back(first + second);
                i += 2;
            } else {
                merged.emplace_back(word[i]);
                i += 1;
            }
        }
        word.swap(merged);
    }

    std::vector<int> ids;
    ids.reserve(word.size());
    for (const auto& sym : word) {
        auto it = e->vocab.find(sym);
        if (it != e->vocab.end()) ids.push_back(it->second);
        // unknown symbols are dropped (BPE model has no unk token)
    }
    e->cache.emplace(utf8_word, ids);

    int n = static_cast<int>(ids.size());
    if (n > max_out) n = max_out;
    std::memcpy(out_ids, ids.data(), n * sizeof(int));
    return n;
}

}  // extern "C"

// Native PTB caption tokenizer.
//
// The reference tokenizes via a Java subprocess (Stanford CoreNLP
// PTBTokenizer, coco_caption/pycocoevalcap/tokenizer/ptbtokenizer.py:31-33,
// flags -preserveLines -lowerCase) followed by stripping a fixed punctuation
// list.  This library is the native replacement: identical rules to the
// pure-Python fallback in evalcap/tokenizer.py (Penn Treebank tokenizer.sed
// conventions), one process, multithreaded over lines.  Python binds via
// ctypes (evalcap/_native.py); parity with the Python rules is enforced by
// tests/test_native_tokenizer.py.
//
// C ABI:
//   char* sicz_ptb_tokenize_lines(const char* text, int n_threads);
//     text: '\n'-separated raw caption lines (UTF-8 passthrough).
//     returns: '\n'-separated tokenized lines (lowercased, PTB-split,
//              punctuation-stripped tokens joined by single spaces).
//     Caller frees with sicz_free().
//   void sicz_free(char* p);

#include <algorithm>
#include <cctype>
#include <cstring>
#include <regex>
#include <string>
#include <thread>
#include <unordered_set>
#include <vector>

namespace {

struct Rule {
  std::regex re;
  std::string repl;
};

// Mirrors _RULES_PRE in evalcap/tokenizer.py, same order.
const std::vector<Rule>& pre_rules() {
  static const std::vector<Rule>* rules = new std::vector<Rule>{
      {std::regex(R"rx(^")rx"), "``"},
      {std::regex(R"rx((``))rx"), " $1 "},
      {std::regex(R"rx(([ (\[{<])")rx"), "$1 `` "},
      {std::regex(R"rx(([:,])([^\d]))rx"), " $1 $2"},
      {std::regex(R"rx(([:,])$)rx"), " $1 "},
      {std::regex(R"rx(\.\.\.)rx"), " ... "},
      {std::regex(R"rx([;@#$%&])rx"), " $& "},
      {std::regex(R"rx(([^\.])(\.)([\]\)}>"']*)\s*$)rx"), "$1 $2$3 "},
      {std::regex(R"rx([?!])rx"), " $& "},
      {std::regex(R"rx(([^'])' )rx"), "$1 ' "},
      {std::regex(R"rx(\()rx"), " -LRB- "},
      {std::regex(R"rx(\))rx"), " -RRB- "},
      {std::regex(R"rx(\[)rx"), " -LSB- "},
      {std::regex(R"rx(\])rx"), " -RSB- "},
      {std::regex(R"rx(\{)rx"), " -LCB- "},
      {std::regex(R"rx(\})rx"), " -RCB- "},
      {std::regex(R"rx(--)rx"), " -- "},
      {std::regex(R"rx(")rx"), " '' "},
      {std::regex(R"rx((\S)(''))rx"), "$1 $2 "},
      {std::regex(R"rx(([^' ])('[sS]|'[mM]|'[dD]|') )rx"), "$1 $2 "},
      {std::regex(R"rx(([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) )rx"), "$1 $2 "},
  };
  return *rules;
}

const std::vector<std::regex>& contraction_rules() {
  static const std::vector<std::regex>* rules = new std::vector<std::regex>{
      std::regex(R"rx(\b(can)(not)\b)rx", std::regex::icase),
      std::regex(R"rx(\b(d)('ye)\b)rx", std::regex::icase),
      std::regex(R"rx(\b(gim)(me)\b)rx", std::regex::icase),
      std::regex(R"rx(\b(gon)(na)\b)rx", std::regex::icase),
      std::regex(R"rx(\b(got)(ta)\b)rx", std::regex::icase),
      std::regex(R"rx(\b(lem)(me)\b)rx", std::regex::icase),
      std::regex(R"rx(\b(more)('n)\b)rx", std::regex::icase),
      std::regex(R"rx(\b(wan)(na)(?=\s))rx", std::regex::icase),
  };
  return *rules;
}

// coco_caption punctuation strip list (ptbtokenizer.py:24-25).
const std::unordered_set<std::string>& punct_set() {
  static const std::unordered_set<std::string>* s =
      new std::unordered_set<std::string>{
          "''", "'",  "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
          ".",  "?",  "!",  ",", ":",     "-",     "--",    "...",  ";"};
  return *s;
}

std::string strip(const std::string& s) {
  size_t a = s.find_first_not_of(" \t\r\n");
  if (a == std::string::npos) return "";
  size_t b = s.find_last_not_of(" \t\r\n");
  return s.substr(a, b - a + 1);
}

std::string tokenize_line(const std::string& raw) {
  std::string text = " " + strip(raw) + " ";
  for (const Rule& r : pre_rules()) {
    text = std::regex_replace(text, r.re, r.repl);
  }
  for (const std::regex& re : contraction_rules()) {
    text = std::regex_replace(text, re, " $1 $2 ");
  }
  // split on whitespace, lowercase, drop punctuation tokens
  std::string out;
  size_t i = 0, n = text.size();
  while (i < n) {
    while (i < n && std::isspace(static_cast<unsigned char>(text[i]))) ++i;
    size_t j = i;
    while (j < n && !std::isspace(static_cast<unsigned char>(text[j]))) ++j;
    if (j > i) {
      std::string tok = text.substr(i, j - i);
      std::transform(tok.begin(), tok.end(), tok.begin(), [](unsigned char c) {
        return static_cast<char>(std::tolower(c));
      });
      if (!punct_set().count(tok)) {
        if (!out.empty()) out += ' ';
        out += tok;
      }
    }
    i = j;
  }
  return out;
}

}  // namespace

extern "C" {

char* sicz_ptb_tokenize_lines(const char* text, int n_threads) {
  std::vector<std::string> lines;
  {
    const char* p = text;
    const char* start = p;
    for (;; ++p) {
      if (*p == '\n' || *p == '\0') {
        lines.emplace_back(start, p - start);
        if (*p == '\0') break;
        start = p + 1;
      }
    }
  }
  std::vector<std::string> results(lines.size());
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int workers = n_threads > 0 ? n_threads : (hw > 0 ? hw : 4);
  workers = std::min<int>(workers, static_cast<int>(lines.size()) > 0
                                       ? static_cast<int>(lines.size())
                                       : 1);
  if (workers <= 1) {
    for (size_t i = 0; i < lines.size(); ++i)
      results[i] = tokenize_line(lines[i]);
  } else {
    std::vector<std::thread> pool;
    pool.reserve(workers);
    for (int w = 0; w < workers; ++w) {
      pool.emplace_back([&, w]() {
        for (size_t i = w; i < lines.size(); i += workers)
          results[i] = tokenize_line(lines[i]);
      });
    }
    for (auto& t : pool) t.join();
  }
  std::string joined;
  for (size_t i = 0; i < results.size(); ++i) {
    if (i) joined += '\n';
    joined += results[i];
  }
  char* out = static_cast<char*>(std::malloc(joined.size() + 1));
  std::memcpy(out, joined.c_str(), joined.size() + 1);
  return out;
}

void sicz_free(char* p) { std::free(p); }

}  // extern "C"

// Batch JSON insert shredder: the native data-loader hot path.
//
// Parses a JSON array of flat records and shreds it into typed
// columnar buffers in one pass — the role the reference's C++ insert
// path plays (reference: db/table_service.cc:883-897 groups records
// into ShreddedRecordList column batches; util/json/ is the C++ JSON
// parser; io/cstable/RecordShredder.cc does the typed conversion).
//
// Semantics contract: byte-for-byte the Python slow path
// (eventql_tpu/db/table_service.py insert_json → _from_json → _coerce),
// verified by tests/test_native_insert.py. Any input whose conversion
// the C++ cannot PROVE matches Python (huge ints, inf/nan/underscore
// float syntax, non-ASCII numerics, nested values, float→string
// formatting) returns EVQL_SHRED_FALLBACK and the caller re-runs the
// batch through the Python path. Genuine user errors (unknown column,
// non-convertible string) return EVQL_SHRED_ERROR with the row index
// and Python's exact message; rows before it are delivered so the
// caller can preserve insert-up-to-error semantics.
//
// Exposed through a plain C ABI consumed via ctypes
// (eventql_tpu/columnar/native.py). Build: make -C native.

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// SType codes (eventql_tpu/core/types.py)
enum {
  T_NIL = 0,
  T_UINT64 = 1,
  T_INT64 = 2,
  T_FLOAT64 = 3,
  T_BOOL = 4,
  T_STRING = 5,
  T_TIMESTAMP64 = 6,
};

enum { OK = 0, ROW_ERROR = 1, FALLBACK = 2, BAD_INPUT = 3 };

struct ColBuf {
  uint32_t type;
  std::string name;
  std::vector<uint64_t> num;      // numeric payloads (bit patterns)
  std::vector<uint8_t> valid;
  std::vector<uint32_t> stroff;   // string offsets (nrows+1)
  std::string strbytes;
};

struct Shred {
  int status = OK;
  uint64_t nrows = 0;  // fully shredded rows (before any error row)
  std::string error;
  std::vector<ColBuf> cols;
};

// ---- JSON scanner ----------------------------------------------------
struct P {
  const char* s;
  const char* end;
  bool fallback = false;  // saw something only Python should decide

  bool eof() const { return s >= end; }
  void ws() {
    while (s < end &&
           (*s == ' ' || *s == '\t' || *s == '\n' || *s == '\r'))
      ++s;
  }
};

// decode a JSON string (after the opening quote) into out as UTF-8;
// returns false on malformed input
bool parse_string(P& p, std::string& out) {
  out.clear();
  while (!p.eof()) {
    unsigned char c = *p.s++;
    if (c == '"') return true;
    if (c == '\\') {
      if (p.eof()) return false;
      char e = *p.s++;
      switch (e) {
        case '"': out += '"'; break;
        case '\\': out += '\\'; break;
        case '/': out += '/'; break;
        case 'b': out += '\b'; break;
        case 'f': out += '\f'; break;
        case 'n': out += '\n'; break;
        case 'r': out += '\r'; break;
        case 't': out += '\t'; break;
        case 'u': {
          if (p.end - p.s < 4) return false;
          unsigned int cp = 0;
          for (int i = 0; i < 4; ++i) {
            char h = p.s[i];
            cp <<= 4;
            if (h >= '0' && h <= '9') cp |= h - '0';
            else if (h >= 'a' && h <= 'f') cp |= h - 'a' + 10;
            else if (h >= 'A' && h <= 'F') cp |= h - 'A' + 10;
            else return false;
          }
          p.s += 4;
          if (cp >= 0xD800 && cp <= 0xDBFF) {  // surrogate pair
            if (p.end - p.s < 6 || p.s[0] != '\\' || p.s[1] != 'u')
              return false;
            p.s += 2;
            unsigned int lo = 0;
            for (int i = 0; i < 4; ++i) {
              char h = p.s[i];
              lo <<= 4;
              if (h >= '0' && h <= '9') lo |= h - '0';
              else if (h >= 'a' && h <= 'f') lo |= h - 'a' + 10;
              else if (h >= 'A' && h <= 'F') lo |= h - 'A' + 10;
              else return false;
            }
            p.s += 4;
            if (lo < 0xDC00 || lo > 0xDFFF) return false;
            cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
          }
          // UTF-8 encode
          if (cp < 0x80) out += char(cp);
          else if (cp < 0x800) {
            out += char(0xC0 | (cp >> 6));
            out += char(0x80 | (cp & 0x3F));
          } else if (cp < 0x10000) {
            out += char(0xE0 | (cp >> 12));
            out += char(0x80 | ((cp >> 6) & 0x3F));
            out += char(0x80 | (cp & 0x3F));
          } else {
            out += char(0xF0 | (cp >> 18));
            out += char(0x80 | ((cp >> 12) & 0x3F));
            out += char(0x80 | ((cp >> 6) & 0x3F));
            out += char(0x80 | (cp & 0x3F));
          }
          break;
        }
        default:
          return false;
      }
    } else {
      out += char(c);
    }
  }
  return false;
}

// a scanned JSON scalar value
struct Val {
  enum Kind { NUL, BOOL, INT, FLOAT, STR, COMPLEX } kind = NUL;
  bool b = false;
  int64_t i = 0;       // INT payload (sign-extended)
  bool i_negative = false;
  uint64_t u = 0;      // INT payload magnitude handling via i/u
  double f = 0;
  std::string s;
};

// skip a nested value (object/array) — marks the row COMPLEX
bool skip_value(P& p);

bool skip_object(P& p) {
  // p.s just after '{'
  p.ws();
  if (!p.eof() && *p.s == '}') { ++p.s; return true; }
  for (;;) {
    p.ws();
    if (p.eof() || *p.s != '"') return false;
    ++p.s;
    std::string k;
    if (!parse_string(p, k)) return false;
    p.ws();
    if (p.eof() || *p.s != ':') return false;
    ++p.s;
    if (!skip_value(p)) return false;
    p.ws();
    if (p.eof()) return false;
    if (*p.s == ',') { ++p.s; continue; }
    if (*p.s == '}') { ++p.s; return true; }
    return false;
  }
}

bool skip_array(P& p) {
  p.ws();
  if (!p.eof() && *p.s == ']') { ++p.s; return true; }
  for (;;) {
    if (!skip_value(p)) return false;
    p.ws();
    if (p.eof()) return false;
    if (*p.s == ',') { ++p.s; continue; }
    if (*p.s == ']') { ++p.s; return true; }
    return false;
  }
}

bool parse_number(P& p, Val& v) {
  const char* start = p.s;
  if (!p.eof() && *p.s == '-') ++p.s;
  while (!p.eof() && isdigit((unsigned char)*p.s)) ++p.s;
  bool is_float = false;
  if (!p.eof() && *p.s == '.') {
    is_float = true;
    ++p.s;
    while (!p.eof() && isdigit((unsigned char)*p.s)) ++p.s;
  }
  if (!p.eof() && (*p.s == 'e' || *p.s == 'E')) {
    is_float = true;
    ++p.s;
    if (!p.eof() && (*p.s == '+' || *p.s == '-')) ++p.s;
    while (!p.eof() && isdigit((unsigned char)*p.s)) ++p.s;
  }
  size_t lit_len = size_t(p.s - start);
  if (lit_len == 0 || (lit_len == 1 && start[0] == '-')) return false;
  if (is_float) {
    // stack copy for the NUL strtod needs — no heap allocation on the
    // per-field hot path (measured: the std::string ctor per number
    // was a visible share of the 0.87 us/row shred wall)
    char buf[40];
    if (lit_len >= sizeof(buf)) { p.fallback = true; return true; }
    memcpy(buf, start, lit_len);
    buf[lit_len] = 0;
    v.kind = Val::FLOAT;
    v.f = strtod(buf, nullptr);
    if (!std::isfinite(v.f)) p.fallback = true;  // Python keeps precision
  } else {
    // integer literal: Python is arbitrary-precision — only accept
    // what provably fits (and therefore converts identically).
    // Inline digit accumulation (no strtoull, no allocation): a
    // magnitude of <= 19 digits always fits u64; anything longer
    // punts to Python.
    const char* q = start;
    bool neg = (*q == '-');
    if (neg) ++q;
    size_t nd = size_t(p.s - q);
    if (nd > 19) { p.fallback = true; }
    unsigned long long x = 0;
    for (const char* d = q; d < p.s; ++d) x = x * 10 + (*d - '0');
    v.kind = Val::INT;
    v.i_negative = neg;
    if (neg) {
      if (x > 9223372036854775807ull) { p.fallback = true; }
      v.i = -(long long)x;
    } else {
      v.u = x;
      v.i = (int64_t)x;
    }
  }
  return true;
}

bool parse_value(P& p, Val& v) {
  p.ws();
  if (p.eof()) return false;
  char c = *p.s;
  if (c == '"') {
    ++p.s;
    v.kind = Val::STR;
    return parse_string(p, v.s);
  }
  if (c == '{') {
    ++p.s;
    v.kind = Val::COMPLEX;
    return skip_object(p);
  }
  if (c == '[') {
    ++p.s;
    v.kind = Val::COMPLEX;
    return skip_array(p);
  }
  if (c == 't') {
    if (p.end - p.s < 4 || memcmp(p.s, "true", 4)) return false;
    p.s += 4;
    v.kind = Val::BOOL;
    v.b = true;
    return true;
  }
  if (c == 'f') {
    if (p.end - p.s < 5 || memcmp(p.s, "false", 5)) return false;
    p.s += 5;
    v.kind = Val::BOOL;
    v.b = false;
    return true;
  }
  if (c == 'n') {
    if (p.end - p.s < 4 || memcmp(p.s, "null", 4)) return false;
    p.s += 4;
    v.kind = Val::NUL;
    return true;
  }
  return parse_number(p, v);
}

bool skip_value(P& p) {
  Val v;
  return parse_value(p, v);
}

// ---- string → number classification ---------------------------------
// Python: float(s or 0). Returns: 0 = parsed (out set), 1 = Python
// would raise ValueError, 2 = only Python should decide (fallback).
int str_to_double(const std::string& s, double& out) {
  // Python float() strips ASCII whitespace; non-ASCII anything → punt
  size_t a = 0, b = s.size();
  for (char c : s)
    if ((unsigned char)c >= 0x80) return 2;
  while (a < b && strchr(" \t\n\r\f\v", s[a])) ++a;
  while (b > a && strchr(" \t\n\r\f\v", s[b - 1])) --b;
  std::string t = s.substr(a, b - a);
  if (t.empty()) {
    if (s.empty()) { out = 0.0; return 0; }  // float(0) — empty payload
    return 1;  // whitespace-only: float("  ") raises
  }
  // chars outside the strict float alphabet: could be inf/nan/hex/
  // underscores — Python semantics differ, punt
  for (char c : t)
    if (!strchr("0123456789+-.eE", c)) return 1 + (isalpha((unsigned char)c) || c == '_');
  // strict float literal: [+-]? (d+[.d*] | .d+) ([eE][+-]?d+)?
  size_t i = 0;
  if (t[i] == '+' || t[i] == '-') ++i;
  size_t digits = 0;
  while (i < t.size() && isdigit((unsigned char)t[i])) { ++i; ++digits; }
  if (i < t.size() && t[i] == '.') {
    ++i;
    while (i < t.size() && isdigit((unsigned char)t[i])) { ++i; ++digits; }
  }
  if (digits == 0) return 1;
  if (i < t.size() && (t[i] == 'e' || t[i] == 'E')) {
    ++i;
    if (i < t.size() && (t[i] == '+' || t[i] == '-')) ++i;
    size_t ed = 0;
    while (i < t.size() && isdigit((unsigned char)t[i])) { ++i; ++ed; }
    if (ed == 0) return 1;
  }
  if (i != t.size()) return 1;
  out = strtod(t.c_str(), nullptr);
  if (!std::isfinite(out)) return 2;  // overflow to inf: punt
  return 0;
}

const char* type_name(uint32_t t) {
  switch (t) {
    case T_UINT64: return "UINT64";
    case T_FLOAT64: return "FLOAT64";
    case T_BOOL: return "BOOL";
    case T_STRING: return "STRING";
    case T_TIMESTAMP64: return "TIMESTAMP64";
    default: return "?";
  }
}

// append one converted value; returns OK / ROW_ERROR (err set) /
// FALLBACK
int append_value(ColBuf& col, const Val& v, std::string& err) {
  auto push_num = [&](uint64_t bits, bool ok) {
    col.num.push_back(ok ? bits : 0);
    col.valid.push_back(ok ? 1 : 0);
    col.stroff.push_back((uint32_t)col.strbytes.size());
  };
  auto push_str = [&](const std::string& s, bool ok) {
    col.num.push_back(0);
    col.valid.push_back(ok ? 1 : 0);
    if (ok) col.strbytes += s;
    col.stroff.push_back((uint32_t)col.strbytes.size());
  };
  auto conv_error = [&](const std::string& shown) {
    err = "can't convert " + shown + " to " + type_name(col.type);
    return ROW_ERROR;
  };

  if (v.kind == Val::NUL) {
    if (col.type == T_STRING) push_str("", false);
    else push_num(0, false);
    return OK;
  }
  if (v.kind == Val::COMPLEX) return FALLBACK;

  switch (col.type) {
    case T_UINT64:
    case T_TIMESTAMP64: {
      if (v.kind == Val::BOOL) { push_num(v.b ? 1 : 0, true); return OK; }
      if (v.kind == Val::INT) {
        // wrap_u64 of the (possibly negative) int
        push_num(v.i_negative ? (uint64_t)v.i : v.u, true);
        return OK;
      }
      if (v.kind == Val::FLOAT) {
        // int(float): truncate toward zero, then wrap
        if (!std::isfinite(v.f) || std::fabs(v.f) >= 1.8446744073709552e19)
          return FALLBACK;  // Python big-int wrap beyond u64 range
        double t = std::trunc(v.f);
        uint64_t bits;
        if (t < 0) bits = (uint64_t)(int64_t)t;
        else bits = (uint64_t)t;
        push_num(bits, true);
        return OK;
      }
      // string: float(s or 0) then int() then wrap
      double d;
      int rc = str_to_double(v.s, d);
      if (rc == 2) return FALLBACK;
      if (rc == 1) return conv_error(v.s);
      if (std::fabs(d) >= 1.8446744073709552e19) return FALLBACK;
      double t = std::trunc(d);
      push_num(t < 0 ? (uint64_t)(int64_t)t : (uint64_t)t, true);
      return OK;
    }
    case T_FLOAT64: {
      double d;
      if (v.kind == Val::BOOL) d = v.b ? 1.0 : 0.0;
      else if (v.kind == Val::INT)
        d = v.i_negative ? (double)v.i : (double)v.u;
      else if (v.kind == Val::FLOAT) d = v.f;
      else {
        int rc = str_to_double(v.s, d);
        if (rc == 2) return FALLBACK;
        if (rc == 1) return conv_error(v.s);
      }
      uint64_t bits;
      memcpy(&bits, &d, 8);
      push_num(bits, true);
      return OK;
    }
    case T_BOOL: {
      if (v.kind == Val::BOOL) { push_num(v.b ? 1 : 0, true); return OK; }
      if (v.kind == Val::INT) {
        push_num((v.i_negative ? v.i != 0 : v.u != 0) ? 1 : 0, true);
        return OK;
      }
      if (v.kind == Val::FLOAT) { push_num(v.f != 0 ? 1 : 0, true); return OK; }
      // string payload == b"true" (table_service.py _coerce)
      push_num(v.s == "true" ? 1 : 0, true);
      return OK;
    }
    case T_STRING: {
      if (v.kind == Val::STR) { push_str(v.s, true); return OK; }
      if (v.kind == Val::BOOL) { push_str(v.b ? "true" : "false", true); return OK; }
      if (v.kind == Val::INT) {
        char buf[32];
        if (v.i_negative) snprintf(buf, sizeof(buf), "%lld", (long long)v.i);
        else snprintf(buf, sizeof(buf), "%llu", (unsigned long long)v.u);
        push_str(buf, true);
        return OK;
      }
      // float → string: Python's formatting, punt
      return FALLBACK;
    }
    default:
      return FALLBACK;  // INT64 / NIL targets: Python decides
  }
}

// ---- one-record shredding (shared by the array and the wire-frame
// drivers) -------------------------------------------------------------

// Parse ONE JSON object from p and append it to out's columns.
// Returns OK (row appended, out->nrows bumped) or ROW_ERROR/FALLBACK/
// BAD_INPUT (no partial row left behind).
static int shred_one_record(
    P& p, Shred* out,
    const std::unordered_map<std::string, uint32_t>& index,
    std::vector<Val>& rowvals, std::vector<uint8_t>& present,
    std::vector<uint32_t>& row_order) {
  uint32_t ncols = (uint32_t)out->cols.size();
  p.ws();
  if (p.eof() || *p.s != '{') return BAD_INPUT;
  ++p.s;
  std::fill(present.begin(), present.end(), 0);
  row_order.clear();
  p.ws();
  bool empty_obj = (!p.eof() && *p.s == '}');
  if (empty_obj) ++p.s;
  std::string key;  // reused across fields: keeps its capacity
  Val v;
  while (!empty_obj) {
    p.ws();
    if (p.eof() || *p.s != '"') return BAD_INPUT;
    ++p.s;
    key.clear();
    if (!parse_string(p, key)) return BAD_INPUT;
    p.ws();
    if (p.eof() || *p.s != ':') return BAD_INPUT;
    ++p.s;
    auto it = index.find(key);
    if (it == index.end()) {
      out->error = "column not found: '" + key + "'";
      return ROW_ERROR;
    }
    v = Val();
    if (!parse_value(p, v)) return BAD_INPUT;
    rowvals[it->second] = v;  // duplicate key: last wins
    if (!present[it->second]) row_order.push_back(it->second);
    present[it->second] = 1;
    p.ws();
    if (p.eof()) return BAD_INPUT;
    if (*p.s == ',') { ++p.s; continue; }
    if (*p.s == '}') { ++p.s; break; }
    return BAD_INPUT;
  }
  if (p.fallback) return FALLBACK;
  // convert in JSON key order (error parity with the Python path),
  // then nulls for missing columns
  std::string err;
  int rc = OK;
  std::vector<uint32_t> done_cols;
  for (uint32_t c : row_order) {
    rc = append_value(out->cols[c], rowvals[c], err);
    if (rc != OK) break;
    done_cols.push_back(c);
  }
  if (rc == OK) {
    Val nullv;
    for (uint32_t c = 0; c < ncols; ++c) {
      if (present[c]) continue;
      append_value(out->cols[c], nullv, err);  // null never fails
      done_cols.push_back(c);
    }
  }
  if (rc != OK) {
    for (uint32_t c : done_cols) {  // roll the partial row back
      ColBuf& col = out->cols[c];
      col.num.pop_back();
      col.valid.pop_back();
      col.stroff.pop_back();
      col.strbytes.resize(col.stroff.back());
    }
    out->error = err;
    return rc == FALLBACK ? FALLBACK : ROW_ERROR;
  }
  ++out->nrows;
  return OK;
}

// ---- SHA-1 (record ids) ----------------------------------------------
// Compact from-scratch SHA-1 (FIPS 180-1) for primary-key record ids —
// ids must equal hashlib.sha1 over the same wire bytes so replication
// pushes and local inserts agree on identity.

static void sha1_digest(const uint8_t* data, size_t len, uint8_t out[20]) {
  uint32_t h0 = 0x67452301u, h1 = 0xEFCDAB89u, h2 = 0x98BADCFEu,
           h3 = 0x10325476u, h4 = 0xC3D2E1F0u;
  uint64_t total_bits = (uint64_t)len * 8;
  // message + 0x80 + zeros + 8-byte length, in 64-byte blocks
  size_t padded = ((len + 8) / 64 + 1) * 64;
  std::vector<uint8_t> buf(padded, 0);
  memcpy(buf.data(), data, len);
  buf[len] = 0x80;
  for (int i = 0; i < 8; ++i)
    buf[padded - 1 - i] = (uint8_t)(total_bits >> (8 * i));
  uint32_t w[80];
  for (size_t off = 0; off < padded; off += 64) {
    const uint8_t* b = buf.data() + off;
    for (int t = 0; t < 16; ++t)
      w[t] = ((uint32_t)b[4 * t] << 24) | ((uint32_t)b[4 * t + 1] << 16) |
             ((uint32_t)b[4 * t + 2] << 8) | (uint32_t)b[4 * t + 3];
    for (int t = 16; t < 80; ++t) {
      uint32_t x = w[t - 3] ^ w[t - 8] ^ w[t - 14] ^ w[t - 16];
      w[t] = (x << 1) | (x >> 31);
    }
    uint32_t a = h0, bb = h1, c = h2, d = h3, e = h4;
    for (int t = 0; t < 80; ++t) {
      uint32_t f, k;
      if (t < 20) {
        f = (bb & c) | ((~bb) & d);
        k = 0x5A827999u;
      } else if (t < 40) {
        f = bb ^ c ^ d;
        k = 0x6ED9EBA1u;
      } else if (t < 60) {
        f = (bb & c) | (bb & d) | (c & d);
        k = 0x8F1BBCDCu;
      } else {
        f = bb ^ c ^ d;
        k = 0xCA62C1D6u;
      }
      uint32_t tmp = ((a << 5) | (a >> 27)) + f + e + k + w[t];
      e = d;
      d = c;
      c = (bb << 30) | (bb >> 2);
      bb = a;
      a = tmp;
    }
    h0 += a; h1 += bb; h2 += c; h3 += d; h4 += e;
  }
  uint32_t hs[5] = {h0, h1, h2, h3, h4};
  for (int i = 0; i < 5; ++i) {
    out[4 * i] = (uint8_t)(hs[i] >> 24);
    out[4 * i + 1] = (uint8_t)(hs[i] >> 16);
    out[4 * i + 2] = (uint8_t)(hs[i] >> 8);
    out[4 * i + 3] = (uint8_t)hs[i];
  }
}

}  // namespace

extern "C" {

// Parse + shred a JSON array of flat records.
//   json/len   — the array bytes
//   ncols      — column count
//   names/types — flat schema (SType codes)
// Returns an opaque handle; inspect with the getters below.
void* evql_json_shred(
    const char* json, uint64_t len,
    uint32_t ncols, const char* const* names, const uint32_t* types) {
  Shred* out = new Shred();
  out->cols.resize(ncols);
  std::unordered_map<std::string, uint32_t> index;
  for (uint32_t i = 0; i < ncols; ++i) {
    out->cols[i].type = types[i];
    out->cols[i].name = names[i];
    out->cols[i].stroff.push_back(0);
    index.emplace(names[i], i);
  }

  P p{json, json + len};
  p.ws();
  if (p.eof() || *p.s != '[') {
    out->status = BAD_INPUT;
    return out;
  }
  ++p.s;
  p.ws();

  std::vector<Val> rowvals(ncols);
  std::vector<uint8_t> present(ncols);
  std::vector<uint32_t> row_order;  // JSON key order (error parity)

  if (!p.eof() && *p.s == ']') {
    ++p.s;
    return out;  // empty array
  }

  for (;;) {
    int rc = shred_one_record(p, out, index, rowvals, present, row_order);
    if (rc != OK) {
      out->status = rc;
      return out;
    }
    p.ws();
    if (p.eof()) {
      out->status = BAD_INPUT;
      return out;
    }
    if (*p.s == ',') { ++p.s; continue; }
    if (*p.s == ']') { ++p.s; break; }
    out->status = BAD_INPUT;
    return out;
  }
  // trailing content after the closing ']' is invalid JSON — the
  // Python path must decide (and raise) for the whole batch
  p.ws();
  if (!p.eof()) {
    out->status = BAD_INPUT;
  }
  return out;
}

// Shred `count` lenenc-framed JSON records straight from a native-
// protocol INSERT frame body (varint record length + record bytes,
// repeated — reference: transport/native/frames/insert.cc). Unlike
// the array driver, an error or fallback mid-stream leaves the rows
// BEFORE it fully shredded (status + nrows tell the caller where to
// resume with the Python path), matching the reference's per-record
// insert loop semantics.
void* evql_records_shred(
    const char* buf, uint64_t len, uint64_t count,
    uint32_t ncols, const char* const* names, const uint32_t* types) {
  Shred* out = new Shred();
  out->cols.resize(ncols);
  std::unordered_map<std::string, uint32_t> index;
  for (uint32_t i = 0; i < ncols; ++i) {
    out->cols[i].type = types[i];
    out->cols[i].name = names[i];
    out->cols[i].stroff.push_back(0);
    index.emplace(names[i], i);
  }
  std::vector<Val> rowvals(ncols);
  std::vector<uint8_t> present(ncols);
  std::vector<uint32_t> row_order;

  const char* s = buf;
  const char* end = buf + len;
  for (uint64_t r = 0; r < count; ++r) {
    uint64_t rl = 0;
    int shift = 0;
    for (;;) {
      if (s >= end) { out->status = BAD_INPUT; return out; }
      uint8_t b = (uint8_t)*s++;
      rl |= (uint64_t)(b & 0x7f) << shift;
      shift += 7;
      if (!(b & 0x80)) break;
    }
    if ((uint64_t)(end - s) < rl) { out->status = BAD_INPUT; return out; }
    P p{s, s + rl};
    int rc = shred_one_record(p, out, index, rowvals, present, row_order);
    if (rc == OK) {
      p.ws();
      if (!p.eof()) rc = BAD_INPUT;  // junk after the record object
    }
    if (rc != OK) {
      out->status = rc;
      return out;  // nrows rows stand; caller resumes at record nrows
    }
    s += rl;
  }
  return out;
}

// Primary-key record ids for every shredded row: SHA1 of the
// NUL-joined wire strings of the pk columns — bit-identical to
// table_service._batch_record_ids / shredded_record_list.from_relation.
// Returns 1 and fills out (nrows*20 bytes) on success; 0 when a pk
// column's type has no native wire encoding (FLOAT64: Python computes).
int evql_shred_rids(
    void* h, uint32_t npk, const uint32_t* pk_cols, uint8_t* out20) {
  Shred* sh = (Shred*)h;
  for (uint32_t i = 0; i < npk; ++i) {
    uint32_t t = sh->cols[pk_cols[i]].type;
    if (t != T_UINT64 && t != T_TIMESTAMP64 && t != T_STRING &&
        t != T_BOOL)
      return 0;
  }
  std::string wire;
  char numbuf[24];
  for (uint64_t r = 0; r < sh->nrows; ++r) {
    wire.clear();
    for (uint32_t i = 0; i < npk; ++i) {
      if (i) wire.push_back('\0');
      const ColBuf& col = sh->cols[pk_cols[i]];
      if (!col.valid[r]) continue;  // NULL pk component → empty
      switch (col.type) {
        case T_STRING:
          wire.append(col.strbytes.data() + col.stroff[r],
                      col.stroff[r + 1] - col.stroff[r]);
          break;
        case T_BOOL:
          wire.append(col.num[r] ? "true" : "false");
          break;
        default: {  // UINT64 / TIMESTAMP64: decimal, str(int) parity
          int n = snprintf(numbuf, sizeof(numbuf), "%llu",
                           (unsigned long long)col.num[r]);
          wire.append(numbuf, (size_t)n);
        }
      }
    }
    sha1_digest((const uint8_t*)wire.data(), wire.size(), out20 + 20 * r);
  }
  return 1;
}

int evql_shred_status(void* h) { return ((Shred*)h)->status; }
uint64_t evql_shred_nrows(void* h) { return ((Shred*)h)->nrows; }
const char* evql_shred_error(void* h) { return ((Shred*)h)->error.c_str(); }
const uint64_t* evql_shred_num(void* h, uint32_t col) {
  return ((Shred*)h)->cols[col].num.data();
}
const uint8_t* evql_shred_valid(void* h, uint32_t col) {
  return ((Shred*)h)->cols[col].valid.data();
}
const uint32_t* evql_shred_stroff(void* h, uint32_t col) {
  return ((Shred*)h)->cols[col].stroff.data();
}
const uint8_t* evql_shred_strbytes(void* h, uint32_t col) {
  return (const uint8_t*)((Shred*)h)->cols[col].strbytes.data();
}
void evql_shred_free(void* h) { delete (Shred*)h; }

}  // extern "C"

// Native FASTA/FASTQ reader + 2-bit encoder (components C1/C2, SURVEY.md §2).
//
// The reference implements its sequence IO in C++ (kseq-style streaming
// parser; reference source unavailable at survey time — SURVEY.md §0); this
// is the TPU framework's native equivalent: it feeds the host→device code
// pipeline at memory bandwidth instead of Python line-loop speed.
//
// Contract (must match miekki_tpu/io/reader.py + encode.py bit-for-bit,
// property-tested from tests/test_native_io.py):
//   * gzip detected by magic bytes (0x1f 0x8b), not extension; zlib inflate.
//   * FASTA: '>' header lines; sequence lines joined; name = first token.
//   * FASTQ: 4-line records; '+' line required; qual length == seq length.
//   * encode: A/a=0 C/c=1 G/g=2 T/t=3, everything else = 4 (INVALID_CODE).
//
// C ABI (ctypes-friendly, no C++ types across the boundary):
//   mio_parse_file(path, &result) -> 0 on success, negative error code.
//   result owns three buffers freed by mio_free().

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

constexpr uint8_t kInvalid = 4;

struct Lut {
  uint8_t v[256];
  constexpr Lut() : v{} {
    for (int i = 0; i < 256; ++i) v[i] = kInvalid;
    v['A'] = v['a'] = 0;
    v['C'] = v['c'] = 1;
    v['G'] = v['g'] = 2;
    v['T'] = v['t'] = 3;
  }
};
constexpr Lut kLut;

// Error codes (mirrored in miekki_tpu/io/native.py).
enum {
  kOk = 0,
  kErrOpen = -1,
  kErrGzip = -2,
  kErrFormat = -3,     // unrecognized leading byte
  kErrFastq = -4,      // malformed FASTQ record
  kErrAlloc = -5,
};

int read_all(const char* path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return kErrOpen;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (sz < 0) { std::fclose(f); return kErrOpen; }
  out.resize(static_cast<size_t>(sz));
  size_t got = sz ? std::fread(out.data(), 1, out.size(), f) : 0;
  std::fclose(f);
  if (got != out.size()) return kErrOpen;
  return kOk;
}

int gunzip(const std::vector<uint8_t>& in, std::vector<uint8_t>& out) {
  z_stream zs{};
  if (inflateInit2(&zs, 15 + 32) != Z_OK) return kErrGzip;  // gzip+zlib
  out.clear();
  out.reserve(in.size() * 4);
  std::vector<uint8_t> buf(1 << 20);
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  int ret = Z_OK;
  do {
    zs.next_out = buf.data();
    zs.avail_out = static_cast<uInt>(buf.size());
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return kErrGzip;
    }
    out.insert(out.end(), buf.data(), buf.data() + (buf.size() - zs.avail_out));
    // concatenated gzip members: restart inflate on trailing input
    if (ret == Z_STREAM_END && zs.avail_in > 0) {
      if (inflateReset2(&zs, 15 + 32) != Z_OK) {
        inflateEnd(&zs);
        return kErrGzip;
      }
      ret = Z_OK;
    }
  } while (ret != Z_STREAM_END && (zs.avail_in > 0 || zs.avail_out == 0));
  inflateEnd(&zs);
  // A truncated stream leaves inflate at Z_OK with no input left; treat it
  // as an error (the Python reader raises EOFError on the same bytes) —
  // silently returning partial data would produce wrong sketches.
  return ret == Z_STREAM_END ? kOk : kErrGzip;
}

struct Parsed {
  std::vector<uint8_t> codes;     // concatenated record codes
  std::vector<uint64_t> offsets;  // n_records + 1 boundaries into codes
  std::string names;              // NUL-separated record names
  uint64_t n_records = 0;
};

inline const uint8_t* find_nl(const uint8_t* p, const uint8_t* end) {
  const void* nl = memchr(p, '\n', static_cast<size_t>(end - p));
  return nl ? static_cast<const uint8_t*>(nl) : end;
}

inline void encode_line(const uint8_t* p, const uint8_t* e,
                        std::vector<uint8_t>& out) {
  if (e > p && e[-1] == '\r') --e;
  size_t base = out.size();
  out.resize(base + static_cast<size_t>(e - p));
  uint8_t* dst = out.data() + base;
  for (; p != e; ++p) *dst++ = kLut.v[*p];
}

inline void push_name(const uint8_t* p, const uint8_t* e, std::string& names) {
  if (e > p && e[-1] == '\r') --e;
  const uint8_t* q = p;
  while (q != e && *q != ' ' && *q != '\t') ++q;  // first token
  names.append(reinterpret_cast<const char*>(p), static_cast<size_t>(q - p));
  names.push_back('\0');
}

int parse_fasta(const uint8_t* p, const uint8_t* end, Parsed& out) {
  bool in_record = false;
  while (p < end) {
    const uint8_t* nl = find_nl(p, end);
    if (*p == '>') {
      if (in_record) out.offsets.push_back(out.codes.size());
      push_name(p + 1, nl, out.names);
      ++out.n_records;
      in_record = true;
    } else if (in_record && nl > p) {
      encode_line(p, nl, out.codes);
    }
    p = nl + 1;
  }
  if (in_record) out.offsets.push_back(out.codes.size());
  return kOk;
}

int parse_fastq(const uint8_t* p, const uint8_t* end, Parsed& out) {
  while (p < end) {
    const uint8_t* nl = find_nl(p, end);
    if (nl == p) { p = nl + 1; continue; }  // skip blank lines
    if (*p != '@') return kErrFastq;
    push_name(p + 1, nl, out.names);
    p = nl + 1;
    if (p >= end) return kErrFastq;
    nl = find_nl(p, end);
    size_t seq_begin = out.codes.size();
    encode_line(p, nl, out.codes);
    size_t seq_len = out.codes.size() - seq_begin;
    p = nl + 1;
    if (p >= end || *p != '+') return kErrFastq;
    p = find_nl(p, end) + 1;
    if (p > end) return kErrFastq;
    nl = find_nl(p, end);
    const uint8_t* qe = nl;
    if (qe > p && qe[-1] == '\r') --qe;
    if (static_cast<size_t>(qe - p) != seq_len) return kErrFastq;
    p = nl + 1;
    ++out.n_records;
    out.offsets.push_back(out.codes.size());
  }
  return kOk;
}

}  // namespace

extern "C" {

struct MioResult {
  uint8_t* codes;
  uint64_t* offsets;  // n_records + 1
  char* names;        // NUL-separated
  uint64_t n_records;
  uint64_t codes_len;
  uint64_t names_len;
};

int mio_parse_file(const char* path, MioResult* res) {
  std::vector<uint8_t> raw;
  int rc = read_all(path, raw);
  if (rc != kOk) return rc;
  std::vector<uint8_t> plain;
  const std::vector<uint8_t>* data = &raw;
  if (raw.size() >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {
    rc = gunzip(raw, plain);
    if (rc != kOk) return rc;
    data = &plain;
  }
  Parsed parsed;
  parsed.offsets.push_back(0);
  if (data->empty()) return kErrFormat;
  const uint8_t* p = data->data();
  const uint8_t* end = p + data->size();
  if (*p == '>') {
    rc = parse_fasta(p, end, parsed);
  } else if (*p == '@') {
    rc = parse_fastq(p, end, parsed);
  } else {
    return kErrFormat;
  }
  if (rc != kOk) return rc;

  res->n_records = parsed.n_records;
  res->codes_len = parsed.codes.size();
  res->names_len = parsed.names.size();
  res->codes = static_cast<uint8_t*>(std::malloc(parsed.codes.size() + 1));
  res->offsets = static_cast<uint64_t*>(
      std::malloc(sizeof(uint64_t) * parsed.offsets.size()));
  res->names = static_cast<char*>(std::malloc(parsed.names.size() + 1));
  if (!res->codes || !res->offsets || !res->names) return kErrAlloc;
  std::memcpy(res->codes, parsed.codes.data(), parsed.codes.size());
  std::memcpy(res->offsets, parsed.offsets.data(),
              sizeof(uint64_t) * parsed.offsets.size());
  std::memcpy(res->names, parsed.names.data(), parsed.names.size());
  return kOk;
}

void mio_free(MioResult* res) {
  std::free(res->codes);
  std::free(res->offsets);
  std::free(res->names);
  res->codes = nullptr;
  res->offsets = nullptr;
  res->names = nullptr;
}

}  // extern "C"

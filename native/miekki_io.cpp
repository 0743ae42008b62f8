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

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
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

// ---------------------------------------------------------------- streaming
//
// Bounded-memory record streaming for >RAM read sets (VERDICT r1 item 4 /
// BASELINE config 4): mio_open / mio_next_batch / mio_close.  Compressed
// bytes are inflated incrementally into a text carry buffer; each
// mio_next_batch call parses the longest prefix of COMPLETE records up to
// ~max_codes bases and moves the partial-record tail to the front.  RSS is
// bounded by max_codes + one record, independent of file size.

namespace {

struct Stream {
  FILE* f = nullptr;
  bool gz = false;
  bool gz_done = false;     // saw Z_STREAM_END with no further members
  bool file_eof = false;
  z_stream zs{};
  std::vector<uint8_t> inbuf;   // compressed read buffer
  size_t in_pos = 0, in_len = 0;
  std::vector<uint8_t> carry;   // inflated-but-unparsed text
  char fmt = 0;                 // '>' or '@' (0 = undetected)
};

// Refill `carry` with up to `want` more text bytes.  Returns kOk or error.
int refill(Stream* st, size_t want) {
  size_t target = st->carry.size() + want;
  std::vector<uint8_t> buf(1 << 20);
  while (st->carry.size() < target) {
    if (!st->gz) {
      size_t base = st->carry.size();
      st->carry.resize(base + buf.size());
      size_t got = std::fread(st->carry.data() + base, 1, buf.size(), st->f);
      st->carry.resize(base + got);
      if (got < buf.size()) {
        // short read = EOF only if no stream error: a mid-file I/O fault
        // must surface, not silently truncate the record stream (the
        // whole-file path returns kErrOpen on short reads the same way)
        if (std::ferror(st->f)) return kErrOpen;
        st->file_eof = true;
        break;
      }
      continue;
    }
    if (st->in_pos == st->in_len) {
      st->in_len = std::fread(st->inbuf.data(), 1, st->inbuf.size(), st->f);
      st->in_pos = 0;
      if (st->in_len < st->inbuf.size() && std::ferror(st->f))
        return kErrOpen;  // I/O fault, not EOF — never truncate silently
      if (st->in_len == 0) {
        st->file_eof = true;
        // a truncated member (no Z_STREAM_END) is an error, matching the
        // whole-file path and the Python reader's EOFError
        return st->gz_done ? kOk : kErrGzip;
      }
      st->gz_done = false;  // more compressed bytes: expect a clean END again
    }
    st->zs.next_in = st->inbuf.data() + st->in_pos;
    st->zs.avail_in = static_cast<uInt>(st->in_len - st->in_pos);
    st->zs.next_out = buf.data();
    st->zs.avail_out = static_cast<uInt>(buf.size());
    int ret = inflate(&st->zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END && ret != Z_BUF_ERROR)
      return kErrGzip;
    st->in_pos = st->in_len - st->zs.avail_in;
    st->carry.insert(st->carry.end(), buf.data(),
                     buf.data() + (buf.size() - st->zs.avail_out));
    if (ret == Z_STREAM_END) {
      st->gz_done = true;
      if (inflateReset2(&st->zs, 15 + 32) != Z_OK) return kErrGzip;
    } else if (ret == Z_BUF_ERROR && st->zs.avail_in == 0) {
      continue;  // need more input
    }
  }
  return kOk;
}

// Offset just past the last COMPLETE record in text[0, n).  FASTA records
// complete at the next '>' line; the final record completes only at EOF.
size_t fasta_cut(const uint8_t* text, size_t n, bool eof) {
  if (eof) return n;
  // find last "\n>" — everything before that newline is complete records
  for (size_t i = n; i-- > 1;) {
    if (text[i] == '>' && text[i - 1] == '\n') return i;
  }
  return 0;
}

// FASTQ: walk 4-line groups (blank lines skipped between records).
size_t fastq_cut(const uint8_t* text, size_t n, bool eof) {
  size_t cut = 0;
  const uint8_t* p = text;
  const uint8_t* end = text + n;
  while (p < end) {
    // skip blank lines
    while (p < end && (*p == '\n' || *p == '\r')) ++p;
    const uint8_t* rec = p;
    int lines = 0;
    while (lines < 4 && p < end) {
      const uint8_t* nl = static_cast<const uint8_t*>(
          memchr(p, '\n', static_cast<size_t>(end - p)));
      if (!nl) { p = end; break; }
      p = nl + 1;
      ++lines;
    }
    if (lines == 4 || (eof && p == end && lines > 0)) {
      cut = static_cast<size_t>(p - text);
    } else {
      return eof ? n : cut;  // partial record: stop (at EOF let the parser
    }                        // report the malformed tail)
    (void)rec;
  }
  return cut;
}

}  // namespace

void* mio_open(const char* path, int* err) {
  *err = kOk;
  FILE* f = std::fopen(path, "rb");
  if (!f) { *err = kErrOpen; return nullptr; }
  Stream* st = new Stream();
  st->f = f;
  unsigned char magic[2];
  size_t got = std::fread(magic, 1, 2, f);
  std::fseek(f, 0, SEEK_SET);
  st->gz = (got == 2 && magic[0] == 0x1f && magic[1] == 0x8b);
  if (st->gz) {
    if (inflateInit2(&st->zs, 15 + 32) != Z_OK) {
      std::fclose(f);
      delete st;
      *err = kErrGzip;
      return nullptr;
    }
    st->inbuf.resize(1 << 20);
  }
  return st;
}

int mio_next_batch(void* handle, uint64_t max_codes, MioResult* res) {
  Stream* st = static_cast<Stream*>(handle);
  int rc = kOk;
  if (st->carry.size() < max_codes && !st->file_eof) {
    rc = refill(st, max_codes - st->carry.size() + 1);
    if (rc != kOk) return rc;
  }
  if (st->carry.empty() && st->file_eof) return 0;  // EOF
  if (st->fmt == 0) {
    if (st->carry.empty()) return kErrFormat;
    st->fmt = static_cast<char>(st->carry[0]);
    if (st->fmt != '>' && st->fmt != '@') return kErrFormat;
  }
  size_t cut = (st->fmt == '>')
                   ? fasta_cut(st->carry.data(), st->carry.size(), st->file_eof)
                   : fastq_cut(st->carry.data(), st->carry.size(), st->file_eof);
  while (cut == 0 && !st->file_eof) {  // one record spans the whole carry
    rc = refill(st, st->carry.size() + (1 << 20));
    if (rc != kOk) return rc;
    cut = (st->fmt == '>')
              ? fasta_cut(st->carry.data(), st->carry.size(), st->file_eof)
              : fastq_cut(st->carry.data(), st->carry.size(), st->file_eof);
  }
  if (cut == 0) return 0;

  Parsed parsed;
  parsed.offsets.push_back(0);
  const uint8_t* p = st->carry.data();
  rc = (st->fmt == '>') ? parse_fasta(p, p + cut, parsed)
                        : parse_fastq(p, p + cut, parsed);
  if (rc != kOk) return rc;
  std::memmove(st->carry.data(), st->carry.data() + cut,
               st->carry.size() - cut);
  st->carry.resize(st->carry.size() - cut);

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
  return 1;
}

void mio_close(void* handle) {
  Stream* st = static_cast<Stream*>(handle);
  if (st->gz) inflateEnd(&st->zs);
  if (st->f) std::fclose(st->f);
  delete st;
}

// ---------------------------------------------------------------- resolve
// Exact shared_in_x for a list of sketch pairs: the host epilogue of the
// MXU stream-pass counter (miekki_tpu/ops/mxu_intersect.py
// resolve_pairs_host).  The ambiguous-pair count per all-vs-all job is
// small (thousands) but each pair needs an exact bottom-s-union merge of
// two sorted 10k-value sketches — a batched device sort measured 45 s for
// ~10k pairs on the tunneled TPU (r4), while a threaded two-pointer merge
// on the host does the same 2e8 compares in ~0.1 s.  This is the one spot
// where the reference's CPU-shaped two-pointer loop IS the right tool:
// tiny, branchy, latency-bound work off the device's critical path.
//
// Tables are the (hi, lo) uint32 planes of sorted ascending sketches with
// UINT64_MAX sentinels (compact indexes pass code<<32 planes — same
// ordering).  Semantics are bit-identical to ops/intersect.py
// pair_counts_merge: count values present in BOTH sketches whose 1-based
// distinct-union rank is <= s (parity-tested in tests/test_native_io.py).

static void resolve_range(const uint32_t* a_hi, const uint32_t* a_lo,
                          const uint32_t* b_hi, const uint32_t* b_lo,
                          const int64_t* pi, const int64_t* pj,
                          int64_t lo_p, int64_t hi_p, int64_t sp_a,
                          int64_t sp_b, int64_t s, int32_t* out) {
  const uint64_t kInf = ~0ULL;
  for (int64_t p = lo_p; p < hi_p; ++p) {
    const uint32_t* ah = a_hi + pi[p] * sp_a;
    const uint32_t* al = a_lo + pi[p] * sp_a;
    const uint32_t* bh = b_hi + pj[p] * sp_b;
    const uint32_t* bl = b_lo + pj[p] * sp_b;
    int64_t ia = 0, ib = 0, rank = 0;
    int32_t shared = 0;
    while (rank < s && (ia < sp_a || ib < sp_b)) {
      uint64_t va = ia < sp_a
                        ? ((uint64_t)ah[ia] << 32 | al[ia]) : kInf;
      uint64_t vb = ib < sp_b
                        ? ((uint64_t)bh[ib] << 32 | bl[ib]) : kInf;
      if (va == kInf && vb == kInf) break;  // sentinel tails
      ++rank;
      if (va == vb) {
        ++shared;
        ++ia;
        ++ib;
      } else if (va < vb) {
        ++ia;
      } else {
        ++ib;
      }
    }
    out[p] = shared;
  }
}

extern "C" void mio_resolve_pairs(const uint32_t* a_hi, const uint32_t* a_lo,
                                  const uint32_t* b_hi, const uint32_t* b_lo,
                                  const int64_t* pi, const int64_t* pj,
                                  int64_t n_pairs, int64_t sp_a,
                                  int64_t sp_b, int64_t s, int32_t* out) {
  int64_t nt = (int64_t)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if (nt > 16) nt = 16;
  if (n_pairs < 256) nt = 1;  // thread spawn not worth it
  if (nt == 1) {
    resolve_range(a_hi, a_lo, b_hi, b_lo, pi, pj, 0, n_pairs, sp_a, sp_b, s,
                  out);
    return;
  }
  std::vector<std::thread> threads;
  int64_t per = (n_pairs + nt - 1) / nt;
  for (int64_t t = 0; t < nt; ++t) {
    int64_t lo_p = t * per;
    int64_t hi_p = std::min(n_pairs, lo_p + per);
    if (lo_p >= hi_p) break;
    threads.emplace_back(resolve_range, a_hi, a_lo, b_hi, b_lo, pi, pj,
                         lo_p, hi_p, sp_a, sp_b, s, out);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"

// Native BAM scanner: BGZF inflate + record field extraction.
//
// Produces the columnar alignment table (chrom id, start, end, read name,
// mapq, strand, cigar) that svscope_tpu.io.bam.AlignmentTable serves to the
// selection/feature stages — the whole-genome ingest path, where the Python
// per-record parser would be the bottleneck.  Sequences/qualities are
// skipped here; per-window read payloads are fetched lazily by the Python
// reader over the (small) candidate regions.
//
// C ABI: bam_scan_open parses the whole file into an in-memory table;
// accessors copy columns out; strings are exposed as one concatenated
// buffer + offsets.
#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Table {
  std::vector<std::string> refs;
  std::vector<int64_t> ref_len;
  std::vector<int32_t> ref_id;
  std::vector<int64_t> start;
  std::vector<int64_t> end;
  std::vector<int32_t> mapq;
  std::vector<int32_t> flag;
  std::vector<uint32_t> name_off;   // offsets into names (n+1 entries)
  std::string names;
  std::vector<uint32_t> cigar_off;  // offsets into cigars (n+1 entries)
  std::string cigars;
  std::string error;
  // lazy record access: decompressed stream + per-record offsets
  std::string data;
  std::vector<uint64_t> rec_off;
};

bool bgzf_inflate(const uint8_t* data, size_t n, std::string& out) {
  size_t pos = 0;
  std::vector<uint8_t> block(1 << 17);
  while (pos + 18 <= n) {
    if (data[pos] != 0x1f || data[pos + 1] != 0x8b) return false;
    uint16_t xlen = data[pos + 10] | (data[pos + 11] << 8);
    size_t epos = pos + 12;
    size_t eend = epos + xlen;
    int bsize = -1;
    while (epos + 4 <= eend) {
      uint8_t si1 = data[epos], si2 = data[epos + 1];
      uint16_t slen = data[epos + 2] | (data[epos + 3] << 8);
      if (si1 == 66 && si2 == 67 && slen == 2)
        bsize = (data[epos + 4] | (data[epos + 5] << 8)) + 1;
      epos += 4 + slen;
    }
    if (bsize < 0) return false;
    const uint8_t* cdata = data + pos + 12 + xlen;
    size_t clen = bsize - 26;
    uint32_t isize;
    memcpy(&isize, data + pos + bsize - 4, 4);
    if (isize > 0) {
      z_stream zs{};
      inflateInit2(&zs, -15);
      if (block.size() < isize) block.resize(isize);
      zs.next_in = const_cast<uint8_t*>(cdata);
      zs.avail_in = (uInt)clen;
      zs.next_out = block.data();
      zs.avail_out = (uInt)block.size();
      int rc = inflate(&zs, Z_FINISH);
      inflateEnd(&zs);
      if (rc != Z_STREAM_END) return false;
      out.append((const char*)block.data(), isize);
    }
    pos += bsize;
  }
  return true;
}

const char kCigarOps[] = "MIDNSHP=X";
// reference-consuming ops: M D N = X
const bool kRefConsume[9] = {true, false, true, true, false,
                             false, false, true, true};

Table* parse_bam(const uint8_t* raw, size_t rawlen, bool keep_data) {
  auto* t = new Table();
  std::string& data = t->data;
  if (!bgzf_inflate(raw, rawlen, data)) {
    t->error = "bad BGZF stream";
    return t;
  }
  if (data.size() < 8 || memcmp(data.data(), "BAM\x01", 4) != 0) {
    t->error = "not a BAM file";
    return t;
  }
  size_t off = 4;
  auto rd_i32 = [&](size_t o) {
    int32_t v;
    memcpy(&v, data.data() + o, 4);
    return v;
  };
  int32_t l_text = rd_i32(off);
  off += 4 + l_text;
  int32_t n_ref = rd_i32(off);
  off += 4;
  for (int r = 0; r < n_ref; r++) {
    int32_t l_name = rd_i32(off);
    off += 4;
    t->refs.emplace_back(data.data() + off, l_name - 1);
    off += l_name;
    t->ref_len.push_back(rd_i32(off));
    off += 4;
  }
  t->name_off.push_back(0);
  t->cigar_off.push_back(0);
  char numbuf[16];
  while (off + 4 <= data.size()) {
    int32_t block_size = rd_i32(off);
    size_t rec = off + 4;
    off = rec + block_size;
    if (off > data.size()) break;
    int32_t ref_id = rd_i32(rec);
    int32_t pos = rd_i32(rec + 4);
    uint8_t l_read_name = (uint8_t)data[rec + 8];
    uint8_t mapq = (uint8_t)data[rec + 9];
    uint16_t n_cigar;
    memcpy(&n_cigar, data.data() + rec + 12, 2);
    uint16_t flag;
    memcpy(&flag, data.data() + rec + 14, 2);
    if (ref_id < 0 || (flag & 0x4)) continue;  // unmapped
    t->rec_off.push_back(rec);
    t->ref_id.push_back(ref_id);
    t->start.push_back(pos);
    t->mapq.push_back(mapq);
    t->flag.push_back(flag);
    t->names.append(data.data() + rec + 32, l_read_name - 1);
    t->name_off.push_back((uint32_t)t->names.size());
    size_t coff = rec + 32 + l_read_name;
    int64_t ref_span = 0;
    for (int k = 0; k < n_cigar; k++) {
      uint32_t c;
      memcpy(&c, data.data() + coff + 4ull * k, 4);
      uint32_t op = c & 0xF;
      uint32_t len = c >> 4;
      if (op < 9 && kRefConsume[op]) ref_span += len;
      int nn = snprintf(numbuf, sizeof numbuf, "%u", len);
      t->cigars.append(numbuf, nn);
      t->cigars.push_back(op < 9 ? kCigarOps[op] : '?');
    }
    t->cigar_off.push_back((uint32_t)t->cigars.size());
    t->end.push_back(pos + ref_span);
  }
  if (!keep_data) {
    t->data.clear();
    t->data.shrink_to_fit();
    t->rec_off.clear();
  }
  return t;
}

const char kSeqNt16[] = "=ACMGRSVTWYHKDBN";

}  // namespace

extern "C" {

void* bam_scan_open(const uint8_t* raw, int64_t rawlen) {
  return parse_bam(raw, (size_t)rawlen, false);
}

// keep the decompressed stream for lazy per-record sequence access
void* bam_scan_open_lazy(const uint8_t* raw, int64_t rawlen) {
  return parse_bam(raw, (size_t)rawlen, true);
}

// decode record idx's sequence (soft clips included); returns length or -1
int64_t bam_scan_record_seq(void* h, int64_t idx, char* out, int64_t cap) {
  Table* t = (Table*)h;
  if (t->data.empty() || idx < 0 || idx >= (int64_t)t->rec_off.size())
    return -1;
  const char* rec = t->data.data() + t->rec_off[idx];
  uint8_t l_read_name = (uint8_t)rec[8];
  uint16_t n_cigar;
  memcpy(&n_cigar, rec + 12, 2);
  int32_t l_seq;
  memcpy(&l_seq, rec + 16, 4);
  if (l_seq > cap) return -1;
  const uint8_t* packed =
      (const uint8_t*)rec + 32 + l_read_name + 4ull * n_cigar;
  for (int32_t k = 0; k < l_seq; k++) {
    uint8_t code = (k & 1) ? (packed[k >> 1] & 0xF) : (packed[k >> 1] >> 4);
    out[k] = kSeqNt16[code];
  }
  return l_seq;
}

void bam_scan_free(void* h) { delete (Table*)h; }

const char* bam_scan_error(void* h) {
  Table* t = (Table*)h;
  return t->error.empty() ? nullptr : t->error.c_str();
}

int64_t bam_scan_n_records(void* h) { return ((Table*)h)->ref_id.size(); }
int32_t bam_scan_n_refs(void* h) { return (int32_t)((Table*)h)->refs.size(); }

int32_t bam_scan_ref_name(void* h, int32_t i, char* out, int32_t cap) {
  const std::string& s = ((Table*)h)->refs[i];
  if ((int32_t)s.size() + 1 > cap) return -1;
  memcpy(out, s.c_str(), s.size() + 1);
  return (int32_t)s.size();
}

int64_t bam_scan_ref_length(void* h, int32_t i) {
  return ((Table*)h)->ref_len[i];
}

void bam_scan_columns(void* h, int32_t* ref_id, int64_t* start, int64_t* end,
                      int32_t* mapq, int32_t* flag) {
  Table* t = (Table*)h;
  size_t n = t->ref_id.size();
  memcpy(ref_id, t->ref_id.data(), n * 4);
  memcpy(start, t->start.data(), n * 8);
  memcpy(end, t->end.data(), n * 8);
  memcpy(mapq, t->mapq.data(), n * 4);
  memcpy(flag, t->flag.data(), n * 4);
}

int64_t bam_scan_names_size(void* h) { return ((Table*)h)->names.size(); }
int64_t bam_scan_cigars_size(void* h) { return ((Table*)h)->cigars.size(); }

void bam_scan_strings(void* h, uint8_t* names, uint32_t* name_off,
                      uint8_t* cigars, uint32_t* cigar_off) {
  Table* t = (Table*)h;
  memcpy(names, t->names.data(), t->names.size());
  memcpy(name_off, t->name_off.data(), t->name_off.size() * 4);
  memcpy(cigars, t->cigars.data(), t->cigars.size());
  memcpy(cigar_off, t->cigar_off.data(), t->cigar_off.size() * 4);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Breakpoint extraction (WindowSelection GetSpanReads/ParseCLIP semantics,
// specified by svscope_tpu/select/breakpoints.py; parity-tested there).
// Emits one row per DEL>=indel_cutoff, INS>=indel_cutoff, CLIP>=clip_cutoff:
//   rec_idx, bp_type (0 DEL / 1 INS / 2 CLIP), ref_start, ref_end,
//   read_start, read_end, region_start, region_end
// where (region_start, region_end) is the aligned-block read span used for
// the row's readRegion string (strand-reversed coordinates for CLIP rows).
// ---------------------------------------------------------------------------

struct BpRows {
  std::vector<int64_t> rec_idx;
  std::vector<int32_t> bp_type;
  std::vector<int64_t> ref_start, ref_end, read_start, read_end;
  std::vector<int64_t> region_start, region_end;
};

namespace {

void extract_bp(Table* t, int64_t i, int indel_cutoff, int clip_cutoff,
                BpRows& out, std::vector<uint32_t>& lens,
                std::vector<char>& ops) {
  const char* c = t->cigars.data() + t->cigar_off[i];
  const char* cend = t->cigars.data() + t->cigar_off[i + 1];
  lens.clear();
  ops.clear();
  uint32_t num = 0;
  for (const char* p = c; p < cend; p++) {
    if (*p >= '0' && *p <= '9') {
      num = num * 10 + (*p - '0');
    } else {
      lens.push_back(num);
      ops.push_back(*p);
      num = 0;
    }
  }
  int n = (int)ops.size();
  int first_m = -1, last_m = -1;
  for (int k = 0; k < n; k++)
    if (ops[k] == 'M' || ops[k] == 'X') {
      if (first_m < 0) first_m = k;
      last_m = k;
    }
  if (first_m < 0) return;
  auto is_refgrow = [](char o) { return o == 'D' || o == 'P' || o == 'N'; };
  int64_t read_start_aln = 0;
  for (int k = 0; k < first_m; k++) read_start_aln += lens[k];
  int64_t read_end_aln = 0;
  for (int k = 0; k <= last_m; k++)
    if (!is_refgrow(ops[k])) read_end_aln += lens[k];
  int64_t start = t->start[i];
  bool rev = (t->flag[i] & 0x10) != 0;
  // DEL / INS with the reference's ref-walk readstart
  int64_t ref_before = 0;
  for (int k = 0; k < n; k++) {
    char o = ops[k];
    bool ismatch = (o == 'M' || o == 'X');
    if ((o == 'D' || o == 'I') && (int)lens[k] >= indel_cutoff) {
      int64_t rs = start + ref_before;
      out.rec_idx.push_back(i);
      out.bp_type.push_back(o == 'D' ? 0 : 1);
      out.ref_start.push_back(rs);
      out.ref_end.push_back(o == 'D' ? rs + lens[k] : rs);
      out.read_start.push_back(ref_before);
      out.read_end.push_back(o == 'D' ? ref_before : ref_before + lens[k]);
      out.region_start.push_back(read_start_aln);
      out.region_end.push_back(read_end_aln);
    }
    if (ismatch || is_refgrow(o)) ref_before += lens[k];
  }
  // CLIP on the strand-reversed cigar
  int fm = -1, lm = -1;
  auto opAt = [&](int k) { return rev ? ops[n - 1 - k] : ops[k]; };
  auto lenAt = [&](int k) { return lens[rev ? n - 1 - k : k]; };
  for (int k = 0; k < n; k++)
    if (opAt(k) == 'M' || opAt(k) == 'X') {
      if (fm < 0) fm = k;
      lm = k;
    }
  int64_t rs_c = 0;
  for (int k = 0; k < fm; k++) rs_c += lenAt(k);
  int64_t re_c = 0;
  for (int k = 0; k <= lm; k++)
    if (!is_refgrow(opAt(k))) re_c += lenAt(k);
  for (int k = 0; k < n; k++) {
    char o = opAt(k);
    if ((o == 'S' || o == 'H') && (int)lenAt(k) >= clip_cutoff) {
      int64_t refpos, readpos;
      if (k == 0) {
        refpos = rev ? t->end[i] : start;
        readpos = rs_c;
      } else {
        refpos = rev ? start : t->end[i];
        readpos = re_c;
      }
      out.rec_idx.push_back(i);
      out.bp_type.push_back(2);
      out.ref_start.push_back(refpos);
      out.ref_end.push_back(refpos);
      out.read_start.push_back(readpos);
      out.read_end.push_back(readpos);
      out.region_start.push_back(rs_c);
      out.region_end.push_back(re_c);
    }
  }
}

}  // namespace

extern "C" {

void* bam_scan_breakpoints(void* h, int32_t indel_cutoff,
                           int32_t clip_cutoff) {
  Table* t = (Table*)h;
  auto* out = new BpRows();
  std::vector<uint32_t> lens;
  std::vector<char> ops;
  for (int64_t i = 0; i < (int64_t)t->ref_id.size(); i++)
    extract_bp(t, i, indel_cutoff, clip_cutoff, *out, lens, ops);
  return out;
}

int64_t bp_rows_count(void* b) { return ((BpRows*)b)->rec_idx.size(); }

void bp_rows_columns(void* b, int64_t* rec_idx, int32_t* bp_type,
                     int64_t* ref_start, int64_t* ref_end,
                     int64_t* read_start, int64_t* read_end,
                     int64_t* region_start, int64_t* region_end) {
  BpRows* r = (BpRows*)b;
  size_t n = r->rec_idx.size();
  memcpy(rec_idx, r->rec_idx.data(), n * 8);
  memcpy(bp_type, r->bp_type.data(), n * 4);
  memcpy(ref_start, r->ref_start.data(), n * 8);
  memcpy(ref_end, r->ref_end.data(), n * 8);
  memcpy(read_start, r->read_start.data(), n * 8);
  memcpy(read_end, r->read_end.data(), n * 8);
  memcpy(region_start, r->region_start.data(), n * 8);
  memcpy(region_end, r->region_end.data(), n * 8);
}

void bp_rows_free(void* b) { delete (BpRows*)b; }

}  // extern "C"

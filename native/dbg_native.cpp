// debigulator_tpu native host runtime: DEFLATE stream scanner, serial
// inflate, and checksums.
//
// Role (SURVEY §3 boundary note): everything below the device boundary is
// JAX/Pallas; this file is the *host* side — the IO/runtime component that
// feeds the accelerator: it indexes DEFLATE streams (block boundaries,
// output offsets, code lengths) in one fast serial pass, provides a serial
// inflate used as CLI fallback / encode-verification oracle, and computes
// CRC-32/Adler-32 at memory speed (slice-by-8).
//
// Clean-room implementation from RFC 1951/1952/1950 — structured around a
// canonical (count/first/base + sorted symbols) decoder, not the
// reference's hashed-probe tables (inflate.c:494-557).

#include <cstdint>
#include <cstring>

namespace {

constexpr int kMaxBits = 15;

struct BitReader {
  const uint8_t* data;
  uint64_t size;      // bytes
  uint64_t bitpos;    // absolute bit position
  bool overrun;

  uint32_t bits(int n) {
    // LSB-first read of n (<=24) bits.
    uint64_t byte = bitpos >> 3;
    if (byte + 4 > size) {
      // Slow, safe tail path.
      uint32_t v = 0;
      for (int i = 0; i < n; i++) {
        uint64_t b = (bitpos + i) >> 3;
        if (b >= size) { overrun = true; break; }
        v |= (uint32_t)((data[b] >> ((bitpos + i) & 7)) & 1) << i;
      }
      bitpos += n;
      return v;
    }
    uint32_t w;
    std::memcpy(&w, data + byte, 4);
    uint32_t v = (w >> (bitpos & 7)) & ((1u << n) - 1);
    bitpos += n;
    return v;
  }

  uint32_t peek15() {
    uint64_t byte = bitpos >> 3;
    if (byte + 4 > size) {
      uint32_t v = 0;
      for (int i = 0; i < 15; i++) {
        uint64_t b = (bitpos + i) >> 3;
        if (b >= size) break;
        v |= (uint32_t)((data[b] >> ((bitpos + i) & 7)) & 1) << i;
      }
      return v;
    }
    uint32_t w;
    std::memcpy(&w, data + byte, 4);
    return (w >> (bitpos & 7)) & 0x7FFF;
  }
};

struct Table {
  int32_t count[kMaxBits + 1];
  int32_t first[kMaxBits + 1];   // smallest MSB-first code per length
  int32_t base[kMaxBits + 1];    // offset into syms
  int16_t syms[288];
  // Fast path: direct 10-bit lookup, one packed load: len<<9 | sym,
  // 0 if the code is longer than 10 bits (len 0 never occurs for a match).
  uint16_t fast[1 << 10];
  int ok;
};

uint32_t rev_bits(uint32_t x, int n) {
  uint32_t r = 0;
  for (int i = 0; i < n; i++) { r = (r << 1) | (x & 1); x >>= 1; }
  return r;
}

// Canonical table construction (RFC 1951 §3.2.2).
void build_table(const int32_t* lengths, int n, Table* t) {
  t->ok = 1;
  std::memset(t->count, 0, sizeof t->count);
  for (int i = 0; i < n; i++) {
    if (lengths[i] < 0 || lengths[i] > kMaxBits) { t->ok = 0; return; }
    t->count[lengths[i]]++;
  }
  t->count[0] = 0;
  int32_t code = 0, left = 1;
  t->first[0] = 0;
  for (int b = 1; b <= kMaxBits; b++) {
    code = (code + t->count[b - 1]) << 1;
    t->first[b] = code;
    left = (left << 1) - t->count[b];
    if (left < 0) { t->ok = 0; return; }
  }
  int32_t at = 0;
  for (int b = 0; b <= kMaxBits; b++) { t->base[b] = at; at += t->count[b]; }
  int32_t idx[kMaxBits + 1];
  std::memcpy(idx, t->base, sizeof idx);
  for (int s = 0; s < n; s++)
    if (lengths[s]) t->syms[idx[lengths[s]]++] = (int16_t)s;
  // Fast direct table over the low 10 reversed bits.
  for (int w = 0; w < (1 << 10); w++) {
    t->fast[w] = 0;
    uint32_t rev = rev_bits((uint32_t)w, 10);  // MSB-first 10-bit code prefix
    for (int l = 1; l <= 10; l++) {
      int32_t c = rev >> (10 - l);
      int32_t off = c - t->first[l];
      if (off >= 0 && off < t->count[l]) {
        t->fast[w] = (uint16_t)((l << 9) | t->syms[t->base[l] + off]);
        break;
      }
    }
  }
}

int decode_sym(BitReader& br, const Table& t) {
  uint32_t w15 = br.peek15();
  uint32_t e = t.fast[w15 & 0x3FF];
  if (e) { br.bitpos += e >> 9; return (int)(e & 0x1FF); }
  uint32_t rev = rev_bits(w15, 15);
  for (int l = 11; l <= kMaxBits; l++) {
    int32_t c = rev >> (kMaxBits - l);
    int32_t off = c - t.first[l];
    if (off >= 0 && off < t.count[l]) {
      br.bitpos += l;
      return t.syms[t.base[l] + off];
    }
  }
  return -1;
}

const int32_t kLenBase[29] = {3,4,5,6,7,8,9,10,11,13,15,17,19,23,27,31,35,43,
                              51,59,67,83,99,115,131,163,195,227,258};
const int32_t kLenExtra[29] = {0,0,0,0,0,0,0,0,1,1,1,1,2,2,2,2,3,3,3,3,4,4,4,
                               4,5,5,5,5,0};
const int32_t kDistBase[30] = {1,2,3,4,5,7,9,13,17,25,33,49,65,97,129,193,257,
                               385,513,769,1025,1537,2049,3073,4097,6145,8193,
                               12289,16385,24577};
const int32_t kDistExtra[30] = {0,0,0,0,1,1,2,2,3,3,4,4,5,5,6,6,7,7,8,8,9,9,
                                10,10,11,11,12,12,13,13};
const int kClOrder[19] = {16,17,18,0,8,7,9,6,10,5,11,4,12,3,13,2,14,1,15};

void fixed_lengths(int32_t* ll, int32_t* dd) {
  for (int i = 0; i < 144; i++) ll[i] = 8;
  for (int i = 144; i < 256; i++) ll[i] = 9;
  for (int i = 256; i < 280; i++) ll[i] = 7;
  for (int i = 280; i < 288; i++) ll[i] = 8;
  for (int i = 0; i < 32; i++) dd[i] = 5;
}

// Parse a dynamic header into raw code lengths (RFC 1951 §3.2.7).
int read_dynamic_lengths(BitReader& br, int32_t* ll, int32_t* dd,
                         int* hlit_out, int* hdist_out) {
  int hlit = (int)br.bits(5) + 257;
  int hdist = (int)br.bits(5) + 1;
  int hclen = (int)br.bits(4) + 4;
  if (hlit > 286 || hdist > 30) return -1;
  int32_t cl[19] = {0};
  for (int i = 0; i < hclen; i++) cl[kClOrder[i]] = (int32_t)br.bits(3);
  Table clt;
  build_table(cl, 19, &clt);
  if (!clt.ok) return -1;
  int32_t lens[288 + 32] = {0};
  int i = 0;
  while (i < hlit + hdist) {
    int sym = decode_sym(br, clt);
    if (sym < 0 || br.overrun) return -1;
    if (sym < 16) {
      lens[i++] = sym;
    } else if (sym == 16) {
      if (i == 0) return -1;
      int rep = 3 + (int)br.bits(2);
      if (i + rep > hlit + hdist) return -1;
      for (int r = 0; r < rep; r++, i++) lens[i] = lens[i - 1];
    } else if (sym == 17) {
      i += 3 + (int)br.bits(3);
    } else {
      i += 11 + (int)br.bits(7);
    }
  }
  if (i != hlit + hdist || lens[256] == 0) return -1;
  std::memset(ll, 0, 288 * sizeof(int32_t));
  std::memset(dd, 0, 32 * sizeof(int32_t));
  std::memcpy(ll, lens, hlit * sizeof(int32_t));
  std::memcpy(dd, lens + hlit, hdist * sizeof(int32_t));
  *hlit_out = hlit;
  *hdist_out = hdist;
  return 0;
}

}  // namespace

extern "C" {

struct BlockRec {
  uint64_t start_bit;
  uint64_t data_start_bit;
  uint64_t end_bit;
  uint64_t out_start;
  uint64_t out_size;
  int32_t btype;
  int32_t bfinal;
};

// Token-record emission buffers for the v8 device pipeline (all optional).
// Matches: m_pos[k] = stream output offset of match k (monotone),
// m_meta[k] = length<<16 | dist.  Literal runs (maximal runs of literal
// tokens within one virtual cell): r_pos[k] = output offset, r_cell[k] =
// global virtual-cell index, r_j0len[k] = tape_slot_j0<<8 | run_len.
// The (cell, slot) coordinates mirror the device chase tape layout exactly:
// a token occupies tape[cell-of-its-emitting-code-start, #prior emissions
// in that cell]; literal tokens emit at their litlen code start, match
// tokens at their DIST code start (length codes emit nothing).
struct ScanRecs {
  int32_t* m_pos;
  int32_t* m_meta;
  int64_t max_matches;
  int64_t n_matches;
  int32_t* r_pos;
  int32_t* r_cell;
  int32_t* r_j0len;
  int64_t max_runs;
  int64_t n_runs;
  int32_t max_cell_tokens;
  // Dense literal bytes in output order (v10 pipeline): literal k of the
  // stream (counting every literal token once, in stream order) lands at
  // lit_bytes[k].  Run r's literals occupy [sum of earlier run lens, +len)
  // — the host derives per-run offsets by prefix-summing r_j0len&0xFF.
  uint8_t* lit_bytes;
  int64_t max_lits;
  int64_t n_lits;
};

// Scan a raw DEFLATE stream: fill block records + per-block code lengths
// (288 litlen + 32 dist int32 per block; zeros for stored blocks).
// If `output` is non-null (capacity out_cap), also produce decompressed
// bytes (full serial inflate).  Returns number of blocks, or -1 on error,
// -2 if block capacity exceeded, -3 if output capacity exceeded,
// -5 if a record capacity (recs) is exceeded.
//
// Cell-entry recording (cell_bits > 0): for every `cell_bits`-sized cell of
// the *virtually rebased* stream (each compressed block bit-aligned to a
// cell boundary, matching ops/inflate_v3.build_plan_v3), record the exact
// decoder state at the first code starting in that cell:
//   cell_states[i] = local_bit_offset*2 + mode (0 litlen / 1 dist), or -1
//   if no code starts in the cell; cell_pend[i] = pending match length at a
//   dist-mode entry.  This removes any need for speculative entry fixpoints
//   on the device — entries are exact by construction.
static int64_t scan_impl(const uint8_t* data, uint64_t size,
                 BlockRec* blocks, int64_t max_blocks,
                 int32_t* lengths_buf,  // max_blocks * 320
                 uint8_t* output, uint64_t out_cap,
                 uint64_t* out_size_ret,
                 int64_t cell_bits,
                 int64_t* cell_states, int32_t* cell_pend,
                 int64_t max_cells, int64_t* n_cells_ret,
                 ScanRecs* recs, int32_t* max_cell_tokens_ret = nullptr) {
  BitReader br{data, size, 0, false};
  int64_t nb = 0;
  uint64_t out_at = 0;
  const bool produce = output != nullptr;
  const bool cells = cell_bits > 0 && cell_states != nullptr;
  int64_t cell_base = 0;   // global cell index of current block's cell 0
  int64_t cell_filled = 0; // cells recorded so far (global)

  // --- token-record tracking (v8 pipeline; mirrors the device tape) ---
  const bool track = recs != nullptr && cells;
  int64_t rc_cur_cell = -1;  // cell whose slot counter is live
  int32_t rc_cur_slot = 0;
  int64_t run_cell = -1;     // literal-run accumulator
  int32_t run_j0 = 0, run_len = 0;
  int64_t run_pos = 0;

  // Tape coordinates of a code starting at absolute bit `posbits` inside
  // the block whose data starts at `bds`: cell = virtual cell index, slot
  // = number of tokens already emitted in that cell.
  auto cellslot = [&](uint64_t posbits, uint64_t bds, int64_t* cellp) {
    int64_t vcell =
        cell_base + (int64_t)((posbits - bds) / (uint64_t)cell_bits);
    if (vcell != rc_cur_cell) { rc_cur_cell = vcell; rc_cur_slot = 0; }
    *cellp = vcell;
    int32_t s = rc_cur_slot++;
    if (rc_cur_slot > recs->max_cell_tokens)
      recs->max_cell_tokens = rc_cur_slot;
    return s;
  };
  auto flush_run = [&]() {
    if (run_len > 0) {
      if (recs->n_runs >= recs->max_runs) return -5;
      recs->r_pos[recs->n_runs] = (int32_t)run_pos;
      recs->r_cell[recs->n_runs] = (int32_t)run_cell;
      recs->r_j0len[recs->n_runs] = (run_j0 << 8) | run_len;
      recs->n_runs++;
      run_len = 0;
    }
    return 0;
  };

  // Record the state at a code start: fill any newly entered cells.
  // `rec_boundary` is the absolute bit position where the next unfilled
  // cell begins in the CURRENT block; the common case (code starts inside
  // an already-recorded cell) is a single compare — no division.
  uint64_t rec_boundary = 0;
  uint64_t rec_block_ds = 0;  // current block's data_start_bit
  // Exact per-cell token bound (cells mode): lets the device plan size
  // its tape slots without an overflow probe (a device round trip).
  int32_t mct = 0, tok_in_cell = 0;
  uint64_t tok_boundary = 0;
  uint64_t tok_block_ds = (uint64_t)-1;
  auto count_token = [&](uint64_t cs, uint64_t ds2) {
    if (!cells) return;
    if (cs >= tok_boundary || ds2 != tok_block_ds) {
      tok_in_cell = 0;
      tok_block_ds = ds2;
      uint64_t rel = cs - ds2;
      tok_boundary = ds2 + (rel / (uint64_t)cell_bits + 1) * (uint64_t)cell_bits;
    }
    tok_in_cell++;
    if (tok_in_cell > mct) mct = tok_in_cell;
  };
  auto record = [&](uint64_t block_data_start, int mode, int32_t pending) -> int {
    if (!cells) return 0;
    if (br.bitpos < rec_boundary && block_data_start == rec_block_ds)
      return 0;
    rec_block_ds = block_data_start;
    uint64_t voff = br.bitpos - block_data_start;
    int64_t vcell = cell_base + (int64_t)(voff / (uint64_t)cell_bits);
    if (vcell >= max_cells) return -4;
    while (cell_filled < vcell) {  // cells with no code start
      cell_states[cell_filled] = -1;
      cell_pend[cell_filled] = 0;
      cell_filled++;
    }
    if (cell_filled == vcell) {
      // Global virtual state: block's virtual base + local offset.
      cell_states[cell_filled] =
          ((int64_t)cell_base * cell_bits + (int64_t)voff) * 2 + mode;
      cell_pend[cell_filled] = pending;
      cell_filled++;
    }
    // Next unfilled cell starts at local bit (cell_filled-cell_base)*cell_bits.
    rec_boundary =
        block_data_start + (uint64_t)((cell_filled - cell_base) * cell_bits);
    return 0;
  };
  for (;;) {
    if (nb >= max_blocks) return -2;
    BlockRec& rec = blocks[nb];
    rec.start_bit = br.bitpos;
    rec.bfinal = (int32_t)br.bits(1);
    rec.btype = (int32_t)br.bits(2);
    int32_t* ll = lengths_buf + nb * 320;
    int32_t* dd = ll + 288;
    std::memset(ll, 0, 320 * sizeof(int32_t));
    if (br.overrun) return -1;
    if (rec.btype == 0) {
      br.bitpos = (br.bitpos + 7) & ~7ull;
      uint64_t byte = br.bitpos >> 3;
      if (byte + 4 > size) return -1;
      uint32_t len = data[byte] | (data[byte + 1] << 8);
      uint32_t nlen = data[byte + 2] | (data[byte + 3] << 8);
      if ((len ^ nlen) != 0xFFFF) return -1;
      rec.data_start_bit = (byte + 4) * 8;
      if (byte + 4 + len > size) return -1;
      if (produce) {
        if (out_at + len > out_cap) return -3;
        std::memcpy(output + out_at, data + byte + 4, len);
      }
      out_at += len;
      rec.out_start = out_at - len;
      rec.out_size = len;
      br.bitpos = (byte + 4 + len) * 8;
      rec.end_bit = br.bitpos;
    } else if (rec.btype == 1 || rec.btype == 2) {
      Table lt, dt;
      if (rec.btype == 1) {
        fixed_lengths(ll, dd);
      } else {
        int hlit, hdist;
        if (read_dynamic_lengths(br, ll, dd, &hlit, &hdist) < 0) return -1;
      }
      build_table(ll, 288, &lt);
      build_table(dd, 32, &dt);
      if (!lt.ok || !dt.ok) return -1;
      rec.data_start_bit = br.bitpos;
      rec.out_start = out_at;
      const uint64_t ds = br.bitpos;
      for (;;) {
        if (br.overrun || br.bitpos > size * 8) return -1;
        if (record(ds, 0, 0) < 0) return -4;
        const uint64_t code_start = br.bitpos;
        int sym = decode_sym(br, lt);
        if (sym < 0) return -1;
        if (sym < 256) {
          count_token(code_start, ds);
          if (track) {
            int64_t vc;
            int32_t s = cellslot(code_start, ds, &vc);
            if (run_len > 0 && vc == run_cell && s == run_j0 + run_len) {
              run_len++;
            } else {
              if (flush_run() < 0) return -5;
              run_cell = vc;
              run_j0 = s;
              run_len = 1;
              run_pos = (int64_t)out_at;
            }
            if (recs->lit_bytes) {
              if (recs->n_lits >= recs->max_lits) return -5;
              recs->lit_bytes[recs->n_lits++] = (uint8_t)sym;
            }
          }
          if (produce) {
            if (out_at >= out_cap) return -3;
            output[out_at] = (uint8_t)sym;
          }
          out_at++;
        } else if (sym == 256) {
          if (track && flush_run() < 0) return -5;
          break;
        } else {
          if (sym > 285) return -1;
          int li = sym - 257;
          uint32_t length = kLenBase[li] + br.bits(kLenExtra[li]);
          if (record(ds, 1, (int32_t)length) < 0) return -4;
          count_token(br.bitpos, ds);
          if (track) {
            if (flush_run() < 0) return -5;
            int64_t vc;
            (void)cellslot(br.bitpos, ds, &vc);  // dist-code start slot
          }
          int dsym = decode_sym(br, dt);
          if (dsym < 0 || dsym > 29) return -1;
          uint32_t dist = kDistBase[dsym] + br.bits(kDistExtra[dsym]);
          if (dist > out_at) return -1;
          if (track) {
            if (recs->n_matches >= recs->max_matches) return -5;
            recs->m_pos[recs->n_matches] = (int32_t)out_at;
            recs->m_meta[recs->n_matches] =
                ((int32_t)length << 16) | (int32_t)dist;
            recs->n_matches++;
          }
          if (produce) {
            if (out_at + length > out_cap) return -3;
            // Overlap-safe byte copy (RFC 1951 §3.2.3 semantics).
            for (uint32_t k = 0; k < length; k++)
              output[out_at + k] = output[out_at + k - dist];
          }
          out_at += length;
        }
      }
      rec.end_bit = br.bitpos;
      rec.out_size = out_at - rec.out_start;
      if (cells) {
        // Close this block's cell range: pad symbol-free tail cells.
        uint64_t nbits = rec.end_bit - rec.data_start_bit;
        int64_t ncells = (int64_t)((nbits + cell_bits - 1) / cell_bits);
        if (ncells < 1) ncells = 1;
        if (cell_base + ncells > max_cells) return -4;
        while (cell_filled < cell_base + ncells) {
          cell_states[cell_filled] = -1;
          cell_pend[cell_filled] = 0;
          cell_filled++;
        }
        cell_base += ncells;
      }
    } else {
      return -1;
    }
    nb++;
    if (rec.bfinal) break;
  }
  if (out_size_ret) *out_size_ret = out_at;
  if (n_cells_ret) *n_cells_ret = cell_filled;
  if (max_cell_tokens_ret) *max_cell_tokens_ret = mct;
  return nb;
}

int64_t dbg_scan(const uint8_t* data, uint64_t size,
                 BlockRec* blocks, int64_t max_blocks,
                 int32_t* lengths_buf,
                 uint8_t* output, uint64_t out_cap,
                 uint64_t* out_size_ret,
                 int64_t cell_bits,
                 int64_t* cell_states, int32_t* cell_pend,
                 int64_t max_cells, int64_t* n_cells_ret,
                 int32_t* max_cell_tokens_ret) {
  return scan_impl(data, size, blocks, max_blocks, lengths_buf, output,
                   out_cap, out_size_ret, cell_bits, cell_states, cell_pend,
                   max_cells, n_cells_ret, nullptr, max_cell_tokens_ret);
}

// v8 scan: dbg_scan plus dense token records (see ScanRecs).
// Returns blocks, or the scan_impl error codes (-5 = record capacity).
int64_t dbg_scan2(const uint8_t* data, uint64_t size,
                  BlockRec* blocks, int64_t max_blocks,
                  int32_t* lengths_buf,
                  int64_t cell_bits,
                  int64_t* cell_states, int32_t* cell_pend,
                  int64_t max_cells, int64_t* n_cells_ret,
                  int32_t* m_pos, int32_t* m_meta, int64_t max_matches,
                  int64_t* n_matches_ret,
                  int32_t* r_pos, int32_t* r_cell, int32_t* r_j0len,
                  int64_t max_runs, int64_t* n_runs_ret,
                  int32_t* max_cell_tokens_ret,
                  uint64_t* out_size_ret,
                  uint8_t* lit_bytes, int64_t max_lits,
                  int64_t* n_lits_ret) {
  ScanRecs recs{m_pos, m_meta, max_matches, 0,
                r_pos, r_cell, r_j0len, max_runs, 0, 0,
                lit_bytes, max_lits, 0};
  int64_t nb = scan_impl(data, size, blocks, max_blocks, lengths_buf,
                         nullptr, 0, out_size_ret, cell_bits, cell_states,
                         cell_pend, max_cells, n_cells_ret, &recs);
  if (n_matches_ret) *n_matches_ret = recs.n_matches;
  if (n_runs_ret) *n_runs_ret = recs.n_runs;
  if (max_cell_tokens_ret) *max_cell_tokens_ret = recs.max_cell_tokens;
  if (n_lits_ret) *n_lits_ret = recs.n_lits;
  return nb;
}

// ---------------------------------------------------------------------------
// Group packing for the v9 match kernel.
//
// The device kernel executes groups of GROUP=8 match copies with all loads
// issued before all stores and NO conflict checking, so every group must be
// internally clean: no slot's source range may overlap another slot's (or
// its own) destination range.  This packer guarantees that by construction:
//
//  * long matches (len > 128) are split into <=128-byte pieces — for
//    dist >= len the pieces are mutually clean (src block lies entirely
//    below the first dst), so they can share a group;
//  * RLE matches (dist < len) are split into pattern-doubling pieces, each
//    with dist_k >= len_k; consecutive pieces conflict (each reads the
//    previous piece's output), which the group packer resolves by placing
//    them in successive groups;
//  * a small in-order deferred queue lets a blocked match wait while later
//    independent matches fill the current group (safe: with dist >= len,
//    src+len <= dst, so an earlier match never reads a later match's
//    destination — executing a later match early cannot disturb it);
//  * groups never span a seg_bytes output boundary, and a piece crossing
//    the boundary is split there (the kernel resolves one segment per
//    launch with only a 32 KiB carried tail).
//
// Padding slots get len 0 and pos = segment start.  Outputs: g_pos/g_meta
// (n_slots entries, multiple of GROUP), seg_lo/seg_hi per-segment slot
// ranges.  Returns n_slots, or -1 if max_slots is too small.
// ---------------------------------------------------------------------------

static const int kGroup = 8;
static const int kPieceMax = 128;
static const int kDeferMax = 64;

struct PieceSrc {
  const int32_t* m_pos;
  const int32_t* m_meta;
  int64_t n;
  int64_t i;        // next match
  // split state for the current match
  int64_t dst, src, remaining;
  int64_t avail;     // RLE mode: length of the materialized periodic run
  int64_t rle_dist;  // RLE mode: the period; 0 = plain (dist >= len)
  int64_t seg_bytes;

  bool next(int64_t* p_dst, int64_t* p_src, int64_t* p_len) {
    while (remaining == 0) {
      if (i >= n) return false;
      int64_t d = m_pos[i];
      int64_t l = (m_meta[i] >> 16) & 0xFFFF;
      int64_t dist = m_meta[i] & 0xFFFF;
      i++;
      if (l <= 0) continue;
      dst = d;
      src = d - dist;
      remaining = l;
      if (dist < l) {  // RLE: grow the periodic run by doubling
        rle_dist = dist;
        avail = dist;
      } else {
        rle_dist = 0;
      }
    }
    int64_t len, piece_dist;
    if (rle_dist == 0) {
      len = remaining < kPieceMax ? remaining : kPieceMax;
      piece_dist = dst - src;
    } else {
      // The run out[src, dst) has period rle_dist; any copy whose
      // distance is a multiple of the period extends it correctly and
      // stays clean (len <= dist).  Take the largest such distance.
      piece_dist = avail - avail % rle_dist;
      len = piece_dist < remaining ? piece_dist : remaining;
      if (len > kPieceMax) len = kPieceMax;
    }
    // split at the dst 128-byte row boundary (which also covers the
    // segment boundary): every piece then satisfies (dst&127)+len <= 128,
    // so the kernel's store is a single masked row and its load a 2-row
    // window (v11 narrow-piece path).
    int64_t row_end = (dst / 128 + 1) * 128;
    if (dst + len > row_end) len = row_end - dst;
    *p_dst = dst;
    *p_src = dst - piece_dist;
    *p_len = len;
    dst += len;
    if (rle_dist == 0) src += len;
    else avail += len;
    remaining -= len;
    return true;
  }
};

int64_t dbg_pack_groups(const int32_t* m_pos, const int32_t* m_meta,
                        int64_t n, int64_t seg_bytes, int64_t n_seg,
                        int32_t* g_pos, int32_t* g_meta, int64_t max_slots,
                        int32_t* seg_lo, int32_t* seg_hi) {
  PieceSrc ps{m_pos, m_meta, n,
              /*i=*/0, /*dst=*/0, /*src=*/0, /*remaining=*/0,
              /*avail=*/0, /*rle_dist=*/0, seg_bytes};
  struct Pc { int64_t dst, src, len; };
  Pc defer[kDeferMax];
  int n_defer = 0;
  bool src_done = false;

  int64_t slot = 0;
  int64_t cur_seg = 0;
  if (n_seg > 0) seg_lo[0] = 0;

  Pc group[kGroup];
  int gn = 0;
  int64_t group_seg = -1;  // segment of the current group (-1 = empty)

  auto flush = [&]() -> bool {
    if (gn == 0) return true;
    if (slot + kGroup > max_slots) return false;
    int64_t seg_start = group_seg * seg_bytes;
    for (int k = 0; k < kGroup; k++) {
      if (k < gn) {
        g_pos[slot + k] = (int32_t)group[k].dst;
        g_meta[slot + k] = (int32_t)((group[k].len << 16) |
                                     (group[k].dst - group[k].src));
      } else {
        g_pos[slot + k] = (int32_t)seg_start;
        g_meta[slot + k] = 0;
      }
    }
    slot += kGroup;
    gn = 0;
    group_seg = -1;
    return true;
  };

  // src range [s, s+l) vs dst range of pending pieces (group + earlier
  // deferred entries that remain unplaced).
  auto conflicts = [&](const Pc& c, int defer_upto) -> bool {
    for (int k = 0; k < gn; k++)
      if (c.src < group[k].dst + group[k].len && c.src + c.len > group[k].dst)
        return true;
    for (int k = 0; k < defer_upto; k++)
      if (defer[k].len > 0 && c.src < defer[k].dst + defer[k].len &&
          c.src + c.len > defer[k].dst)
        return true;
    return false;
  };

  auto seg_of = [&](int64_t dst) { return dst / seg_bytes; };

  auto advance_seg = [&](int64_t seg) -> bool {
    while (cur_seg < seg) {
      seg_hi[cur_seg] = (int32_t)slot;
      cur_seg++;
      if (cur_seg < n_seg) seg_lo[cur_seg] = (int32_t)slot;
    }
    return true;
  };

  auto place = [&](const Pc& c) { group[gn++] = c; };

  for (;;) {
    // Try deferred entries first (in order), then pull fresh pieces.
    bool placed_any = false;
    for (int k = 0; k < n_defer && gn < kGroup; k++) {
      if (defer[k].len <= 0) continue;
      int64_t seg = seg_of(defer[k].dst);
      if (group_seg >= 0 && seg != group_seg) continue;
      if (conflicts(defer[k], k)) continue;
      if (group_seg < 0) {
        if (!advance_seg(seg)) return -1;
        group_seg = seg;
      }
      place(defer[k]);
      defer[k].len = 0;
      placed_any = true;
    }
    // compact the deferred queue
    int w = 0;
    for (int k = 0; k < n_defer; k++)
      if (defer[k].len > 0) defer[w++] = defer[k];
    n_defer = w;

    while (gn < kGroup && !src_done && n_defer < kDeferMax) {
      Pc c;
      if (!ps.next(&c.dst, &c.src, &c.len)) { src_done = true; break; }
      int64_t seg = seg_of(c.dst);
      if ((group_seg >= 0 && seg != group_seg) || conflicts(c, n_defer)) {
        defer[n_defer++] = c;
        continue;
      }
      if (group_seg < 0) {
        if (!advance_seg(seg)) return -1;
        group_seg = seg;
      }
      place(c);
      placed_any = true;
    }

    if (gn > 0) {
      if (!flush()) return -1;
      continue;
    }
    if (n_defer > 0) {
      if (placed_any) continue;
      // Group is empty and nothing placed: defer[0]'s blockers have all
      // executed, so it is always placeable — seed the next group with it.
      if (!advance_seg(seg_of(defer[0].dst))) return -1;
      group_seg = seg_of(defer[0].dst);
      place(defer[0]);
      defer[0].len = 0;
      int w2 = 0;
      for (int k = 0; k < n_defer; k++)
        if (defer[k].len > 0) defer[w2++] = defer[k];
      n_defer = w2;
      continue;
    }
    if (src_done) break;
  }
  if (!flush()) return -1;
  while (cur_seg < n_seg) {
    seg_hi[cur_seg] = (int32_t)slot;
    cur_seg++;
    if (cur_seg < n_seg) seg_lo[cur_seg] = (int32_t)slot;
  }
  return slot;
}

// ---------------------------------------------------------------------------
// Checksums (slice-by-8 CRC-32; straightforward Adler-32).
// ---------------------------------------------------------------------------

static uint32_t crc_tab[8][256];
static int crc_init_done = 0;

static void crc_init() {
  if (crc_init_done) return;
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t c = i;
    for (int k = 0; k < 8; k++) c = (c & 1) ? (c >> 1) ^ 0xEDB88320u : c >> 1;
    crc_tab[0][i] = c;
  }
  for (int s = 1; s < 8; s++)
    for (uint32_t i = 0; i < 256; i++)
      crc_tab[s][i] = (crc_tab[s - 1][i] >> 8) ^ crc_tab[0][crc_tab[s - 1][i] & 0xFF];
  crc_init_done = 1;
}

uint32_t dbg_crc32(const uint8_t* data, uint64_t n, uint32_t crc) {
  crc_init();
  uint32_t c = crc ^ 0xFFFFFFFFu;
  while (n && ((uintptr_t)data & 7)) { c = (c >> 8) ^ crc_tab[0][(c ^ *data++) & 0xFF]; n--; }
  while (n >= 8) {
    uint32_t lo, hi;
    std::memcpy(&lo, data, 4);
    std::memcpy(&hi, data + 4, 4);
    lo ^= c;
    c = crc_tab[7][lo & 0xFF] ^ crc_tab[6][(lo >> 8) & 0xFF] ^
        crc_tab[5][(lo >> 16) & 0xFF] ^ crc_tab[4][lo >> 24] ^
        crc_tab[3][hi & 0xFF] ^ crc_tab[2][(hi >> 8) & 0xFF] ^
        crc_tab[1][(hi >> 16) & 0xFF] ^ crc_tab[0][hi >> 24];
    data += 8; n -= 8;
  }
  while (n--) c = (c >> 8) ^ crc_tab[0][(c ^ *data++) & 0xFF];
  return c ^ 0xFFFFFFFFu;
}

// ---------------------------------------------------------------------------
// Sequence-parallel taint analysis (SURVEY §5.7).  The output range
// [0, out_size) is split into shards of shard_bytes; shard s's decode
// depends on shard s-1's final tail (the ≤32 KiB DEFLATE window).  This
// pass computes, exactly, which bytes/matches are *tainted* — i.e. derive
// (transitively, through LZ77 copies) from their shard's incoming window
// — so the device can resolve all shards in parallel with zero windows
// and then replay only the tainted matches after a ring tail exchange.
//
// m_pos/m_meta: match records in stream (dst) order — dst and
// len<<16|dist, exactly the scanner's output.  Literal bytes are never
// tainted.  Outputs: m_taint[i] = 1 if match i writes any tainted byte;
// tail_taint[s] = 1 if shard s's last `window` bytes contain taint.
// Returns the number of tainted matches.
// ---------------------------------------------------------------------------
int64_t dbg_taint(const int32_t* m_pos, const int32_t* m_meta, int64_t n,
                  int64_t out_size, int64_t shard_bytes, int64_t window,
                  uint8_t* taint_buf /* out_size scratch, zeroed here */,
                  uint8_t* m_taint, uint8_t* tail_taint, int64_t n_shards) {
  memset(taint_buf, 0, (size_t)out_size);
  memset(tail_taint, 0, (size_t)n_shards);
  int64_t n_tainted = 0;
  for (int64_t i = 0; i < n; i++) {
    int64_t dst = m_pos[i];
    int64_t len = (m_meta[i] >> 16) & 0xFFFF;
    int64_t dist = m_meta[i] & 0xFFFF;
    int64_t shard_start = (dst / shard_bytes) * shard_bytes;
    uint8_t any = 0;
    for (int64_t k = 0; k < len; k++) {
      int64_t d = dst + k;
      int64_t s = d - dist;
      // A dst that crosses into the next shard re-bases its window.
      int64_t ss = (d / shard_bytes) * shard_bytes;
      uint8_t t = (s < ss) ? (uint8_t)1 : taint_buf[s];
      taint_buf[d] = t;
      any |= t;
    }
    (void)shard_start;
    if (any) { m_taint[i] = 1; n_tainted++; } else { m_taint[i] = 0; }
  }
  for (int64_t s = 0; s < n_shards; s++) {
    int64_t end = (s + 1) * shard_bytes;
    if (end > out_size) end = out_size;
    int64_t lo = end - window;
    if (lo < s * shard_bytes) lo = s * shard_bytes;
    for (int64_t p = lo; p < end; p++)
      if (taint_buf[p]) { tail_taint[s] = 1; break; }
  }
  return n_tainted;
}

uint32_t dbg_adler32(const uint8_t* data, uint64_t n, uint32_t adler) {
  uint32_t s1 = adler & 0xFFFF, s2 = adler >> 16;
  while (n) {
    uint64_t chunk = n > 5552 ? 5552 : n;  // max bytes before s2 overflow
    n -= chunk;
    while (chunk--) { s1 += *data++; s2 += s1; }
    s1 %= 65521; s2 %= 65521;
  }
  return (s2 << 16) | s1;
}

}  // extern "C"

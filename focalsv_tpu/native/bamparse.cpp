// Native batch BAM record parser.
//
// Parses a buffer of concatenated length-prefixed BAM alignment records
// (the decompressed BGZF payload after the header) into column arrays in
// two passes: count, then fill.  Replaces the per-record Python
// parse_record hot loop (io/bam.py) on the region tile-build path -- the
// Python parser costs ~60us/record and holds the GIL; this runs at
// ~memcpy speed and is called with the GIL released (ctypes).
//
// Reference role: pysam's fetch decode loops used throughout the
// reference's extractors (e.g. extract_contig_signature_CCS.py:342-375).

#include <cstdint>
#include <cstring>

namespace {

struct RecHead {
    int32_t block_size;
    int32_t ref_id;
    int32_t pos;
    uint8_t l_read_name;
    uint8_t mapq;
    uint16_t bin;
    uint16_t n_cigar;
    uint16_t flag;
    int32_t l_seq;
    int32_t next_ref;
    int32_t next_pos;
    int32_t tlen;
} __attribute__((packed));

// 4-bit nibble -> uint8 code (A0 C1 G2 T3, everything else N=4);
// nibble alphabet "=ACMGRSVTWYHKDBN" (io/bam.py::_SEQ_NT16)
static const uint8_t NIB2CODE[16] = {
    4, 0, 1, 4, 2, 4, 4, 4, 3, 4, 4, 4, 4, 4, 4, 4};

}  // namespace

extern "C" {

namespace {
// A record whose variable-length fields don't fit inside block_size (or
// with a negative l_seq) is corrupt: both passes treat it as end-of-parse
// so neither ever walks past rec_end / past the buffer.
inline bool rec_fields_fit(const RecHead& h, int64_t sz) {
    if (h.l_seq < 0) return false;
    const int64_t need = (int64_t)sizeof(RecHead) - 4 + h.l_read_name +
                         4LL * h.n_cigar + ((int64_t)h.l_seq + 1) / 2 +
                         h.l_seq;
    return need <= sz;
}
}  // namespace

// Pass 1: count complete records and their cigar/seq totals.
// Returns the number of complete records; *consumed gets the byte length
// of the complete-record prefix (a trailing partial record is excluded).
int64_t bamparse_count(const uint8_t* buf, int64_t n,
                       int64_t* total_cigar_ops, int64_t* total_seq,
                       int64_t* consumed) {
    int64_t p = 0, nrec = 0, cig = 0, seq = 0;
    while (p + 4 <= n) {
        int32_t sz;
        std::memcpy(&sz, buf + p, 4);
        if (sz < (int64_t)sizeof(RecHead) - 4 || p + 4 + (int64_t)sz > n)
            break;
        RecHead h;
        std::memcpy(&h, buf + p, sizeof(RecHead));
        if (!rec_fields_fit(h, sz)) break;
        cig += h.n_cigar;
        seq += h.l_seq;
        nrec += 1;
        p += 4 + sz;
    }
    *total_cigar_ops = cig;
    *total_seq = seq;
    *consumed = p;
    return nrec;
}

// Pass 2: fill column arrays (sized from pass 1 by the caller).
// cig_out is (total_cigar_ops, 2) int32 [op, len]; seq_out/qual_out are
// uint8 of total_seq.  name/tags stay as (offset, length) into buf.
int64_t bamparse_fill(
    const uint8_t* buf, int64_t n,
    int32_t* ref_id, int32_t* pos, int32_t* mapq, int32_t* flag,
    int32_t* next_ref, int32_t* next_pos, int32_t* tlen,
    int64_t* name_off, int32_t* name_len,
    int64_t* cig_off, int32_t* n_cigar,
    int64_t* seq_off, int32_t* l_seq,
    int64_t* tags_off, int32_t* tags_len,
    int32_t* cig_out, uint8_t* seq_out, uint8_t* qual_out) {
    int64_t p = 0, nrec = 0, cigp = 0, seqp = 0;
    while (p + 4 <= n) {
        int32_t sz;
        std::memcpy(&sz, buf + p, 4);
        if (sz < (int64_t)sizeof(RecHead) - 4 || p + 4 + (int64_t)sz > n)
            break;
        RecHead h;
        std::memcpy(&h, buf + p, sizeof(RecHead));
        if (!rec_fields_fit(h, sz)) break;
        const int64_t rec_end = p + 4 + sz;
        ref_id[nrec] = h.ref_id;
        pos[nrec] = h.pos;
        mapq[nrec] = h.mapq;
        flag[nrec] = h.flag;
        next_ref[nrec] = h.next_ref;
        next_pos[nrec] = h.next_pos;
        tlen[nrec] = h.tlen;
        int64_t q = p + sizeof(RecHead);
        name_off[nrec] = q;
        name_len[nrec] = h.l_read_name > 0 ? h.l_read_name - 1 : 0;
        q += h.l_read_name;
        cig_off[nrec] = cigp;
        n_cigar[nrec] = h.n_cigar;
        for (int i = 0; i < h.n_cigar; i++) {
            uint32_t raw;
            std::memcpy(&raw, buf + q + 4LL * i, 4);
            cig_out[2 * (cigp + i)] = (int32_t)(raw & 0xF);
            cig_out[2 * (cigp + i) + 1] = (int32_t)(raw >> 4);
        }
        cigp += h.n_cigar;
        q += 4LL * h.n_cigar;
        seq_off[nrec] = seqp;
        l_seq[nrec] = h.l_seq;
        const int64_t nsb = ((int64_t)h.l_seq + 1) / 2;
        for (int64_t i = 0; i < nsb; i++) {
            const uint8_t b = buf[q + i];
            seq_out[seqp + 2 * i] = NIB2CODE[b >> 4];
            if (2 * i + 1 < h.l_seq)
                seq_out[seqp + 2 * i + 1] = NIB2CODE[b & 0xF];
        }
        q += nsb;
        std::memcpy(qual_out + seqp, buf + q, h.l_seq);
        q += h.l_seq;
        seqp += h.l_seq;
        tags_off[nrec] = q;
        tags_len[nrec] = (int32_t)(rec_end - q);
        nrec += 1;
        p = rec_end;
    }
    return nrec;
}

}  // extern "C"

// ---------------------------------------------------------------------
// Native region tile builder: the compact_pileup_rows walk + split-half
// nibble packing (assembly/consensus.py::compact_pileup_rows +
// parallel/region_step.py::pack_row_tile/pack_nibbles) in one pass.
// Semantics are kept bit-identical to the Python implementations.
// ---------------------------------------------------------------------

namespace {
// BAM cigar op codes (io/bam.py)
enum { CMATCH = 0, CINS = 1, CDEL = 2, CREF_SKIP = 3, CSOFT_CLIP = 4,
       CEQUAL = 7, CDIFF = 8 };
const uint8_t NIB_DEL = 5, NIB_NOCOV = 15;
const uint8_t SYM_DEL = 254;

inline uint8_t sym2nib(uint8_t v) {
    // NIB_MAP parity: 0..4 map to themselves, DEL_SYM -> 5, everything
    // else (incl. symbol 5 = enc.PAD) -> NOCOV
    return v < 5 ? v : (v == SYM_DEL ? NIB_DEL : NIB_NOCOV);
}

// split-half nibble write: buffer column p of a W-wide row
inline void nib_write(uint8_t* row_bytes, int64_t W, int64_t p, uint8_t v) {
    const int64_t h = W / 2;
    if (p < h)
        row_bytes[p] = (uint8_t)((row_bytes[p] & 0xF0) | v);
    else
        row_bytes[p - h] = (uint8_t)((row_bytes[p - h] & 0x0F) | (v << 4));
}
}  // namespace

extern "C" {

// Pass 1: per-read covered spans [r0, r1) within the region and insertion
// counts/sizes.  Returns total insertion count.
int64_t tile_spans(const int64_t* cig_ptrs, const int32_t* n_cigs,
                   const int32_t* poss, int64_t R,
                   int64_t region_start, int64_t region_len,
                   int32_t* r0_out, int32_t* r1_out,
                   int64_t* ins_seq_total) {
    int64_t n_ins = 0, seq_total = 0;
    for (int64_t i = 0; i < R; i++) {
        const int32_t* cig = (const int32_t*)(intptr_t)cig_ptrs[i];
        const int32_t nc = n_cigs[i];
        const int64_t rpos = (int64_t)poss[i] - region_start;
        // span first: a read with an empty clipped span contributes NO
        // insertion candidates (compact_pileup_rows `continue`s before
        // its CIGAR walk for such reads -- parity requires the same here)
        int64_t total_ref = 0;
        for (int32_t k = 0; k < nc; k++) {
            const int32_t op = cig[2 * k];
            if (op == CMATCH || op == CEQUAL || op == CDIFF ||
                op == CDEL || op == CREF_SKIP)
                total_ref += cig[2 * k + 1];
        }
        int64_t r0 = rpos > 0 ? rpos : 0;
        int64_t r1 = rpos + total_ref < region_len ? rpos + total_ref
                                                   : region_len;
        if (r1 <= r0) { r0 = 0; r1 = 0; }
        r0_out[i] = (int32_t)r0;
        r1_out[i] = (int32_t)r1;
        if (r1 <= r0) continue;
        int64_t ref_len = 0;
        for (int32_t k = 0; k < nc; k++) {
            const int32_t op = cig[2 * k];
            const int32_t ln = cig[2 * k + 1];
            if (op == CMATCH || op == CEQUAL || op == CDIFF ||
                op == CDEL || op == CREF_SKIP) {
                ref_len += ln;
            }
            if (op == CINS) {
                const int64_t at = rpos + ref_len;
                if (at >= 0 && at < region_len) {
                    n_ins += 1;
                    seq_total += ln;
                }
            }
        }
    }
    *ins_seq_total = seq_total;
    return n_ins;
}

// Pass 2: fill the (R, W_pad/2) split-half nibble matrix (pre-filled with
// 0xFF by the caller) and the insertion arrays.  Each row i is placed at
// in-buffer offset r0[i] % block.  Returns the insertion count written.
int64_t tile_fill(const int64_t* cig_ptrs, const int32_t* n_cigs,
                  const int64_t* seq_ptrs, const int32_t* poss,
                  int64_t R, int64_t region_start, int64_t region_len,
                  int64_t W_pad, int64_t block,
                  const int32_t* r0s, const int32_t* r1s,
                  uint8_t* nib_out,
                  int32_t* ins_rpos, int32_t* ins_read,
                  int64_t* ins_off, int32_t* ins_len, uint8_t* ins_seq) {
    int64_t ins_n = 0, ins_seq_p = 0;
    const int64_t row_bytes_n = W_pad / 2;
    for (int64_t i = 0; i < R; i++) {
        if (r1s[i] <= r0s[i]) continue;   // empty span: no row, no INS
        const int32_t* cig = (const int32_t*)(intptr_t)cig_ptrs[i];
        const uint8_t* seq = (const uint8_t*)(intptr_t)seq_ptrs[i];
        const int32_t nc = n_cigs[i];
        uint8_t* row = nib_out + i * row_bytes_n;
        const int64_t r0 = r0s[i];
        const int64_t off = (r0 % block) - r0;   // buffer p = col + off
        int64_t rpos = (int64_t)poss[i] - region_start;
        int64_t qpos = 0;
        for (int32_t k = 0; k < nc; k++) {
            const int32_t op = cig[2 * k];
            const int64_t ln = cig[2 * k + 1];
            if (op == CMATCH || op == CEQUAL || op == CDIFF) {
                int64_t a = r0 - rpos > 0 ? r0 - rpos : 0;
                int64_t b = region_len - rpos < ln ? region_len - rpos : ln;
                for (int64_t c = a; c < b; c++)
                    nib_write(row, W_pad, rpos + c + off,
                              sym2nib(seq[qpos + c]));
                rpos += ln;
                qpos += ln;
            } else if (op == CINS) {
                if (rpos >= 0 && rpos < region_len) {
                    ins_rpos[ins_n] = (int32_t)rpos;
                    ins_read[ins_n] = (int32_t)i;
                    ins_off[ins_n] = ins_seq_p;
                    ins_len[ins_n] = (int32_t)ln;
                    std::memcpy(ins_seq + ins_seq_p, seq + qpos, ln);
                    ins_seq_p += ln;
                    ins_n += 1;
                }
                qpos += ln;
            } else if (op == CSOFT_CLIP) {
                qpos += ln;
            } else if (op == CDEL || op == CREF_SKIP) {
                int64_t a = r0 - rpos > 0 ? r0 - rpos : 0;
                int64_t b = region_len - rpos < ln ? region_len - rpos : ln;
                for (int64_t c = a; c < b; c++)
                    nib_write(row, W_pad, rpos + c + off, NIB_DEL);
                rpos += ln;
            }
        }
    }
    return ins_n;
}

// ---------------------------------------------------------------------
// Reference-delta tile extraction: each read becomes its covered span
// [r0, r1) plus sparse deviations from the region reference --
// substitutions (col, sym) and deletion runs [a, b) (CIGAR D and N ops,
// exactly the columns the dense tile writes NIB_DEL).  The device kernel
// (parallel/region_step.py::_one_region_delta) reconstructs the exact
// column counts, so h2d ships O(deviations) instead of O(span/2) bytes.
// Span/clip semantics bit-match tile_spans/tile_fill (and thus
// assembly/consensus.py::compact_pileup_rows).
// ---------------------------------------------------------------------

// Pass 1: spans + deviation/insertion counts.
void tile_delta_count(const int64_t* cig_ptrs, const int32_t* n_cigs,
                      const int64_t* seq_ptrs, const uint8_t* ref,
                      const int32_t* poss, int64_t R,
                      int64_t region_start, int64_t region_len,
                      int32_t* r0_out, int32_t* r1_out,
                      int64_t* n_subs, int64_t* n_dels, int64_t* n_ins,
                      int64_t* ins_seq_total) {
    int64_t subs = 0, dels = 0, ins = 0, seq_total = 0;
    for (int64_t i = 0; i < R; i++) {
        const int32_t* cig = (const int32_t*)(intptr_t)cig_ptrs[i];
        const uint8_t* seq = (const uint8_t*)(intptr_t)seq_ptrs[i];
        const int32_t nc = n_cigs[i];
        const int64_t rpos0 = (int64_t)poss[i] - region_start;
        int64_t total_ref = 0;
        for (int32_t k = 0; k < nc; k++) {
            const int32_t op = cig[2 * k];
            if (op == CMATCH || op == CEQUAL || op == CDIFF ||
                op == CDEL || op == CREF_SKIP)
                total_ref += cig[2 * k + 1];
        }
        int64_t r0 = rpos0 > 0 ? rpos0 : 0;
        int64_t r1 = rpos0 + total_ref < region_len ? rpos0 + total_ref
                                                    : region_len;
        if (r1 <= r0) { r0 = 0; r1 = 0; }
        r0_out[i] = (int32_t)r0;
        r1_out[i] = (int32_t)r1;
        if (r1 <= r0) continue;
        int64_t rpos = rpos0, qpos = 0;
        for (int32_t k = 0; k < nc; k++) {
            const int32_t op = cig[2 * k];
            const int64_t ln = cig[2 * k + 1];
            if (op == CMATCH || op == CEQUAL || op == CDIFF) {
                int64_t a = r0 - rpos > 0 ? r0 - rpos : 0;
                int64_t b = region_len - rpos < ln ? region_len - rpos : ln;
                for (int64_t c = a; c < b; c++)
                    if (sym2nib(seq[qpos + c]) != ref[rpos + c]) subs++;
                rpos += ln;
                qpos += ln;
            } else if (op == CINS) {
                if (rpos >= 0 && rpos < region_len) {
                    ins++;
                    seq_total += ln;
                }
                qpos += ln;
            } else if (op == CSOFT_CLIP) {
                qpos += ln;
            } else if (op == CDEL || op == CREF_SKIP) {
                int64_t a = rpos > r0 ? rpos : r0;
                int64_t b = rpos + ln < r1 ? rpos + ln : r1;
                if (b > a) dels++;
                rpos += ln;
            }
        }
    }
    *n_subs = subs;
    *n_dels = dels;
    *n_ins = ins;
    *ins_seq_total = seq_total;
}

// Pass 2: fill the deviation arrays (sized from pass 1).
void tile_delta_fill(const int64_t* cig_ptrs, const int32_t* n_cigs,
                     const int64_t* seq_ptrs, const uint8_t* ref,
                     const int32_t* poss, int64_t R,
                     int64_t region_start, int64_t region_len,
                     const int32_t* r0s, const int32_t* r1s,
                     int32_t* sub_pos, int32_t* sub_read, uint8_t* sub_sym,
                     int32_t* del_read, int32_t* del_a, int32_t* del_b,
                     int32_t* ins_rpos, int32_t* ins_read,
                     int64_t* ins_off, int32_t* ins_len, uint8_t* ins_seq) {
    int64_t ns = 0, nd = 0, ni = 0, ins_seq_p = 0;
    for (int64_t i = 0; i < R; i++) {
        if (r1s[i] <= r0s[i]) continue;
        const int32_t* cig = (const int32_t*)(intptr_t)cig_ptrs[i];
        const uint8_t* seq = (const uint8_t*)(intptr_t)seq_ptrs[i];
        const int32_t nc = n_cigs[i];
        const int64_t r0 = r0s[i], r1 = r1s[i];
        int64_t rpos = (int64_t)poss[i] - region_start, qpos = 0;
        for (int32_t k = 0; k < nc; k++) {
            const int32_t op = cig[2 * k];
            const int64_t ln = cig[2 * k + 1];
            if (op == CMATCH || op == CEQUAL || op == CDIFF) {
                int64_t a = r0 - rpos > 0 ? r0 - rpos : 0;
                int64_t b = region_len - rpos < ln ? region_len - rpos : ln;
                for (int64_t c = a; c < b; c++) {
                    const uint8_t s = sym2nib(seq[qpos + c]);
                    if (s != ref[rpos + c]) {
                        sub_pos[ns] = (int32_t)(rpos + c);
                        sub_read[ns] = (int32_t)i;
                        sub_sym[ns] = s;
                        ns++;
                    }
                }
                rpos += ln;
                qpos += ln;
            } else if (op == CINS) {
                if (rpos >= 0 && rpos < region_len) {
                    ins_rpos[ni] = (int32_t)rpos;
                    ins_read[ni] = (int32_t)i;
                    ins_off[ni] = ins_seq_p;
                    ins_len[ni] = (int32_t)ln;
                    std::memcpy(ins_seq + ins_seq_p, seq + qpos, ln);
                    ins_seq_p += ln;
                    ni++;
                }
                qpos += ln;
            } else if (op == CSOFT_CLIP) {
                qpos += ln;
            } else if (op == CDEL || op == CREF_SKIP) {
                int64_t a = rpos > r0 ? rpos : r0;
                int64_t b = rpos + ln < r1 ? rpos + ln : r1;
                if (b > a) {
                    del_read[nd] = (int32_t)i;
                    del_a[nd] = (int32_t)a;
                    del_b[nd] = (int32_t)b;
                    nd++;
                }
                rpos += ln;
            }
        }
    }
}

}  // extern "C"

// ---------------------------------------------------------------------
// Native read-signature CIGAR extraction + per-alignment geometry
// (signatures/contig.py::sigs_from_cigar + _aln_geometry semantics,
// batched over reads; feeds signatures/reads.py::extract_read_sigs).
// ---------------------------------------------------------------------

namespace {
enum { CHARD_CLIP = 5, CPAD = 6 };
inline bool consumes_ref(int32_t op) {
    return op == CMATCH || op == CDEL || op == CREF_SKIP ||
           op == CEQUAL || op == CDIFF;
}
inline bool consumes_query(int32_t op) {
    return op == CMATCH || op == CINS || op == CSOFT_CLIP ||
           op == CEQUAL || op == CDIFF;
}
inline bool full_query(int32_t op) {   // M/I/S/H/=/X (read-length ops)
    return consumes_query(op) || op == CHARD_CLIP;
}
}  // namespace

extern "C" {

// Per-read geometry (one row per read): ref_end, read_start, read_end,
// read_len, clip_head, clip_tail (ref_start = poss[i] is caller-known).
void aln_geometry_batch(const int64_t* cig_ptrs, const int32_t* n_cigs,
                        const int32_t* poss, int64_t R,
                        int64_t* ref_end, int64_t* read_start,
                        int64_t* read_end, int64_t* read_len,
                        uint8_t* clip_head, uint8_t* clip_tail) {
    for (int64_t i = 0; i < R; i++) {
        const int32_t* cig = (const int32_t*)(intptr_t)cig_ptrs[i];
        const int32_t nc = n_cigs[i];
        int64_t rl = 0, ref_l = 0;
        for (int32_t k = 0; k < nc; k++) {
            const int32_t op = cig[2 * k];
            const int64_t ln = cig[2 * k + 1];
            if (full_query(op)) rl += ln;
            if (consumes_ref(op)) ref_l += ln;
        }
        const bool ch = nc > 0 && (cig[0] == CSOFT_CLIP ||
                                   cig[0] == CHARD_CLIP);
        const bool ct = nc > 0 && (cig[2 * (nc - 1)] == CSOFT_CLIP ||
                                   cig[2 * (nc - 1)] == CHARD_CLIP);
        ref_end[i] = poss[i] + ref_l;
        read_start[i] = ch ? cig[1] : 0;
        read_end[i] = rl - (ct ? cig[2 * (nc - 1) + 1] : 0);
        read_len[i] = rl;
        clip_head[i] = ch;
        clip_tail[i] = ct;
    }
}

// CIGAR DEL/INS signatures >= min_svlen from reads passing the mapq gate.
// Two-pass: count then fill.  Per read, DELs take priority over INSs on
// equal pos (the Python stable-sort order); offsets are emitted in
// full-contig space (leading hard clips included).
int64_t cigar_sigs_count(const int64_t* cig_ptrs, const int32_t* n_cigs,
                         const int32_t* mapqs, int64_t R,
                         int64_t min_mapq, int64_t min_svlen) {
    int64_t n = 0;
    for (int64_t i = 0; i < R; i++) {
        if (mapqs[i] < min_mapq) continue;
        const int32_t* cig = (const int32_t*)(intptr_t)cig_ptrs[i];
        const int32_t nc = n_cigs[i];
        for (int32_t k = 0; k < nc; k++) {
            const int32_t op = cig[2 * k];
            if ((op == CDEL || op == CINS) && cig[2 * k + 1] >= min_svlen)
                n++;
        }
    }
    return n;
}

int64_t cigar_sigs_fill(const int64_t* cig_ptrs, const int32_t* n_cigs,
                        const int32_t* poss, const int32_t* mapqs,
                        const int32_t* cids, const uint8_t* strands,
                        int64_t R, int64_t min_mapq, int64_t min_svlen,
                        int8_t* svtype, int64_t* pos, int64_t* svlen,
                        int32_t* contig, int64_t* rstart, int64_t* rend,
                        int8_t* strand_out, int32_t* mapq_out) {
    int64_t n = 0;
    for (int64_t i = 0; i < R; i++) {
        if (mapqs[i] < min_mapq) continue;
        const int32_t* cig = (const int32_t*)(intptr_t)cig_ptrs[i];
        const int32_t nc = n_cigs[i];
        if (nc == 0) continue;
        const int64_t base = n;
        int64_t ref_off = poss[i];
        int64_t q_off = cig[0] == CHARD_CLIP ? cig[1] : 0;
        for (int32_t k = 0; k < nc; k++) {
            const int32_t op = cig[2 * k];
            const int64_t ln = cig[2 * k + 1];
            if ((op == CDEL || op == CINS) && ln >= min_svlen) {
                // insert keeping per-read order sorted by pos with DEL
                // priority on ties (stable-sort parity with Python)
                int64_t j = n;
                while (j > base &&
                       (pos[j - 1] > ref_off ||
                        (pos[j - 1] == ref_off && svtype[j - 1] == 1 &&
                         op == CDEL))) {
                    pos[j] = pos[j - 1]; svlen[j] = svlen[j - 1];
                    svtype[j] = svtype[j - 1]; rstart[j] = rstart[j - 1];
                    rend[j] = rend[j - 1];
                    j--;
                }
                pos[j] = ref_off;
                svlen[j] = ln;
                svtype[j] = op == CDEL ? 0 : 1;
                rstart[j] = q_off;
                rend[j] = op == CDEL ? q_off + 1 : q_off + ln;
                n++;
            }
            if (consumes_ref(op)) ref_off += ln;
            if (consumes_query(op)) q_off += ln;
        }
        for (int64_t j = base; j < n; j++) {
            contig[j] = cids[i];
            strand_out[j] = (int8_t)strands[i];
            mapq_out[j] = mapqs[i];
        }
    }
    return n;
}

}  // extern "C"

// ---------------------------------------------------------------------
// Whole-buffer BGZF inflate (io/bam.py::BgzfReader.read_all, natively).
//
// The Python reader pays one zlib.decompress call + bytearray reassembly
// per 64 KB block under the GIL; at 30x coverage that is ~60% of the
// region-BAM load cost.  Here: one header walk to index the blocks, then
// the blocks inflate in parallel (each block's uncompressed offset is the
// prefix sum of the ISIZE footers, so writers never overlap).
//
// Reference contrast: the reference shells out to samtools (htslib's
// threaded BGZF codec) per region, 1_crop_bam.py:90-91.
// ---------------------------------------------------------------------

#include <zlib.h>

#include <thread>
#include <vector>

#ifdef HAVE_LIBDEFLATE
#include <libdeflate.h>
#endif

namespace {

struct BgzfBlock {
    int64_t cdata_off;   // compressed payload start
    int64_t cdata_len;
    int64_t uoff;        // uncompressed output offset
    int64_t ulen;        // ISIZE
};

// Walk block headers; returns blocks and total uncompressed size, or -1 on
// a malformed header (caller falls back to the Python reader).
int64_t bgzf_index(const uint8_t* raw, int64_t n,
                   std::vector<BgzfBlock>* blocks) {
    int64_t off = 0, usize = 0;
    while (off < n) {
        if (off + 18 > n) return -1;
        if (raw[off] != 0x1F || raw[off + 1] != 0x8B) return -1;
        uint16_t xlen;
        std::memcpy(&xlen, raw + off + 10, 2);
        int64_t p = off + 12, end_extra = p + xlen;
        if (end_extra > n) return -1;
        int64_t bsize = -1;
        while (p + 4 <= end_extra) {
            const uint8_t si1 = raw[p], si2 = raw[p + 1];
            uint16_t slen;
            std::memcpy(&slen, raw + p + 2, 2);
            if (p + 4 + slen > end_extra) return -1;  // subfield overruns
            if (si1 == 0x42 && si2 == 0x43 && slen >= 2) {
                uint16_t bs;
                std::memcpy(&bs, raw + p + 4, 2);
                bsize = (int64_t)bs + 1;
            }
            p += 4 + slen;
        }
        if (bsize < 0 || off + bsize > n || bsize < 12 + xlen + 8) return -1;
        uint32_t isize;
        std::memcpy(&isize, raw + off + bsize - 4, 4);
        BgzfBlock b;
        b.cdata_off = off + 12 + xlen;
        b.cdata_len = bsize - 12 - xlen - 8;
        b.uoff = usize;
        b.ulen = isize;
        if (isize > 0) blocks->push_back(b);
        usize += isize;
        off += bsize;
    }
    return usize;
}

bool inflate_one_zlib(const uint8_t* src, int64_t src_len,
                      uint8_t* dst, int64_t dst_len) {
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, -15) != Z_OK) return false;
    zs.next_in = const_cast<uint8_t*>(src);
    zs.avail_in = (uInt)src_len;
    zs.next_out = dst;
    zs.avail_out = (uInt)dst_len;
    const int rc = inflate(&zs, Z_FINISH);
    const bool ok = (rc == Z_STREAM_END) &&
                    (int64_t)zs.total_out == dst_len;
    inflateEnd(&zs);
    return ok;
}

#ifdef HAVE_LIBDEFLATE
// libdeflate's raw-deflate decoder is 2-3x faster than zlib's (it is what
// htslib links for BGZF); one decompressor object per worker stripe.
struct Inflater {
    libdeflate_decompressor* d;
    Inflater() : d(libdeflate_alloc_decompressor()) {}
    ~Inflater() { if (d) libdeflate_free_decompressor(d); }
    bool run(const uint8_t* src, int64_t src_len,
             uint8_t* dst, int64_t dst_len) {
        if (!d) return inflate_one_zlib(src, src_len, dst, dst_len);
        size_t actual = 0;
        const libdeflate_result rc = libdeflate_deflate_decompress(
            d, src, (size_t)src_len, dst, (size_t)dst_len, &actual);
        return rc == LIBDEFLATE_SUCCESS && (int64_t)actual == dst_len;
    }
};
#else
struct Inflater {
    bool run(const uint8_t* src, int64_t src_len,
             uint8_t* dst, int64_t dst_len) {
        return inflate_one_zlib(src, src_len, dst, dst_len);
    }
};
#endif

}  // namespace

extern "C" {

// Total uncompressed size of a BGZF buffer (header walk only), or -1.
int64_t bgzf_usize(const uint8_t* raw, int64_t n) {
    std::vector<BgzfBlock> blocks;
    return bgzf_index(raw, n, &blocks);
}

// Inflate every block into out (caller sized it via bgzf_usize).
// Returns bytes written, or -1 on any malformed/corrupt block.
int64_t bgzf_inflate_all(const uint8_t* raw, int64_t n,
                         uint8_t* out, int64_t out_cap, int64_t n_threads) {
    std::vector<BgzfBlock> blocks;
    const int64_t usize = bgzf_index(raw, n, &blocks);
    if (usize < 0 || usize > out_cap) return -1;
    const int64_t nb = (int64_t)blocks.size();
    if (nb == 0) return 0;
    int64_t nt = n_threads < 1 ? 1 : n_threads;
    if (nt > nb) nt = nb;
    std::vector<uint8_t> ok(nt, 1);
    auto work = [&](int64_t t) {
        // contiguous stripes: each thread's writes are one dst range
        Inflater inf;
        const int64_t lo = t * nb / nt, hi = (t + 1) * nb / nt;
        for (int64_t i = lo; i < hi; i++) {
            const BgzfBlock& b = blocks[i];
            if (!inf.run(raw + b.cdata_off, b.cdata_len,
                         out + b.uoff, b.ulen)) {
                ok[t] = 0;
                return;
            }
        }
    };
    if (nt == 1) {
        work(0);
    } else {
        std::vector<std::thread> ths;
        for (int64_t t = 0; t < nt; t++) ths.emplace_back(work, t);
        for (auto& th : ths) th.join();
    }
    for (int64_t t = 0; t < nt; t++)
        if (!ok[t]) return -1;
    return usize;
}

}  // extern "C"

// ---------------------------------------------------------------------
// Native consensus stitch (assembly/consensus.py::stitch_contig_segments,
// bit-parity port).  The Python original walks the op stream one run at a
// time under the GIL; noisy consensus tracks have thousands of
// single-column holes, making this the hottest ragged-finish piece.
// ---------------------------------------------------------------------

extern "C" {

// sym/covpos are the L-column consensus tracks (covpos = cov > 0);
// cut_pos/ins_off/ins_len (ascending cut_pos) describe the decided
// insertions whose bases live in ins_seq.  Outputs: contig bytes,
// per-segment (t0, ops_off, n_ops) and a shared (op, len) int32 ops pool.
// Returns packed counts ((n_segs << 40) | (ops_used << 20) | contig_len
// is too small; use three out-params instead).  ok = 0, caps hit = -1.
int64_t stitch_segments(
    const uint8_t* sym, const uint8_t* covpos, int64_t L,
    const int64_t* cut_pos, const int64_t* ins_off, const int64_t* ins_len,
    int64_t n_cut, const uint8_t* ins_seq, int64_t max_gap,
    uint8_t* contig_out, int64_t contig_cap,
    int32_t* ops_out, int64_t ops_cap,          // (op, len) pairs
    int64_t* seg_t0, int64_t* seg_ops_off, int64_t* seg_n_ops,
    int64_t seg_cap,
    int64_t* out_contig_len, int64_t* out_n_segs) {
    *out_contig_len = 0;
    *out_n_segs = 0;
    // ---- contig assembly + emitted-column stream in one pass ----
    // stream is built as (op, len) runs directly from the mask walk.
    std::vector<int32_t> stream;   // op,len pairs (lens < 2^31 since L is)
    stream.reserve(256);
    int64_t contig_len = 0, n_emit = 0;
    int64_t prev = -2;             // last reference column consumed; -2 = None
    bool any_emit_seen = false;
    int64_t first_pos = -1;
    int64_t ci = 0;                // next cut index
    auto push_op = [&](int32_t op, int64_t ln) {
        if (ln <= 0) return;
        if (!stream.empty() && stream[stream.size() - 2] == op)
            stream[stream.size() - 1] += (int32_t)ln;
        else {
            stream.push_back(op);
            stream.push_back((int32_t)ln);
        }
    };
    // emit columns in [a, b): append bases + M/D stream runs
    auto emit_range = [&](int64_t a, int64_t b) -> bool {
        if (a < 0) a = 0;
        if (b > L) b = L;     // a cut point at/past L emits no extra bases
        int64_t run = 0;
        for (int64_t p = a; p < b; p++) {
            if (sym[p] < 4 && covpos[p]) {
                if (contig_len >= contig_cap) return false;
                contig_out[contig_len++] = sym[p];
                n_emit++;
                if (first_pos < 0) first_pos = p;
                if (!any_emit_seen) {
                    any_emit_seen = true;
                } else if (prev >= -1 && p > prev + 1) {
                    push_op(CDEL, p - prev - 1);
                }
                push_op(CMATCH, 1);
                prev = p;
                run++;
            }
        }
        return true;
    };
    for (ci = 0; ci < n_cut; ci++) {
        const int64_t lo = ci ? cut_pos[ci - 1] : 0;
        const int64_t cp = cut_pos[ci];
        if (!emit_range(lo, cp)) return -1;
        // splice the insertion bases
        if (contig_len + ins_len[ci] > contig_cap) return -1;
        std::memcpy(contig_out + contig_len, ins_seq + ins_off[ci],
                    ins_len[ci]);
        contig_len += ins_len[ci];
        if (any_emit_seen && cp > prev + 1) {
            push_op(CDEL, cp - prev - 1);
            prev = cp - 1;
        }
        // INS never merges with a previous INS in the Python original
        // (separate appends) -- but push_op merges adjacent same-op runs.
        // The original DOES append (CINS, len) individually, and two
        // adjacent CINS ops only arise from two cut points with no emitted
        // base between them; downstream treats a merged run identically,
        // but bit-parity requires keeping them split.
        stream.push_back(CINS);
        stream.push_back((int32_t)ins_len[ci]);
    }
    if (!emit_range(n_cut ? cut_pos[n_cut - 1] : 0, L)) return -1;
    if (contig_len == 0) return 0;                   // (None, [])
    if (n_emit == 0) { *out_contig_len = contig_len; return 0; }  // no anchor
    // ---- split into segments at gaps > max_gap ----
    // cur ops accumulate into ops_out at ops_used, finalized per segment
    int64_t ops_used = 0, n_segs = 0;
    int64_t q = 0, t = first_pos;
    int64_t cur_t = t, cur_q = 0;
    int64_t cur_off = ops_used, cur_n = 0;
    auto finalize = [&]() -> bool {
        // strip dangling gap ops, wrap soft clips
        int64_t t0 = cur_t, q0 = cur_q;
        int64_t b = cur_off, e = cur_off + cur_n;    // pair indices
        while (e > b && ops_out[2 * (e - 1)] != CMATCH) e--;
        while (e > b && ops_out[2 * b] != CMATCH) {
            if (ops_out[2 * b] == CDEL) t0 += ops_out[2 * b + 1];
            else q0 += ops_out[2 * b + 1];
            b++;
        }
        if (e == b) { cur_n = 0; return true; }      // dropped segment
        int64_t q_end = q0;
        for (int64_t i = b; i < e; i++) {
            const int32_t op = ops_out[2 * i];
            if (op == CMATCH || op == CINS || op == CSOFT_CLIP ||
                op == CEQUAL || op == CDIFF)
                q_end += ops_out[2 * i + 1];
        }
        // shift down over the stripped prefix, with room for a leading clip
        const bool lead = q0 > 0;
        const bool tail = q_end < contig_len;
        const int64_t need = (e - b) + (lead ? 1 : 0) + (tail ? 1 : 0);
        if (cur_off + need > ops_cap || n_segs >= seg_cap) return false;
        if (lead) {
            // make room: move [b, e) to cur_off+1
            std::memmove(ops_out + 2 * (cur_off + 1), ops_out + 2 * b,
                         2 * (e - b) * sizeof(int32_t));
            ops_out[2 * cur_off] = CSOFT_CLIP;
            ops_out[2 * cur_off + 1] = (int32_t)q0;
        } else if (b != cur_off) {
            std::memmove(ops_out + 2 * cur_off, ops_out + 2 * b,
                         2 * (e - b) * sizeof(int32_t));
        }
        int64_t w = cur_off + (e - b) + (lead ? 1 : 0);
        if (tail) {
            ops_out[2 * w] = CSOFT_CLIP;
            ops_out[2 * w + 1] = (int32_t)(contig_len - q_end);
            w++;
        }
        seg_t0[n_segs] = t0;
        seg_ops_off[n_segs] = cur_off;
        seg_n_ops[n_segs] = w - cur_off;
        n_segs++;
        ops_used = w;
        cur_off = ops_used;
        cur_n = 0;
        return true;
    };
    auto cur_push = [&](int32_t op, int64_t ln) -> bool {
        if (cur_n &&
            ops_out[2 * (cur_off + cur_n - 1)] == op) {
            ops_out[2 * (cur_off + cur_n - 1) + 1] += (int32_t)ln;
            return true;
        }
        if (cur_off + cur_n >= ops_cap) return false;
        ops_out[2 * (cur_off + cur_n)] = op;
        ops_out[2 * (cur_off + cur_n) + 1] = (int32_t)ln;
        cur_n++;
        return true;
    };
    const int64_t n_stream = (int64_t)stream.size() / 2;
    for (int64_t s = 0; s < n_stream; s++) {
        const int32_t op = stream[2 * s];
        const int64_t ln = stream[2 * s + 1];
        if (ln <= 0) continue;
        const bool oversize = ln > max_gap && (op == CDEL || op == CINS);
        if ((oversize || cur_n == 0) && op != CMATCH) {
            if (oversize && cur_n) {
                if (!finalize()) return -1;
            }
            if (op == CDEL) t += ln; else q += ln;
            if (cur_n == 0) { cur_t = t; cur_q = q; }
            continue;
        }
        if (!cur_push(op, ln)) return -1;
        if (op == CMATCH) { q += ln; t += ln; }
        else if (op == CINS) q += ln;
        else t += ln;
    }
    if (cur_n) {
        if (!finalize()) return -1;
    }
    *out_contig_len = contig_len;
    *out_n_segs = n_segs;
    return 0;
}

}  // extern "C"

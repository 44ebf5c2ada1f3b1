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

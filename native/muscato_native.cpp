// Native host-side kernels for muscato_tpu.
//
// The reference pipeline snappy-compresses every intermediate stream
// (golang/snappy; see /root/reference/cmd/muscato_prep_targets/main.go and
// SURVEY.md section 2.5).  muscato_tpu keeps its working set in arrays, but
// prepared-target files and any spill artifacts still use the snappy framed
// format, and at production scale the pure-Python codec would dominate
// host time.  This library provides:
//
//   - CRC-32C (Castagnoli), slice-by-8
//   - snappy block compress / decompress
//   - snappy framed-stream encode / decode
//   - fastq record scanning (newline indexing)
//
// Exposed as a C ABI consumed through ctypes (muscato_tpu/io/native.py).
// Build: python native/build.py  (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <cstddef>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ------------------------------------------------------------------ crc32c

static uint32_t crc_table[8][256];
static bool crc_init_done = false;

static void crc_init() {
    if (crc_init_done) return;
    const uint32_t poly = 0x82F63B78u;
    for (int n = 0; n < 256; n++) {
        uint32_t c = (uint32_t)n;
        for (int k = 0; k < 8; k++) c = (c >> 1) ^ ((c & 1) ? poly : 0);
        crc_table[0][n] = c;
    }
    for (int n = 0; n < 256; n++) {
        uint32_t c = crc_table[0][n];
        for (int t = 1; t < 8; t++) {
            c = crc_table[0][c & 0xff] ^ (c >> 8);
            crc_table[t][n] = c;
        }
    }
    crc_init_done = true;
}

uint32_t mn_crc32c(const uint8_t* data, size_t n, uint32_t crc) {
    crc_init();
    uint32_t c = crc ^ 0xFFFFFFFFu;
    size_t i = 0;
    while (n - i >= 8) {
        uint32_t lo, hi;
        memcpy(&lo, data + i, 4);
        memcpy(&hi, data + i + 4, 4);
        lo ^= c;
        c = crc_table[7][lo & 0xff] ^ crc_table[6][(lo >> 8) & 0xff] ^
            crc_table[5][(lo >> 16) & 0xff] ^ crc_table[4][lo >> 24] ^
            crc_table[3][hi & 0xff] ^ crc_table[2][(hi >> 8) & 0xff] ^
            crc_table[1][(hi >> 16) & 0xff] ^ crc_table[0][hi >> 24];
        i += 8;
    }
    for (; i < n; i++) c = crc_table[0][(c ^ data[i]) & 0xff] ^ (c >> 8);
    return c ^ 0xFFFFFFFFu;
}

// -------------------------------------------------------------- snappy block

// Max encoded size of an n-byte block (same bound snappy itself uses).
size_t mn_max_compressed(size_t n) { return 32 + n + n / 6; }

static uint8_t* emit_varint(uint8_t* p, size_t n) {
    while (n >= 0x80) { *p++ = (uint8_t)(n | 0x80); n >>= 7; }
    *p++ = (uint8_t)n;
    return p;
}

static uint8_t* emit_literal(uint8_t* p, const uint8_t* src, size_t n) {
    size_t m = n - 1;
    if (m < 60) {
        *p++ = (uint8_t)(m << 2);
    } else if (m < (1u << 8)) {
        *p++ = 60 << 2; *p++ = (uint8_t)m;
    } else if (m < (1u << 16)) {
        *p++ = 61 << 2; *p++ = (uint8_t)m; *p++ = (uint8_t)(m >> 8);
    } else if (m < (1u << 24)) {
        *p++ = 62 << 2; *p++ = (uint8_t)m; *p++ = (uint8_t)(m >> 8);
        *p++ = (uint8_t)(m >> 16);
    } else {
        *p++ = 63 << 2; *p++ = (uint8_t)m; *p++ = (uint8_t)(m >> 8);
        *p++ = (uint8_t)(m >> 16); *p++ = (uint8_t)(m >> 24);
    }
    memcpy(p, src, n);
    return p + n;
}

static uint8_t* emit_copy(uint8_t* p, size_t offset, size_t length) {
    // length in [4, 64], offset < 65536 guaranteed by the matcher
    while (length > 0) {
        size_t take = length > 64 ? 64 : length;
        if (take < 4) break;  // caller ensures this cannot strand a tail
        if (take <= 11 && offset < 2048) {
            *p++ = (uint8_t)(((offset >> 8) << 5) | ((take - 4) << 2) | 1);
            *p++ = (uint8_t)offset;
        } else {
            *p++ = (uint8_t)(((take - 1) << 2) | 2);
            *p++ = (uint8_t)offset; *p++ = (uint8_t)(offset >> 8);
        }
        length -= take;
    }
    return p;
}

static inline uint32_t load32(const uint8_t* p) {
    uint32_t v; memcpy(&v, p, 4); return v;
}

// Returns compressed size, or -1 if out_cap is too small.
long long mn_block_compress(const uint8_t* in, size_t n,
                            uint8_t* out, size_t out_cap) {
    if (out_cap < mn_max_compressed(n)) return -1;
    uint8_t* p = emit_varint(out, n);
    if (n < 16) {
        if (n) p = emit_literal(p, in, n);
        return (long long)(p - out);
    }
    const int HASH_BITS = 14;
    uint32_t table[1 << HASH_BITS];
    memset(table, 0, sizeof(table));
    const uint8_t* base = in;
    size_t i = 1, lit_start = 0, limit = n - 3;
    while (i < limit) {
        uint32_t v = load32(base + i);
        uint32_t h = (v * 0x1e35a7bd) >> (32 - HASH_BITS);
        size_t cand = table[h];
        table[h] = i;
        if (cand && i - cand < 65536 && load32(base + cand) == v) {
            size_t m = 4;
            while (i + m < n && base[cand + m] == base[i + m]) m++;
            if (i > lit_start) p = emit_literal(p, base + lit_start, i - lit_start);
            // emit in <=64 chunks; a final chunk <4 is folded into the last
            size_t len = m;
            size_t off = i - cand;
            while (len > 68) { p = emit_copy(p, off, 64); len -= 64; }
            if (len > 64) { p = emit_copy(p, off, 60); len -= 60; }
            p = emit_copy(p, off, len);
            i += m;
            lit_start = i;
        } else {
            i++;
        }
    }
    if (n > lit_start) p = emit_literal(p, base + lit_start, n - lit_start);
    return (long long)(p - out);
}

// Returns decompressed size, or -1 on malformed input / overflow.
long long mn_block_decompress(const uint8_t* in, size_t n,
                              uint8_t* out, size_t out_cap) {
    size_t pos = 0, want = 0;
    int shift = 0;
    // varint
    while (pos < n) {
        uint8_t b = in[pos++];
        want |= (size_t)(b & 0x7f) << shift;
        if (!(b & 0x80)) break;
        shift += 7;
        if (shift > 35) return -1;
    }
    if (want > out_cap) return -1;
    size_t o = 0;
    while (pos < n) {
        uint8_t tag = in[pos++];
        int kind = tag & 3;
        if (kind == 0) {
            size_t len = tag >> 2;
            if (len < 60) {
                len += 1;
            } else {
                int nb = (int)len - 59;
                if (pos + nb > n) return -1;
                size_t v = 0;
                for (int k = 0; k < nb; k++) v |= (size_t)in[pos + k] << (8 * k);
                pos += nb;
                len = v + 1;
            }
            if (pos + len > n || o + len > out_cap) return -1;
            memcpy(out + o, in + pos, len);
            pos += len; o += len;
        } else {
            size_t len, offset;
            if (kind == 1) {
                if (pos >= n) return -1;
                len = 4 + ((tag >> 2) & 7);
                offset = ((size_t)(tag >> 5) << 8) | in[pos++];
            } else if (kind == 2) {
                if (pos + 2 > n) return -1;
                len = (tag >> 2) + 1;
                offset = (size_t)in[pos] | ((size_t)in[pos + 1] << 8);
                pos += 2;
            } else {
                if (pos + 4 > n) return -1;
                len = (tag >> 2) + 1;
                offset = (size_t)in[pos] | ((size_t)in[pos + 1] << 8) |
                         ((size_t)in[pos + 2] << 16) | ((size_t)in[pos + 3] << 24);
                pos += 4;
            }
            if (offset == 0 || offset > o || o + len > out_cap) return -1;
            // overlapping forward copy
            for (size_t k = 0; k < len; k++) out[o + k] = out[o - offset + k];
            o += len;
        }
    }
    return o == want ? (long long)o : -1;
}

// ------------------------------------------------------------- framed codec

static const uint8_t IDENT[10] = {0xff, 0x06, 0x00, 0x00,
                                  's', 'N', 'a', 'P', 'p', 'Y'};
static const size_t MAX_CHUNK = 65536;

static uint32_t masked_crc(const uint8_t* d, size_t n) {
    uint32_t c = mn_crc32c(d, n, 0);
    return (uint32_t)((((c >> 15) | (c << 17)) + 0xa282ead8u));
}

size_t mn_frame_max_compressed(size_t n) {
    size_t chunks = n / MAX_CHUNK + 1;
    return 10 + chunks * (8 + mn_max_compressed(MAX_CHUNK));
}

// Returns encoded size, or -1 on overflow.
long long mn_frame_compress(const uint8_t* in, size_t n,
                            uint8_t* out, size_t out_cap) {
    if (out_cap < mn_frame_max_compressed(n)) return -1;
    uint8_t* p = out;
    memcpy(p, IDENT, 10); p += 10;
    size_t off = 0;
    while (off < n || (n == 0 && off == 0)) {
        size_t take = n - off < MAX_CHUNK ? n - off : MAX_CHUNK;
        if (take == 0 && n != 0) break;
        uint32_t crc = masked_crc(in + off, take);
        uint8_t* hdr = p;
        p += 4;  // chunk header
        memcpy(p, &crc, 4); p += 4;
        long long cs = mn_block_compress(in + off, take, p,
                                         mn_max_compressed(take));
        if (cs > 0 && (size_t)cs < take) {
            hdr[0] = 0x00;
            size_t plen = (size_t)cs + 4;
            hdr[1] = (uint8_t)plen; hdr[2] = (uint8_t)(plen >> 8);
            hdr[3] = (uint8_t)(plen >> 16);
            p += cs;
        } else {
            hdr[0] = 0x01;
            size_t plen = take + 4;
            hdr[1] = (uint8_t)plen; hdr[2] = (uint8_t)(plen >> 8);
            hdr[3] = (uint8_t)(plen >> 16);
            memcpy(p, in + off, take); p += take;
        }
        off += take;
        if (n == 0) break;
    }
    return (long long)(p - out);
}

// Upper bound on the decoded size of a framed stream (sum of chunk
// capacities); exact size comes from decoding.
size_t mn_frame_decompressed_bound(const uint8_t* in, size_t n) {
    size_t pos = 0, total = 0;
    while (pos + 4 <= n) {
        uint8_t typ = in[pos];
        size_t len = (size_t)in[pos + 1] | ((size_t)in[pos + 2] << 8) |
                     ((size_t)in[pos + 3] << 16);
        pos += 4;
        if (typ == 0x00) total += MAX_CHUNK;
        else if (typ == 0x01) total += len >= 4 ? len - 4 : 0;
        pos += len;
    }
    return total;
}

// Returns decoded size, or -1 on malformed input.
long long mn_frame_decompress(const uint8_t* in, size_t n,
                              uint8_t* out, size_t out_cap) {
    size_t pos = 0, o = 0;
    while (pos + 4 <= n) {
        uint8_t typ = in[pos];
        size_t len = (size_t)in[pos + 1] | ((size_t)in[pos + 2] << 8) |
                     ((size_t)in[pos + 3] << 16);
        pos += 4;
        if (pos + len > n) return -1;
        if (typ == 0xff) {
            // stream identifier
        } else if (typ == 0x00) {
            if (len < 4) return -1;
            long long ds = mn_block_decompress(in + pos + 4, len - 4,
                                               out + o, out_cap - o);
            if (ds < 0) return -1;
            o += (size_t)ds;
        } else if (typ == 0x01) {
            if (len < 4 || o + len - 4 > out_cap) return -1;
            memcpy(out + o, in + pos + 4, len - 4);
            o += len - 4;
        } else if (typ >= 0x02 && typ <= 0x7f) {
            return -1;  // unskippable
        }
        pos += len;
    }
    return (long long)o;
}

// ------------------------------------------------------------ fastq scanning

// Fill `offsets` with the byte offset of each line start; returns the line
// count (capped at cap).  Lets Python slice records without scanning.
size_t mn_line_offsets(const uint8_t* data, size_t n,
                       uint64_t* offsets, size_t cap) {
    size_t cnt = 0;
    if (n == 0 || cap == 0) return 0;
    offsets[cnt++] = 0;
    const uint8_t* p = data;
    const uint8_t* end = data + (n > 0 ? n - 1 : 0);
    while (p < end) {
        const uint8_t* nl = (const uint8_t*)memchr(p, '\n', (size_t)(end - p));
        if (!nl) break;
        if (cnt >= cap) return cnt;
        offsets[cnt++] = (uint64_t)(nl - data) + 1;
        p = nl + 1;
    }
    return cnt;
}

// ------------------------------------------------- bulk row transforms
// These replace numpy fancy-indexing hot loops in the host prep/report
// paths: generic 2-D gathers in numpy run ~10M cells/s, these run at
// memory bandwidth.

// Translate n variable-offset rows of `src` through `table` into a dense
// (n, width) matrix; bytes beyond lens[i] are set to `pad`.
void mn_encode_rows(const uint8_t* src, const int64_t* starts,
                    const int32_t* lens, size_t n, size_t width,
                    const uint8_t* table, uint8_t pad, uint8_t* out) {
#pragma omp parallel for schedule(static) if (n > 65536)
    for (size_t i = 0; i < n; i++) {
        const uint8_t* s = src + starts[i];
        uint8_t* o = out + i * width;
        size_t l = (size_t)(lens[i] < 0 ? 0 : lens[i]);
        if (l > width) l = width;
        for (size_t j = 0; j < l; j++) o[j] = table[s[j]];
        if (l < width) memset(o + l, pad, width - l);
    }
}

// dst[dst_starts[i] : +lens[i]] = src[src_starts[i] : +lens[i]] for each i.
void mn_ranged_copy(uint8_t* dst, const int64_t* dst_starts,
                    const uint8_t* src, const int64_t* src_starts,
                    const int64_t* lens, size_t n) {
#pragma omp parallel for schedule(static) if (n > 65536)
    for (size_t i = 0; i < n; i++) {
        memcpy(dst + dst_starts[i], src + src_starts[i], (size_t)lens[i]);
    }
}

// dst[dst_starts[i] : +lens[i]] = table[rows[i*stride : +lens[i]]] —
// decode matrix rows (e.g. read codes) straight into an output blob.
void mn_decode_rows(uint8_t* dst, const int64_t* dst_starts,
                    const uint8_t* rows, size_t stride,
                    const int64_t* row_idx, const int64_t* lens,
                    const uint8_t* table, size_t n) {
    for (size_t i = 0; i < n; i++) {
        const uint8_t* s = rows + (size_t)row_idx[i] * stride;
        uint8_t* o = dst + dst_starts[i];
        size_t l = (size_t)lens[i];
        for (size_t j = 0; j < l; j++) o[j] = table[s[j]];
    }
}

// out[i] = rows[perm[i]] for (n, w) row-major byte matrices.
void mn_permute_rows(const uint8_t* rows, const int64_t* perm,
                     size_t n, size_t w, uint8_t* out) {
#pragma omp parallel for schedule(static) if (n > 65536)
    for (size_t i = 0; i < n; i++) {
        memcpy(out + i * w, rows + (size_t)perm[i] * w, w);
    }
}

// out[i] = 1 iff row i differs from row i-1 (out[0] = 1).
void mn_rows_differ(const uint8_t* rows, size_t n, size_t w, uint8_t* out) {
    if (n == 0) return;
    out[0] = 1;
#pragma omp parallel for schedule(static) if (n > 65536)
    for (size_t i = 1; i < n; i++) {
        out[i] = memcmp(rows + i * w, rows + (i - 1) * w, w) != 0;
    }
}

// ------------------------------------------------- index build kernels

// Window keys at every position of a code stream: Horner folds with
// multipliers m1 (and m2 when nonzero), one pass.  Positions within
// width-1 of the end read zero padding (callers mask by validity).
void mn_window_keys(const uint8_t* tcat, size_t n, size_t width,
                    uint32_t m1, uint32_t m2, uint32_t* k1, uint32_t* k2) {
    if (n == 0) return;
    // rolling evaluation: k(p) = sum tcat[p+i] * m^(width-1-i)
    // computed directly per position over the (short) width loop —
    // width <= ~32, and the stream stays in cache line order.
    std::vector<uint8_t> padded(n + width);
    memcpy(padded.data(), tcat, n);
    memset(padded.data() + n, 0, width);
    for (size_t p = 0; p < n; p++) {
        uint32_t a = 0, b = 0;
        const uint8_t* s = padded.data() + p;
        for (size_t i = 0; i < width; i++) {
            a = a * m1 + s[i];
            if (m2) b = b * m2 + s[i];
        }
        k1[p] = a;
        if (m2) k2[p] = b;
    }
}

// LSD radix sort of (k1, k2) 64-bit composite keys with an int32 payload,
// 8 x 8-bit digits.  Parallel per-block histograms + scatter (OpenMP when
// compiled in); digit passes where every key shares one digit value are
// skipped (e.g. k2 == 0 for exact-width indexes halves the passes).
// ~25x np.lexsort at 100M rows.
void mn_sort_index(uint32_t* k1, uint32_t* k2, int32_t* pos, size_t n) {
    if (n < 2) return;
    const int BITS = 8;
    const size_t RADIX = (size_t)1 << BITS;
    const int NPASS = 8;
    int nthreads = 1;
#ifdef _OPENMP
    nthreads = omp_get_max_threads();
    if (nthreads < 1) nthreads = 1;
#endif
    std::vector<uint32_t> t1(n), t2(n);
    std::vector<int32_t> tp(n);
    uint32_t* a1 = k1; uint32_t* a2 = k2; int32_t* ap = pos;
    uint32_t* b1 = t1.data(); uint32_t* b2 = t2.data(); int32_t* bp = tp.data();

    // One sweep computes all 8 digit histograms up front; trivial digits
    // (a single occupied bucket) need no pass.
    std::vector<size_t> hist(NPASS * RADIX, 0);
    {
        std::vector<size_t> local((size_t)nthreads * NPASS * RADIX, 0);
#ifdef _OPENMP
#pragma omp parallel num_threads(nthreads)
#endif
        {
            int t = 0;
#ifdef _OPENMP
            t = omp_get_thread_num();
#endif
            size_t lo = n * t / nthreads, hi = n * (t + 1) / nthreads;
            size_t* h = local.data() + (size_t)t * NPASS * RADIX;
            for (size_t i = lo; i < hi; i++) {
                uint64_t key = ((uint64_t)a1[i] << 32) | a2[i];
                for (int p = 0; p < NPASS; p++)
                    h[p * RADIX + ((key >> (p * BITS)) & (RADIX - 1))]++;
            }
        }
        for (int t = 0; t < nthreads; t++)
            for (size_t j = 0; j < (size_t)NPASS * RADIX; j++)
                hist[j] += local[(size_t)t * NPASS * RADIX + j];
    }

    int done = 0;  // number of executed (swapping) passes
    std::vector<size_t> offs((size_t)nthreads * RADIX);
    for (int pass = 0; pass < NPASS; pass++) {
        size_t* h = hist.data() + (size_t)pass * RADIX;
        size_t occupied = 0;
        for (size_t d = 0; d < RADIX; d++) occupied += (h[d] != 0);
        if (occupied <= 1) continue;  // all keys share this digit
        int s = pass * BITS;

        // per-block digit counts -> per-block write offsets
#ifdef _OPENMP
#pragma omp parallel num_threads(nthreads)
#endif
        {
            int t = 0;
#ifdef _OPENMP
            t = omp_get_thread_num();
#endif
            size_t lo = n * t / nthreads, hi = n * (t + 1) / nthreads;
            size_t* o = offs.data() + (size_t)t * RADIX;
            memset(o, 0, RADIX * sizeof(size_t));
            for (size_t i = lo; i < hi; i++) {
                uint64_t key = ((uint64_t)a1[i] << 32) | a2[i];
                o[(key >> s) & (RADIX - 1)]++;
            }
        }
        size_t acc = 0;
        for (size_t d = 0; d < RADIX; d++) {
            for (int t = 0; t < nthreads; t++) {
                size_t c = offs[(size_t)t * RADIX + d];
                offs[(size_t)t * RADIX + d] = acc;
                acc += c;
            }
        }
#ifdef _OPENMP
#pragma omp parallel num_threads(nthreads)
#endif
        {
            int t = 0;
#ifdef _OPENMP
            t = omp_get_thread_num();
#endif
            size_t lo = n * t / nthreads, hi = n * (t + 1) / nthreads;
            size_t* o = offs.data() + (size_t)t * RADIX;
            for (size_t i = lo; i < hi; i++) {
                uint64_t key = ((uint64_t)a1[i] << 32) | a2[i];
                size_t dst = o[(key >> s) & (RADIX - 1)]++;
                b1[dst] = a1[i]; b2[dst] = a2[i]; bp[dst] = ap[i];
            }
        }
        std::swap(a1, b1); std::swap(a2, b2); std::swap(ap, bp);
        done++;
    }
    if (done & 1) {  // odd pass count: copy back into the caller's arrays
        memcpy(b1, a1, n * sizeof(uint32_t));
        memcpy(b2, a2, n * sizeof(uint32_t));
        memcpy(bp, ap, n * sizeof(int32_t));
    }
}

}  // extern "C"

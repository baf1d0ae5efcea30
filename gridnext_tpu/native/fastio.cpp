// fastio: native codec for unified count TSVs (the framework's hottest host
// I/O path). pandas to_csv of a (15k genes x 5k spots) gz TSV takes ~3.5
// minutes (default formatting + gzip level 9); this writer does the same
// file in seconds (fast integer/double formatting + zlib level 1), and the
// reader parses numeric TSVs several times faster than pandas' C engine.
//
// Gzip output is MULTI-MEMBER (BGZF-style, RFC 1952 concatenated members):
// rows are chunked ~4 MB raw, each chunk becomes an independent gzip member
// whose total on-disk size is recorded in a 'GX' EXTRA subfield of its own
// header. The file stays a perfectly ordinary .tsv.gz -- pandas, zcat and
// gzopen read concatenated members transparently -- but this reader can walk
// the member chain from the EXTRA fields and INFLATE MEMBERS IN PARALLEL
// across the thread pool (decompression is the serial bottleneck once
// parsing is parallel). Compression is likewise parallel across chunks.
//
// Exposed via ctypes (gridnext_tpu/native/__init__.py). Build:
//   g++ -O3 -shared -fPIC fastio.cpp -o fastio.so -lz
//
// File contract matches io/unify.py (visium_datasets.py:173-174 semantics):
// header row "<index_name>\t<col>...", then one row per gene:
// "<gene>\t<int-or-float>...".

#include <zlib.h>

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cmath>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

// --- multi-member gzip helpers ----------------------------------------------
//
// Member layout (all little-endian, per RFC 1952):
//   10-byte base header (FLG=FEXTRA), XLEN=8,
//   subfield {'G','X', SLEN=4, u32 total_member_size},
//   raw-deflate payload, CRC32, ISIZE.
// total_member_size covers header..ISIZE so a reader can hop members without
// inflating (the BGZF 'BC' trick, sized u32 instead of u16).

static const size_t kGzHeaderLen = 10 + 2 + 8;  // base + XLEN + GX subfield
static const size_t kGzTrailerLen = 8;          // CRC32 + ISIZE

static void put_u16(unsigned char* p, uint32_t v) {
    p[0] = v & 0xff; p[1] = (v >> 8) & 0xff;
}
static void put_u32(unsigned char* p, uint32_t v) {
    p[0] = v & 0xff; p[1] = (v >> 8) & 0xff;
    p[2] = (v >> 16) & 0xff; p[3] = (v >> 24) & 0xff;
}
static uint32_t get_u16(const unsigned char* p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8);
}
static uint32_t get_u32(const unsigned char* p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8)
         | ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24);
}

// Compress `raw` into one self-describing gzip member appended to `out`.
// Returns false on zlib failure or if the member would overflow the u32
// size subfield (callers chunk well below that).
static bool deflate_member(const std::string& raw, int level, std::string& out) {
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8,
                     Z_DEFAULT_STRATEGY) != Z_OK)
        return false;
    size_t bound = deflateBound(&zs, raw.size());
    size_t start = out.size();
    out.resize(start + kGzHeaderLen + bound + kGzTrailerLen);
    unsigned char* base = (unsigned char*)&out[start];

    zs.next_in = (Bytef*)raw.data();
    zs.avail_in = (uInt)raw.size();
    zs.next_out = base + kGzHeaderLen;
    zs.avail_out = (uInt)bound;
    int rc = deflate(&zs, Z_FINISH);
    size_t comp = zs.total_out;
    deflateEnd(&zs);
    if (rc != Z_STREAM_END) { out.resize(start); return false; }

    size_t member = kGzHeaderLen + comp + kGzTrailerLen;
    if (member > 0xffffffffu || raw.size() > 0xffffffffu) {
        out.resize(start);
        return false;
    }
    // header
    base[0] = 0x1f; base[1] = 0x8b; base[2] = 8;  // magic, deflate
    base[3] = 0x04;                               // FLG = FEXTRA
    put_u32(base + 4, 0);                         // MTIME (deterministic)
    base[8] = 0; base[9] = 0xff;                  // XFL, OS=unknown
    put_u16(base + 10, 8);                        // XLEN
    base[12] = 'G'; base[13] = 'X';
    put_u16(base + 14, 4);                        // SLEN
    put_u32(base + 16, (uint32_t)member);
    // trailer
    uint32_t crc = crc32(0L, (const Bytef*)raw.data(), (uInt)raw.size());
    put_u32(base + kGzHeaderLen + comp, crc);
    put_u32(base + kGzHeaderLen + comp + 4, (uint32_t)raw.size());
    out.resize(start + member);
    return true;
}

extern "C" {

// ---------------------------------------------------------------------------
// Writer
// ---------------------------------------------------------------------------

// Write a numeric matrix as (gz) TSV. values are doubles; values that are
// exactly integral are written as integers (matching pandas' int64 output
// for count data). Returns 0 on success.
int tsv_write_matrix(const char* path, const char* index_name,
                     const char** row_names, const char** col_names,
                     const double* values, int64_t n_rows, int64_t n_cols,
                     int gzip_level, int force_int) {
    const bool use_gz = gzip_level >= 0;

    auto format_rows = [&](int64_t lo, int64_t hi, std::string& buf) {
        char num[40];
        buf.reserve((hi - lo) * (n_cols * 6 + 24));
        for (int64_t r = lo; r < hi; ++r) {
            buf.append(row_names[r]);
            const double* row = values + r * n_cols;
            for (int64_t c = 0; c < n_cols; ++c) {
                buf.push_back('\t');
                double v = row[c];
                if (force_int || v == (double)(int64_t)v) {
                    int len = snprintf(num, sizeof(num), "%lld", (long long)v);
                    buf.append(num, len);
                } else {
                    int len = snprintf(num, sizeof(num), "%.17g", v);
                    buf.append(num, len);
                }
            }
            buf.push_back('\n');
        }
    };

    // header
    std::string header;
    header.append(index_name);
    for (int64_t c = 0; c < n_cols; ++c) {
        header.push_back('\t');
        header.append(col_names[c]);
    }
    header.push_back('\n');

    // fixed-size row chunks (~4 MB raw each): on gz output every chunk is its
    // own gzip member, so BOTH compression here and decompression in tsv_open
    // parallelize across the member list regardless of thread count
    int64_t bytes_per_row = n_cols * 6 + 24;
    int64_t chunk_rows = std::max<int64_t>(
        64, (int64_t)(4 << 20) / std::max<int64_t>(1, bytes_per_row));
    int64_t n_chunks = n_rows ? (n_rows + chunk_rows - 1) / chunk_rows : 0;

    unsigned hw = std::thread::hardware_concurrency();
    int64_t n_threads = std::max<int64_t>(
        1, std::min<int64_t>({(int64_t)(hw ? hw : 1), n_chunks, 16}));

    std::vector<std::string> bufs((size_t)n_chunks);
    std::atomic<int64_t> next(0);
    std::atomic<bool> failed(false);
    auto worker = [&]() {
        for (;;) {
            int64_t i = next.fetch_add(1);
            if (i >= n_chunks || failed.load()) return;
            int64_t lo = i * chunk_rows;
            int64_t hi = std::min(n_rows, lo + chunk_rows);
            if (use_gz) {
                std::string raw;
                format_rows(lo, hi, raw);
                if (!deflate_member(raw, gzip_level, bufs[i]))
                    failed.store(true);
            } else {
                format_rows(lo, hi, bufs[i]);
            }
        }
    };
    if (n_threads <= 1) {
        worker();
    } else {
        std::vector<std::thread> threads;
        for (int64_t t = 0; t < n_threads; ++t) threads.emplace_back(worker);
        for (auto& th : threads) th.join();
    }
    if (failed.load()) return 2;

    FILE* fp = fopen(path, "wb");
    if (!fp) return 1;
    bool ok = true;
    if (use_gz) {
        std::string hdr_member;
        ok = deflate_member(header, gzip_level, hdr_member)
             && fwrite(hdr_member.data(), 1, hdr_member.size(), fp)
                    == hdr_member.size();
    } else {
        ok = fwrite(header.data(), 1, header.size(), fp) == header.size();
    }
    for (auto& b : bufs) {
        if (!ok) break;
        if (!b.empty() && fwrite(b.data(), 1, b.size(), fp) != b.size())
            ok = false;
    }
    // close unconditionally (no handle leak) and surface flush failures
    if (fclose(fp) != 0) ok = false;
    return ok ? 0 : 2;
}

// ---------------------------------------------------------------------------
// Reader
// ---------------------------------------------------------------------------

struct TsvMatrix {
    std::vector<std::string> row_names;
    std::vector<std::string> col_names;
    std::vector<double> values;  // row-major (n_rows x n_cols)
    std::string index_name;
    int64_t n_rows = 0;
    int64_t n_cols = 0;
};

// Walk self-describing members (written by tsv_write_matrix): every member
// must start with a gzip FEXTRA header whose 'GX' subfield holds the member's
// total on-disk size. Returns false (-> caller falls back to serial gzread)
// for plain files, foreign gzips, or any malformed chain.
static bool walk_members(const std::string& comp,
                         std::vector<std::pair<size_t, size_t>>& members) {
    const unsigned char* d = (const unsigned char*)comp.data();
    size_t n = comp.size(), off = 0;
    while (off < n) {
        if (off + kGzHeaderLen + kGzTrailerLen > n) return false;
        const unsigned char* h = d + off;
        if (h[0] != 0x1f || h[1] != 0x8b || h[2] != 8 || h[3] != 0x04)
            return false;
        uint32_t xlen = get_u16(h + 10);
        if (off + 12 + xlen > n) return false;
        // scan EXTRA subfields for 'GX'
        size_t p = off + 12, extra_end = p + xlen;
        size_t msize = 0;
        while (p + 4 <= extra_end) {
            uint32_t slen = get_u16(d + p + 2);
            if (p + 4 + slen > extra_end) return false;
            if (d[p] == 'G' && d[p + 1] == 'X' && slen == 4) {
                msize = get_u32(d + p + 4);
                break;
            }
            p += 4 + slen;
        }
        if (msize < kGzHeaderLen + kGzTrailerLen || off + msize > n)
            return false;
        members.emplace_back(off, msize);
        off += msize;
    }
    return off == n && !members.empty();
}

// Inflate one complete gzip member (header auto-parsed by windowBits 15+16)
// straight into its caller-provided slice of the output buffer.
static bool inflate_member(const unsigned char* data, size_t size,
                           char* dst, size_t raw_size) {
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, 15 + 16) != Z_OK) return false;
    zs.next_in = (Bytef*)data;
    zs.avail_in = (uInt)size;
    zs.next_out = (Bytef*)dst;
    zs.avail_out = (uInt)raw_size;
    int rc = inflate(&zs, Z_FINISH);
    bool ok = rc == Z_STREAM_END && zs.total_out == raw_size;
    inflateEnd(&zs);
    return ok;
}

static bool read_all(const char* path, std::string& out) {
    // raw bytes first: multi-member files inflate across the thread pool
    FILE* fp = fopen(path, "rb");
    if (!fp) return false;
    std::string comp;
    {
        char chunk[1 << 20];
        size_t n;
        while ((n = fread(chunk, 1, sizeof(chunk), fp)) > 0) comp.append(chunk, n);
        bool ok = !ferror(fp);
        fclose(fp);
        if (!ok) return false;
    }
    if (comp.size() >= 2 && (unsigned char)comp[0] == 0x1f
            && (unsigned char)comp[1] == 0x8b) {
        std::vector<std::pair<size_t, size_t>> members;
        if (walk_members(comp, members)) {
            // Each member's raw size is in its ISIZE trailer, so every
            // output offset is knowable up front: size `out` once and let
            // workers inflate directly into their slice -- no per-member
            // staging buffers (which would hold compressed + raw + copied
            // output simultaneously, ~2x raw peak RSS on GB-scale caches).
            const unsigned char* cd = (const unsigned char*)comp.data();
            size_t base = out.size(), total = 0;
            std::vector<size_t> offs(members.size());
            for (size_t i = 0; i < members.size(); ++i) {
                offs[i] = total;
                total += get_u32(cd + members[i].first
                                 + members[i].second - 4);
            }
            out.resize(base + total);
            unsigned hw = std::thread::hardware_concurrency();
            size_t n_threads = std::max<size_t>(1, std::min<size_t>(
                {(size_t)(hw ? hw : 1), members.size(), (size_t)16}));
            std::atomic<size_t> next(0);
            std::atomic<bool> failed(false);
            auto worker = [&]() {
                for (;;) {
                    size_t i = next.fetch_add(1);
                    if (i >= members.size() || failed.load()) return;
                    size_t end = i + 1 < members.size() ? offs[i + 1] : total;
                    if (!inflate_member(cd + members[i].first,
                                        members[i].second,
                                        &out[base + offs[i]],
                                        end - offs[i]))
                        failed.store(true);
                }
            };
            if (n_threads <= 1) {
                worker();
            } else {
                std::vector<std::thread> threads;
                for (size_t t = 0; t < n_threads; ++t)
                    threads.emplace_back(worker);
                for (auto& th : threads) th.join();
            }
            if (!failed.load())
                return true;
            out.resize(base);  // malformed despite valid chain: fall back
        }
        // foreign gzip (pandas single-member, bgzip, ...): stream-inflate
        // the bytes ALREADY in memory. gzopen here would re-read the whole
        // file from disk while `comp` stayed resident anyway -- double the
        // I/O for the same compressed+raw peak RSS.
        z_stream zs;
        std::memset(&zs, 0, sizeof(zs));
        if (inflateInit2(&zs, 15 + 16) != Z_OK) return false;  // gzip wrap
        size_t in_pos = 0;
        std::vector<char> buf(1 << 20);
        bool ok = true;
        for (;;) {
            if (zs.avail_in == 0 && in_pos < comp.size()) {
                size_t n = std::min<size_t>(comp.size() - in_pos,
                                            0x7fffffffu);  // uInt chunks
                zs.next_in = (Bytef*)comp.data() + in_pos;
                zs.avail_in = (uInt)n;
                in_pos += n;
            }
            zs.next_out = (Bytef*)buf.data();
            zs.avail_out = (uInt)buf.size();
            int ret = inflate(&zs, Z_NO_FLUSH);
            if (ret != Z_OK && ret != Z_STREAM_END) { ok = false; break; }
            size_t produced = buf.size() - zs.avail_out;
            out.append(buf.data(), produced);
            if (ret == Z_STREAM_END) {
                if (zs.avail_in == 0 && in_pos >= comp.size()) break;
                // concatenated members (bgzip): expect another gzip header
                if (inflateReset(&zs) != Z_OK) { ok = false; break; }
            } else if (zs.avail_in == 0 && in_pos >= comp.size()
                       && produced == 0) {
                ok = false;  // input exhausted mid-member: truncated file
                break;
            }
        }
        inflateEnd(&zs);
        return ok;
    }
    out = std::move(comp);  // plain TSV
    return true;
}

void* tsv_open(const char* path) {
    std::string data;
    if (!read_all(path, data)) return nullptr;

    auto* m = new TsvMatrix();
    const char* p = data.data();
    const char* end = p + data.size();

    // header line
    const char* nl = (const char*)memchr(p, '\n', end - p);
    if (!nl) { delete m; return nullptr; }
    {
        const char* q = p;
        bool first = true;
        while (q <= nl) {
            const char* tab = (const char*)memchr(q, '\t', nl - q);
            const char* stop = tab ? tab : nl;
            size_t len = stop - q;
            if (len && q[len - 1] == '\r') --len;
            if (first) { m->index_name.assign(q, len); first = false; }
            else m->col_names.emplace_back(q, len);
            if (!tab) break;
            q = tab + 1;
        }
    }
    m->n_cols = (int64_t)m->col_names.size();
    p = nl + 1;

    // index line starts (serial memchr scan), then parse rows in parallel
    std::vector<const char*> line_starts;
    std::vector<const char*> line_ends;
    while (p < end) {
        const char* lnl = (const char*)memchr(p, '\n', end - p);
        if (!lnl) lnl = end;
        if (lnl > p) {
            line_starts.push_back(p);
            line_ends.push_back(lnl);
        }
        p = lnl + 1;
    }
    const int64_t n_rows = (int64_t)line_starts.size();
    m->n_rows = n_rows;
    m->row_names.resize(n_rows);
    m->values.resize((size_t)n_rows * m->n_cols);

    const int64_t n_cols = m->n_cols;
    const double kNaN = std::nan("");
    auto parse_range = [&](int64_t lo, int64_t hi) {
        for (int64_t r = lo; r < hi; ++r) {
            const char* q = line_starts[r];
            const char* lnl = line_ends[r];
            const char* tab = (const char*)memchr(q, '\t', lnl - q);
            if (!tab) continue;
            m->row_names[r].assign(q, tab - q);
            q = tab + 1;
            double* out_row = m->values.data() + (size_t)r * n_cols;
            for (int64_t c = 0; c < n_cols; ++c) {
                // empty/missing/short fields become NaN (pandas semantics);
                // strtod would otherwise skip the separator and silently
                // shift every remaining value
                if (q >= lnl || *q == '\t') {
                    out_row[c] = kNaN;
                } else {
                    char* next = nullptr;
                    double v = strtod(q, &next);
                    if (next == q || next > lnl) {
                        out_row[c] = kNaN;
                        // skip the malformed token up to the next separator
                        const char* sep = (const char*)memchr(q, '\t', lnl - q);
                        q = sep ? sep : lnl;
                    } else {
                        out_row[c] = v;
                        q = next;
                    }
                }
                if (q < lnl && (*q == '\t')) ++q;
            }
        }
    };

    unsigned hw = std::thread::hardware_concurrency();
    int64_t n_threads = std::max<int64_t>(1, std::min<int64_t>(hw ? hw : 1, 16));
    if (n_rows < 256) n_threads = 1;
    if (n_threads == 1) {
        parse_range(0, n_rows);
    } else {
        std::vector<std::thread> threads;
        int64_t per = (n_rows + n_threads - 1) / n_threads;
        for (int64_t t = 0; t < n_threads; ++t) {
            int64_t lo = t * per, hi = std::min(n_rows, lo + per);
            if (lo >= hi) break;
            threads.emplace_back(parse_range, lo, hi);
        }
        for (auto& th : threads) th.join();
    }
    return m;
}

int64_t tsv_n_rows(void* h) { return ((TsvMatrix*)h)->n_rows; }
int64_t tsv_n_cols(void* h) { return ((TsvMatrix*)h)->n_cols; }

void tsv_copy_values(void* h, double* out) {
    auto* m = (TsvMatrix*)h;
    memcpy(out, m->values.data(), m->values.size() * sizeof(double));
}

const char* tsv_index_name(void* h) { return ((TsvMatrix*)h)->index_name.c_str(); }
const char* tsv_row_name(void* h, int64_t i) {
    return ((TsvMatrix*)h)->row_names[i].c_str();
}
const char* tsv_col_name(void* h, int64_t i) {
    return ((TsvMatrix*)h)->col_names[i].c_str();
}

void tsv_free(void* h) { delete (TsvMatrix*)h; }

}  // extern "C"

// Native data-path runtime for mega_nerf_viewer_tpu.
//
// TPU-native equivalent of the reference's C++ data layer: the cnpy
// .npz/.npy zip reader (reference 3rdparty/cnpy) and the vector-quantized
// color decode loop (reference src/n3tree/n3tree.cpp:109-175), rebuilt
// from scratch with mmap'd I/O, multi-threaded inflate across archive
// entries, and a parallel VQ decode.  Exposed as a C ABI consumed from
// Python via ctypes (mega_nerf_viewer_tpu/native.py); the pure-numpy
// path remains as a fallback.
//
// ZIP subset supported: stored (0) and deflate (8) entries, zip64
// end-of-central-directory, as produced by numpy.savez / svox.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>
#include <thread>
#include <atomic>
#include <memory>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <zlib.h>

namespace {

struct Entry {
    std::string name;        // npy member name (with .npy suffix)
    uint64_t header_off;     // local file header offset
    uint64_t comp_size;
    uint64_t uncomp_size;
    uint16_t method;
    // filled lazily from the local header:
    uint64_t data_off = 0;
    // npy payload geometry (parsed from the npy header on first read)
    std::string descr;
    std::vector<uint64_t> shape;
    bool fortran = false;
    uint64_t payload_off = 0;   // offset of raw array data inside member
};

struct Archive {
    int fd = -1;
    const uint8_t* base = nullptr;
    size_t size = 0;
    std::vector<Entry> entries;
    std::string error;
};

uint16_t rd16(const uint8_t* p) { uint16_t v; memcpy(&v, p, 2); return v; }
uint32_t rd32(const uint8_t* p) { uint32_t v; memcpy(&v, p, 4); return v; }
uint64_t rd64(const uint8_t* p) { uint64_t v; memcpy(&v, p, 8); return v; }

bool parse_central_directory(Archive* a) {
    const uint8_t* b = a->base;
    size_t n = a->size;
    if (n < 22) { a->error = "file too small"; return false; }
    // find EOCD
    size_t scan = n >= 65557 ? n - 65557 : 0;
    size_t eocd = SIZE_MAX;
    for (size_t i = n - 22; ; --i) {
        if (rd32(b + i) == 0x06054b50) { eocd = i; break; }
        if (i == scan) break;
    }
    if (eocd == SIZE_MAX) { a->error = "no EOCD"; return false; }
    uint64_t n_entries = rd16(b + eocd + 10);
    uint64_t cd_off = rd32(b + eocd + 16);
    // zip64?
    if (n_entries == 0xFFFF || cd_off == 0xFFFFFFFFu) {
        if (eocd < 20) { a->error = "bad zip64"; return false; }
        size_t loc = eocd - 20;
        if (rd32(b + loc) != 0x07064b50) { a->error = "no zip64 locator"; return false; }
        uint64_t z64 = rd64(b + loc + 8);
        if (z64 + 56 > n || rd32(b + z64) != 0x06064b50) {
            a->error = "bad zip64 EOCD"; return false;
        }
        n_entries = rd64(b + z64 + 32);
        cd_off = rd64(b + z64 + 48);
    }
    uint64_t p = cd_off;
    for (uint64_t i = 0; i < n_entries; ++i) {
        if (p + 46 > n || rd32(b + p) != 0x02014b50) {
            a->error = "bad central header"; return false;
        }
        Entry e;
        e.method = rd16(b + p + 10);
        e.comp_size = rd32(b + p + 20);
        e.uncomp_size = rd32(b + p + 24);
        uint16_t name_len = rd16(b + p + 28);
        uint16_t extra_len = rd16(b + p + 30);
        uint16_t comment_len = rd16(b + p + 32);
        e.header_off = rd32(b + p + 42);
        if (p + 46 + (uint64_t)name_len + extra_len + comment_len > n) {
            a->error = "central header beyond file"; return false;
        }
        e.name.assign((const char*)(b + p + 46), name_len);
        // zip64 extra field
        const uint8_t* ex = b + p + 46 + name_len;
        const uint8_t* ex_end = ex + extra_len;
        while (ex + 4 <= ex_end) {
            uint16_t id = rd16(ex), sz = rd16(ex + 2);
            if (ex + 4 + sz > ex_end) break;
            if (id == 1) {
                const uint8_t* q = ex + 4;
                const uint8_t* q_end = ex + 4 + sz;
                if (e.uncomp_size == 0xFFFFFFFFu && q + 8 <= q_end) {
                    e.uncomp_size = rd64(q); q += 8;
                }
                if (e.comp_size == 0xFFFFFFFFu && q + 8 <= q_end) {
                    e.comp_size = rd64(q); q += 8;
                }
                if (e.header_off == 0xFFFFFFFFu && q + 8 <= q_end) {
                    e.header_off = rd64(q); q += 8;
                }
            }
            ex += 4 + sz;
        }
        p += 46 + name_len + extra_len + comment_len;
        a->entries.push_back(std::move(e));
    }
    // resolve local-header data offsets + bound every member's bytes
    // against the mapping (a truncated/corrupt archive must fail
    // cleanly, not SIGBUS past the mmap)
    for (auto& e : a->entries) {
        uint64_t lh = e.header_off;
        if (lh + 30 > n || rd32(b + lh) != 0x04034b50) {
            a->error = "bad local header for " + e.name; return false;
        }
        uint16_t nl = rd16(b + lh + 26), el = rd16(b + lh + 28);
        e.data_off = lh + 30 + nl + el;
        uint64_t extent = e.method == 0 ? e.uncomp_size : e.comp_size;
        if (e.data_off > n || extent > n - e.data_off) {
            a->error = "member bytes beyond file for " + e.name;
            return false;
        }
    }
    return true;
}

// Streaming inflate of a deflated member: produce bytes
// [skip, skip + want) of the UNCOMPRESSED stream into dst.  All sizes
// are 64-bit clean — input and output are fed to zlib in <= 1 GiB
// slices (a single-shot (uInt) cast truncated >4 GiB members mod 2^32
// and zlib then reported success on the ~0.6 GiB prefix: silently
// corrupt Mill-19-scale trees).
bool inflate_member(const Archive* a, const Entry& e, uint64_t skip,
                    uint8_t* dst, uint64_t want, std::string* err) {
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, -MAX_WBITS) != Z_OK) {
        *err = "inflateInit"; return false;
    }
    const uint64_t SLICE = 1ull << 30;
    const uint8_t* src = a->base + e.data_off;
    uint64_t in_left = e.comp_size;
    uint64_t out_done = 0;                  // produced so far (incl. skip)
    const uint64_t total_want = skip + want;
    static thread_local std::vector<uint8_t> scratch;
    while (out_done < total_want) {
        if (zs.avail_in == 0 && in_left) {
            uint64_t take = in_left < SLICE ? in_left : SLICE;
            zs.next_in = const_cast<uint8_t*>(src);
            zs.avail_in = (uInt)take;
            src += take;
            in_left -= take;
        }
        uint8_t* out_ptr;
        uint64_t out_take;
        if (out_done < skip) {
            if (scratch.size() < 65536) scratch.resize(65536);
            out_take = skip - out_done;
            if (out_take > scratch.size()) out_take = scratch.size();
            out_ptr = scratch.data();
        } else {
            out_take = total_want - out_done;
            if (out_take > SLICE) out_take = SLICE;
            out_ptr = dst + (out_done - skip);
        }
        zs.next_out = out_ptr;
        zs.avail_out = (uInt)out_take;
        int rc = inflate(&zs, Z_NO_FLUSH);
        out_done += out_take - zs.avail_out;
        if (rc == Z_STREAM_END) break;
        if (rc != Z_OK && rc != Z_BUF_ERROR) {
            inflateEnd(&zs);
            *err = "inflate failed"; return false;
        }
        if (zs.avail_in == 0 && in_left == 0 && out_done < total_want) {
            inflateEnd(&zs);
            *err = "truncated deflate stream"; return false;
        }
    }
    inflateEnd(&zs);
    if (out_done < total_want) { *err = "truncated member"; return false; }
    return true;
}

// Copy/decompress bytes [skip, skip + want) of a member into dst.
// Stored members copy straight from the mapping (no temporary); a
// bounds check against the mmap extent already ran at parse time.
bool read_member_range(const Archive* a, const Entry& e, uint64_t skip,
                       uint8_t* dst, uint64_t want, std::string* err) {
    if (skip + want > e.uncomp_size) {
        *err = "read beyond member"; return false;
    }
    if (e.method == 0) {
        memcpy(dst, a->base + e.data_off + skip, want);
        return true;
    }
    if (e.method != 8) { *err = "unsupported method"; return false; }
    return inflate_member(a, e, skip, dst, want, err);
}

// Parse the npy header of a member (needs the first few hundred bytes).
bool parse_npy_header(const Archive* a, Entry& e, std::string* err) {
    // decompress just enough of the member to read the header
    uint64_t probe = e.uncomp_size < 4096 ? e.uncomp_size : 4096;
    std::vector<uint8_t> buf(probe);
    if (!read_member_range(a, e, 0, buf.data(), probe, err)) return false;
    if (probe < 10 || memcmp(buf.data(), "\x93NUMPY", 6) != 0) {
        *err = "not an npy member"; return false;
    }
    uint8_t major = buf[6];
    uint64_t hlen;
    uint64_t hstart;
    if (major == 1) { hlen = rd16(buf.data() + 8); hstart = 10; }
    else { hlen = rd32(buf.data() + 8); hstart = 12; }
    if (hstart + hlen > probe) { *err = "npy header too large"; return false; }
    std::string hdr((const char*)buf.data() + hstart, hlen);
    e.payload_off = hstart + hlen;
    // parse dict: {'descr': '<f4', 'fortran_order': False, 'shape': (3, 4), }
    auto find_val = [&](const char* key) -> std::string {
        size_t k = hdr.find(key);
        if (k == std::string::npos) return "";
        size_t c = hdr.find(':', k);
        size_t end = hdr.find(',', c);
        // shape tuple contains commas; handle parens
        size_t open = hdr.find('(', c);
        if (open != std::string::npos && (end == std::string::npos || open < end)) {
            size_t close = hdr.find(')', open);
            return hdr.substr(open, close - open + 1);
        }
        if (end == std::string::npos) end = hdr.find('}', c);
        return hdr.substr(c + 1, end - c - 1);
    };
    std::string descr = find_val("'descr'");
    // strip quotes/spaces
    std::string d;
    for (char ch : descr) if (ch != '\'' && ch != ' ') d += ch;
    e.descr = d;
    std::string fo = find_val("'fortran_order'");
    e.fortran = fo.find("True") != std::string::npos;
    std::string shp = find_val("'shape'");
    e.shape.clear();
    uint64_t cur = 0; bool has = false;
    for (char ch : shp) {
        if (ch >= '0' && ch <= '9') { cur = cur * 10 + (ch - '0'); has = true; }
        else if (has) { e.shape.push_back(cur); cur = 0; has = false; }
    }
    return true;
}

// Read the raw array payload of a header-parsed entry into dst.
// const on the Archive (no lazy mutation, no a->error writes) so
// nv_read_many_cap's worker threads can call it concurrently.
int64_t entry_read_core(const Archive* a, const Entry& e, uint8_t* dst,
                        int64_t dst_cap, std::string* err) {
    if (e.payload_off > e.uncomp_size) {
        *err = "corrupt member: payload offset beyond member size";
        return -1;
    }
    int64_t payload = (int64_t)(e.uncomp_size - e.payload_off);
    if (dst_cap >= 0 && payload > dst_cap) {
        *err = "corrupt member: payload larger than npy geometry";
        return -1;
    }
    if (!read_member_range(a, e, e.payload_off, dst, (uint64_t)payload,
                           err))
        return -1;
    return payload;
}

}  // namespace

extern "C" {

void* nv_open(const char* path) {
    auto* a = new Archive();
    a->fd = open(path, O_RDONLY);
    if (a->fd < 0) { a->error = "open failed"; return a; }
    struct stat st;
    fstat(a->fd, &st);
    a->size = (size_t)st.st_size;
    a->base = (const uint8_t*)mmap(nullptr, a->size, PROT_READ, MAP_PRIVATE,
                                   a->fd, 0);
    if (a->base == MAP_FAILED) { a->base = nullptr; a->error = "mmap failed"; return a; }
    madvise((void*)a->base, a->size, MADV_SEQUENTIAL);
    if (!parse_central_directory(a)) return a;
    return a;
}

const char* nv_error(void* h) {
    auto* a = (Archive*)h;
    return a->error.c_str();
}

int nv_num_entries(void* h) { return (int)((Archive*)h)->entries.size(); }

const char* nv_entry_name(void* h, int i) {
    return ((Archive*)h)->entries[i].name.c_str();
}

// Fills descr (caller buffer, >= 16 bytes), shape (caller int64 buffer,
// >= 32 entries), returns ndim, or -1 on error.
int nv_entry_info(void* h, int i, char* descr, int64_t* shape) {
    auto* a = (Archive*)h;
    if (i < 0 || i >= (int)a->entries.size()) return -1;
    Entry& e = a->entries[i];
    std::string err;
    if (e.descr.empty() && !parse_npy_header(a, e, &err)) {
        a->error = err;
        return -1;
    }
    snprintf(descr, 16, "%s", e.descr.c_str());
    for (size_t k = 0; k < e.shape.size() && k < 32; ++k)
        shape[k] = (int64_t)e.shape[k];
    return (int)e.shape.size();
}

// Reads the raw array payload of entry i into dst (caller-allocated,
// dst_cap bytes).  Fails cleanly (-1) when the member's payload size
// disagrees with the caller's npy-header-derived capacity — a corrupt
// or malicious archive whose zip uncomp_size exceeds the descr*shape
// geometry must not overflow the destination buffer.
int64_t nv_entry_read_cap(void* h, int i, uint8_t* dst, int64_t dst_cap) {
    auto* a = (Archive*)h;
    if (i < 0 || i >= (int)a->entries.size()) return -1;
    Entry& e = a->entries[i];
    std::string err;
    if (e.descr.empty() && !parse_npy_header(a, e, &err)) {
        a->error = err; return -1;
    }
    int64_t payload = entry_read_core(a, e, dst, dst_cap, &err);
    if (payload < 0) a->error = err;
    return payload;
}

// Unchecked legacy entry point (kept for ABI compatibility; callers that
// size dst from nv_entry_info geometry should use nv_entry_read_cap).
int64_t nv_entry_read(void* h, int i, uint8_t* dst) {
    return nv_entry_read_cap(h, i, dst, -1);
}

// Read several entries in parallel: indices[k] -> dsts[k] (caps[k] bytes
// each; caps may be null for unchecked reads).  Returns 0 on success.
int nv_read_many_cap(void* h, const int* indices, uint8_t** dsts,
                     const int64_t* caps, int count) {
    auto* a = (Archive*)h;
    // parse every requested npy header up front, single-threaded: the
    // lazy parse mutates shared Entry fields (descr/shape/payload_off)
    // and a->error, which the worker threads below must never touch
    for (int k = 0; k < count; ++k) {
        int i = indices[k];
        if (i < 0 || i >= (int)a->entries.size()) {
            a->error = "entry index out of range";
            return 1;
        }
        Entry& e = a->entries[i];
        std::string err;
        if (e.descr.empty() && !parse_npy_header(a, e, &err)) {
            a->error = err;
            return 1;
        }
    }
    unsigned n_threads = std::thread::hardware_concurrency();
    if (n_threads == 0) n_threads = 4;
    if ((unsigned)count < n_threads) n_threads = (unsigned)count;
    std::atomic<int> next{0};
    std::vector<std::string> errs(count);   // per-task slots, no sharing
    std::vector<std::thread> ts;
    for (unsigned t = 0; t < n_threads; ++t) {
        ts.emplace_back([&]() {
            for (;;) {
                int k = next.fetch_add(1);
                if (k >= count) break;
                int64_t cap = caps ? caps[k] : -1;
                std::string err;
                if (entry_read_core(a, a->entries[indices[k]], dsts[k],
                                    cap, &err) < 0)
                    errs[k] = err.empty() ? "read failed" : err;
            }
        });
    }
    for (auto& th : ts) th.join();
    for (int k = 0; k < count; ++k) {
        if (!errs[k].empty()) {
            a->error = a->entries[indices[k]].name + ": " + errs[k];
            return 1;
        }
    }
    return 0;
}

int nv_read_many(void* h, const int* indices, uint8_t** dsts, int count) {
    return nv_read_many_cap(h, indices, dsts, nullptr, count);
}

void nv_close(void* h) {
    auto* a = (Archive*)h;
    if (a->base) munmap((void*)a->base, a->size);
    if (a->fd >= 0) close(a->fd);
    delete a;
}

// ---------------------------------------------------------------------
// Parallel VQ color decode (reference n3tree.cpp:109-175 semantics,
// including the observed channel*n_basis write index when bug_compat).
// data: f16 [capacity, N3, data_dim] (pre-zeroed by caller)
// quant_map: u16 [n_basis_q, capacity, N3]
// quant_colors: f16 [n_basis_q, 65536, 3]
// sigma: f16 [capacity, N3]
// ---------------------------------------------------------------------
void nv_vq_decode(uint16_t* data, const uint16_t* quant_map,
                  const uint16_t* quant_colors, const uint16_t* retained,
                  const uint16_t* sigma,
                  int64_t capacity, int n3, int data_dim,
                  int n_basis_q, int n_retain, int bug_compat) {
    int n_basis = n_basis_q + n_retain;
    unsigned n_threads = std::thread::hardware_concurrency();
    if (n_threads == 0) n_threads = 4;
    std::vector<std::thread> ts;
    int64_t chunk = (capacity + n_threads - 1) / n_threads;
    for (unsigned t = 0; t < n_threads; ++t) {
        int64_t lo = t * chunk, hi = std::min(capacity, lo + chunk);
        ts.emplace_back([=]() {
            for (int64_t i = lo; i < hi; ++i) {
                for (int j = 0; j < n3; ++j) {
                    uint16_t* row = data + (i * n3 + j) * data_dim;
                    for (int b = 0; b < n_basis_q; ++b) {
                        int basis = n_retain + b;
                        uint16_t id = quant_map[(int64_t)b * capacity * n3
                                                + i * n3 + j];
                        const uint16_t* col = quant_colors
                            + ((int64_t)b * 65536 + id) * 3;
                        for (int c = 0; c < 3; ++c) {
                            int idx = bug_compat ? c * n_basis
                                                 : c * n_basis + basis;
                            row[idx] = col[c];
                        }
                    }
                    if (retained) {
                        int64_t total = (int64_t)n_retain * capacity * n3;
                        for (int b = 0; b < n_retain; ++b) {
                            int64_t base = (int64_t)b * capacity * n3
                                + i * n3 + j;
                            for (int c = 0; c < 3; ++c) {
                                int idx = bug_compat ? c * n_basis
                                                     : c * n_basis + b;
                                int64_t src = base + c;
                                if (src >= total) src = total - 1;
                                row[idx] = retained[src];
                            }
                        }
                    }
                    row[data_dim - 1] = sigma[i * n3 + j];
                }
            }
        });
    }
    for (auto& th : ts) th.join();
}

// ---------------------------------------------------------------------
// Stable counting-sort argsort for small non-negative keys (per-ray
// march step counts: values ~0..4096).  Produces the cost-sorted ray
// permutation and its inverse for the renderer's uniform-cost tiling
// (ops/accel.order_from_steps) ~20x faster than a comparison argsort.
// Returns 0 on success, -1 if a key is out of [0, max_key].
// ---------------------------------------------------------------------
int nv_argsort_counts(const int32_t* keys, int64_t n, int32_t max_key,
                      int32_t* perm, int32_t* inv) {
    if (max_key < 0 || max_key > (1 << 22)) return -1;
    std::vector<int64_t> hist(static_cast<size_t>(max_key) + 2, 0);
    for (int64_t i = 0; i < n; ++i) {
        int32_t k = keys[i];
        if (k < 0 || k > max_key) return -1;
        hist[k + 1]++;
    }
    for (size_t k = 1; k < hist.size(); ++k) hist[k] += hist[k - 1];
    for (int64_t i = 0; i < n; ++i) {
        int64_t pos = hist[keys[i]]++;
        perm[pos] = (int32_t)i;
        inv[i] = (int32_t)pos;
    }
    return 0;
}

}  // extern "C"
